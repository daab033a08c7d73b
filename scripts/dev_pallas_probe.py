"""Probe pallas frontend kernel stages for compile hangs (dev only)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microwakeword_tpu.frontend import pallas as fp
from microwakeword_tpu.frontend import reference as ref

STAGE = sys.argv[1] if len(sys.argv) > 1 else "dft"
T_TILE = 128
HOP_PAD = 256


def _kernel(audio_hbm, wcs_ref, wss_ref, mel_ref, smooth_ref, out_ref,
            est_ref, rows_ref, sem, *, n_parts, t_tile):
    b = pl.program_id(0)
    tt = pl.program_id(1)
    dma = pltpu.make_async_copy(
        audio_hbm.at[b, pl.ds(tt * t_tile, t_tile + 8), :], rows_ref, sem)
    dma.start()
    dma.wait()
    rows = rows_ref[...]
    re = jnp.zeros((t_tile, fp.N_BINS_PAD), jnp.float32)
    im = jnp.zeros((t_tile, fp.N_BINS_PAD), jnp.float32)
    if STAGE == "plain":
        block = rows[:t_tile]
        re = jnp.dot(block, wcs_ref[0], preferred_element_type=jnp.float32)
        out_ref[0] = re[:, : ref.NUM_CHANNELS]
        return
    if STAGE == "copy":
        out_ref[0] = rows[:t_tile, : ref.NUM_CHANNELS]
        return
    if STAGE in ("dft", "mel", "scan"):
        for j in range(n_parts):
            block = pltpu.roll(rows, (T_TILE + 8 - j) % (T_TILE + 8), 0)[:t_tile]
            re = re + jnp.dot(block, wcs_ref[j], preferred_element_type=jnp.float32)
            im = im + jnp.dot(block, wss_ref[j], preferred_element_type=jnp.float32)
    if STAGE == "dft":
        out_ref[0] = (re * re + im * im)[:, : ref.NUM_CHANNELS]
        return
    energy = re * re + im * im
    sf = jnp.sqrt(jnp.dot(energy, mel_ref[...], preferred_element_type=jnp.float32)) / 8.0
    if STAGE == "mel":
        out_ref[0] = sf[:, : ref.NUM_CHANNELS]
        return
    smoothing = smooth_ref[...]
    a_acc = jnp.broadcast_to(1.0 - smoothing, sf.shape)
    b_acc = smoothing * sf
    d = 1
    while d < t_tile:
        a_prev = jnp.concatenate([jnp.ones((d, fp.N_CHAN_PAD), jnp.float32), a_acc[:-d]], 0)
        b_prev = jnp.concatenate([jnp.zeros((d, fp.N_CHAN_PAD), jnp.float32), b_acc[:-d]], 0)
        a_acc, b_acc = a_acc * a_prev, a_acc * b_prev + b_acc
        d *= 2
    est_in = est_ref[0:1, :]
    est = a_acc * est_in + b_acc
    est_ref[0:1, :] = est[t_tile - 1 : t_tile, :]
    out_ref[0] = est[:, : ref.NUM_CHANNELS]


def run():
    rng = np.random.default_rng(0)
    audio = rng.integers(-20000, 20000, (1, 16000)).astype(np.float32)
    hop = 160
    n_parts = 3
    bsz, n = audio.shape
    t = 1 + (n - 480) // hop
    n_tiles = pl.cdiv(t, T_TILE)
    n_rows = n_tiles * T_TILE + 8
    audio = np.pad(audio, ((0, 0), (0, n_rows * hop - n)))
    rows = audio.reshape(bsz, n_rows, hop)
    rows = np.pad(rows, ((0, 0), (0, 0), (0, HOP_PAD - hop)))
    wcs, wss, mel, smooth = fp._padded_constants(hop)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_kernel, n_parts=n_parts, t_tile=T_TILE),
        grid=(bsz, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] + [const_spec] * 4,
        out_specs=pl.BlockSpec(
            (1, T_TILE, ref.NUM_CHANNELS), lambda b, tt: (b, tt, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles * T_TILE, ref.NUM_CHANNELS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, fp.N_CHAN_PAD), jnp.float32),
            pltpu.VMEM((T_TILE + 8, HOP_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    t0 = time.time()
    out = jax.jit(lambda *a: fn(*a))(
        jnp.asarray(rows), jnp.asarray(wcs), jnp.asarray(wss),
        jnp.asarray(mel), jnp.asarray(smooth))
    out = np.asarray(out)
    print(STAGE, "ok", round(time.time() - t0, 1), out.shape, flush=True)


if __name__ == "__main__":
    run()
