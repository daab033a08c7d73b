"""Fused Pallas TPU kernel for the micro-frontend hot path.

One kernel computes PCM -> features end to end, replacing the XLA pipeline's
three materialized HBM intermediates (frames [B,T,480], DFT re/im [B,T,257],
mel energies [B,T,40]) with VMEM-resident tiles:

  grid (b, tt):  DMA audio rows [T_TILE + n_parts - 1, hop] from HBM
                 -> windowed-DFT re/im WITHOUT assembling overlapping
                    frames: the [480 x 384] folded-window DFT matrix is
                    split into n_parts row-blocks of `hop` rows, and
                    re = sum_j rows[j : T+j] @ WC_j  (shifted-matmul
                    decomposition of the frame/matmul; all MXU)
                 -> mel projection: one MXU matmul [T_TILE,384]@[384,128]
                 -> noise-EMA as in-tile Hillis-Steele scan (log2 T_TILE
                    steps) with the running estimate carried across
                    time-tiles in a VMEM scratch (grid iterates time
                    innermost, so the carry is sequential per batch row)
                 -> PCAN + log scale -> write [T_TILE, 40] features

The math is identical to microwakeword_tpu.frontend.xla (same folded DFT/mel
constants, same AGC formulas), which in turn matches the C micro frontend's
float convention (uint16 * 0.0390625 in [0, 26]); see frontend/reference.py
and the reference's audio_utils.py:66-84.

Matrix lane dims are zero-padded to multiples of 128 (257 -> 384 DFT bins,
40 -> 128 mel channels); zero columns flow through as zero features and are
sliced off at the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microwakeword_tpu.frontend import reference as ref
from microwakeword_tpu.frontend import xla as fx

T_TILE = 128  # hops per grid step
N_BINS_PAD = 384  # 257 rfft bins -> 3 * 128 lanes
N_CHAN_PAD = 128  # 40 mel channels -> 1 * 128 lanes


def _n_parts(hop: int) -> int:
    return -(-ref.WINDOW_SAMPLES // hop)  # ceil(480 / hop): 3 @10ms, 2 @20ms


@functools.lru_cache(maxsize=None)
def _padded_constants(hop: int):
    """DFT cos/sin split into `hop`-row blocks (zero-padded), mel, smoothing.

    Returns (wcs [P, hop, 384], wss [P, hop, 384], mel [384, 128],
    smoothing [1, 128]) as float32 NumPy.
    """
    wc, ws, mel, smoothing = fx._dft_mel_constants()
    p = _n_parts(hop)
    hop_pad = -(-hop // 128) * 128  # lane-aligned row width (160->256, 320->384)
    wcs = np.zeros((p, hop_pad, N_BINS_PAD), np.float32)
    wss = np.zeros((p, hop_pad, N_BINS_PAD), np.float32)
    for j in range(p):
        rows = min(hop, ref.WINDOW_SAMPLES - j * hop)
        wcs[j, :rows, : wc.shape[1]] = wc[j * hop : j * hop + rows]
        wss[j, :rows, : ws.shape[1]] = ws[j * hop : j * hop + rows]
    mel_p = np.zeros((N_BINS_PAD, N_CHAN_PAD), np.float32)
    mel_p[: mel.shape[0], : mel.shape[1]] = mel
    # smoothing pad 0 -> a=1, b=0: padded channels stay exactly 0.
    smooth_p = np.zeros((1, N_CHAN_PAD), np.float32)
    smooth_p[0, : smoothing.shape[0]] = smoothing
    return wcs, wss, mel_p, smooth_p


def _kernel(
    audio_hbm, wcs_ref, wss_ref, mel_ref, smooth_ref,
    out_ref, est_ref, rows_ref, sem, *, n_parts: int, t_tile: int,
):
    b = pl.program_id(0)
    tt = pl.program_id(1)

    # DMA length padded to a sublane multiple (Mosaic requires slice
    # shapes aligned to the (8, 128) tiling).
    dma = pltpu.make_async_copy(
        audio_hbm.at[b, pl.ds(tt * t_tile, t_tile + 8), :],
        rows_ref,
        sem,
    )
    dma.start()

    @pl.when(tt == 0)
    def _():
        est_ref[...] = jnp.zeros(est_ref.shape, est_ref.dtype)

    dma.wait()

    # Shifted-matmul windowed DFT: rows overlap across hops, so instead of
    # materializing [t, 480] frames, accumulate per-row-block contributions.
    re = jnp.zeros((t_tile, N_BINS_PAD), jnp.float32)
    im = jnp.zeros((t_tile, N_BINS_PAD), jnp.float32)
    for j in range(n_parts):
        block = rows_ref[j : t_tile + j, :]
        re = re + jnp.dot(block, wcs_ref[j], preferred_element_type=jnp.float32)
        im = im + jnp.dot(block, wss_ref[j], preferred_element_type=jnp.float32)
    energy = re * re + im * im
    sf = jnp.sqrt(
        jnp.dot(energy, mel_ref[...], preferred_element_type=jnp.float32)
    ) / 8.0

    # Noise-estimate EMA est_t = (1-s)*est_{t-1} + s*sf_t as a Hillis-Steele
    # inclusive scan over the tile (jax.lax.associative_scan semantics).
    smoothing = smooth_ref[...]
    a_acc = jnp.broadcast_to(1.0 - smoothing, sf.shape)
    b_acc = smoothing * sf
    d = 1
    while d < t_tile:
        a_prev = jnp.concatenate(
            [jnp.ones((d, N_CHAN_PAD), jnp.float32), a_acc[:-d]], 0
        )
        b_prev = jnp.concatenate(
            [jnp.zeros((d, N_CHAN_PAD), jnp.float32), b_acc[:-d]], 0
        )
        a_acc, b_acc = a_acc * a_prev, a_acc * b_prev + b_acc
        d *= 2
    est_in = est_ref[0:1, :]  # [1, 128] carry from the previous time-tile
    est = a_acc * est_in + b_acc
    est_ref[0:1, :] = est[t_tile - 1 : t_tile, :]

    # PCAN + log scale (frontend/xla.py _agc_output; reference.py constants).
    sub = jnp.maximum(sf - jnp.minimum(est, sf), ref.MIN_SIGNAL_REMAINING * sf)
    snr = (sub / 8.0) * jnp.power(1.0 + est / ref.PCAN_OFFSET, -ref.PCAN_STRENGTH)
    pcan = jnp.where(snr < 2.0, snr * snr / 4.0, snr - 1.0)
    pcan_q6 = jnp.floor(pcan * (1 << ref.PCAN_OUTPUT_BITS))
    value = pcan_q6 * (1 << ref.CORRECTION_BITS)
    logged = jnp.where(
        value > 1.0,
        jnp.log(jnp.maximum(value, 1.0)) * (1 << ref.LOG_SCALE_SHIFT),
        0.0,
    )
    feats = jnp.clip(jnp.round(logged), 0, 65535) * ref.FEATURE_SCALE
    out_ref[0] = feats[:, : ref.NUM_CHANNELS]


@functools.partial(jax.jit, static_argnames=("step_ms", "interpret", "t_tile"))
def frontend_batch(
    audio: jnp.ndarray,
    step_ms: int = 10,
    interpret: bool = False,
    t_tile: int = T_TILE,
) -> jnp.ndarray:
    """[B, N] int16/float samples -> [B, T, 40] float32 features in [0, 26].

    Drop-in equivalent of frontend/xla.py frontend_batch, fused into one
    Pallas kernel.  `interpret=True` runs the Mosaic interpreter (CPU tests).
    """
    if step_ms not in (10, 20):
        raise ValueError("step_ms must be 10 or 20")
    hop = 160 * (step_ms // 10)
    n_parts = _n_parts(hop)
    if jnp.issubdtype(audio.dtype, jnp.floating):
        audio = jnp.round(jnp.clip(audio * 32768.0, -32768.0, 32767.0))
    audio = audio.astype(jnp.float32)

    bsz, n = audio.shape
    t = 1 + (n - ref.WINDOW_SAMPLES) // hop if n >= ref.WINDOW_SAMPLES else 0
    if t <= 0:
        return jnp.zeros((bsz, 0, ref.NUM_CHANNELS), jnp.float32)

    # Short clips (the fused-training window case, e.g. t=194): one
    # right-sized tile instead of cdiv(t, 128) fixed tiles -- at t=194 the
    # fixed tiling computed 256 hops for 194 (33% waste) and paid a second
    # grid step per batch row (VERDICT r2 item 8).
    if t <= 2 * T_TILE:
        t_tile = -(-t // 8) * 8  # sublane-aligned single tile
    n_tiles = pl.cdiv(t, t_tile)
    # Pad so every tile's DMA window exists; padded hops are sliced off.
    n_rows = n_tiles * t_tile + 8
    n_pad = n_rows * hop - n
    if n_pad > 0:
        audio = jnp.pad(audio, ((0, 0), (0, n_pad)))
    rows = audio[:, : n_rows * hop].reshape(bsz, n_rows, hop)
    # Lane-align row width (DMA slices must be multiples of the 128-lane
    # tiling even in HBM); the padded lanes hit zero rows of wcs/wss.
    hop_pad = -(-hop // 128) * 128
    if hop_pad != hop:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, hop_pad - hop)))

    wcs, wss, mel, smooth = _padded_constants(hop)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_parts=n_parts, t_tile=t_tile),
        grid=(bsz, n_tiles),
        in_specs=[
            # Keep audio in (untiled) HBM: VMEM placement would subject the
            # per-tile DMA source slices to (8, 128) tiling alignment.
            pl.BlockSpec(memory_space=pltpu.HBM),
            const_spec,
            const_spec,
            const_spec,
            const_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, ref.NUM_CHANNELS),
            lambda b, tt: (b, tt, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, n_tiles * t_tile, ref.NUM_CHANNELS), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((8, N_CHAN_PAD), jnp.float32),  # est carry (row 0)
            pltpu.VMEM((t_tile + 8, -(-hop // 128) * 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rows, jnp.asarray(wcs), jnp.asarray(wss), jnp.asarray(mel), jnp.asarray(smooth))
    return out[:, :t, :]
