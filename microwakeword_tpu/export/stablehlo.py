"""Portable StableHLO deployment artifacts via jax.export (.mwwx).

The reference's deployment artifact is an int8 TFLite flatbuffer produced
by graph-surgery + converter (reference utils.py:289-348) and executed by
the TFLite C++ interpreter (reference inference.py:34-64).  The TPU-native
equivalent keeps the model a *pure function*: this module serializes the
ModelBundle's jitted streaming step (explicit ring-buffer cache pytree in
and out), the zero-cache initializer, and the non-streaming forward as
versioned StableHLO (jax.export), weights baked in as constants.

The artifact is one zip file:

    meta.json            model name, stride, input features, shapes
    forward.bin          [b, T, F] spectrogram -> [b, 1] probs
    stream_init.bin      () -> zero ring-buffer cache pytree (batch 1)
    stream_step.bin      (cache, [1, stride, F]) -> ([1, 1] probs, cache)

Batch is a symbolic dimension for ``forward`` (serve any batch from one
artifact); the streaming pair is exported at batch 1 (a deployed stream).
StableHLO serialization is versioned and forward-compatible, so artifacts
outlive the exporting jax version, and one artifact runs on every platform
in ``platforms`` (default: cpu + tpu) -- the role TFLite portability plays
for the reference, without leaving the XLA toolchain.
"""

from __future__ import annotations

import io
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def _export_fn(fn, args, platforms):
    """jax.export with a multi-platform lowering, falling back to the
    current platform when a primitive lacks a cross-platform rule.

    The fallback is loud (warning naming the lost platforms + cause) and the
    artifact's meta.json records the platforms actually lowered, so a
    reduced-platform artifact is never produced silently.  If the
    single-platform retry fails too, the original multi-platform error is
    re-raised as well so the real cause is not masked.
    """
    try:
        return jax.export.export(jax.jit(fn), platforms=platforms)(*args)
    except Exception as multi_err:
        import warnings

        warnings.warn(
            f"multi-platform StableHLO lowering for {platforms} failed "
            f"({type(multi_err).__name__}: {multi_err}); falling back to the "
            f"current platform only -- the artifact will not run on the "
            f"other platforms",
            stacklevel=2,
        )
        try:
            return jax.export.export(jax.jit(fn))(*args)
        except Exception as single_err:
            raise single_err from multi_err


def export_streaming(bundle, variables, path, platforms=("cpu", "tpu")):
    """Serializes bundle + trained variables to a .mwwx zip at ``path``."""
    variables = {
        k: jax.tree.map(jnp.asarray, variables[k])
        for k in ("params", "batch_stats")
        if k in variables
    }
    f32 = jnp.float32
    feats = bundle.input_features

    # forward: symbolic batch so one artifact serves any batch size
    try:
        (b,) = jax.export.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, bundle.spectrogram_length, feats), f32)
    except Exception:  # symbolic shapes unavailable: pin batch 1
        x_spec = jax.ShapeDtypeStruct((1, bundle.spectrogram_length, feats), f32)
    forward = _export_fn(
        lambda x: bundle.forward(variables, x), (x_spec,), platforms
    )

    cache = bundle.stream_init(variables, batch_size=1)
    stream_init = _export_fn(lambda: bundle.stream_init(variables, 1), (), platforms)
    cache_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), cache
    )
    frame_spec = jax.ShapeDtypeStruct((1, bundle.stride, feats), f32)
    stream_step = _export_fn(
        lambda c, fr: bundle.stream_step(variables, c, fr),
        (cache_spec, frame_spec),
        platforms,
    )

    meta = {
        "format_version": FORMAT_VERSION,
        "model": bundle.name,
        "stride": bundle.stride,
        "input_features": feats,
        "spectrogram_length": bundle.spectrogram_length,
        "platforms": list(forward.platforms),
        "jax_version": jax.__version__,
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=2))
        z.writestr("forward.bin", bytes(forward.serialize()))
        z.writestr("stream_init.bin", bytes(stream_init.serialize()))
        z.writestr("stream_step.bin", bytes(stream_step.serialize()))
    with open(path, "wb") as f:
        f.write(buf.getvalue())


class StableHLOModel:
    """Loaded .mwwx artifact: pure callables, no link back to the exporter.

    ``forward`` accepts any batch (symbolic dim); ``stream_step`` carries
    the explicit ring-buffer cache pytree exactly like ModelBundle, so the
    evaluation stack (inference.Model, streaming_model_roc's stream_fn
    protocol) drives it unchanged.
    """

    def __init__(self, path):
        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read("meta.json"))
            self._forward = jax.export.deserialize(z.read("forward.bin")).call
            self._stream_init = jax.export.deserialize(
                z.read("stream_init.bin")
            ).call
            self._stream_step = jax.export.deserialize(
                z.read("stream_step.bin")
            ).call
        self.stride = int(self.meta["stride"])
        self.input_features = int(self.meta["input_features"])
        self.spectrogram_length = int(self.meta["spectrogram_length"])

    def forward(self, x) -> jnp.ndarray:
        """[b, T, F] spectrogram -> [b, 1] probabilities."""
        return self._forward(jnp.asarray(x, jnp.float32))

    def stream_init(self) -> dict:
        return self._stream_init()

    def stream_step(self, cache, frames):
        """(cache, [1, stride, F]) -> ([1, 1] probs, new cache)."""
        return self._stream_step(cache, jnp.asarray(frames, jnp.float32))

    def predict_spectrogram(self, spectrogram) -> np.ndarray:
        """Streams a [T, F] (or [1, T, F]) spectrogram stride frames at a
        time; returns [T // stride] probabilities (reference
        inference.py:98-125 semantics)."""
        spec = np.asarray(spectrogram, np.float32)
        if spec.ndim == 2:
            spec = spec[None]
        steps = spec.shape[1] // self.stride
        cache = self.stream_init()
        probs = []
        for i in range(steps):
            frames = spec[:, i * self.stride : (i + 1) * self.stride]
            p, cache = self.stream_step(cache, frames)
            probs.append(float(np.asarray(p)[0, 0]))
        return np.asarray(probs, np.float32)
