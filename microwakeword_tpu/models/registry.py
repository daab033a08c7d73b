"""Unified model API: one config -> (init, forward, stream_step) pure fns.

Replaces the reference's mode-cloning graph surgery
(utils.py:27-128 convert_to_inference_model/_copy_weights): here the same
parameter pytree drives both the full-sequence forward pass and the
streaming step; the streaming ring buffers live in an explicit ``cache``
pytree returned/accepted by ``stream_step``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from microwakeword_tpu.models import inception, mixednet


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """Pure-functional handle on a model family in both modes."""

    name: str
    config: Any
    module: Any  # non-streaming flax module
    stream_module: Any  # streaming flax module
    stride: int  # streaming input frames per step
    input_features: int = 40

    # ---- construction -------------------------------------------------
    def init(self, rng: jax.Array) -> dict:
        """Initialize {'params', 'batch_stats'} variables."""
        x = jnp.zeros((1, self.config.spectrogram_length, self.input_features))
        variables = self.module.init(rng, x, train=True)
        return dict(variables)

    # ---- non-streaming ------------------------------------------------
    def forward(self, variables: dict, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T, F] -> [B, 1] probabilities (inference, running BN stats)."""
        return self.module.apply(
            {k: variables[k] for k in ("params", "batch_stats") if k in variables},
            x,
            train=False,
        )

    def forward_train(
        self, variables: dict, x: jnp.ndarray, dropout_rng: jax.Array | None = None
    ) -> tuple[jnp.ndarray, dict]:
        """Training forward: returns (probs, {'batch_stats': updated})."""
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else {}
        probs, updates = self.module.apply(
            {k: variables[k] for k in ("params", "batch_stats") if k in variables},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs=rngs,
        )
        return probs, updates

    # ---- streaming ----------------------------------------------------
    def stream_init(self, variables: dict, batch_size: int = 1) -> dict:
        """Zero ring-buffer cache for a batch of independent streams."""
        x = jnp.zeros((batch_size, self.stride, self.input_features))
        init_vars = self.stream_module.init(jax.random.PRNGKey(0), x, train=False)
        return init_vars.get("cache", {})

    def stream_step(
        self, variables: dict, cache: dict, frames: jnp.ndarray
    ) -> tuple[jnp.ndarray, dict]:
        """[B, stride, F] newest slices -> ([B, 1] probs, new cache)."""
        probs, updates = self.stream_module.apply(
            {
                **{
                    k: variables[k]
                    for k in ("params", "batch_stats")
                    if k in variables
                },
                "cache": cache,
            },
            frames,
            train=False,
            mutable=["cache"],
        )
        return probs, updates["cache"]

    def stream_scan(
        self, variables: dict, x: jnp.ndarray, cache: dict | None = None
    ) -> jnp.ndarray:
        """Scan stream_step over a [B, T, F] spectrogram; T % stride == 0.

        Returns [B, T//stride, 1] per-step probabilities.  This is the
        building block of streamed ambient evaluation (SURVEY.md §5:
        lax.scan with carried ring-buffer state).
        """
        b, t, f = x.shape
        steps = t // self.stride
        if cache is None:
            cache = self.stream_init(variables, b)
        xs = jnp.moveaxis(
            x[:, : steps * self.stride].reshape(b, steps, self.stride, f), 1, 0
        )

        def step(carry, frame_block):
            probs, new_cache = self.stream_step(variables, carry, frame_block)
            return new_cache, probs

        _, probs = jax.lax.scan(step, cache, xs)
        return jnp.moveaxis(probs, 0, 1)

    # ---- static shape info -------------------------------------------
    @property
    def spectrogram_length(self) -> int:
        return self.config.spectrogram_length

    @property
    def slices_dropped(self) -> int:
        if self.name == "mixednet":
            return mixednet.spectrogram_slices_dropped(self.config)
        return inception.spectrogram_slices_dropped(self.config)


def build_model(name: str, config: Any = None, **overrides) -> ModelBundle:
    """Builds a ModelBundle for 'mixednet' or 'inception'."""
    if name == "mixednet":
        cfg = config or mixednet.MixedNetConfig(**overrides)
        return ModelBundle(
            name=name,
            config=cfg,
            module=mixednet.MixedNet(cfg, streaming=False),
            stream_module=mixednet.MixedNet(cfg, streaming=True),
            stride=cfg.stride,
        )
    if name == "inception":
        cfg = config or inception.InceptionConfig(**overrides)
        return ModelBundle(
            name=name,
            config=cfg,
            module=inception.Inception(cfg, streaming=False),
            stream_module=inception.Inception(cfg, streaming=True),
            stride=cfg.stride,
        )
    raise ValueError(f"unknown model {name!r}; expected 'mixednet' or 'inception'")
