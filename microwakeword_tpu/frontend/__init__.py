"""Audio feature frontend: 16 kHz PCM -> 40 mel features / hop.

- reference: NumPy float golden implementation (validated vs the C op)
- xla:      batched + streaming JAX implementations (TPU compute path)
- pallas:   fused single-kernel TPU implementation of the hot path
"""

from microwakeword_tpu.frontend.reference import (  # noqa: F401
    FEATURE_SCALE,
    MicroFrontend,
    NUM_CHANNELS,
    SAMPLE_RATE,
    WINDOW_SAMPLES,
    generate_features_for_clip,
)
