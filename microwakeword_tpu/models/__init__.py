"""Model zoo: MixedNet (flagship) and Inception streaming wake-word models."""

from microwakeword_tpu.models.registry import ModelBundle, build_model  # noqa: F401
from microwakeword_tpu.models.mixednet import MixedNet, MixedNetConfig  # noqa: F401
from microwakeword_tpu.models.inception import Inception, InceptionConfig  # noqa: F401
