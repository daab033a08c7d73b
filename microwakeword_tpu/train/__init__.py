"""Training loop, metrics, and checkpoint policy."""

from microwakeword_tpu.train.metrics import (  # noqa: F401
    confusion_at_cutoffs,
    validation_metrics,
)
from microwakeword_tpu.train.loop import train  # noqa: F401
