"""Evaluation: streamed ambient false-accept rates and ROC curves."""

from microwakeword_tpu.evaluate.roc import (  # noqa: F401
    compute_false_accepts_per_hour,
    generate_roc_curve,
    moving_average,
)
from microwakeword_tpu.evaluate.streaming_eval import (  # noqa: F401
    streaming_model_roc,
    model_accuracy,
)
