"""Export: streaming TFLite models (full-int8) for on-device deployment."""

from microwakeword_tpu.export.tflite import (  # noqa: F401
    build_tf_streaming_mixednet,
    convert_to_tflite,
    export_and_evaluate_tflite,
    TFLiteStreamingModel,
)
