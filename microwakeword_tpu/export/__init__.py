"""Export: streaming TFLite (full-int8), native .mww, and StableHLO .mwwx
deployment artifacts."""

from microwakeword_tpu.export.tflite import (  # noqa: F401
    build_tf_streaming_mixednet,
    convert_to_tflite,
    export_and_evaluate_tflite,
    TFLiteStreamingModel,
)
from microwakeword_tpu.export.stablehlo import (  # noqa: F401
    export_streaming as export_stablehlo,
    StableHLOModel,
)
