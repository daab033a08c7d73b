"""Training configuration: YAML load + derived shapes.

Port of the reference's load_config (model_train_eval.py:45-96): reads the
same YAML schema (features list, schedules, metric selection) and computes
spectrogram_length_final_layer / spectrogram_length / training_input_shape
from the clip duration, window step and model stride.
"""

from __future__ import annotations

import os

import yaml

from microwakeword_tpu.models.presets import derive_lengths


def load_config(path: str, model_config, stride: int | None = None) -> dict:
    """Loads the YAML training config and derives shapes for model_config.

    model_config: a MixedNetConfig/InceptionConfig whose slices-dropped
    count determines the model input length.  Returns the config dict with
    spectrogram_length/-_final_layer/stride/training_input_shape set, and
    the (possibly updated) model config dataclass under 'model_config'.
    """
    with open(path) as f:
        config = yaml.safe_load(f)
    return derive_config(config, model_config, stride)


def derive_config(config: dict, model_config, stride: int | None = None) -> dict:
    import dataclasses

    from microwakeword_tpu.models import inception as I
    from microwakeword_tpu.models import mixednet as MX

    config = dict(config)
    config.setdefault("window_step_ms", 20)  # reference default (quirk §8.8)
    config["summaries_dir"] = os.path.join(config.get("train_dir", "."), "logs")
    if stride is None:
        stride = getattr(model_config, "stride", 1)
    config["stride"] = stride

    if isinstance(model_config, MX.MixedNetConfig):
        dropped = MX.spectrogram_slices_dropped(model_config)
    elif isinstance(model_config, I.InceptionConfig):
        dropped = I.spectrogram_slices_dropped(model_config)
    else:
        raise TypeError(f"unknown model config {type(model_config)}")

    final, total = derive_lengths(
        int(config["clip_duration_ms"]), int(config["window_step_ms"]), stride, dropped
    )
    config["spectrogram_length_final_layer"] = final
    config["spectrogram_length"] = total
    config["training_input_shape"] = (total, 40)
    config["model_config"] = dataclasses.replace(
        model_config, spectrogram_length=total
    )
    return config
