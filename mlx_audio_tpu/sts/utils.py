"""STS model registry + loader.

Parity: /root/reference/mlx_audio/sts/utils.py (MODEL_REMAPPING :13-26,
config-shape-based inference `infer_model_type_from_config` :29-60).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

from ..utils import base_load_model

MODEL_REMAPPING = {
    "sam_audio": "sam_audio",
    "moshi": "moshi",
    "deepfilternet": "deepfilternet",
    "mossformer2": "mossformer2_se",
    "mossformer2_se": "mossformer2_se",
    "mel_roformer": "mel_roformer",
    "mel_band_roformer": "mel_roformer",
    "lfm_audio": "lfm_audio",
}


def infer_model_type_from_config(config: dict) -> Optional[str]:
    """Guess the STS architecture from characteristic config keys
    (reference sts/utils.py:29-60)."""
    keys = set(config.keys())
    if {"audio_encoder_args", "text_encoder_args"} & keys or "sam" in str(
            config.get("model_type", "")):
        return "sam_audio"
    if {"depformer", "dep_q"} & keys:
        return "moshi"
    if "df_order" in keys or "erb_bands" in keys:
        return "deepfilternet"
    if "mossformer" in str(config.get("model_type", "")):
        return "mossformer2_se"
    return config.get("model_type")


def load_model(model_path: Union[str, Path], **kwargs):
    if "model_type" not in kwargs:
        # STS checkpoints often ship without model_type (e.g. raw kyutai
        # moshi configs) — infer it from characteristic keys, as the
        # reference does before dispatch (sts/utils.py:29-60)
        from ..utils import get_model_path, load_config

        try:
            inferred = infer_model_type_from_config(
                load_config(get_model_path(str(model_path))))
        except (FileNotFoundError, OSError):
            inferred = None
        if inferred:
            kwargs["model_type"] = inferred
    return base_load_model(
        model_path=model_path,
        category="sts",
        model_remapping=MODEL_REMAPPING,
        **kwargs,
    )


load = load_model
