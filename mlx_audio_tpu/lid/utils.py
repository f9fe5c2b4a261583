"""LID model registry + loader (parity: /root/reference/mlx_audio/lid/utils.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Union

from ..utils import base_load_model

MODEL_REMAPPING = {
    "ecapa": "ecapa_tdnn",
    "ecapa_tdnn": "ecapa_tdnn",
    "wav2vec2": "wav2vec2",
    "mms_lid": "wav2vec2",
}


def load_model(model_path: Union[str, Path], **kwargs):
    return base_load_model(
        model_path=model_path,
        category="lid",
        model_remapping=MODEL_REMAPPING,
        **kwargs,
    )


load = load_model
