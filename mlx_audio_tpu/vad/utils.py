"""VAD model registry + loader (parity: /root/reference/mlx_audio/vad/utils.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Union

from ..utils import base_load_model

MODEL_REMAPPING = {
    "silero": "silero_vad",
    "silero_vad": "silero_vad",
    "vad": "silero_vad",
    "sortformer": "sortformer",
    "fsmn": "fsmn",
    "smart_turn": "smart_turn",
}


def load_model(model_path: Union[str, Path], **kwargs):
    return base_load_model(
        model_path=model_path,
        category="vad",
        model_remapping=MODEL_REMAPPING,
        **kwargs,
    )


load = load_model
