"""TTS model registry + loader.

Parity: /root/reference/mlx_audio/tts/utils.py (MODEL_REMAPPING :19-47,
load/load_model :100-155).
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

from ..utils import base_load_model

MODEL_REMAPPING = {
    "style_tts": "kokoro",
    "kokoro": "kokoro",
    "kitten": "kitten_tts",
    "kittentts": "kitten_tts",
    "qwen3_tts": "qwen3_tts",
    "qwen3tts": "qwen3_tts",
    "csm": "sesame",
    "sesame": "sesame",
    "higgs": "higgs_audio_v3",
    "higgs_audio_v3": "higgs_audio_v3",
    "higgs_audio": "higgs_audio",
    "bark": "bark",
    "dia": "dia",
    "spark": "spark",
    "outetts": "outetts",
    "soprano": "soprano",
    "vibevoice": "vibevoice",
    "vibevoice_streaming": "vibevoice",
    "chatterbox": "chatterbox",
    "chatterbox_turbo": "chatterbox_turbo",
    "chatterboxturbo": "chatterbox_turbo",
    "melotts": "melotts",
    "vits": "melotts",
    "pocket_tts": "pocket_tts",
    "pocket": "pocket_tts",
    "moss_tts": "moss_tts",
    "moss_tts_delay": "moss_tts_delay",
    "moss_ttsd": "moss_tts_delay",
    "moss_tts_local": "moss_tts_local",
    "moss_tts_nano": "moss_tts_nano",
    "mosstts": "moss_tts",
    "qwen3": "qwen3",
    "vyvo": "qwen3",
    "vyvotts": "qwen3",
    "bailingmm": "bailingmm",
    "ming_omni_tts": "bailingmm",
    "ming_omni": "bailingmm",
    "dense": "dense",
    "kugelaudio": "kugelaudio",
    "kugel": "kugelaudio",
    "voxcpm": "voxcpm",
    "voxcpm2": "voxcpm2",
    "tada": "tada",
    "fish_speech": "fish_qwen3_omni",
    "fish_qwen3_omni": "fish_qwen3_omni",
    "fishspeech": "fish_qwen3_omni",
    "confucius4": "confucius4",
    "confucius": "confucius4",
    "echo_tts": "echo_tts",
    "echo": "echo_tts",
    "echotts": "echo_tts",
    "indextts": "indextts",
    "index_tts": "indextts",
    "index-tts": "indextts",
    "omnivoice": "omnivoice",
    "omni_voice": "omnivoice",
    "voxtral_tts": "voxtral_tts",
    "voxtral": "voxtral_tts",
    "audiodit": "longcat_audiodit",
    "longcat_audiodit": "longcat_audiodit",
    "longcat": "longcat_audiodit",
    "zonos2": "zonos2",
    "zonos": "zonos2",
    "irodori_tts": "irodori_tts",
    "irodori": "irodori_tts",
    "dramabox-tts": "dramabox",
    "dramabox": "dramabox",
}


def load_model(model_path: Union[str, Path], **kwargs):
    return base_load_model(
        model_path=model_path,
        category="tts",
        model_remapping=MODEL_REMAPPING,
        **kwargs,
    )


# soft alias matching the reference's dual name surface
load = load_model
