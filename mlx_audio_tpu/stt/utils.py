"""STT model registry + loader + audio helpers.

Parity: /root/reference/mlx_audio/stt/utils.py (MODEL_REMAPPING :55-75,
load_audio :84). The reference's `wired_limit` Metal working-set guard (:16)
has no TPU analog — HBM is managed by XLA; we expose a no-op shim for API
compatibility.
"""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path
from typing import Union

from ..utils import base_load_model

MODEL_REMAPPING = {
    "whisper": "whisper",
    "distil": "whisper",
    "voxtral_realtime": "voxtral_realtime",
    "parakeet": "parakeet",
    "parakeet_ctc": "parakeet",
    "parakeet_encoder": "parakeet",
    "wav2vec2": "mms",
    "wav2vec": "mms",
    "mms": "mms",
    "moonshine": "moonshine",
    "sensevoice": "sensevoice",
    "sense_voice": "sensevoice",
    "canary": "canary",
    "qwen3_asr": "qwen3_asr",
    "qwen3_omni_moe": "qwen3_asr",
    "mega_asr": "mega_asr",
    "glmasr": "glmasr",
    "glm_asr": "glmasr",
    "nemotron_asr": "nemotron_asr",
    "voxtral_realtime": "voxtral_realtime",
    "voxtral": "voxtral",
    "qwen2_audio": "qwen2_audio",
    "qwen2audio": "qwen2_audio",
    "cohere_asr": "cohere_asr",
    "cohere": "cohere_asr",
    "cohere2": "cohere_asr",
    "qwen3_forced_aligner": "qwen3_forced_aligner",
    "forced_aligner": "qwen3_forced_aligner",
    "lasr": "lasr_ctc",
    "lasr_ctc": "lasr_ctc",
    "fireredasr2": "fireredasr2",
    "firered_asr2": "fireredasr2",
    "fireredasr": "fireredasr2",
    "granite_speech": "granite_speech",
    "granite": "granite_speech",
    "fun_asr_nano": "fun_asr_nano",
    "funasr_nano": "fun_asr_nano",
    "fun_asr": "fun_asr_nano",
    "vibevoice_asr": "vibevoice_asr",
    "vibevoiceasr": "vibevoice_asr",
    "moss_transcribe_diarize": "moss_transcribe_diarize",
    "moss_transcribe": "moss_transcribe_diarize",
    "moss_music": "moss_music",
    "higgs_audio_3": "higgs_audio_3",
    "higgs_audio3": "higgs_audio_3",
    "granite_speech_nar": "granite_speech_nar",
    "granitespeech_nar": "granite_speech_nar",
}


def load_model(model_path: Union[str, Path], **kwargs):
    return base_load_model(
        model_path=model_path,
        category="stt",
        model_remapping=MODEL_REMAPPING,
        **kwargs,
    )


load = load_model


@contextmanager
def wired_limit(*args, **kwargs):
    """No-op on TPU (reference stt/utils.py:16-52 pins Metal working set)."""
    yield


def load_audio(path, sample_rate: int = 16000):
    from ..utils import load_audio as _load

    return _load(path, sample_rate=sample_rate)


def resample_audio(audio, orig_sr: int, target_sr: int):
    """Polyphase resample (reference stt/utils.py:78-81 re-export)."""
    from ..utils import resample_audio as _resample

    return _resample(audio, orig_sr, target_sr)
