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
    "llama": "llama",
    "orpheus": "llama",
    "svara": "llama",
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


def get_available_models():
    """All TTS model types in this install (reference tts/utils.py:53-68)."""
    models_dir = Path(__file__).parent / "models"
    out = []
    for d in sorted(models_dir.iterdir()):
        if d.is_dir() and (d / "__init__.py").exists() \
                and not d.name.startswith("_"):
            out.append(d.name)
    return out


def get_model_and_args(model_type: str, model_name=None):
    """(architecture module, resolved model_type) — reference
    tts/utils.py:71-97's remap-then-partial-match resolution."""
    from ..utils import get_model_class, get_model_name_parts

    resolved = MODEL_REMAPPING.get(model_type, model_type)
    if resolved not in get_available_models() and model_name:
        parts = []
        for name in (model_name if isinstance(model_name, (list, tuple))
                     else [model_name]):
            parts.extend(get_model_name_parts(str(name)))
        for part in parts:
            if part in MODEL_REMAPPING:
                resolved = MODEL_REMAPPING[part]
                break
    module, arch = get_model_class(resolved, "tts", MODEL_REMAPPING)
    return module, arch


def fetch_from_hub(model_path, lazy: bool = False, **kwargs):
    """(model, config dict) pair (reference tts/utils.py:158-164)."""
    from ..utils import load_config

    model = load_model(model_path, **kwargs)
    config = load_config(model_path)
    return model, config


def convert(hf_path, mlx_path: str = "mlx_model", quantize: bool = False,
            q_group_size=None, q_bits=None, dtype=None, upload_repo=None,
            revision=None, dequantize: bool = False,
            trust_remote_code: bool = True, quant_predicate=None,
            q_mode: str = "affine"):
    """TTS checkpoint conversion (reference tts/utils.py:213-324) —
    delegates to the domain-aware converter."""
    from ..convert import convert as _convert

    return _convert(
        hf_path=str(hf_path), mlx_path=str(mlx_path),
        dtype=dtype or "bfloat16", quantize=quantize,
        q_group_size=q_group_size, q_bits=q_bits or 4, q_mode=q_mode,
        quant_predicate=quant_predicate, domain="tts",
        upload_repo=upload_repo, dequantize=dequantize, revision=revision)


def upload_to_hub(path, upload_repo: str, hf_path: str = ""):
    """Upload a converted model dir to the HF hub (reference
    tts/utils.py:167-210)."""
    from ..convert import _upload_to_hub

    _upload_to_hub(Path(path), upload_repo)
