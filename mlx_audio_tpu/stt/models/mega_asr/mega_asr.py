"""MegaASR: Qwen3-ASR with a quality router and LoRA specialization.

Parity: reference stt/models/mega_asr/mega_asr.py — wraps Qwen3ASRModel
(:17-52), routes each request through the AudioQualityRouter and toggles
LoRA deltas on the ASR weights when audio is degraded (:81-97), loads
extras/router.safetensors and extras/lora.safetensors in post_load_hook
(:61-79); config flattens to a qwen3_asr config (config.py:43-55).

Functional twist: LoRA deltas are added/subtracted on the nested params
dict (lora.py) — the jitted decode programs are keyed on shapes only, so
toggling LoRA never recompiles.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

from ..qwen3_asr.config import ModelConfig as Qwen3Config
from ..qwen3_asr.qwen3_asr import Model as Qwen3ASRModel
from .lora import apply_deltas, load_lora_factors
from .router import AudioQualityRouter


class ModelConfig(Qwen3Config):
    pass


class Model(Qwen3ASRModel):
    def __init__(self, config=None, **kwargs):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config, **kwargs)
        self.config.model_type = "mega_asr"
        self._router: Optional[AudioQualityRouter] = None
        self._deltas: Dict = {}
        self._lora_active = False
        self.router_weights = "extras/router.safetensors"
        self.lora_weights = "extras/lora.safetensors"

    def _set_lora(self, want: bool) -> None:
        if not self._deltas or want == self._lora_active:
            return
        self.params = apply_deltas(self.params, self._deltas,
                                   1.0 if want else -1.0)
        self._lora_active = want

    def _route(self, audio) -> None:
        if self._router is None:
            return
        route = self._router.route(self._load(audio))
        self._set_lora(bool(route["use_lora"]))

    def generate(self, audio, **kwargs):
        self._route(audio)
        return super().generate(audio, **kwargs)

    def stream_transcribe(self, audio, **kwargs):
        self._route(audio)
        return super().stream_transcribe(audio, **kwargs)

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        model = Qwen3ASRModel.post_load_hook(model, model_path)
        model_path = Path(model_path)
        rp = model_path / model.router_weights
        if rp.exists():
            from safetensors.numpy import load_file
            model._router = AudioQualityRouter.from_converted(
                load_file(str(rp)))
        lp = model_path / model.lora_weights
        if lp.exists():
            model._deltas = load_lora_factors(lp)
        return model


__all__ = ["Model", "ModelConfig"]
