"""KittenTTS: 15-80M edge TTS (Kokoro-style ALBERT + prosody + ISTFTNet).

Parity: /root/reference/mlx_audio/tts/models/kitten_tts (kitten_tts.py
ModelConfig :94, KittenDecoder :120 — a parametrized Kokoro decoder with
configurable conv width / asr-res dim; quant.py ONNX-style dynamic uint8
fake-quantization :4-21; voices.npz packs with speed priors).

The architecture is Kokoro with width knobs, so this family composes the
kokoro functional modules directly (kokoro already exposes
decoder_bottleneck/decoder_res_dim for exactly this reason).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ..kokoro.kokoro import Model as KokoroModel, ModelConfig as KokoroConfig


def fake_quant_dynamic_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic per-tensor uint8 fake-quant (ONNX DynamicQuantizeLinear),
    parity with reference quant.py:4-21."""
    xf = x.astype(jnp.float32)
    x_min = jnp.minimum(jnp.min(xf), 0.0)
    x_max = jnp.maximum(jnp.max(xf), 0.0)
    scale = (x_max - x_min) / 255.0
    scale_safe = jnp.where(scale == 0, 1.0, scale)
    zp = jnp.clip(jnp.round(-x_min / scale_safe), 0.0, 255.0)
    q = jnp.clip(jnp.round(xf / scale_safe + zp), 0.0, 255.0)
    deq = (q - zp) * scale_safe
    return jnp.where(scale == 0, jnp.zeros_like(deq), deq).astype(x.dtype)


def basic_english_tokenize(text: str) -> List[str]:
    return re.findall(r"\w+|[^\w\s]", text)


@dataclass
class ModelConfig(BaseModelArgs):
    hidden_dim: int = 128
    max_conv_dim: int = 512
    max_dur: int = 50
    n_layer: int = 3
    n_mels: int = 80
    n_token: int = 178
    style_dim: int = 128
    text_encoder_kernel_size: int = 5
    asr_res_dim: int = 64
    plbert: dict = field(default_factory=dict)
    istftnet: dict = field(default_factory=dict)
    vocab: Dict[str, int] = field(default_factory=dict)
    sample_rate: int = 24000
    decoder_out_dim: Optional[int] = None
    voices_path: str = "voices.npz"
    speed_priors: Optional[dict] = None
    voice_aliases: Optional[dict] = None
    model_path: str = ""
    activation_quant_modules: Optional[List[str]] = None


class Model(KokoroModel):
    """KittenTTS = width-parametrized Kokoro + voices.npz + speed priors."""

    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.kitten_config = config
        kcfg = KokoroConfig(
            istftnet=config.istftnet,
            hidden_dim=config.hidden_dim,
            max_conv_dim=config.max_conv_dim,
            max_dur=config.max_dur,
            n_layer=config.n_layer,
            n_mels=config.n_mels,
            n_token=config.n_token,
            style_dim=config.style_dim,
            text_encoder_kernel_size=config.text_encoder_kernel_size,
            plbert=config.plbert,
            vocab=config.vocab,
            sample_rate=config.sample_rate,
            model_path=config.model_path,
            decoder_bottleneck=config.max_conv_dim,
            decoder_res_dim=config.asr_res_dim,
        )
        super().__init__(kcfg)
        self.speed_priors = config.speed_priors or {}
        self.voice_aliases = config.voice_aliases or {}
        self._voices: Optional[Dict[str, np.ndarray]] = None

    # -- voices (npz pack, reference kitten_tts voices.npz) ------------------

    def load_voices(self) -> Dict[str, np.ndarray]:
        if self._voices is None:
            from pathlib import Path

            path = Path(self.kitten_config.model_path or ".") / \
                self.kitten_config.voices_path
            self._voices = {}
            if path.exists():
                with np.load(path) as data:
                    for name in data.files:
                        self._voices[name] = data[name]
        return self._voices

    def get_voice(self, voice: str, n_phonemes: int = 1) -> np.ndarray:
        voice = self.voice_aliases.get(voice, voice)
        packs = self.load_voices()
        if voice not in packs:
            raise FileNotFoundError(
                f"Voice '{voice}' not in {sorted(packs) or 'empty pack'}")
        pack = packs[voice]
        if pack.ndim == 3:  # kokoro-style per-length packs
            pack = pack[min(n_phonemes - 1, pack.shape[0] - 1)]
        return pack.reshape(1, -1)

    def get_supported_speakers(self) -> List[str]:
        return sorted(self.load_voices())

    # -- generation ----------------------------------------------------------

    def generate(self, text: str, voice: Optional[str] = None,
                 speed: float = 1.0, lang_code: str = "a",
                 split_pattern: str = r"\n+", **kwargs):
        """Kokoro-style generator but with npz voices + per-voice speed
        priors (reference kitten_tts Model.generate)."""
        import time as _time

        from ...g2p import g2p
        from ..base import GenerationResult, format_duration, peak_memory_gb
        from ..kokoro.pipeline import KokoroPipeline

        voice = voice or (self.get_supported_speakers() or ["default"])[0]
        speed = speed * float(self.speed_priors.get(voice, 1.0))
        segments = KokoroPipeline.split_segments(text, split_pattern)
        start = _time.time()
        for segment_idx, segment in enumerate(segments):
            ps = g2p(segment)
            for chunk in KokoroPipeline.chunk_phonemes(ps):
                ids = self.phonemes_to_ids(chunk)
                if not ids:
                    continue
                ref_s = self.get_voice(voice, len(ids))
                audio, _ = self(chunk, ref_s, speed=speed)
                now = _time.time()
                seg_time = now - start
                start = now
                dur = len(audio) / self.config.sample_rate
                yield GenerationResult(
                    audio=audio, samples=len(audio),
                    sample_rate=self.config.sample_rate,
                    segment_idx=segment_idx, token_count=len(ids),
                    audio_duration=format_duration(dur),
                    real_time_factor=round(seg_time / dur, 2) if dur else 0,
                    prompt={"tokens": len(ids), "tokens-per-sec":
                            round(len(ids) / seg_time, 2) if seg_time else 0},
                    audio_samples={"samples": len(audio), "samples-per-sec":
                                   round(len(audio) / seg_time, 2)
                                   if seg_time else 0},
                    processing_time_seconds=seg_time,
                    peak_memory_usage=peak_memory_gb(),
                )
