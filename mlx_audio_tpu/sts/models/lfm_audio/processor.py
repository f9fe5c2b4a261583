"""LFM2.5-Audio processor: mel front-end, tokenizers, chat state.

Parity: /root/reference/mlx_audio/sts/models/lfm_audio/processor.py —
AudioPreprocessor (:33, NeMo-style slaney mel with pre-emphasis, log
guard 2^-24 and per-feature Bessel normalization), LFM2AudioProcessor
(:144, lazy text tokenizer / 32-codebook Mimi / detokenizer), ChatState
(:403, parallel text/audio/modality streams with <|im_start|> turns).

TPU design: the mel front-end is one fused jitted program (matmul DFT +
mel + normalize); Mimi and the detokenizer are the repo's own TPU
implementations.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from .... import dsp
from .detokenizer import LFM2AudioDetokenizer


class LFMModality(IntEnum):
    """Modality flags (values match the PyTorch implementation)."""

    TEXT = 1
    AUDIO_IN = 2
    AUDIO_OUT = 3


@dataclass
class PreprocessorConfig(BaseModelArgs):
    sample_rate: int = 16000
    normalize: str = "per_feature"
    window_size: float = 0.025
    window_stride: float = 0.01
    window: str = "hann"
    features: int = 128
    n_fft: int = 512
    log: bool = True
    frame_splicing: int = 1
    dither: float = 1e-05
    pad_to: int = 0
    pad_value: float = 0.0
    preemph: float = 0.97

    @property
    def hop_length(self) -> int:
        return int(self.sample_rate * self.window_stride)

    @property
    def win_length(self) -> int:
        return int(self.sample_rate * self.window_size)


def preprocess_features(c: PreprocessorConfig, audio: jnp.ndarray,
                        mel_fb: jnp.ndarray) -> jnp.ndarray:
    """(T,) waveform -> (frames, n_mels) normalized log-mel."""
    if c.preemph and c.preemph > 0:
        audio = jnp.concatenate(
            [audio[:1], audio[1:] - c.preemph * audio[:-1]])
    spec = dsp.stft(audio, n_fft=c.n_fft, hop_length=c.hop_length,
                    win_length=c.win_length, window=c.window,
                    center=True, pad_mode="constant")
    power = dsp.spec_abs(spec) ** 2
    mel = power @ mel_fb.T
    if c.log:
        mel = jnp.log(mel + 5.96e-8)  # 2^-24 guard (reference :112-113)
    if c.normalize == "per_feature":
        n = audio.shape[0] // c.hop_length
        n = min(max(n, 2), mel.shape[0])
        valid = mel[:n]
        mean = jnp.mean(valid, axis=0, keepdims=True)
        var = jnp.sum((valid - mean) ** 2, axis=0, keepdims=True) / (n - 1)
        mel = (mel - mean) / (jnp.sqrt(var) + 1e-5)
    return mel


class AudioPreprocessor:
    """Waveform -> mel features (reference AudioPreprocessor :33)."""

    def __init__(self, config: PreprocessorConfig):
        if isinstance(config, dict):
            config = PreprocessorConfig.from_dict(config)
        self.config = config
        self._mel_fb = dsp.mel_filters(
            sample_rate=config.sample_rate, n_fft=config.n_fft,
            n_mels=config.features, f_min=0.0,
            f_max=config.sample_rate // 2, norm="slaney",
            mel_scale="slaney")
        self._jit = jax.jit(
            lambda a: preprocess_features(self.config, a, self._mel_fb))

    def __call__(self, audio) -> jnp.ndarray:
        audio = jnp.asarray(audio, jnp.float32)
        single = audio.ndim == 1
        if single:
            audio = audio[None]
        feats = jnp.stack([self._jit(audio[i])
                           for i in range(audio.shape[0])])
        return feats[0] if single else feats


class LFM2AudioProcessor:
    """Text + audio front/back-ends (reference LFM2AudioProcessor :144)."""

    def __init__(self, config: Any, tokenizer: Optional[Any] = None,
                 mimi: Optional[Any] = None,
                 detokenizer: Optional[LFM2AudioDetokenizer] = None):
        self.config = config
        pre = getattr(config, "preprocessor", None) or PreprocessorConfig()
        if isinstance(pre, dict):
            pre = PreprocessorConfig.from_dict(pre)
        self.audio_preprocessor = AudioPreprocessor(pre)
        self._tokenizer = tokenizer
        self._mimi = mimi
        self._detokenizer = detokenizer
        self.model_path: Optional[Path] = None

    # ------------------------------------------------------ lazy members

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from transformers import AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(
                str(self.model_path), trust_remote_code=True)
        return self._tokenizer

    @property
    def mimi(self):
        """32-codebook Kyutai Mimi; LFM2.5 uses the first 8
        (reference :197-210)."""
        if self._mimi is None:
            from ....codec.models.mimi.mimi import Mimi, mimi_202407
            from ....utils import unflatten

            cfg = mimi_202407(num_codebooks=32)
            self._mimi = Mimi(cfg)
            files = sorted(Path(self.model_path).glob(
                "tokenizer-*.safetensors"))
            if files:
                from safetensors import safe_open

                weights = {}
                with safe_open(str(files[0]), framework="numpy") as f:
                    for k in f.keys():
                        weights[k] = f.get_tensor(k)
                self._mimi.bind(unflatten(self._mimi.sanitize(weights)))
            else:
                self._mimi.init_and_bind()
        return self._mimi

    @property
    def detokenizer(self) -> LFM2AudioDetokenizer:
        if self._detokenizer is None:
            import json

            from ....utils import unflatten

            base = Path(self.model_path) / "audio_detokenizer"
            cfg_f = base / "config.json"
            cfg = json.loads(cfg_f.read_text()) if cfg_f.exists() else {}
            from .detokenizer import DetokenizerConfig

            detok = LFM2AudioDetokenizer(DetokenizerConfig.from_dict(cfg))
            wf = base / "model.safetensors"
            if wf.exists():
                from safetensors import safe_open

                weights = {}
                with safe_open(str(wf), framework="numpy") as f:
                    for k in f.keys():
                        weights[k] = f.get_tensor(k)
                detok.bind(unflatten(detok.sanitize(weights)))
            else:
                detok.init_and_bind()
            self._detokenizer = detok
        return self._detokenizer

    @classmethod
    def from_pretrained(cls, model_name_or_path: str,
                        config: Optional[Any] = None
                        ) -> "LFM2AudioProcessor":
        import json

        from ....utils import get_model_path

        model_path = Path(model_name_or_path) \
            if Path(model_name_or_path).exists() \
            else get_model_path(model_name_or_path)
        if config is None:
            from .lfm_audio import LFM2AudioConfig

            cfg = json.loads((model_path / "config.json").read_text())
            config = LFM2AudioConfig.from_dict(cfg)
        proc = cls(config)
        proc.model_path = model_path
        return proc

    # ------------------------------------------------------------ audio

    def preprocess_audio(self, audio, sample_rate: int = 16000):
        target = self.audio_preprocessor.config.sample_rate
        if sample_rate != target:
            audio = self._resample(audio, sample_rate, target)
        return self.audio_preprocessor(audio)

    def tokenize_audio(self, audio, sample_rate: int = 24000):
        audio = np.asarray(audio, np.float32)
        mimi_sr = int(self.mimi.sample_rate)
        if sample_rate != mimi_sr:
            audio = np.asarray(
                self._resample(audio, sample_rate, mimi_sr))
        if audio.ndim == 1:
            audio = audio[None]
        return self.mimi.encode(audio)

    def decode_audio(self, codes, codec: str = "detokenizer"):
        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        if codec == "detokenizer":
            return self.decode_with_detokenizer(codes)
        if codec == "mimi":
            return np.asarray(self.mimi.decode(codes))
        raise ValueError(f"Invalid codec: {codec}")

    def decode_with_detokenizer(self, codes) -> np.ndarray:
        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        vocab = self.detokenizer.config.vocab_size
        codes = np.clip(codes, 0, vocab - 1)
        return self.detokenizer(codes)

    # ------------------------------------------------------------- text

    def tokenize_text(self, text: str):
        return np.asarray(
            self.tokenizer.encode(text, add_special_tokens=True))

    def decode_text(self, tokens) -> str:
        if hasattr(tokens, "tolist"):
            tokens = np.asarray(tokens).reshape(-1).tolist()
        return self.tokenizer.decode(tokens)

    def format_chat(self, messages: List[Dict[str, str]],
                    add_generation_prompt: bool = True) -> str:
        return self.tokenizer.apply_chat_template(
            messages, tokenize=False,
            add_generation_prompt=add_generation_prompt)

    @staticmethod
    def _resample(audio, orig_sr: int, target_sr: int):
        if orig_sr == target_sr:
            return audio
        from ....utils import resample_audio

        return resample_audio(np.asarray(audio), orig_sr, target_sr)


def _subsampled_frames(mel_frames: int, stages: int = 3) -> int:
    """Encoder frames after the dw_striding stack (reference :481-488)."""
    t = mel_frames
    for _ in range(stages):
        t = (t + 2 * 1 - 3) // 2 + 1
    return t


class ChatState:
    """Multi-turn prompt builder (reference ChatState :403-533)."""

    def __init__(self, processor: LFM2AudioProcessor, add_bos: bool = True):
        self.processor = processor
        self.text_tokens: List[int] = []
        self.audio_features = None
        self.audio_out_codes: List[np.ndarray] = []
        self.modalities: List[LFMModality] = []
        self.current_turn: Optional[str] = None
        if add_bos:
            bos = getattr(processor.tokenizer, "bos_token_id", 1)
            if bos is not None:
                self.text_tokens.append(int(bos))
                self.modalities.append(LFMModality.TEXT)

    def _add_tokens(self, tokens: List[int]):
        self.text_tokens.extend(int(t) for t in tokens)
        self.modalities.extend([LFMModality.TEXT] * len(tokens))

    def new_turn(self, role: str):
        self.current_turn = role
        self._add_tokens(self.processor.tokenizer.encode(
            f"<|im_start|>{role}\n", add_special_tokens=False))

    def end_turn(self):
        self._add_tokens(self.processor.tokenizer.encode(
            "<|im_end|>\n", add_special_tokens=False))
        self.current_turn = None

    def add_text(self, text: str):
        self._add_tokens(self.processor.tokenizer.encode(
            text, add_special_tokens=False))

    def add_audio(self, audio, sample_rate: int = 16000):
        feats = self.processor.preprocess_audio(audio, sample_rate)
        feats = np.asarray(feats)
        if feats.ndim == 3:
            feats = feats[0]
        if self.audio_features is None:
            self.audio_features = feats
        else:
            self.audio_features = np.concatenate(
                [self.audio_features, feats], axis=0)
        n = _subsampled_frames(feats.shape[0])
        self.modalities.extend([LFMModality.AUDIO_IN] * n)

    def append(self, token, modality: LFMModality):
        if modality == LFMModality.TEXT:
            self.text_tokens.append(int(np.asarray(token).reshape(())))
        elif modality == LFMModality.AUDIO_OUT:
            self.audio_out_codes.append(np.asarray(token))
        self.modalities.append(modality)

    def get_text_tokens(self):
        return np.asarray(self.text_tokens, np.int32)[None]

    def get_audio_features(self):
        if self.audio_features is None:
            return None
        f = np.asarray(self.audio_features)
        return f[None] if f.ndim == 2 else f

    def get_modalities(self):
        return np.asarray([int(m) for m in self.modalities], np.int32)[None]

    def items(self):
        return [("text_tokens", self.get_text_tokens()),
                ("audio_features", self.get_audio_features()),
                ("modalities", self.get_modalities())]

    def __iter__(self):
        return iter(self.items())

    def keys(self):
        return [k for k, _ in self.items()]

    def __getitem__(self, key):
        for k, v in self.items():
            if k == key:
                return v
        raise KeyError(key)


__all__ = ["LFMModality", "PreprocessorConfig", "AudioPreprocessor",
           "LFM2AudioProcessor", "ChatState", "preprocess_features"]
