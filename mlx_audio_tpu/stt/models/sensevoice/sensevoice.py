"""SenseVoice-Small: non-autoregressive multilingual CTC ASR with rich
tags (language / emotion / audio-event).

Parity: reference mlx_audio/stt/models/sensevoice/sensevoice.py — Kaldi
fbank at int16 scale -> LFR(7,6) -> CMVN frontend (:17-104), SANM encoder
(fused q/k/v + depthwise FSMN memory added to the attention output,
:135-200; first layer projects 560->512 with no attention residual,
:203-236), sinusoidal positions starting at 1 (:107-123), tp_encoders tail,
4-frame query prefix [lang, event, emo, textnorm] (:396-432), greedy CTC
over frames 4+ with rich-tag extraction from frames 0..3 (:449-500), and
the ctc.ctc_lo / fsmn_block layout sanitize (:559-571).

TPU design: the whole (query prefix + features -> encoder -> CTC argmax)
pipeline is one jitted program per frame bucket with a validity mask
(attention bias + post-stage re-zeroing), so arbitrary-length audio reuses
a handful of compiled programs; the CTC collapse is a vectorized host pass.
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_embedding, apply_layer_norm,
                    apply_linear, init_conv1d, init_embedding,
                    init_layer_norm, init_linear)
from ..base import STTOutput

Array = jax.Array

FRAME_BUCKETS = (64, 128, 256, 512, 1024, 2048)

LID_DICT = {"auto": 0, "zh": 3, "en": 4, "yue": 7, "ja": 11, "ko": 12,
            "nospeech": 13}
TEXTNORM_DICT = {"withitn": 14, "woitn": 15}
LID_MAP = {24884: "zh", 24885: "en", 24888: "yue", 24892: "ja",
           24896: "ko", 24992: "nospeech"}
EMO_MAP = {25001: "happy", 25002: "sad", 25003: "angry", 25004: "neutral",
           25005: "fearful", 25006: "disgusted", 25007: "surprised",
           25008: "other", 25009: "unk"}
EVENT_MAP = {24993: "Speech", 24995: "BGM", 24997: "Laughter",
             24999: "Applause"}


@dataclass
class EncoderConfig(BaseModelArgs):
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50
    tp_blocks: int = 20
    kernel_size: int = 11
    sanm_shift: int = 0
    normalize_before: bool = True

    @classmethod
    def from_dict(cls, params: dict) -> "EncoderConfig":
        if "sanm_shfit" in params and "sanm_shift" not in params:
            params = dict(params, sanm_shift=params["sanm_shfit"])
        return super().from_dict(params)


@dataclass
class FrontendConfig(BaseModelArgs):
    fs: int = 16000
    window: str = "hamming"
    n_mels: int = 80
    frame_length: int = 25
    frame_shift: int = 10
    lfr_m: int = 7
    lfr_n: int = 6


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "sensevoice"
    vocab_size: int = 25055
    input_size: int = 560
    encoder_conf: Optional[EncoderConfig] = None
    frontend_conf: Optional[FrontendConfig] = None
    cmvn_means: Optional[List[float]] = None
    cmvn_istd: Optional[List[float]] = None
    model_path: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.encoder_conf, dict):
            self.encoder_conf = EncoderConfig.from_dict(self.encoder_conf)
        if self.encoder_conf is None:
            self.encoder_conf = EncoderConfig()
        if isinstance(self.frontend_conf, dict):
            self.frontend_conf = FrontendConfig.from_dict(
                self.frontend_conf)
        if self.frontend_conf is None:
            self.frontend_conf = FrontendConfig()


# ----------------------------------------------------------- frontend

def apply_lfr(feats: np.ndarray, lfr_m: int = 7, lfr_n: int = 6
              ) -> np.ndarray:
    """Stack lfr_m frames every lfr_n with edge replication on both sides
    (reference _apply_lfr)."""
    t, d = feats.shape
    t_out = math.ceil(t / lfr_n)
    left = (lfr_m - 1) // 2
    if left:
        feats = np.concatenate([np.tile(feats[:1], (left, 1)), feats], 0)
    need = (t_out - 1) * lfr_n + lfr_m
    if need > feats.shape[0]:
        feats = np.concatenate(
            [feats, np.tile(feats[-1:], (need - feats.shape[0], 1))], 0)
    idx = np.arange(t_out)[:, None] * lfr_n + np.arange(lfr_m)[None, :]
    return feats[idx].reshape(t_out, lfr_m * d).astype(np.float32)


def parse_am_mvn(path: Union[str, Path]
                 ) -> Tuple[np.ndarray, np.ndarray]:
    text = Path(path).read_text()
    shift = re.search(r"<AddShift>.*?<LearnRateCoef>\s+\d+\s+\[(.*?)\]",
                      text, re.DOTALL)
    scale = re.search(r"<Rescale>.*?<LearnRateCoef>\s+\d+\s+\[(.*?)\]",
                      text, re.DOTALL)
    if not shift or not scale:
        raise ValueError(f"cannot parse am.mvn: {path}")
    return (np.array([float(x) for x in shift.group(1).split()],
                     np.float32),
            np.array([float(x) for x in scale.group(1).split()],
                     np.float32))


# -------------------------------------------------------------- encoder

def _init_sanm_layer(ks, in_size: int, size: int, heads: int,
                     linear_units: int, kernel: int) -> dict:
    return {
        "self_attn": {
            "linear_q_k_v": init_linear(next(ks), in_size, 3 * size),
            "linear_out": init_linear(next(ks), size, size),
            "fsmn_block": init_conv1d(next(ks), size, size, kernel,
                                      bias=False, groups=size),
        },
        "feed_forward": {"w_1": init_linear(next(ks), size, linear_units),
                         "w_2": init_linear(next(ks), linear_units, size)},
        "norm1": init_layer_norm(in_size),
        "norm2": init_layer_norm(size),
    }


def init_sensevoice(key, cfg: ModelConfig) -> dict:
    enc = cfg.encoder_conf
    n = 1 + (enc.num_blocks - 1) + enc.tp_blocks
    ks = iter(jax.random.split(key, 8 + 5 * n))
    p = {"encoder": {
            "encoders0": {"0": _init_sanm_layer(
                ks, cfg.input_size, enc.output_size, enc.attention_heads,
                enc.linear_units, enc.kernel_size)},
            "encoders": {str(i): _init_sanm_layer(
                ks, enc.output_size, enc.output_size, enc.attention_heads,
                enc.linear_units, enc.kernel_size)
                for i in range(enc.num_blocks - 1)},
            "after_norm": init_layer_norm(enc.output_size),
            "tp_encoders": {str(i): _init_sanm_layer(
                ks, enc.output_size, enc.output_size, enc.attention_heads,
                enc.linear_units, enc.kernel_size)
                for i in range(enc.tp_blocks)},
            "tp_norm": init_layer_norm(enc.output_size),
         },
         "ctc_lo": init_linear(next(ks), enc.output_size, cfg.vocab_size),
         "embed": init_embedding(next(ks), 16, cfg.input_size)}
    return p


def _sinusoidal_positions(t: int, dim: int) -> Array:
    """Positions 1..T, half sin / half cos (reference
    SinusoidalPositionEncoder)."""
    pos = jnp.arange(1, t + 1, dtype=jnp.float32)
    half = dim // 2
    inv = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                  * (-math.log(10000.0) / (half - 1)))
    ang = pos[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _sanm_attention(p: dict, cfg: EncoderConfig, x: Array,
                    bias: Array, mask: Array) -> Array:
    b, t, _ = x.shape
    size = cfg.output_size
    heads = cfg.attention_heads
    hd = size // heads
    q, k, v = jnp.split(apply_linear(p["linear_q_k_v"], x), 3, axis=-1)

    # depthwise FSMN memory on v (zero-padded: invalid frames are zero)
    kernel = p["fsmn_block"]["weight"].shape[0]
    lp = (kernel - 1) // 2 + cfg.sanm_shift
    rp = kernel - 1 - lp
    vm = v * mask
    fsmn = apply_conv1d(p["fsmn_block"], vm, padding=(lp, rp),
                        groups=size) + vm
    fsmn = fsmn * mask

    q = q.reshape(b, t, heads, hd)
    k = k.reshape(b, t, heads, hd)
    vh = v.reshape(b, t, heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
    scores = scores + bias[:, None, None, :]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, t, size)
    return apply_linear(p["linear_out"], out) + fsmn


def _sanm_layer(p: dict, cfg: EncoderConfig, x: Array, in_size: int,
                bias: Array, mask: Array) -> Array:
    res = x
    h = apply_layer_norm(p["norm1"], x)
    attn = _sanm_attention(p["self_attn"], cfg, h, bias, mask)
    x = res + attn if in_size == cfg.output_size else attn
    res = x
    h = apply_layer_norm(p["norm2"], x)
    h = apply_linear(p["feed_forward"]["w_2"],
                     jax.nn.relu(apply_linear(p["feed_forward"]["w_1"],
                                              h)))
    return (res + h) * mask


def sensevoice_forward(params: dict, cfg: ModelConfig, speech: Array,
                       length: Array) -> Array:
    """speech (B, T, input_size) incl. query prefix -> CTC log-probs."""
    enc = cfg.encoder_conf
    b, t, _ = speech.shape
    valid = jnp.arange(t)[None, :] < length[:, None]
    mask = valid.astype(speech.dtype)[..., None]
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)

    x = speech * (enc.output_size ** 0.5)
    x = (x + _sinusoidal_positions(t, cfg.input_size)[None]) * mask
    ep = params["encoder"]
    x = _sanm_layer(ep["encoders0"]["0"], enc, x, cfg.input_size, bias,
                    mask)
    for i in range(enc.num_blocks - 1):
        x = _sanm_layer(ep["encoders"][str(i)], enc, x, enc.output_size,
                        bias, mask)
    x = apply_layer_norm(ep["after_norm"], x)
    for i in range(enc.tp_blocks):
        x = _sanm_layer(ep["tp_encoders"][str(i)], enc, x,
                        enc.output_size, bias, mask)
    x = apply_layer_norm(ep["tp_norm"], x) * mask
    logits = apply_linear(params["ctc_lo"], x)
    return jax.nn.log_softmax(logits, axis=-1)


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.blank_id = 0
        self._cmvn: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self._tokenizer = None
        self._token_list: Optional[List[str]] = None
        self._jit_cache: Dict = {}

    def init_params(self, key):
        return init_sensevoice(key, self.config)

    # frontend ---------------------------------------------------------

    def _extract_features(self, audio: np.ndarray) -> np.ndarray:
        from ....dsp import compute_fbank_kaldi
        fc = self.config.frontend_conf
        fbank = np.asarray(compute_fbank_kaldi(
            np.asarray(audio, np.float32) * 32768.0, sample_rate=fc.fs,
            win_len=fc.fs * fc.frame_length // 1000,
            win_inc=fc.fs * fc.frame_shift // 1000, num_mels=fc.n_mels,
            win_type=fc.window, dither=0.0))
        feats = apply_lfr(fbank, fc.lfr_m, fc.lfr_n)
        if self._cmvn is not None and len(self._cmvn[0]) == feats.shape[1]:
            feats = (feats + self._cmvn[0]) * self._cmvn[1]
        return feats

    def _build_speech(self, feats: np.ndarray, language: str,
                      use_itn: bool) -> np.ndarray:
        emb = np.asarray(self.params["embed"]["weight"])
        lid = LID_DICT.get(language, 0)
        textnorm = TEXTNORM_DICT["withitn" if use_itn else "woitn"]
        prefix = emb[[lid, 1, 2, textnorm]]
        return np.concatenate([prefix, feats], axis=0)

    def _fwd(self, bucket: int):
        fn = self._jit_cache.get(bucket)
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, s, n: sensevoice_forward(p, cfg, s, n))
            self._jit_cache[bucket] = fn
        return fn

    # decode -----------------------------------------------------------

    def _decode_tokens(self, ids: List[int]) -> str:
        if self._tokenizer is not None:
            return self._tokenizer.decode(ids)
        if self._token_list is not None:
            return "".join(self._token_list[t] for t in ids
                           if 0 <= t < len(self._token_list)) \
                .replace("▁", " ").strip()
        return " ".join(str(t) for t in ids)

    def generate(self, audio, *, language: str = "auto",
                 use_itn: bool = False, verbose: bool = False,
                 **kwargs) -> STTOutput:
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio
            audio = load_audio(str(audio), self.config.frontend_conf.fs)
        audio = np.asarray(audio, np.float32).reshape(-1)
        feats = self._extract_features(audio)
        speech = self._build_speech(feats, language, use_itn)

        n = speech.shape[0]
        bucket = next((b for b in FRAME_BUCKETS if n <= b),
                      ((n + 511) // 512) * 512)
        padded = np.zeros((1, bucket, speech.shape[1]), np.float32)
        padded[0, :n] = speech
        log_probs = np.asarray(self._fwd(bucket)(
            self.params, jnp.asarray(padded), jnp.asarray([n])))[0, :n]

        rich = {
            "language": LID_MAP.get(int(log_probs[0].argmax()), "unknown"),
            "emotion": EMO_MAP.get(int(log_probs[1].argmax()),
                                   f"token_{int(log_probs[1].argmax())}"),
            "event": EVENT_MAP.get(int(log_probs[2].argmax()),
                                   f"token_{int(log_probs[2].argmax())}"),
        }
        pred = log_probs[4:].argmax(-1)
        keep = np.ones(pred.shape, bool)
        keep[1:] = pred[1:] != pred[:-1]
        ids = pred[keep]
        ids = ids[ids != self.blank_id].tolist()
        text = self._decode_tokens(ids)
        if verbose:
            print(f"Language: {rich['language']}\n"
                  f"Emotion: {rich['emotion']}\nEvent: {rich['event']}\n"
                  f"Text: {text}")
        return STTOutput(
            text=text, language=rich["language"],
            segments=[{"text": text, **rich}])

    __call__ = generate

    # loading -----------------------------------------------------------

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            k = k.replace("ctc.ctc_lo.", "ctc_lo.")
            if "fsmn_block.weight" in k and v.ndim == 3 \
                    and v.shape[0] > v.shape[-1]:
                # torch depthwise (C, 1, K) -> WIO (K, 1, C); channels
                # always exceed the small kernel, so C-leading means torch
                v = jnp.transpose(jnp.asarray(v), (2, 1, 0))
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path: Path) -> "Model":
        model_path = Path(model_path)
        mvn = model_path / "am.mvn"
        if mvn.exists():
            model._cmvn = parse_am_mvn(mvn)
        elif model.config.cmvn_means is not None:
            model._cmvn = (np.asarray(model.config.cmvn_means, np.float32),
                           np.asarray(model.config.cmvn_istd, np.float32))
        bpe = model_path / "chn_jpn_yue_eng_ko_spectok.bpe.model"
        if bpe.exists():
            try:
                import sentencepiece as spm
                sp = spm.SentencePieceProcessor()
                sp.Load(str(bpe))
                model._tokenizer = sp
            except ImportError:
                pass
        tokens = model_path / "tokens.json"
        if model._tokenizer is None and tokens.exists():
            model._token_list = json.loads(tokens.read_text())
        return model


SenseVoiceSmall = Model

__all__ = ["Model", "SenseVoiceSmall", "ModelConfig", "EncoderConfig",
           "FrontendConfig", "sensevoice_forward", "apply_lfr",
           "parse_am_mvn"]
