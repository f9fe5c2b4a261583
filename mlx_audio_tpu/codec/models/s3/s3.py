"""S3 speech tokenizer (CosyVoice / chatterbox acoustic tokens).

Parity: reference codec/models/s3/ — whisper-style log-mel front-end
normalized to [-1, 1]-ish (utils.py:8-43), v1: conv stem + sinusoidal
positions + pre-LN attention blocks with (d/h)^-0.25 double scaling and
L2-normalized Euclidean VQ (model.py:29-260); v2: FSMN memory added to
the attention output, split-half RoPE on 64-dim heads, and FSQ
quantization (tanh -> x0.999 -> round -> base-3 digits, model_v2.py).
The v2 FSQ codebook has no official up-projection, so decode raises —
same as the reference (model_v2.py:98-100).

TPU design: the mel -> tokens pipeline is one jitted program per frame
bucket with validity masks at every stage (convs re-zeroed, attention
biased); audio longer than 30 s is tokenized in sequential 30 s windows
(the reference's mixed-batch splitter reshapes long rows into extra batch
rows — same arithmetic, expressed as a loop over fixed windows).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_layer_norm, apply_linear,
                    init_conv1d, init_layer_norm, init_linear)

Array = jax.Array

MAX_FRAMES = 3000                      # 30 s at hop 160
FRAME_BUCKETS = (256, 512, 1024, 2048, 3000)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "s3"
    name: str = "speech_tokenizer_v2_25hz"
    n_mels: int = 128
    n_audio_ctx: int = 1500
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 6
    n_codebook_size: int = 6561        # 3**8 for v2; 4096 for v1

    @property
    def is_v2(self) -> bool:
        return "v2" in self.name

    @property
    def stride(self) -> int:
        # v1_25hz and all v2 use stride 2 in conv1; v1_50hz uses 1
        return 2 if ("25hz" in self.name or self.is_v2) else 1


def log_mel_spectrogram(audio, n_mels: int = 128) -> jnp.ndarray:
    """Whisper-normalized log mel at 128 bins with SLANEY filters
    (reference utils.py:8-43; note: slaney, unlike whisper's htk)."""
    from ....dsp import log_mel_spectrogram as _lm
    mel = _lm(jnp.asarray(audio, jnp.float32), n_fft=400, hop_length=160,
              n_mels=n_mels, sample_rate=16000,
              log_base="log10_whisper", mel_scale="slaney",
              mel_norm="slaney")
    return mel[..., :-1, :]            # drop last partial frame


def _sinusoids(length: int, channels: int) -> np.ndarray:
    inc = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1) \
        .astype(np.float32)


def _rope_tables(dim: int, end: int) -> Tuple[np.ndarray, np.ndarray]:
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32)
                               / dim))
    ang = np.outer(np.arange(end, dtype=np.float32), freqs)
    cos = np.concatenate([np.cos(ang), np.cos(ang)], axis=-1)
    sin = np.concatenate([np.sin(ang), np.sin(ang)], axis=-1)
    return cos.astype(np.float32), sin.astype(np.float32)


def _apply_rope_halved(x: Array, cos: Array, sin: Array) -> Array:
    """x (B, T, H, D); split-half rotation with duplicated tables."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, :, None, :] + rot * sin[None, :, None, :]


# ------------------------------------------------------------------ init

def init_s3(key, cfg: ModelConfig) -> dict:
    d = cfg.n_audio_state
    ks = iter(jax.random.split(key, 8 + 8 * cfg.n_audio_layer))
    p = {"encoder": {
            "conv1": init_conv1d(next(ks), cfg.n_mels, d, 3),
            "conv2": init_conv1d(next(ks), d, d, 3),
            "blocks": {}}}
    for i in range(cfg.n_audio_layer):
        blk = {
            "attn": {"query": init_linear(next(ks), d, d),
                     "key": init_linear(next(ks), d, d, bias=False),
                     "value": init_linear(next(ks), d, d),
                     "out": init_linear(next(ks), d, d)},
            "attn_ln": init_layer_norm(d),
            "mlp": {"0": init_linear(next(ks), d, 4 * d),
                    "2": init_linear(next(ks), 4 * d, d)},
            "mlp_ln": init_layer_norm(d),
        }
        if cfg.is_v2:
            blk["attn"]["fsmn_block"] = init_conv1d(next(ks), d, d, 31,
                                                    bias=False, groups=d)
        p["encoder"]["blocks"][str(i)] = blk
    if cfg.is_v2:
        p["quantizer"] = {"fsq_codebook": {
            "project_down": init_linear(next(ks), d, 8)}}
    else:
        p["quantizer"] = {"_codebook": {
            "embed": jax.random.normal(next(ks),
                                       (cfg.n_codebook_size, d)) * 0.02}}
    return p


# --------------------------------------------------------------- forward

def _attention(p: dict, cfg: ModelConfig, x: Array, bias: Array,
               mask1: Array, rope) -> Array:
    b, t, d = x.shape
    h = cfg.n_audio_head
    hd = d // h
    scale = hd ** -0.25
    q = apply_linear(p["query"], x).reshape(b, t, h, hd)
    k = apply_linear(p["key"], x).reshape(b, t, h, hd)
    v = apply_linear(p["value"], x).reshape(b, t, h, hd)
    if rope is not None:
        cos, sin = rope
        q = _apply_rope_halved(q, cos[:t], sin[:t])
        k = _apply_rope_halved(k, cos[:t], sin[:t])
    fsmn = None
    if "fsmn_block" in p:
        vm = v.reshape(b, t, d) * mask1
        fsmn = apply_conv1d(p["fsmn_block"], vm, padding=(15, 15),
                            groups=d) + vm
        fsmn = fsmn * mask1
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
    scores = scores + bias
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
    out = apply_linear(p["out"], out)
    return out + fsmn if fsmn is not None else out


def s3_encode(params: dict, cfg: ModelConfig, mel: Array,
              mel_len: Array) -> Tuple[Array, Array]:
    """mel (B, T, n_mels) -> (tokens (B, T'), lengths)."""
    enc = params["encoder"]
    n = jnp.asarray(mel_len)
    mask = (jnp.arange(mel.shape[1])[None, :] < n[:, None]) \
        .astype(mel.dtype)[..., None]
    x = jax.nn.gelu(apply_conv1d(enc["conv1"], mel * mask,
                                 stride=cfg.stride, padding=1),
                    approximate=False)
    n = (n + 2 - 2 - 1) // cfg.stride + 1
    mask = (jnp.arange(x.shape[1])[None, :] < n[:, None]) \
        .astype(x.dtype)[..., None]
    x = jax.nn.gelu(apply_conv1d(enc["conv2"], x * mask, stride=2,
                                 padding=1), approximate=False)
    n = (n + 2 - 2 - 1) // 2 + 1
    t = x.shape[1]
    valid = jnp.arange(t)[None, :] < n[:, None]
    mask1 = valid.astype(x.dtype)[..., None]
    bias = jnp.where(valid, 0.0, -1e10)[:, None, None, :]

    rope = None
    if cfg.is_v2:
        # head_dim (64 on real checkpoints; reference hardcodes 64)
        cos, sin = _rope_tables(cfg.n_audio_state // cfg.n_audio_head,
                                2048)
        rope = (jnp.asarray(cos), jnp.asarray(sin))
    else:
        x = x + jnp.asarray(_sinusoids(cfg.n_audio_ctx,
                                       cfg.n_audio_state))[:t][None]
    for i in range(cfg.n_audio_layer):
        blk = params["encoder"]["blocks"][str(i)]
        x = x + _attention(blk["attn"], cfg,
                           apply_layer_norm(blk["attn_ln"], x,
                                            eps=1e-6 if cfg.is_v2
                                            else 1e-5),
                           bias, mask1, rope)
        h = apply_layer_norm(blk["mlp_ln"], x)
        h = apply_linear(blk["mlp"]["2"],
                         jax.nn.gelu(apply_linear(blk["mlp"]["0"], h),
                                     approximate=False))
        x = (x + h) * mask1

    q = params["quantizer"]
    if cfg.is_v2:
        hproj = apply_linear(q["fsq_codebook"]["project_down"], x)
        hproj = jnp.tanh(hproj.astype(jnp.float32)) * 0.9990000128746033
        digits = jnp.round(hproj) + 1
        powers = 3.0 ** jnp.arange(8, dtype=jnp.float32)
        codes = jnp.sum(digits * powers, axis=-1).astype(jnp.int32)
    else:
        xn = x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-8)
        embed = q["_codebook"]["embed"]
        dist = (-jnp.sum(xn * xn, axis=-1, keepdims=True)
                + 2 * xn @ embed.T
                - jnp.sum(embed * embed, axis=-1)[None, None, :])
        codes = jnp.argmax(dist, axis=-1).astype(jnp.int32)
    return codes * valid, n


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        if config.is_v2:
            config.n_codebook_size = 3 ** 8
        super().__init__(config)
        self._jit_cache: Dict = {}

    def init_params(self, key):
        return init_s3(key, self.config)

    def _fwd(self, bucket: int):
        fn = self._jit_cache.get(bucket)
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, m, n: s3_encode(p, cfg, m, n))
            self._jit_cache[bucket] = fn
        return fn

    def quantize(self, mel: np.ndarray, mel_len: int
                 ) -> Tuple[np.ndarray, int]:
        """mel (T, n_mels) -> (tokens, n_tokens); >30 s tokenized in
        sequential 30 s windows."""
        mel = np.asarray(mel, np.float32)
        if mel_len <= MAX_FRAMES:
            t = mel.shape[0]
            tb = next((b for b in FRAME_BUCKETS if t <= b), MAX_FRAMES)
            pad = np.zeros((1, tb, mel.shape[1]), np.float32)
            pad[0, :t] = mel[:tb]
            codes, n = self._fwd(tb)(self.params, jnp.asarray(pad),
                                     jnp.asarray([min(mel_len, tb)]))
            n = int(n[0])
            return np.asarray(codes)[0, :n], n
        outs = []
        for start in range(0, mel_len, MAX_FRAMES):
            chunk = mel[start: start + MAX_FRAMES]
            c, n = self.quantize(chunk, chunk.shape[0])
            outs.append(c)
        codes = np.concatenate(outs)
        return codes, len(codes)

    def encode(self, audio) -> np.ndarray:
        """waveform (T,) 16 kHz -> (1, T') tokens."""
        mel = np.asarray(log_mel_spectrogram(audio, self.config.n_mels))
        codes, n = self.quantize(mel, mel.shape[0])
        return codes[None]

    __call__ = encode

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k.endswith("conv1.weight") or k.endswith("conv2.weight") \
                    or k.endswith("fsmn_block.weight"):
                if v.ndim == 3 and v.shape[0] > v.shape[-1]:
                    v = jnp.transpose(v, (2, 1, 0))   # torch -> WIO
            k = k.replace(".mlp.layers.0.", ".mlp.0.")
            k = k.replace(".mlp.layers.2.", ".mlp.2.")
            out[k] = v
        return out


S3Tokenizer = Model
S3TokenizerV2 = Model

__all__ = ["Model", "ModelConfig", "S3Tokenizer", "S3TokenizerV2",
           "s3_encode", "log_mel_spectrogram"]
