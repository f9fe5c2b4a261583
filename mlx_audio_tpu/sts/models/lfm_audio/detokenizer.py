"""LFM2.5-Audio neural detokenizer: mimi codes -> waveform via ISTFT.

Parity: /root/reference/mlx_audio/sts/models/lfm_audio/detokenizer.py —
FusedEmbedding (:63, mean over 8 offset codebooks), 6x nearest upsample,
an 8-layer LFM2-style backbone alternating gated short-conv and
30-frame sliding-window attention (:109-263), final RMS `embedding_norm`,
then a linear head to 641 log-magnitude + 641 phase bins and a
COLA-normalized ISTFT (:468-507).

TPU design: the whole codes -> waveform path (embed, upsample, backbone,
spectrogram head, irfft overlap-add) is ONE jitted program per bucketed
frame count; the reference runs each stage eagerly and loops batch items
in Python.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention
from ....ops.rope import apply_rope, rope_freqs
from .lfm2 import apply_swiglu, init_swiglu

Array = jax.Array

_DEFAULT_LAYER_TYPES = ("conv", "conv", "sliding_attention", "conv",
                        "sliding_attention", "conv", "sliding_attention",
                        "conv")


@dataclass
class DetokenizerConfig(BaseModelArgs):
    hidden_size: int = 512
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    layer_types: Tuple[str, ...] = _DEFAULT_LAYER_TYPES
    sliding_window: int = 30
    intermediate_size: int = 2304
    norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    output_size: int = 1282
    num_codebooks: int = 8
    vocab_size: int = 2048
    n_fft: int = 1280
    hop_length: int = 320
    upsample_factor: int = 6
    conv_kernel: int = 3

    def __post_init__(self):
        if isinstance(self.layer_types, list):
            self.layer_types = tuple(self.layer_types)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _init_block(ks, c: DetokenizerConfig, kind: str) -> dict:
    d = c.hidden_size
    p = {"operator_norm": init_rms_norm(d),
         "ffn_norm": init_rms_norm(d),
         "feed_forward": init_swiglu(ks, d, c.intermediate_size)}
    if kind == "conv":
        p["conv"] = {
            "in_proj": init_linear(next(ks), d, 3 * d, bias=False),
            "weight": jax.random.normal(next(ks), (c.conv_kernel, d))
            / c.conv_kernel,
            "out_proj": init_linear(next(ks), d, d, bias=False)}
    else:
        hd = c.head_dim
        p["self_attn"] = {
            "q_proj": init_linear(next(ks), d, d, bias=False),
            "k_proj": init_linear(next(ks), d,
                                  c.num_key_value_heads * hd, bias=False),
            "v_proj": init_linear(next(ks), d,
                                  c.num_key_value_heads * hd, bias=False),
            "out_proj": init_linear(next(ks), d, d, bias=False),
            "q_layernorm": init_rms_norm(hd),
            "k_layernorm": init_rms_norm(hd),
        }
    return p


def _conv_block(p, c: DetokenizerConfig, x: Array) -> Array:
    """Gated causal short conv (reference ConvLayer :109-155)."""
    bcx = apply_linear(p["in_proj"], x)
    b_gate, c_gate, xp = jnp.split(bcx, 3, axis=-1)
    bx = b_gate * xp
    k = p["weight"].shape[0]
    t = bx.shape[1]
    pad = jnp.pad(bx, ((0, 0), (k - 1, 0), (0, 0)))
    out = sum(pad[:, j: j + t] * p["weight"][j] for j in range(k))
    return apply_linear(p["out_proj"], c_gate * out)


def _sliding_attention(p, c: DetokenizerConfig, x: Array,
                       mask: Array) -> Array:
    b, t, d = x.shape
    h, kvh, hd = (c.num_attention_heads, c.num_key_value_heads, c.head_dim)
    q = apply_linear(p["q_proj"], x).reshape(b, t, h, hd)
    k = apply_linear(p["k_proj"], x).reshape(b, t, kvh, hd)
    v = apply_linear(p["v_proj"], x).reshape(b, t, kvh, hd)
    q = apply_rms_norm(p["q_layernorm"], q, eps=c.norm_eps)
    k = apply_rms_norm(p["k_layernorm"], k, eps=c.norm_eps)
    inv = rope_freqs(hd, c.rope_theta)
    pos = jnp.arange(t)[None, :]
    q = apply_rope(q, pos, inv)
    k = apply_rope(k, pos, inv)
    out = attention(q, k, v, mask=mask)
    return apply_linear(p["out_proj"], out.reshape(b, t, d))


def detokenizer_backbone(params: dict, c: DetokenizerConfig,
                         x: Array) -> Array:
    t = x.shape[1]
    d_idx = jnp.arange(t)[:, None] - jnp.arange(t)[None, :]
    valid = (d_idx >= 0) & (d_idx < c.sliding_window)
    mask = jnp.where(valid, 0.0, -jnp.inf)[None, None]
    for i, kind in enumerate(c.layer_types):
        p = params["layers"][str(i)]
        h = apply_rms_norm(p["operator_norm"], x, eps=c.norm_eps)
        if kind == "conv":
            h = _conv_block(p["conv"], c, h)
        else:
            h = _sliding_attention(p["self_attn"], c, h, mask)
        x = x + h
        x = x + apply_swiglu(p["feed_forward"],
                             apply_rms_norm(p["ffn_norm"], x,
                                            eps=c.norm_eps))
    return apply_rms_norm(params["embedding_norm"], x, eps=c.norm_eps)


def detokenize_frames(params: dict, c: DetokenizerConfig, codes: Array,
                      window: Array) -> Array:
    """codes (B, K, T) int32 -> waveform (B, T * up * hop)."""
    b, kk, t = codes.shape
    offsets = jnp.arange(kk)[None, :, None] * c.vocab_size
    emb = params["emb"]["weight"][(codes + offsets).reshape(b, -1)]
    x = emb.reshape(b, kk, t, c.hidden_size).mean(axis=1)  # (B, T, D)

    up = c.upsample_factor
    x = jnp.repeat(x, up, axis=1)  # nearest-neighbor 6x upsample

    x = detokenizer_backbone(params, c, x)
    spec = apply_linear(params["lin"], x)  # (B, T', 1282)
    n_bins = c.n_fft // 2 + 1
    log_mag = jnp.clip(spec[..., :n_bins], -30.0, 20.0)
    phase = spec[..., n_bins:]
    mag = jnp.exp(log_mag)
    # COLA-normalized ISTFT, "same" padding trim (reference :482-507)
    from ....dsp import irfft_pair

    frames_time = irfft_pair(mag * jnp.cos(phase), mag * jnp.sin(phase),
                             n=c.n_fft)
    from ....dsp import overlap_add

    n_frames = frames_time.shape[1]
    rec = overlap_add(frames_time * window, c.hop_length, c.n_fft)
    env_np = np.zeros((n_frames - 1) * c.hop_length + c.n_fft, np.float64)
    w2 = np.asarray(window, np.float64) ** 2
    for i in range(n_frames):
        env_np[i * c.hop_length: i * c.hop_length + c.n_fft] += w2
    env = jnp.asarray(np.where(env_np > 1e-10, env_np, 1.0), jnp.float32)
    rec = rec / env
    pad = (c.n_fft - c.hop_length) // 2
    return rec[:, pad:-pad] if pad else rec


class LFM2AudioDetokenizer(FunctionalModel):
    """Codes -> 24 kHz waveform (reference LFM2AudioDetokenizer :366)."""

    def __init__(self, config: Optional[DetokenizerConfig] = None, **kwargs):
        if config is None:
            config = DetokenizerConfig.from_dict(kwargs) if kwargs else \
                DetokenizerConfig()
        elif isinstance(config, dict):
            config = DetokenizerConfig.from_dict(config)
        super().__init__(config)
        self._window = None

    @property
    def window(self) -> np.ndarray:
        if self._window is None:
            n = self.config.n_fft
            self._window = (0.5 - 0.5 * np.cos(
                2 * math.pi * np.arange(n) / n)).astype(np.float32)
        return np.asarray(self._window, np.float32)

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 8 * c.num_hidden_layers + 8))
        return {
            "emb": init_embedding(next(ks),
                                  c.num_codebooks * c.vocab_size,
                                  c.hidden_size),
            "layers": {str(i): _init_block(ks, c, c.layer_types[i])
                       for i in range(c.num_hidden_layers)},
            "embedding_norm": init_rms_norm(c.hidden_size),
            "lin": init_linear(next(ks), c.hidden_size, c.output_size),
        }

    def sanitize(self, weights: Dict[str, jnp.ndarray]) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k == "istft.window":
                self._window = np.asarray(v, np.float32)
                continue
            if k.startswith("lfm.embed_tokens"):
                continue  # unused table (reference detokenizer.py:333-335)
            k = k.replace("emb.emb.", "emb.")
            k = k.replace("lfm.layers.", "layers.")
            k = k.replace("lfm.embedding_norm.", "embedding_norm.")
            k = k.replace(".self_attn.o_proj.", ".self_attn.out_proj.")
            if k.endswith("conv.conv.weight") and v.ndim == 3:
                v = v[:, 0].T  # torch depthwise (D, 1, K) -> (K, D)
                k = k.replace("conv.conv.weight", "conv.weight")
            out[k] = v
        return out

    def __call__(self, codes) -> np.ndarray:
        """codes (B, K, T) or (K, T) -> waveform (B, samples)."""
        codes = jnp.asarray(codes, jnp.int32)
        if codes.ndim == 2:
            codes = codes[None]
        t = codes.shape[-1]
        fn = self._jit_cache.get(("detok", t))
        if fn is None:
            c = self.config
            win = jnp.asarray(self.window)
            fn = jax.jit(lambda p, cd: detokenize_frames(p, c, cd, win))
            self._jit_cache[("detok", t)] = fn
        return np.asarray(fn(self.params, codes))


__all__ = ["DetokenizerConfig", "LFM2AudioDetokenizer",
           "detokenize_frames", "detokenizer_backbone"]
