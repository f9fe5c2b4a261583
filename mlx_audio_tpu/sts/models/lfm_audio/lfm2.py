"""LFM2 hybrid backbone (short-conv + GQA attention), functional.

Parity: the reference model uses `mlx_lm.models.lfm2.Lfm2Model`
(/root/reference/mlx_audio/sts/models/lfm_audio/model.py:16,233) — a
Liquid-AI LFM2 stack: most layers are gated causal short convolutions
(in_proj -> B*x -> depthwise conv -> C*conv -> out_proj), a few are full
GQA attention with per-head Q/K RMSNorm and llama-style RoPE; every layer
is followed by a SwiGLU block, with a final `embedding_norm` and a
weight-tied LM head.

TPU design: decode is two jitted programs (prefill per length bucket +
one-token step) over explicit caches — `KVCache` for attention layers and
a (B, K-1, D) rolling tap buffer for conv layers — so the interleaved
text/audio generation loop never retraces.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from ....base import BaseModelArgs
from ....nn import (
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs

Array = jax.Array


@dataclass
class LFM2Config(BaseModelArgs):
    model_type: str = "lfm2"
    vocab_size: int = 65536
    hidden_size: int = 2048
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    max_position_embeddings: int = 128000
    conv_bias: bool = False
    conv_L_cache: int = 3
    block_multiple_of: int = 256
    block_ff_dim: int = 12288
    block_auto_adjust_ff_dim: bool = True
    full_attn_idxs: Optional[List[int]] = None
    layer_types: Optional[List[str]] = None

    def __post_init__(self):
        if self.layer_types is None:
            attn = set(self.full_attn_idxs
                       if self.full_attn_idxs is not None
                       else [2, 5, 8, 10, 12, 14])
            self.layer_types = [
                "full_attention" if i in attn else "conv"
                for i in range(self.num_hidden_layers)]

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def ff_dim(self) -> int:
        ff = self.block_ff_dim
        if self.block_auto_adjust_ff_dim:
            ff = int(2 * ff / 3)
            m = self.block_multiple_of
            ff = m * math.ceil(ff / m)
        return ff


def init_swiglu(ks, dim: int, hidden: int) -> dict:
    return {"w1": init_linear(next(ks), dim, hidden, bias=False),
            "w2": init_linear(next(ks), hidden, dim, bias=False),
            "w3": init_linear(next(ks), dim, hidden, bias=False)}


def apply_swiglu(p: dict, x: Array) -> Array:
    return apply_linear(
        p["w2"], jax.nn.silu(apply_linear(p["w1"], x))
        * apply_linear(p["w3"], x))


def _init_layer(ks, c: LFM2Config, kind: str) -> dict:
    d = c.hidden_size
    p = {"operator_norm": init_rms_norm(d),
         "ffn_norm": init_rms_norm(d),
         "feed_forward": init_swiglu(ks, d, c.ff_dim)}
    if kind == "full_attention":
        hd = c.head_dim
        p["self_attn"] = {
            "q_proj": init_linear(next(ks), d,
                                  c.num_attention_heads * hd, bias=False),
            "k_proj": init_linear(next(ks), d,
                                  c.num_key_value_heads * hd, bias=False),
            "v_proj": init_linear(next(ks), d,
                                  c.num_key_value_heads * hd, bias=False),
            "out_proj": init_linear(next(ks), c.num_attention_heads * hd,
                                    d, bias=False),
            "q_layernorm": init_rms_norm(hd),
            "k_layernorm": init_rms_norm(hd),
        }
    else:
        k = c.conv_L_cache
        conv = {"in_proj": init_linear(next(ks), d, 3 * d,
                                       bias=c.conv_bias),
                "weight": jax.random.normal(next(ks), (k, d)) / k,
                "out_proj": init_linear(next(ks), d, d, bias=c.conv_bias)}
        if c.conv_bias:
            conv["bias"] = jnp.zeros((d,))
        p["conv"] = conv
    return p


def init_lfm2(key, c: LFM2Config) -> dict:
    ks = iter(jax.random.split(key, 8 * c.num_hidden_layers + 8))
    return {
        "embed_tokens": init_embedding(next(ks), c.vocab_size,
                                       c.hidden_size),
        "layers": {str(i): _init_layer(ks, c, c.layer_types[i])
                   for i in range(c.num_hidden_layers)},
        "embedding_norm": init_rms_norm(c.hidden_size),
    }


def make_lfm2_caches(c: LFM2Config, batch: int, max_len: int,
                     dtype=jnp.float32) -> List[Any]:
    caches: List[Any] = []
    for kind in c.layer_types:
        if kind == "full_attention":
            caches.append(KVCache.init(batch, max_len,
                                       c.num_key_value_heads,
                                       c.head_dim, dtype))
        else:
            caches.append(jnp.zeros(
                (batch, c.conv_L_cache - 1, c.hidden_size), dtype))
    return caches


def _attn_prefill(p, c: LFM2Config, x: Array, cache: KVCache,
                  length: Array):
    b, t, _ = x.shape
    h, kvh, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim
    q = apply_linear(p["q_proj"], x).reshape(b, t, h, hd)
    k = apply_linear(p["k_proj"], x).reshape(b, t, kvh, hd)
    v = apply_linear(p["v_proj"], x).reshape(b, t, kvh, hd)
    q = apply_rms_norm(p["q_layernorm"], q, eps=c.norm_eps)
    k = apply_rms_norm(p["k_layernorm"], k, eps=c.norm_eps)
    inv = rope_freqs(hd, c.rope_theta)
    pos = jnp.arange(t)[None, :]
    q = apply_rope(q, pos, inv)
    k = apply_rope(k, pos, inv)
    cache = kv_update(cache, k, v, jnp.int32(0))
    q_pos = jnp.arange(t)[:, None]
    k_pos = jnp.arange(t)[None, :]
    ok = (k_pos <= q_pos) & (k_pos < length)
    out = attention(q, k, v, mask=jnp.where(ok, 0.0, -jnp.inf)[None, None])
    return apply_linear(p["out_proj"], out.reshape(b, t, h * hd)), cache


def _attn_step(p, c: LFM2Config, x: Array, cache: KVCache, offset: Array):
    b = x.shape[0]
    h, kvh, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim
    q = apply_linear(p["q_proj"], x).reshape(b, 1, h, hd)
    k = apply_linear(p["k_proj"], x).reshape(b, 1, kvh, hd)
    v = apply_linear(p["v_proj"], x).reshape(b, 1, kvh, hd)
    q = apply_rms_norm(p["q_layernorm"], q, eps=c.norm_eps)
    k = apply_rms_norm(p["k_layernorm"], k, eps=c.norm_eps)
    inv = rope_freqs(hd, c.rope_theta)
    pos = jnp.broadcast_to(offset, (b, 1))
    q = apply_rope(q, pos, inv)
    k = apply_rope(k, pos, inv)
    cache = kv_update(cache, k, v, offset)
    cap = cache.k.shape[1]
    ok = jnp.arange(cap)[None, None, None, :] <= offset
    out = attention(q, cache.k, cache.v,
                    mask=jnp.where(ok, 0.0, -jnp.inf))
    return apply_linear(p["out_proj"], out.reshape(b, 1, h * hd)), cache


def _conv_gate(p, x: Array):
    bcx = apply_linear(p["in_proj"], x)
    b_gate, c_gate, xp = jnp.split(bcx, 3, axis=-1)
    return b_gate * xp, c_gate


def _conv_prefill(p, c: LFM2Config, x: Array, cache: Array, length: Array):
    """x (B, T, D); returns (out, new tap cache of last K-1 valid inputs)."""
    bx, c_gate = _conv_gate(p, x)
    k = c.conv_L_cache
    b, t, d = bx.shape
    pad = jnp.concatenate([jnp.zeros((b, k - 1, d), bx.dtype), bx], axis=1)
    out = sum(pad[:, j: j + t] * p["weight"][j] for j in range(k))
    if "bias" in p:
        out = out + p["bias"]
    new_cache = jax.lax.dynamic_slice(
        pad, (0, jnp.maximum(length, 0), 0), (b, k - 1, d)).astype(
            cache.dtype)
    return apply_linear(p["out_proj"], c_gate * out), new_cache


def _conv_step(p, c: LFM2Config, x: Array, cache: Array):
    bx, c_gate = _conv_gate(p, x)  # (B, 1, D)
    window = jnp.concatenate([cache.astype(bx.dtype), bx], axis=1)
    out = jnp.einsum("bkd,kd->bd", window, p["weight"])[:, None]
    if "bias" in p:
        out = out + p["bias"]
    return apply_linear(p["out_proj"], c_gate * out), window[:, 1:]


def lfm2_forward(params: dict, c: LFM2Config, emb: Array,
                 caches: List[Any], offset: Array,
                 length: Optional[Array] = None):
    """emb (B, T, D) -> (hidden (B, T, D), new caches).

    T > 1 is a prefill at position 0 (padded to T; `length` masks the
    tail); T == 1 is a decode step at `offset`.
    """
    x = emb
    is_step = emb.shape[1] == 1
    new_caches: List[Any] = []
    for i, kind in enumerate(c.layer_types):
        p = params["layers"][str(i)]
        h = apply_rms_norm(p["operator_norm"], x, eps=c.norm_eps)
        if kind == "full_attention":
            if is_step:
                h, nc = _attn_step(p["self_attn"], c, h, caches[i], offset)
            else:
                h, nc = _attn_prefill(
                    p["self_attn"], c, h, caches[i],
                    length if length is not None else emb.shape[1])
        else:
            if is_step:
                h, nc = _conv_step(p["conv"], c, h, caches[i])
            else:
                h, nc = _conv_prefill(
                    p["conv"], c, h, caches[i],
                    length if length is not None else emb.shape[1])
        x = x + h
        x = x + apply_swiglu(p["feed_forward"],
                             apply_rms_norm(p["ffn_norm"], x,
                                            eps=c.norm_eps))
        new_caches.append(nc)
    x = apply_rms_norm(params["embedding_norm"], x, eps=c.norm_eps)
    return x, new_caches


def lfm2_embed(params: dict, tokens: Array) -> Array:
    return apply_embedding(params["embed_tokens"], tokens)


def lfm2_logits(params: dict, hidden: Array) -> Array:
    """Weight-tied LM head."""
    return hidden @ params["embed_tokens"]["weight"].T


__all__ = ["LFM2Config", "init_lfm2", "make_lfm2_caches", "lfm2_forward",
           "lfm2_embed", "lfm2_logits", "init_swiglu", "apply_swiglu"]
