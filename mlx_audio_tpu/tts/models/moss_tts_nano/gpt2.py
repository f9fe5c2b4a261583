"""Functional GPT2 stack shared by MOSS-TTS-Nano and MOSS-TTS local heads.

Parity: /root/reference/mlx_audio/tts/models/moss_tts_nano/gpt2.py
(GPT2Model with fused c_attn, gelu_new MLP, rope-or-absolute positions).

TPU design: pure init/apply functions over a params pytree; the KV cache is
the shared fixed-capacity `ops.kvcache.KVCache` so decode steps compile into
one XLA program (no per-token reallocation). RoPE here uses the *interleaved*
(rotate-half over even/odd pairs) convention of the upstream GPT2 port, which
differs from the split-half convention in `ops/rope.py`, so it is implemented
locally.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ....base import BaseModelArgs
from ....nn import (
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update

Array = jax.Array


@dataclass
class GPT2Config(BaseModelArgs):
    model_type: str = "gpt2"
    vocab_size: int = 16384
    n_positions: int = 32768
    n_ctx: int = 32768
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_inner: int = 3072
    activation_function: str = "gelu_new"
    layer_norm_epsilon: float = 1e-5
    initializer_range: float = 0.02
    scale_attn_weights: bool = True
    scale_attn_by_inverse_layer_idx: bool = False
    position_embedding_type: str = "rope"
    rope_base: float = 10000.0
    pad_token_id: int = 3
    bos_token_id: int = 1
    eos_token_id: int = 2
    tie_word_embeddings: bool = True

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @classmethod
    def from_dict(cls, params):
        params = dict(params or {})
        for hf, gpt in (("hidden_size", "n_embd"),
                        ("num_hidden_layers", "n_layer"),
                        ("num_attention_heads", "n_head"),
                        ("intermediate_size", "n_inner")):
            if hf in params and gpt not in params:
                params[gpt] = params[hf]
        return super().from_dict(params)


def gelu_new(x: Array) -> Array:
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def _interleaved_rope(x: Array, positions: Array, dim: int,
                      base: float) -> Array:
    """RoPE with even/odd interleaving (x: (B, T, H, D))."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (B?, T, D/2)
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)
    if cos.ndim == 2:                      # (T, D) -> broadcast over batch
        cos, sin = cos[None], sin[None]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    even, odd = x[..., ::2], x[..., 1::2]
    rot = jnp.stack([-odd, even], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


def init_gpt2(key, cfg: GPT2Config, *, use_token_embedding: bool = True
              ) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.n_layer + 8))
    p: dict = {"h": {}}
    if use_token_embedding:
        p["wte"] = init_embedding(next(ks), cfg.vocab_size, cfg.n_embd)
    if cfg.position_embedding_type.lower() == "absolute":
        p["wpe"] = init_embedding(next(ks), cfg.n_positions, cfg.n_embd)
    for i in range(cfg.n_layer):
        p["h"][str(i)] = {
            "ln_1": init_layer_norm(cfg.n_embd),
            "attn": {
                "c_attn": init_linear(next(ks), cfg.n_embd, 3 * cfg.n_embd,
                                      bias=True),
                "c_proj": init_linear(next(ks), cfg.n_embd, cfg.n_embd,
                                      bias=True),
            },
            "ln_2": init_layer_norm(cfg.n_embd),
            "mlp": {
                "fc_in": init_linear(next(ks), cfg.n_embd,
                                     cfg.n_inner or 4 * cfg.n_embd, bias=True),
                "fc_out": init_linear(next(ks), cfg.n_inner or 4 * cfg.n_embd,
                                      cfg.n_embd, bias=True),
            },
        }
    p["ln_f"] = init_layer_norm(cfg.n_embd)
    return p


def _act(cfg: GPT2Config, x: Array) -> Array:
    if cfg.activation_function == "gelu_new":
        return gelu_new(x)
    if cfg.activation_function == "silu":
        return jax.nn.silu(x)
    return jax.nn.gelu(x)


def gpt2_forward(
    params: dict,
    cfg: GPT2Config,
    embeds: Array,
    *,
    caches: Optional[List[KVCache]] = None,
    offset=0,
    pad_mask: Optional[Array] = None,
    length_mask: Optional[Array] = None,
) -> Tuple[Array, Optional[List[KVCache]]]:
    """embeds (B, T, D) -> hidden (B, T, D) after final LayerNorm.

    caches: fixed-capacity per-layer KVCaches (decode); None = full causal.
    pad_mask: additive (B/1, 1, T?, S) mask merged into attention.
    length_mask: bool (B/1, 1, 1, S) or (S,) valid-key mask (no-cache path).
    """
    b, t, _ = embeds.shape
    x = embeds
    rope = cfg.position_embedding_type.lower() == "rope"
    if not rope and "wpe" in params:
        pos = offset + jnp.arange(t)
        x = x + apply_embedding(params["wpe"], pos)[None]
    positions = offset + jnp.arange(t)[None, :]
    new_caches = [] if caches is not None else None
    eps = cfg.layer_norm_epsilon
    hd = cfg.head_dim
    for i in range(cfg.n_layer):
        lp = params["h"][str(i)]
        h = apply_layer_norm(lp["ln_1"], x, eps)
        qkv = apply_linear(lp["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, cfg.n_head, hd)
        k = k.reshape(b, t, cfg.n_head, hd)
        v = v.reshape(b, t, cfg.n_head, hd)
        if rope:
            q = _interleaved_rope(q, positions, hd, cfg.rope_base)
            k = _interleaved_rope(k, positions, hd, cfg.rope_base)
        scale = hd ** -0.5 if cfg.scale_attn_weights else 1.0
        if cfg.scale_attn_by_inverse_layer_idx:
            scale = scale / float(i + 1)
        if caches is not None:
            nc = kv_update(caches[i], k, v, offset)
            new_caches.append(nc)
            if t == 1:
                o = decode_attention(q, nc.k, nc.v, offset + 1, scale=scale)
            else:
                s = nc.k.shape[1]
                pos_s = jnp.arange(s)[None, None, None, :]
                causal = pos_s <= (offset
                                   + jnp.arange(t))[None, None, :, None]
                valid = pos_s < (offset + t)
                add = jnp.where(causal & valid, 0.0, -jnp.inf)
                if pad_mask is not None:
                    add = add + pad_mask
                o = attention(q, nc.k, nc.v, mask=add, scale=scale)
        else:
            add = None
            if length_mask is not None:
                lm = length_mask
                if lm.ndim == 1:
                    lm = lm[None, None, None, :]
                add = jnp.where(lm, 0.0, -jnp.inf)
            if pad_mask is not None:
                add = pad_mask if add is None else add + pad_mask
            o = attention(q, k, v, mask=add, causal=True, scale=scale)
        x = x + apply_linear(lp["attn"]["c_proj"], o.reshape(b, t, -1))
        h = apply_layer_norm(lp["ln_2"], x, eps)
        x = x + apply_linear(lp["mlp"]["fc_out"],
                             _act(cfg, apply_linear(lp["mlp"]["fc_in"], h)))
    return apply_layer_norm(params["ln_f"], x, eps), new_caches


def gpt2_make_caches(cfg: GPT2Config, batch: int, max_len: int,
                     dtype=jnp.float32) -> List[KVCache]:
    return [KVCache.init(batch, max_len, cfg.n_head, cfg.head_dim, dtype)
            for _ in range(cfg.n_layer)]


__all__ = ["GPT2Config", "init_gpt2", "gpt2_forward", "gpt2_make_caches",
           "gelu_new"]
