"""Functional MiniCPM backbone for VoxCPM / VoxCPM2.

Parity: /root/reference/mlx_audio/tts/models/voxcpm/minicpm.py (+ voxcpm2
variant: kv_channels head-dim override, no_rope for the residual LM).
LongRoPE scaling (short/long factor + sqrt-log scaling), optional MuP
residual scaling (scale_depth / sqrt(L)).

TPU design: fixed-capacity KV caches (ops/kvcache) so decode steps compile
once; rope cos/sin are computed in-graph from integer positions (the factor
choice is static — TTS never exceeds original_max_position_embeddings).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

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

Array = jax.Array


@dataclass
class LMConfig(BaseModelArgs):
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    intermediate_size: int = 4096
    vocab_size: int = 73448
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling_type: str = "longrope"
    rope_long_factor: List[float] = field(default_factory=list)
    rope_short_factor: List[float] = field(default_factory=list)
    scale_emb: int = 12
    dim_model_base: int = 256
    scale_depth: float = 1.4
    original_max_position_embeddings: int = 32768
    max_position_embeddings: int = 32768
    bos_token_id: int = 1
    eos_token_id: int = 2
    use_mup: bool = False
    kv_channels: Optional[int] = None
    no_rope: bool = False

    @property
    def head_dim(self) -> int:
        return self.kv_channels or \
            self.hidden_size // self.num_attention_heads


def rope_cos_sin(cfg: LMConfig, positions: Array) -> Tuple[Array, Array]:
    """LongRoPE cos/sin for (T,) or (B, T) positions -> (..., head_dim)."""
    hd = cfg.head_dim
    half = hd // 2
    inv = 1.0 / (cfg.rope_theta
                 ** (jnp.arange(half, dtype=jnp.float32) / half))
    factors = jnp.asarray(cfg.rope_short_factor or [1.0] * half,
                          jnp.float32)
    if factors.shape[0] != half:
        factors = jnp.ones((half,), jnp.float32)
    scale = cfg.max_position_embeddings / cfg.original_max_position_embeddings
    scaling = math.sqrt(1 + math.log(max(scale, 1.0))
                        / math.log(cfg.original_max_position_embeddings))
    freqs = positions[..., None].astype(jnp.float32) * (inv / factors)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * scaling, jnp.sin(emb) * scaling


def _rope_apply(x: Array, cos: Array, sin: Array) -> Array:
    # x (B, T, H, D); cos/sin (B?, T, D)
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos + rot * sin


def init_minicpm(key, cfg: LMConfig) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))
    hd = cfg.head_dim
    layers = {}
    for i in range(cfg.num_hidden_layers):
        layers[str(i)] = {
            "self_attn": {
                "q_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_attention_heads * hd,
                                      bias=False),
                "k_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_key_value_heads * hd,
                                      bias=False),
                "v_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_key_value_heads * hd,
                                      bias=False),
                "o_proj": init_linear(next(ks),
                                      cfg.num_attention_heads * hd,
                                      cfg.hidden_size, bias=False)},
            "mlp": {
                "gate_proj": init_linear(next(ks), cfg.hidden_size,
                                         cfg.intermediate_size, bias=False),
                "up_proj": init_linear(next(ks), cfg.hidden_size,
                                       cfg.intermediate_size, bias=False),
                "down_proj": init_linear(next(ks), cfg.intermediate_size,
                                         cfg.hidden_size, bias=False)},
            "input_layernorm": init_rms_norm(cfg.hidden_size),
            "post_attention_layernorm": init_rms_norm(cfg.hidden_size)}
    p = {"layers": layers, "norm": init_rms_norm(cfg.hidden_size)}
    if cfg.vocab_size > 0:
        p["embed_tokens"] = init_embedding(next(ks), cfg.vocab_size,
                                           cfg.hidden_size)
    return p


def minicpm_forward(params: dict, cfg: LMConfig, embeds: Array,
                    caches: Optional[List[KVCache]] = None, offset=0,
                    pad_mask: Optional[Array] = None,
                    is_causal: bool = True
                    ) -> Tuple[Array, Optional[List[KVCache]]]:
    b, t, _ = embeds.shape
    x = embeds
    hd = cfg.head_dim
    if cfg.no_rope:
        cos = sin = None
    else:
        cos, sin = rope_cos_sin(cfg, offset + jnp.arange(t))
    scale_res = (cfg.scale_depth / math.sqrt(cfg.num_hidden_layers)
                 if cfg.use_mup else 1.0)
    new_caches = [] if caches is not None else None
    for i in range(cfg.num_hidden_layers):
        lp = params["layers"][str(i)]
        h = apply_rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
        a = lp["self_attn"]
        q = apply_linear(a["q_proj"], h).reshape(
            b, t, cfg.num_attention_heads, hd)
        k = apply_linear(a["k_proj"], h).reshape(
            b, t, cfg.num_key_value_heads, hd)
        v = apply_linear(a["v_proj"], h).reshape(
            b, t, cfg.num_key_value_heads, hd)
        if cos is not None:
            q = _rope_apply(q, cos, sin)
            k = _rope_apply(k, cos, sin)
        if caches is not None:
            nc = kv_update(caches[i], k, v, offset)
            new_caches.append(nc)
            s = nc.k.shape[1]
            q_pos = (offset + jnp.arange(t))[None, None, :, None]
            k_pos = jnp.arange(s)[None, None, None, :]
            ok = k_pos < offset + t
            if is_causal:
                ok = ok & (k_pos <= q_pos)
            add = jnp.where(ok, 0.0, -jnp.inf)
            if pad_mask is not None:
                add = add + pad_mask
            o = attention(q, nc.k, nc.v, mask=add)
        else:
            o = attention(q, k, v, causal=is_causal, mask=pad_mask)
        x = x + apply_linear(a["o_proj"],
                             o.reshape(b, t, -1)) * scale_res
        h = apply_rms_norm(lp["post_attention_layernorm"], x,
                           cfg.rms_norm_eps)
        m = lp["mlp"]
        x = x + apply_linear(m["down_proj"],
                             jax.nn.silu(apply_linear(m["gate_proj"], h))
                             * apply_linear(m["up_proj"], h)) * scale_res
    return apply_rms_norm(params["norm"], x, cfg.rms_norm_eps), new_caches


def minicpm_caches(cfg: LMConfig, batch: int, cap: int) -> List[KVCache]:
    return [KVCache.init(batch, cap, cfg.num_key_value_heads, cfg.head_dim,
                         jnp.float32)
            for _ in range(cfg.num_hidden_layers)]


__all__ = ["LMConfig", "init_minicpm", "minicpm_forward", "minicpm_caches",
           "rope_cos_sin"]
