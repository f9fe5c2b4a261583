"""Functional Qwen2 + BailingMoe backbones for Ming-Omni (bailingmm).

Parity: /root/reference/mlx_audio/tts/models/bailingmm/bailingmm.py
(MingQwen2Model with per-layer sliding windows :481-622, MingBailingMoe*
:238-478 — fused query_key_value attention with optional QK-norm and
partial/3-D rope, grouped top-k expert routing _group_expert_select
:196-235).

TPU notes:
- Experts are STACKED (E, out, in) tensors. Decode steps (T==1) gather the
  k routed experts' weights and run k tiny matmuls; prefill uses a masked
  scan over experts (E dense passes over the short TTS prompt) — static
  shapes either way, no ragged dispatch.
- The TTS path drives all three MRoPE position streams with the same ids
  (ref :1596-1598 stacks [pos, pos, pos]), so 3-D rope reduces to plain
  partial rope over rotary_dim.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

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


# ------------------------------------------------------------------ rope

def partial_rope(x: Array, offset, dims: int, base: float) -> Array:
    """Split-half rope over the first `dims` channels of (B, T, H, D)."""
    dims = min(int(dims), x.shape[-1])
    if dims <= 0:
        return x
    xr, xp = x[..., :dims], x[..., dims:]
    t = x.shape[1]
    pos = offset + jnp.arange(t, dtype=jnp.float32)
    inv = 1.0 / (base ** (jnp.arange(0, dims, 2, dtype=jnp.float32) / dims))
    freqs = jnp.outer(pos, inv)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos = jnp.cos(emb)[None, :, None, :].astype(x.dtype)
    sin = jnp.sin(emb)[None, :, None, :].astype(x.dtype)
    half = dims // 2
    rotated = jnp.concatenate([-xr[..., half:], xr[..., :half]], axis=-1)
    xr = xr * cos + rotated * sin
    return jnp.concatenate([xr, xp], axis=-1) if xp.shape[-1] else xr


# ---------------------------------------------------------------- qwen2

@dataclass
class Qwen2Config(BaseModelArgs):
    model_type: str = "qwen2"
    hidden_size: int = 1024
    num_hidden_layers: int = 8
    intermediate_size: int = 4096
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    vocab_size: int = 32
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = True
    use_sliding_window: bool = False
    sliding_window: int = 0
    max_window_layers: Optional[int] = None
    layer_types: Optional[List[str]] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def layer_sliding(self, idx: int) -> Optional[int]:
        """Per-layer window (ref MingQwen2Model :566-586)."""
        if not self.use_sliding_window or self.sliding_window <= 0:
            return None
        if isinstance(self.layer_types, list) and idx < len(self.layer_types):
            return self.sliding_window \
                if self.layer_types[idx] == "sliding_attention" else None
        max_w = self.max_window_layers
        if max_w is None:
            max_w = self.num_hidden_layers
        return self.sliding_window if idx >= max_w else None


def init_qwen2(key, cfg: Qwen2Config, *, embeddings: bool = True) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))
    hd = cfg.head_dim
    layers = {}
    for i in range(cfg.num_hidden_layers):
        layers[str(i)] = {
            "self_attn": {
                "q_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_attention_heads * hd),
                "k_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_key_value_heads * hd),
                "v_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_key_value_heads * hd),
                "o_proj": init_linear(next(ks), cfg.num_attention_heads * hd,
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
    if embeddings:
        p["embed_tokens"] = init_embedding(next(ks), cfg.vocab_size,
                                           cfg.hidden_size)
    return p


def qwen2_forward(params: dict, cfg: Qwen2Config, embeds: Array,
                  caches: Optional[List[KVCache]] = None, offset=0,
                  pad_mask: Optional[Array] = None
                  ) -> Tuple[Array, Optional[List[KVCache]]]:
    """(B, T, D) -> (B, T, D); per-layer sliding-window causal attention."""
    b, t, _ = embeds.shape
    x = embeds
    hd = cfg.head_dim
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
        q = partial_rope(q, offset, hd, cfg.rope_theta)
        k = partial_rope(k, offset, hd, cfg.rope_theta)
        window = cfg.layer_sliding(i)
        if caches is not None:
            nc = kv_update(caches[i], k, v, offset)
            new_caches.append(nc)
            s = nc.k.shape[1]
            q_pos = (offset + jnp.arange(t))[None, None, :, None]
            k_pos = jnp.arange(s)[None, None, None, :]
            ok = (k_pos <= q_pos) & (k_pos < offset + t)
            if window is not None:
                ok = ok & (k_pos > q_pos - window)
            add = jnp.where(ok, 0.0, -jnp.inf)
            if pad_mask is not None:
                add = add + pad_mask
            o = attention(q, nc.k, nc.v, mask=add)
        else:
            q_pos = jnp.arange(t)[None, None, :, None]
            k_pos = jnp.arange(t)[None, None, None, :]
            ok = k_pos <= q_pos
            if window is not None:
                ok = ok & (k_pos > q_pos - window)
            add = jnp.where(ok, 0.0, -jnp.inf)
            if pad_mask is not None:
                add = add + pad_mask
            o = attention(q, k, v, mask=add)
        x = x + apply_linear(a["o_proj"], o.reshape(b, t, -1))
        h = apply_rms_norm(lp["post_attention_layernorm"], x,
                           cfg.rms_norm_eps)
        m = lp["mlp"]
        x = x + apply_linear(m["down_proj"],
                             jax.nn.silu(apply_linear(m["gate_proj"], h))
                             * apply_linear(m["up_proj"], h))
    return apply_rms_norm(params["norm"], x, cfg.rms_norm_eps), new_caches


# ------------------------------------------------------------ bailing moe

@dataclass
class BailingMoeConfig(BaseModelArgs):
    model_type: str = "bailing_moe"
    hidden_size: int = 2048
    num_hidden_layers: int = 20
    intermediate_size: int = 5632
    num_attention_heads: int = 16
    num_key_value_heads: int = 4
    vocab_size: int = 157184
    rms_norm_eps: float = 1e-6
    rope_theta: float = 600000.0
    tie_word_embeddings: bool = False
    norm_head: bool = False
    use_qk_norm: bool = True
    use_qkv_bias: bool = False
    use_bias: bool = False
    rotary_dim: Optional[int] = None
    partial_rotary_factor: float = 1.0
    rope_scaling: Optional[Dict[str, Any]] = None
    # MoE
    num_experts: Optional[int] = None
    num_experts_per_tok: int = 4
    moe_intermediate_size: int = 1408
    moe_shared_expert_intermediate_size: Optional[int] = None
    num_shared_experts: int = 1
    moe_router_enable_shared_expert: bool = True
    first_k_dense_replace: int = 1
    n_group: Optional[int] = None
    topk_group: Optional[int] = None
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = True
    score_function: str = "sigmoid"
    moe_router_enable_expert_bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def rope_dims(self) -> int:
        if self.rotary_dim is not None:
            return int(self.rotary_dim)
        return int(self.head_dim * self.partial_rotary_factor)

    def is_moe_layer(self, idx: int) -> bool:
        return (self.num_experts is not None
                and idx >= self.first_k_dense_replace)


def _init_mlp(ks, d: int, f: int) -> dict:
    return {"gate_proj": init_linear(next(ks), d, f, bias=False),
            "up_proj": init_linear(next(ks), d, f, bias=False),
            "down_proj": init_linear(next(ks), f, d, bias=False)}


def init_bailing_moe(key, cfg: BailingMoeConfig) -> dict:
    ks = iter(jax.random.split(key, 16 * cfg.num_hidden_layers + 8))
    hd = cfg.head_dim
    layers = {}
    for i in range(cfg.num_hidden_layers):
        lp = {
            "attention": {
                "query_key_value": init_linear(
                    next(ks), cfg.hidden_size,
                    (cfg.num_attention_heads
                     + 2 * cfg.num_key_value_heads) * hd,
                    bias=cfg.use_qkv_bias),
                "dense": init_linear(next(ks),
                                     cfg.num_attention_heads * hd,
                                     cfg.hidden_size, bias=cfg.use_bias),
                **({"query_layernorm": init_rms_norm(hd),
                    "key_layernorm": init_rms_norm(hd)}
                   if cfg.use_qk_norm else {})},
            "input_layernorm": init_rms_norm(cfg.hidden_size),
            "post_attention_layernorm": init_rms_norm(cfg.hidden_size)}
        if cfg.is_moe_layer(i):
            e = cfg.num_experts
            f = cfg.moe_intermediate_size
            k1, k2, k3, k4 = jax.random.split(next(ks), 4)
            block = {
                "gate": {"gate_proj": init_linear(
                    next(ks), cfg.hidden_size, e, bias=False)},
                "switch_mlp": {
                    "gate_proj": {"weight": 0.02 * jax.random.normal(
                        k1, (e, f, cfg.hidden_size))},
                    "up_proj": {"weight": 0.02 * jax.random.normal(
                        k2, (e, f, cfg.hidden_size))},
                    "down_proj": {"weight": 0.02 * jax.random.normal(
                        k3, (e, cfg.hidden_size, f))}}}
            if cfg.moe_router_enable_expert_bias:
                block["gate"]["expert_bias"] = jnp.zeros((e,))
            if cfg.num_shared_experts > 0 and \
                    cfg.moe_router_enable_shared_expert:
                shared = (cfg.moe_shared_expert_intermediate_size
                          or cfg.moe_intermediate_size)
                block["shared_experts"] = _init_mlp(
                    ks, cfg.hidden_size, shared * cfg.num_shared_experts)
            lp["mlp"] = block
        else:
            lp["mlp"] = _init_mlp(ks, cfg.hidden_size,
                                  cfg.intermediate_size)
        layers[str(i)] = lp
    return {
        "word_embeddings": init_embedding(next(ks), cfg.vocab_size,
                                          cfg.hidden_size),
        "layers": layers,
        "norm": init_rms_norm(cfg.hidden_size),
    }


def group_expert_select(gates: Array, cfg: BailingMoeConfig,
                        expert_bias: Optional[Array]
                        ) -> Tuple[Array, Array]:
    """Grouped top-k routing (ref _group_expert_select :196-235).

    gates (N, E) -> (indices (N, k), weights (N, k)).
    """
    if cfg.score_function == "sigmoid":
        scores = jax.nn.sigmoid(gates.astype(jnp.float32))
    else:
        scores = jax.nn.softmax(gates.astype(jnp.float32), axis=-1)
    orig = scores
    if expert_bias is not None:
        scores = scores + expert_bias
    if cfg.n_group is not None and cfg.n_group > 1:
        n, e = scores.shape
        g = scores.reshape(n, cfg.n_group, e // cfg.n_group)
        top2 = jax.lax.top_k(g, 2)[0].sum(axis=-1)          # (N, G)
        keep_groups = jax.lax.top_k(top2, cfg.topk_group)[1]
        keep = jnp.zeros((n, cfg.n_group), bool).at[
            jnp.arange(n)[:, None], keep_groups].set(True)
        g = jnp.where(keep[..., None], g, 0.0)
        scores = g.reshape(n, e)
    k = cfg.num_experts_per_tok
    sel_scores, inds = jax.lax.top_k(scores, k)
    weights = jnp.take_along_axis(orig, inds, axis=-1)
    if k > 1 and cfg.norm_topk_prob:
        weights = weights / (weights.sum(axis=-1, keepdims=True) + 1e-20)
    weights = weights * cfg.routed_scaling_factor
    return inds, weights.astype(gates.dtype)


def _moe_block(p: dict, cfg: BailingMoeConfig, x: Array) -> Array:
    """Sparse MoE over (B, T, D): decode gathers routed experts; longer
    sequences scan over experts with masked accumulation."""
    b, t, d = x.shape
    flat = x.reshape(-1, d).astype(jnp.float32)
    n = flat.shape[0]
    gates = apply_linear(p["gate"]["gate_proj"], flat)
    bias = p["gate"].get("expert_bias")
    inds, weights = group_expert_select(gates, cfg, bias)

    gw = p["switch_mlp"]["gate_proj"]["weight"]  # (E, F, D)
    uw = p["switch_mlp"]["up_proj"]["weight"]    # (E, F, D)
    dw = p["switch_mlp"]["down_proj"]["weight"]  # (E, D, F)

    def expert_mlp(gwe, uwe, dwe, xe):
        g = xe @ gwe.T
        u = xe @ uwe.T
        return ((g * jax.nn.sigmoid(g)) * u) @ dwe.T

    if n <= 4:
        # decode: gather the k routed experts per token
        def per_token(xi, idx, wgt):
            out = jnp.zeros_like(xi)
            for j in range(cfg.num_experts_per_tok):
                e = idx[j]
                y = expert_mlp(gw[e], uw[e], dw[e], xi[None])[0]
                out = out + wgt[j] * y
            return out

        out = jax.vmap(per_token)(flat, inds, weights)
    else:
        # prefill: masked scan over experts
        def body(acc, e):
            y = expert_mlp(gw[e], uw[e], dw[e], flat)      # (N, D)
            w = (weights * (inds == e)).sum(axis=-1)       # (N,)
            return acc + y * w[:, None], None

        out, _ = jax.lax.scan(body, jnp.zeros_like(flat),
                              jnp.arange(gw.shape[0]))
    if "shared_experts" in p:
        se = p["shared_experts"]
        g = apply_linear(se["gate_proj"], flat)
        out = out + apply_linear(
            se["down_proj"],
            (g * jax.nn.sigmoid(g)) * apply_linear(se["up_proj"], flat))
    return out.reshape(b, t, d).astype(x.dtype)


def bailing_moe_forward(params: dict, cfg: BailingMoeConfig, embeds: Array,
                        caches: Optional[List[KVCache]] = None, offset=0,
                        pad_mask: Optional[Array] = None
                        ) -> Tuple[Array, Optional[List[KVCache]]]:
    b, t, _ = embeds.shape
    x = embeds
    hd = cfg.head_dim
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    new_caches = [] if caches is not None else None
    for i in range(cfg.num_hidden_layers):
        lp = params["layers"][str(i)]
        h = apply_rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
        a = lp["attention"]
        qkv = apply_linear(a["query_key_value"], h)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
        q = q.reshape(b, t, nh, hd)
        k = k.reshape(b, t, nkv, hd)
        v = v.reshape(b, t, nkv, hd)
        if "query_layernorm" in a:
            q = apply_rms_norm(a["query_layernorm"], q, cfg.rms_norm_eps)
            k = apply_rms_norm(a["key_layernorm"], k, cfg.rms_norm_eps)
        q = partial_rope(q, offset, cfg.rope_dims, cfg.rope_theta)
        k = partial_rope(k, offset, cfg.rope_dims, cfg.rope_theta)
        if caches is not None:
            nc = kv_update(caches[i], k, v, offset)
            new_caches.append(nc)
            s = nc.k.shape[1]
            q_pos = (offset + jnp.arange(t))[None, None, :, None]
            k_pos = jnp.arange(s)[None, None, None, :]
            add = jnp.where((k_pos <= q_pos) & (k_pos < offset + t),
                            0.0, -jnp.inf)
            if pad_mask is not None:
                add = add + pad_mask
            o = attention(q, nc.k, nc.v, mask=add)
        else:
            o = attention(q, k, v, causal=True, mask=pad_mask)
        x = x + apply_linear(a["dense"], o.reshape(b, t, -1))
        h = apply_rms_norm(lp["post_attention_layernorm"], x,
                           cfg.rms_norm_eps)
        if cfg.is_moe_layer(i):
            x = x + _moe_block(lp["mlp"], cfg, h)
        else:
            m = lp["mlp"]
            x = x + apply_linear(m["down_proj"],
                                 jax.nn.silu(apply_linear(m["gate_proj"], h))
                                 * apply_linear(m["up_proj"], h))
    return apply_rms_norm(params["norm"], x, cfg.rms_norm_eps), new_caches


__all__ = ["Qwen2Config", "init_qwen2", "qwen2_forward", "partial_rope",
           "BailingMoeConfig", "init_bailing_moe", "bailing_moe_forward",
           "group_expert_select"]
