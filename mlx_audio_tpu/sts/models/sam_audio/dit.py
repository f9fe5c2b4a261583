"""Functional DiT (diffusion transformer) for SAM-Audio.

Parity: /root/reference/mlx_audio/sts/models/sam_audio/transformer.py
(Attention w/ the SAM head-reshape order :76-190, SwiGLU FF :191-232,
TimestepEmbedder :234-277, ContextEmbedder :279-310, AdaLN DiTBlock :312-421,
DiT :423-565), patcher.py (ResnetBlock1d group-norm conv stack :185-231),
rope.py (adjacent-pair 2x2 rotation :76-163), align.py (EmbedAnchors :67).

TPU design: pure functions over a params pytree; the caller jits whole ODE
steps, so every block fuses into one program. The adjacent-pair RoPE is
computed inline (no precomputed buffer — XLA constant-folds it).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from ....base import BaseModelArgs
from ....nn import (
    apply_conv1d,
    apply_embedding,
    apply_linear,
    init_conv1d,
    init_embedding,
    init_linear,
)

Array = jax.Array


@dataclass
class TransformerConfig(BaseModelArgs):
    dim: int = 2816
    n_heads: int = 22
    n_layers: int = 22
    norm_eps: float = 1e-5
    qk_norm: bool = True
    fc_bias: bool = False
    ffn_exp: int = 4
    ffn_dim_multiplier: float = 1
    multiple_of: int = 64
    non_linearity: str = "swiglu"
    use_rope: bool = True
    max_positions: int = 10000
    frequency_embedding_dim: int = 256
    timestep_non_linearity: str = "swiglu"
    t_block_non_linearity: str = "silu"
    t_block_bias: bool = True
    context_dim: int = 2816
    context_norm: bool = False
    out_channels: int = 256
    in_channels: Optional[int] = None

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def ffn_hidden(self) -> int:
        hidden = int(self.ffn_exp * self.dim)
        if self.non_linearity == "swiglu":
            hidden = int(2 * hidden / 3)
        hidden = int(self.ffn_dim_multiplier * hidden)
        m = self.multiple_of
        return m * ((hidden + m - 1) // m)


def _rms_norm(p: dict, x: Array, eps: float) -> Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
            ).astype(x.dtype) * p["weight"]


def _rope_pairs(x: Array, theta: float) -> Array:
    """Adjacent-pair RoPE on (B, H, T, D) (reference rope.py 2x2 matrices)."""
    b, h, t, d = x.shape
    half = d // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) * 2 / d))
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * freqs[None, :]
    c, s = jnp.cos(ang), jnp.sin(ang)                     # (T, D/2)
    xr = x.reshape(b, h, t, half, 2)
    x0 = xr[..., 0].astype(jnp.float32)
    x1 = xr[..., 1].astype(jnp.float32)
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(b, h, t, d).astype(x.dtype)


def _heads_sam(x: Array, n_heads: int) -> Array:
    """SAM-Audio's non-standard reshape: (B,T,C)->(B,T,C/H,H)->(B,H,T,C/H)."""
    b, t, c = x.shape
    return x.reshape(b, t, c // n_heads, n_heads).transpose(0, 3, 1, 2)


# ------------------------------------------------------------------- init

def init_projection(key, in_dim: int, out_dim: int, swiglu: bool,
                    bias: bool) -> dict:
    ks = iter(jax.random.split(key, 3))
    p = {"w1": init_linear(next(ks), in_dim, out_dim, bias=bias),
         "w2": init_linear(next(ks), out_dim, out_dim, bias=bias)}
    if swiglu:
        p["w3"] = init_linear(next(ks), in_dim, out_dim, bias=bias)
    return p


def apply_projection(p: dict, x: Array, non_linearity: str) -> Array:
    h1 = apply_linear(p["w1"], x)
    if "w3" in p:
        h = jax.nn.silu(h1) * apply_linear(p["w3"], x)
    elif non_linearity == "silu":
        h = jax.nn.silu(h1)
    else:
        h = jax.nn.gelu(h1)
    return apply_linear(p["w2"], h)


def _init_attention(key, cfg: TransformerConfig) -> dict:
    ks = iter(jax.random.split(key, 4))
    d = cfg.dim
    p = {"wq": init_linear(next(ks), d, d, bias=cfg.fc_bias),
         "wk": init_linear(next(ks), d, d, bias=cfg.fc_bias),
         "wv": init_linear(next(ks), d, d, bias=cfg.fc_bias),
         "wo": init_linear(next(ks), d, d, bias=cfg.fc_bias)}
    if cfg.qk_norm:
        p["q_norm"] = {"weight": jnp.ones(cfg.head_dim)}
        p["k_norm"] = {"weight": jnp.ones(cfg.head_dim)}
    return p


def _init_resnet_block(key, in_ch: int, out_ch: int) -> dict:
    ks = iter(jax.random.split(key, 4))
    p = {"block1": {"groupnorm": {"weight": jnp.ones(in_ch),
                                  "bias": jnp.zeros(in_ch)},
                    "project": init_conv1d(next(ks), in_ch, out_ch, 3)},
         "block2": {"groupnorm": {"weight": jnp.ones(out_ch),
                                  "bias": jnp.zeros(out_ch)},
                    "project": init_conv1d(next(ks), out_ch, out_ch, 3)}}
    if in_ch != out_ch:
        p["to_out"] = init_conv1d(next(ks), in_ch, out_ch, 1)
    return p


def init_dit(key, cfg: TransformerConfig) -> dict:
    ks = iter(jax.random.split(key, 16 + 8 * cfg.n_layers))
    d = cfg.dim
    layers = {}
    for i in range(cfg.n_layers):
        layers[str(i)] = {
            "attention": _init_attention(next(ks), cfg),
            "cross_attention": _init_attention(next(ks), cfg),
            "feed_forward": init_projection(  # w1/w2/w3 with the FF hidden
                next(ks), d, cfg.ffn_hidden, cfg.non_linearity == "swiglu",
                cfg.fc_bias),
            "attention_norm": {"weight": jnp.ones(d)},
            "ffn_norm": {"weight": jnp.ones(d)},
            "scale_shift_table": jax.random.normal(next(ks), (6, d))
            / math.sqrt(d),
        }
        # FF w2 maps hidden->dim, not hidden->hidden; fix the shape
        layers[str(i)]["feed_forward"]["w2"] = init_linear(
            next(ks), cfg.ffn_hidden, d, bias=cfg.fc_bias)
    p = {
        "layers": layers,
        "norm": {"weight": jnp.ones(d)},
        "output": init_linear(next(ks), d, cfg.out_channels,
                              bias=cfg.fc_bias),
        "x_embedder": {"block": _init_resnet_block(next(ks), d, d)},
        "y_embedder": {"projection": init_projection(
            next(ks), cfg.context_dim, d,
            cfg.timestep_non_linearity == "swiglu", cfg.fc_bias)},
        "t_embedder": {"projection": init_projection(
            next(ks), cfg.frequency_embedding_dim, d,
            cfg.timestep_non_linearity == "swiglu", cfg.fc_bias)},
        "t_block": init_linear(next(ks), d, 6 * d, bias=cfg.t_block_bias),
        "final_layer_scale_shift_table": jax.random.normal(
            next(ks), (2, d)) / math.sqrt(d),
    }
    # y/t embedder projections also map to d (w2: d->d already correct)
    if cfg.context_norm:
        p["y_embedder"]["norm"] = {"weight": jnp.ones(cfg.context_dim)}
    return p


# ---------------------------------------------------------------- forward

def _attention(p: dict, cfg: TransformerConfig, x: Array,
               cross_x: Optional[Array], key_padding_mask: Optional[Array],
               use_rope: bool) -> Array:
    b, t, _ = x.shape
    h = cfg.n_heads
    q = _heads_sam(apply_linear(p["wq"], x), h)
    src = x if cross_x is None else cross_x
    k = _heads_sam(apply_linear(p["wk"], src), h)
    v = _heads_sam(apply_linear(p["wv"], src), h)
    if "q_norm" in p:
        q = _rms_norm(p["q_norm"], q, cfg.norm_eps)
        k = _rms_norm(p["k_norm"], k, cfg.norm_eps)
    if use_rope and cross_x is None:
        theta = max(10000.0, 2.0 * cfg.max_positions)
        q = _rope_pairs(q, theta)
        k = _rope_pairs(k, theta)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(cfg.head_dim)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], scores,
                           -jnp.inf)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3) \
        .reshape(b, t, -1)
    return apply_linear(p["wo"], o)


def _group_norm1(p: dict, x: Array, eps: float = 1e-5) -> Array:
    """num_groups=1 GroupNorm on channel-last (B, T, C)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _resnet_block(p: dict, x: Array) -> Array:
    """ResnetBlock1d on channel-last (B, T, C) (patcher.py:185-231)."""
    h = _group_norm1(p["block1"]["groupnorm"], x)
    h = apply_conv1d(p["block1"]["project"], jax.nn.silu(h), padding=1)
    h = _group_norm1(p["block2"]["groupnorm"], h)
    h = apply_conv1d(p["block2"]["project"], jax.nn.silu(h), padding=1)
    if "to_out" in p:
        x = apply_conv1d(p["to_out"], x)
    return h + x


def _timestep_embedding(t: Array, dim: int,
                        max_period: float = 10000.0) -> Array:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def dit_forward(p: dict, cfg: TransformerConfig, x: Array, time: Array,
                padding_mask: Optional[Array] = None,
                memory: Optional[Array] = None,
                memory_padding_mask: Optional[Array] = None) -> Array:
    """x (B, T, dim) -> velocity (B, T, out_channels)."""
    h = _resnet_block(p["x_embedder"]["block"], x)   # patch_size=1

    t_emb = apply_projection(p["t_embedder"]["projection"],
                             _timestep_embedding(
                                 time, cfg.frequency_embedding_dim),
                             cfg.timestep_non_linearity)
    t0 = apply_linear(p["t_block"], jax.nn.silu(t_emb))   # (B, 6*dim)

    y = None
    if memory is not None:
        ym = memory
        if "norm" in p["y_embedder"]:
            ym = _rms_norm(p["y_embedder"]["norm"], ym, cfg.norm_eps)
        y = apply_projection(p["y_embedder"]["projection"], ym,
                             cfg.timestep_non_linearity)

    b = x.shape[0]
    for i in range(cfg.n_layers):
        lp = p["layers"][str(i)]
        biases = lp["scale_shift_table"][None] + t0.reshape(b, 6, -1)
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
         gate_mlp) = [biases[:, j][:, None] for j in range(6)]
        hn = _rms_norm(lp["attention_norm"], h, cfg.norm_eps)
        hn = hn * (1 + scale_msa) + shift_msa
        h = h + _attention(lp["attention"], cfg, hn, None, padding_mask,
                           cfg.use_rope) * gate_msa
        if y is not None:
            h = h + _attention(lp["cross_attention"], cfg, h, y,
                               memory_padding_mask, False)
        hn = _rms_norm(lp["ffn_norm"], h, cfg.norm_eps)
        hn = hn * (1 + scale_mlp) + shift_mlp
        ff = apply_projection(lp["feed_forward"], hn, cfg.non_linearity)
        h = h + ff * gate_mlp

    shift, scale = jnp.split(
        p["final_layer_scale_shift_table"][None] + t_emb[:, None], 2,
        axis=1)
    h = _rms_norm(p["norm"], h, cfg.norm_eps)
    h = h * (1 + scale) + shift
    return apply_linear(p["output"], h)


# -------------------------------------------------------------- anchors

def init_embed_anchors(key, num_anchors: int, embed_dim: int,
                       out_dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"embed": init_embedding(k1, num_anchors + 1, embed_dim),
            "gate": jnp.zeros((1,)),
            "proj": init_linear(k2, embed_dim, out_dim, bias=False)}


def embed_anchors(p: dict, x: Array, anchor_ids: Optional[Array],
                  anchor_alignment: Optional[Array]) -> Array:
    """(B, T, C) + anchors -> (B, T, C) (reference align.py:67-123)."""
    if anchor_ids is None or anchor_alignment is None:
        return x
    gathered = jnp.take_along_axis(anchor_ids, anchor_alignment, axis=1)
    embs = apply_embedding(p["embed"], gathered)
    return x + jnp.tanh(p["gate"]) * apply_linear(p["proj"], embs)


__all__ = ["TransformerConfig", "init_dit", "dit_forward",
           "init_embed_anchors", "embed_anchors", "init_projection",
           "apply_projection"]
