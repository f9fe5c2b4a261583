"""LongCat AudioDiT CrossDiT backbone.

Parity: /root/reference/mlx_audio/tts/models/longcat_audiodit/dit.py —
global AdaLN (shared MLP + per-block scale/shift), qk-norm self attention
with rotate-half RoPE (base 1e5), text cross-attention with cond rope,
ConvNeXtV2+GRN text stack, latent-condition embedder, long-skip added at
the repa layer AND after the last block, AdaLN-zero final norm.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from ....nn import (
    apply_conv1d,
    apply_layer_norm,
    apply_linear,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention

Array = jax.Array


@dataclass
class DiTConfig:
    dim: int = 1536
    depth: int = 24
    heads: int = 24
    ff_mult: float = 4.0
    text_dim: int = 768
    bias: bool = True
    cross_attn: bool = True
    adaln_type: str = "global"
    adaln_use_text_cond: bool = True
    long_skip: bool = True
    text_conv: bool = True
    qk_norm: bool = True
    cross_attn_norm: bool = False
    eps: float = 1e-6
    use_latent_condition: bool = True
    repa_layer: int = 8
    latent_dim: int = 64
    rope_base: float = 100000.0

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (x32 * w).astype(x.dtype)


def _ln_noaffine(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rope_tables(dim: int, length: int, base: float):
    inv = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = jnp.outer(jnp.arange(length, dtype=jnp.float32), inv)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x, cos, sin):
    # x (B, T, H, D)
    h = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c
            + rot.astype(jnp.float32) * s).astype(x.dtype)


def _embedder_init(ks, in_dim, out_dim):
    return {"proj": {"0": init_linear(next(ks), in_dim, out_dim),
                     "1": init_linear(next(ks), out_dim, out_dim)}}


def _embedder(p, x, mask=None):
    if mask is not None:
        x = jnp.where(mask[..., None], x, 0.0)
    x = apply_linear(p["proj"]["1"],
                     jax.nn.silu(apply_linear(p["proj"]["0"], x)))
    if mask is not None:
        x = jnp.where(mask[..., None], x, 0.0)
    return x


def _attn_init(ks, q_dim, kv_dim, inner, bias, qk_norm):
    p = {"to_q": init_linear(next(ks), q_dim, inner, bias=bias),
         "to_k": init_linear(next(ks), kv_dim, inner, bias=bias),
         "to_v": init_linear(next(ks), kv_dim, inner, bias=bias),
         "to_out": init_linear(next(ks), inner, q_dim, bias=bias)}
    if qk_norm:
        p["q_norm"] = {"weight": jnp.ones(inner)}
        p["k_norm"] = {"weight": jnp.ones(inner)}
    return p


def init_dit(key, c: DiTConfig) -> dict:
    ks = iter(jax.random.split(key, 24 * c.depth + 48))
    dim = c.dim
    inner = c.head_dim * c.heads

    blocks = {}
    for i in range(c.depth):
        blk = {
            "self_attn": _attn_init(ks, dim, dim, inner, c.bias,
                                    c.qk_norm),
            "ffn": {"ff": {
                "0": init_linear(next(ks), dim, int(dim * c.ff_mult),
                                 bias=c.bias),
                "1": init_linear(next(ks), int(dim * c.ff_mult), dim,
                                 bias=c.bias)}},
        }
        if c.adaln_type == "global":
            blk["adaln_scale_shift"] = jnp.zeros((dim * 6,))
        else:
            blk["adaln_mlp"] = {"mlp": {
                "0": init_linear(next(ks), dim, dim * 6)}}
        if c.cross_attn:
            blk["cross_attn"] = _attn_init(ks, dim, dim, inner, c.bias,
                                           c.qk_norm)
            if c.cross_attn_norm:
                blk["cross_attn_norm"] = init_layer_norm(dim)
                blk["cross_attn_norm_c"] = init_layer_norm(dim)
        blocks[str(i)] = blk

    p = {
        "time_embed": {"time_mlp": {
            "0": init_linear(next(ks), 256, dim),
            "1": init_linear(next(ks), dim, dim)}},
        "input_embed": _embedder_init(ks, c.latent_dim, dim),
        "text_embed": _embedder_init(ks, c.text_dim, dim),
        "blocks": blocks,
        "norm_out": {"linear": init_linear(next(ks), dim, dim * 2)},
        "proj_out": init_linear(next(ks), dim, c.latent_dim),
    }
    if c.adaln_type == "global":
        p["adaln_global_mlp"] = {"mlp": {
            "0": init_linear(next(ks), dim, dim * 6)}}
    if c.text_conv:
        p["text_conv_layer"] = {}
        for i in range(4):
            p["text_conv_layer"][str(i)] = {
                "dwconv_weight": jnp.zeros((7, 1, dim)),
                "dwconv_bias": jnp.zeros((dim,)),
                "norm": init_layer_norm(dim),
                "pwconv1": init_linear(next(ks), dim, dim * 2, bias=c.bias),
                "grn": {"gamma": jnp.zeros((1, 1, dim * 2)),
                        "beta": jnp.zeros((1, 1, dim * 2))},
                "pwconv2": init_linear(next(ks), dim * 2, dim,
                                       bias=c.bias),
            }
    if c.use_latent_condition:
        p["latent_embed"] = _embedder_init(ks, c.latent_dim, dim)
        p["latent_cond_embedder"] = _embedder_init(ks, dim * 2, dim)
    return p


def _grn(p, x):
    gx = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    return p["gamma"] * (x * nx) + p["beta"] + x


def _convnext_block(p, x, eps):
    residual = x
    x = jax.lax.conv_general_dilated(
        x, p["dwconv_weight"].astype(x.dtype), (1,), [(3, 3)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1]) + p["dwconv_bias"]
    x = apply_layer_norm(p["norm"], x, eps)
    x = jax.nn.silu(apply_linear(p["pwconv1"], x))
    x = _grn(p["grn"], x)
    return residual + apply_linear(p["pwconv2"], x)


def _sinus_time(t: Array, dim: int = 256, scale: float = 1000.0) -> Array:
    half = dim // 2
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                  * (-math.log(10000.0) / (half - 1)))
    emb = scale * t.astype(jnp.float32)[:, None] * emb[None]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def _attn(p, c: DiTConfig, x, kv, rope, kv_rope, key_mask):
    b, t, _ = x.shape
    s = kv.shape[1]
    q = apply_linear(p["to_q"], x)
    k = apply_linear(p["to_k"], kv)
    v = apply_linear(p["to_v"], kv)
    if c.qk_norm:
        q = _rms(q, p["q_norm"]["weight"], c.eps)
        k = _rms(k, p["k_norm"]["weight"], c.eps)
    q = q.reshape(b, t, c.heads, c.head_dim)
    k = k.reshape(b, s, c.heads, c.head_dim)
    v = v.reshape(b, s, c.heads, c.head_dim)
    if rope is not None:
        q = _apply_rope(q, *rope)
    if kv_rope is not None:
        k = _apply_rope(k, *kv_rope)
    mask = None
    if key_mask is not None:
        mask = jnp.where(key_mask[:, None, None, :], 0.0, -jnp.inf)
    o = attention(q, k, v, mask=mask).reshape(b, t, -1)
    return apply_linear(p["to_out"], o)


def dit_forward(p: dict, c: DiTConfig, x: Array, text: Array,
                text_len: Array, time: Array,
                mask: Optional[Array] = None,
                cond_mask: Optional[Array] = None,
                latent_cond: Optional[Array] = None) -> Array:
    """Noisy latents (B, T, latent_dim) -> velocity (B, T, latent_dim)."""
    b, seq_len, _ = x.shape
    text_seq = text.shape[1]
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))

    t = apply_linear(p["time_embed"]["time_mlp"]["1"], jax.nn.silu(
        apply_linear(p["time_embed"]["time_mlp"]["0"],
                     _sinus_time(time))))
    text = _embedder(p["text_embed"], text, cond_mask)
    if c.text_conv:
        for i in range(4):
            text = _convnext_block(p["text_conv_layer"][str(i)], text,
                                   c.eps)
        if cond_mask is not None:
            text = jnp.where(cond_mask[..., None], text, 0.0)

    x = _embedder(p["input_embed"], x, mask)
    if c.use_latent_condition and latent_cond is not None:
        lc = _embedder(p["latent_embed"], latent_cond, mask)
        x = _embedder(p["latent_cond_embedder"],
                      jnp.concatenate([x, lc], axis=-1))
    x_skip = x

    rope = _rope_tables(c.head_dim, seq_len, c.rope_base)
    cond_rope = _rope_tables(c.head_dim, text_seq, c.rope_base)

    if c.adaln_type == "global":
        if c.adaln_use_text_cond:
            text_mean = jnp.sum(text, axis=1) / \
                jnp.maximum(text_len[:, None].astype(text.dtype), 1.0)
            norm_cond = t + text_mean
        else:
            norm_cond = t
        adaln_global = apply_linear(p["adaln_global_mlp"]["mlp"]["0"],
                                    jax.nn.silu(norm_cond))
    else:
        norm_cond = t
        adaln_global = None

    for i in range(c.depth):
        blk = p["blocks"][str(i)]
        if c.adaln_type == "global":
            adaln = adaln_global + blk["adaln_scale_shift"][None]
        else:
            adaln = apply_linear(blk["adaln_mlp"]["mlp"]["0"],
                                 jax.nn.silu(t))
        gate_sa, scale_sa, shift_sa, gate_ff, scale_ff, shift_ff = \
            jnp.split(adaln, 6, axis=-1)
        h = _ln_noaffine(x, c.eps) * (1 + scale_sa[:, None]) \
            + shift_sa[:, None]
        x = x + gate_sa[:, None] * _attn(blk["self_attn"], c, h, h, rope,
                                         rope, mask)
        if c.cross_attn:
            xn = apply_layer_norm(blk["cross_attn_norm"], x, c.eps) \
                if "cross_attn_norm" in blk else x
            cn = apply_layer_norm(blk["cross_attn_norm_c"], text, c.eps) \
                if "cross_attn_norm_c" in blk else text
            x = x + _attn(blk["cross_attn"], c, xn, cn, rope, cond_rope,
                          cond_mask)
        h = _ln_noaffine(x, c.eps) * (1 + scale_ff[:, None]) \
            + shift_ff[:, None]
        ff = blk["ffn"]["ff"]
        x = x + gate_ff[:, None] * apply_linear(
            ff["1"], jax.nn.gelu(apply_linear(ff["0"], h)))
        if c.long_skip and c.repa_layer == i + 1:
            x = x + x_skip

    if c.long_skip:
        x = x + x_skip
    emb = apply_linear(p["norm_out"]["linear"], jax.nn.silu(norm_cond))
    scale, shift = jnp.split(emb, 2, axis=-1)
    x = _ln_noaffine(x, c.eps) * (1 + scale[:, None]) + shift[:, None]
    return apply_linear(p["proj_out"], x)
