"""Matcha/CosyVoice conditional UNet estimator for s3gen flow matching.

Parity: reference tts/models/chatterbox/s3gen/{decoder.py, matcha/*} —
sinusoidal t embedding (scale 1000, [sin|cos]) -> MLP (matcha/decoder.py:
7-45), causal conv blocks (left pad k-1) with LayerNorm + Mish
(decoder.py:71-124), ResnetBlock1D with Mish-then-Linear time projection,
diffusers-style attention (inner_dim = heads*head_dim, no qkv bias) +
GELU FFN transformer blocks (matcha/transformer.py), the down/mid/up
topology with causal-conv edge layers for the default channels=[256]
config, and full-context attention masks (streaming chunk masks are the
reference's streaming path; offline inference uses full context,
decoder.py:344-446).

Everything is channel-last (B, T, C); the reference transposes around
every module.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from .....nn import (apply_conv1d, apply_layer_norm, apply_linear,
                     init_conv1d, init_layer_norm, init_linear)
from .....ops.attention import attention

Array = jax.Array


def _mish(x: Array) -> Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class DecoderConfig:
    def __init__(self, in_channels=320, out_channels=80, causal=True,
                 channels=(256,), attention_head_dim=64, n_blocks=4,
                 num_mid_blocks=12, num_heads=8):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.causal = causal
        self.channels = list(channels)
        self.attention_head_dim = attention_head_dim
        self.n_blocks = n_blocks
        self.num_mid_blocks = num_mid_blocks
        self.num_heads = num_heads
        self.time_embed_dim = self.channels[0] * 4


# ------------------------------------------------------------------ init

def _init_block1d(ks, dim: int, dim_out: int) -> dict:
    return {"conv": {"conv": init_conv1d(next(ks), dim, dim_out, 3)},
            "norm": init_layer_norm(dim_out)}


def _init_resnet(ks, dim: int, dim_out: int, time_dim: int) -> dict:
    return {"block1": _init_block1d(ks, dim, dim_out),
            "block2": _init_block1d(ks, dim_out, dim_out),
            "mlp_linear": init_linear(next(ks), time_dim, dim_out),
            "res_conv": init_conv1d(next(ks), dim, dim_out, 1)}


def _init_transformer(ks, dim: int, heads: int, head_dim: int) -> dict:
    inner = heads * head_dim
    return {"norm1": init_layer_norm(dim),
            "norm3": init_layer_norm(dim),
            "attn": {"query_proj": init_linear(next(ks), dim, inner,
                                               bias=False),
                     "key_proj": init_linear(next(ks), dim, inner,
                                             bias=False),
                     "value_proj": init_linear(next(ks), dim, inner,
                                               bias=False),
                     "out_proj": init_linear(next(ks), inner, dim)},
            "ff": {"layers": {"0": init_linear(next(ks), dim, dim * 4),
                              "1": init_linear(next(ks), dim * 4, dim)}}}


def init_conditional_decoder(key, cfg: DecoderConfig) -> dict:
    ks = iter(jax.random.split(key, 2048))
    td = cfg.time_embed_dim
    p = {"time_mlp": {
        "linear_1": init_linear(next(ks), cfg.in_channels, td),
        "linear_2": init_linear(next(ks), td, td)}}
    out_ch = cfg.in_channels
    for i, ch in enumerate(cfg.channels):
        blk = {"resnet": _init_resnet(ks, out_ch, ch, td)}
        for j in range(cfg.n_blocks):
            blk[f"transformer_{j}"] = _init_transformer(
                ks, ch, cfg.num_heads, cfg.attention_head_dim)
        is_last = i == len(cfg.channels) - 1
        if is_last:
            blk["downsample"] = {"conv": init_conv1d(next(ks), ch, ch, 3)}
        else:
            blk["downsample"] = {"conv": init_conv1d(next(ks), ch, ch, 3)}
        p[f"down_blocks_{i}"] = blk
        out_ch = ch
    for i in range(cfg.num_mid_blocks):
        blk = {"resnet": _init_resnet(ks, cfg.channels[-1],
                                      cfg.channels[-1], td)}
        for j in range(cfg.n_blocks):
            blk[f"transformer_{j}"] = _init_transformer(
                ks, cfg.channels[-1], cfg.num_heads,
                cfg.attention_head_dim)
        p[f"mid_blocks_{i}"] = blk
    rev = list(reversed(cfg.channels)) + [cfg.channels[0]]
    for i in range(len(rev) - 1):
        blk = {"resnet": _init_resnet(ks, rev[i] * 2, rev[i + 1], td)}
        for j in range(cfg.n_blocks):
            blk[f"transformer_{j}"] = _init_transformer(
                ks, rev[i + 1], cfg.num_heads, cfg.attention_head_dim)
        blk["upsample"] = {"conv": init_conv1d(next(ks), rev[i + 1],
                                               rev[i + 1], 3)}
        p[f"up_blocks_{i}"] = blk
    p["final_block"] = _init_block1d(ks, rev[-1], rev[-1])
    p["final_proj"] = init_conv1d(next(ks), rev[-1], cfg.out_channels, 1)
    return p


# --------------------------------------------------------------- forward

def _causal_conv(p: dict, x: Array, k: int = 3) -> Array:
    return apply_conv1d(p, jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0))))


def _block1d(p: dict, x: Array, mask: Array) -> Array:
    h = _causal_conv(p["conv"]["conv"], x * mask)
    h = apply_layer_norm(p["norm"], h)
    return _mish(h) * mask


def _resnet(p: dict, x: Array, mask: Array, t_emb: Array) -> Array:
    h = _block1d(p["block1"], x, mask)
    h = h + apply_linear(p["mlp_linear"], _mish(t_emb))[:, None]
    h = _block1d(p["block2"], h, mask)
    return h + apply_conv1d(p["res_conv"], x * mask)


def _transformer(p: dict, x: Array, amask: Array, heads: int,
                 head_dim: int) -> Array:
    h = apply_layer_norm(p["norm1"], x)
    b, t, _ = x.shape
    a = p["attn"]
    q = apply_linear(a["query_proj"], h).reshape(b, t, heads, head_dim)
    k = apply_linear(a["key_proj"], h).reshape(b, t, heads, head_dim)
    v = apply_linear(a["value_proj"], h).reshape(b, t, heads, head_dim)
    o = attention(q, k, v, mask=amask).reshape(b, t, -1)
    x = x + apply_linear(a["out_proj"], o)
    h = apply_layer_norm(p["norm3"], x)
    f = p["ff"]["layers"]
    h = apply_linear(f["1"], jax.nn.gelu(apply_linear(f["0"], h),
                                         approximate=False))
    return x + h


def conditional_decoder(p: dict, cfg: DecoderConfig, x: Array,
                        mask: Array, mu: Array, t: Array, spks: Array,
                        cond: Array) -> Array:
    """Channel-last estimator: x/mu/cond (B, T, 80), spks (B, 80),
    t (B,), mask (B, T) float -> velocity (B, T, 80).

    Assumes the default single-level channels config (edge layers are
    causal convs, no actual down/upsampling)."""
    half = cfg.in_channels // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    te = 1000.0 * t[:, None] * freqs[None]
    te = jnp.concatenate([jnp.sin(te), jnp.cos(te)], axis=-1)
    tm = p["time_mlp"]
    t_emb = apply_linear(tm["linear_2"],
                         jax.nn.silu(apply_linear(tm["linear_1"], te)))

    spks_b = jnp.broadcast_to(spks[:, None],
                              (x.shape[0], x.shape[1], spks.shape[-1]))
    h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)
    m = mask[..., None]
    amask = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e10)
    hd = cfg.attention_head_dim

    skips = []
    for i in range(len(cfg.channels)):
        blk = p[f"down_blocks_{i}"]
        h = _resnet(blk["resnet"], h, m, t_emb)
        for j in range(cfg.n_blocks):
            h = _transformer(blk[f"transformer_{j}"], h, amask,
                             cfg.num_heads, hd)
        skips.append(h)
        h = _causal_conv(blk["downsample"]["conv"], h * m)
    for i in range(cfg.num_mid_blocks):
        blk = p[f"mid_blocks_{i}"]
        h = _resnet(blk["resnet"], h, m, t_emb)
        for j in range(cfg.n_blocks):
            h = _transformer(blk[f"transformer_{j}"], h, amask,
                             cfg.num_heads, hd)
    for i in range(len(cfg.channels)):
        blk = p[f"up_blocks_{i}"]
        skip = skips.pop()
        h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
        h = _resnet(blk["resnet"], h, m, t_emb)
        for j in range(cfg.n_blocks):
            h = _transformer(blk[f"transformer_{j}"], h, amask,
                             cfg.num_heads, hd)
        h = _causal_conv(blk["upsample"]["conv"], h * m)
    h = _block1d(p["final_block"], h, m)
    out = apply_conv1d(p["final_proj"], h * m)
    return out * m


__all__ = ["DecoderConfig", "init_conditional_decoder",
           "conditional_decoder"]
