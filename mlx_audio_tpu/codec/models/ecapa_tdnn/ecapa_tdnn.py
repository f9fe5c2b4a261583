"""ECAPA-TDNN speaker-embedding backbone (shared by LID + speaker encoders).

Parity: /root/reference/mlx_audio/codec/models/ecapa_tdnn/ecapa_tdnn.py
(TDNNBlock :7, Res2Net :31, SE :59, SERes2Net :72, attentive statistics
pooling :97, backbone :133). Functional channel-last; BatchNorm runs in
inference mode from running stats.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp

from ....nn import apply_conv1d, init_conv1d

Array = jax.Array


@dataclass
class EcapaTdnnConfig:
    input_size: int = 60
    channels: int = 1024
    embed_dim: int = 256
    kernel_sizes: List[int] = field(default_factory=lambda: [5, 3, 3, 3, 1])
    dilations: List[int] = field(default_factory=lambda: [1, 2, 3, 4, 1])
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = False


def init_batch_norm(dim: int) -> dict:
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,)),
            "running_mean": jnp.zeros((dim,)),
            "running_var": jnp.ones((dim,))}


def apply_batch_norm(p: dict, x: Array, eps: float = 1e-5) -> Array:
    return ((x - p["running_mean"]) * jax.lax.rsqrt(p["running_var"] + eps)
            * p["weight"] + p["bias"])


def _init_tdnn(ks, in_ch, out_ch, kernel) -> dict:
    return {"conv": init_conv1d(next(ks), in_ch, out_ch, kernel),
            "norm": init_batch_norm(out_ch)}


def _tdnn(p, x, kernel, dilation=1):
    pad = (kernel - 1) * dilation // 2
    return apply_batch_norm(
        p["norm"], jax.nn.relu(
            apply_conv1d(p["conv"], x, padding=pad, dilation=dilation)))


def init_ecapa_backbone(key, cfg: EcapaTdnnConfig) -> dict:
    ks = iter(jax.random.split(key, 128))
    ch = cfg.channels
    hidden = ch // cfg.res2net_scale

    def se_res2net(k_idx):
        return {
            "tdnn1": _init_tdnn(ks, ch, ch, 1),
            "res2net_block": {"blocks": {
                str(i): _init_tdnn(ks, hidden, hidden,
                                   cfg.kernel_sizes[k_idx])
                for i in range(cfg.res2net_scale - 1)}},
            "tdnn2": _init_tdnn(ks, ch, ch, 1),
            "se_block": {
                "conv1": init_conv1d(next(ks), ch, cfg.se_channels, 1),
                "conv2": init_conv1d(next(ks), cfg.se_channels, ch, 1),
            },
        }

    asp_in = ch * 3 * 3 if cfg.global_context else ch * 3
    return {
        "block0": _init_tdnn(ks, cfg.input_size, ch, cfg.kernel_sizes[0]),
        "block1": se_res2net(1),
        "block2": se_res2net(2),
        "block3": se_res2net(3),
        "mfa": _init_tdnn(ks, ch * 3, ch * 3, cfg.kernel_sizes[4]),
        "asp": {
            "tdnn": _init_tdnn(ks, asp_in, cfg.attention_channels, 1),
            "conv": init_conv1d(next(ks), cfg.attention_channels, ch * 3, 1),
        },
        "asp_bn": init_batch_norm(ch * 6),
        "fc": init_conv1d(next(ks), ch * 6, cfg.embed_dim, 1),
    }


def _se_res2net(p, x, cfg: EcapaTdnnConfig, kernel, dilation):
    out = _tdnn(p["tdnn1"], x, 1)
    chunks = jnp.split(out, cfg.res2net_scale, axis=-1)
    ys = [chunks[0]]
    for i in range(cfg.res2net_scale - 1):
        inp = chunks[i + 1] + ys[-1] if i > 0 else chunks[i + 1]
        ys.append(_tdnn(p["res2net_block"]["blocks"][str(i)], inp, kernel,
                        dilation))
    out = jnp.concatenate(ys, axis=-1)
    out = _tdnn(p["tdnn2"], out, 1)
    s = jnp.mean(out, axis=1, keepdims=True)
    s = jax.nn.relu(apply_conv1d(p["se_block"]["conv1"], s))
    s = jax.nn.sigmoid(apply_conv1d(p["se_block"]["conv2"], s))
    return out * s + x


def ecapa_backbone(p: dict, cfg: EcapaTdnnConfig, x: Array) -> Array:
    """mel (B, T, n_mels) -> embedding (B, embed_dim)."""
    out = _tdnn(p["block0"], x, cfg.kernel_sizes[0], cfg.dilations[0])
    xs = []
    for name, ki in (("block1", 1), ("block2", 2), ("block3", 3)):
        out = _se_res2net(p[name], out, cfg, cfg.kernel_sizes[ki],
                          cfg.dilations[ki])
        xs.append(out)
    out = jnp.concatenate(xs, axis=-1)
    out = _tdnn(p["mfa"], out, cfg.kernel_sizes[4], cfg.dilations[4])
    # attentive statistics pooling
    if cfg.global_context:
        m = jnp.mean(out, axis=1, keepdims=True)
        s = jnp.sqrt(jnp.var(out, axis=1, keepdims=True) + 1e-9)
        attn_in = jnp.concatenate([
            out, jnp.broadcast_to(m, out.shape),
            jnp.broadcast_to(s, out.shape)], axis=-1)
    else:
        attn_in = out
    attn = _tdnn(p["asp"]["tdnn"], attn_in, 1)
    attn = apply_conv1d(p["asp"]["conv"], jnp.tanh(attn))
    attn = jax.nn.softmax(attn, axis=1)
    mean = jnp.sum(attn * out, axis=1)
    var = jnp.sum(attn * out * out, axis=1) - mean * mean
    std = jnp.sqrt(jnp.maximum(var, 1e-9))
    pooled = jnp.concatenate([mean, std], axis=-1)
    pooled = apply_batch_norm(p["asp_bn"], pooled)
    return apply_conv1d(p["fc"], pooled[:, None, :])[:, 0, :]
