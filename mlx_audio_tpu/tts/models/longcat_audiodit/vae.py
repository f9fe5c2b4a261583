"""LongCat AudioDiT WAV-VAE (24 kHz, latent_dim=64, 2048x hop).

Parity: /root/reference/mlx_audio/tts/models/longcat_audiodit/vae.py —
SnakeBeta residual stacks with averaging/duplicating pixel-shuffle
shortcuts, VAE reparameterized encode (softplus stdev), scale 0.71.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp

from ....nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    init_conv1d,
    init_conv_transpose1d,
)

Array = jax.Array


@dataclass
class VaeConfig:
    in_channels: int = 1
    channels: int = 128
    c_mults: List[int] = field(default_factory=lambda: [1, 2, 4, 8, 16])
    strides: List[int] = field(default_factory=lambda: [2, 4, 4, 8, 8])
    latent_dim: int = 64
    encoder_latent_dim: int = 128
    use_snake: bool = True
    downsample_shortcut: str = "averaging"
    upsample_shortcut: str = "duplicating"
    out_shortcut: str = "averaging"
    in_shortcut: str = "duplicating"
    final_tanh: bool = False
    downsampling_ratio: int = 2048
    sample_rate: int = 24000
    scale: float = 0.71


def _act_init(use_snake: bool, ch: int) -> dict:
    if use_snake:
        return {"alpha": jnp.zeros((ch,)), "beta": jnp.zeros((ch,))}
    return {}


def _act(p: dict, x: Array, use_snake: bool) -> Array:
    if use_snake:
        alpha = jnp.exp(p["alpha"])
        beta = jnp.exp(p["beta"])
        return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))
    return jax.nn.elu(x)


def _res_unit_init(ks, in_ch, out_ch, use_snake, kernel=7):
    return {"layers": {
        "0": _act_init(use_snake, out_ch),
        "1": init_conv1d(next(ks), in_ch, out_ch, kernel),
        "2": _act_init(use_snake, out_ch),
        "3": init_conv1d(next(ks), out_ch, out_ch, 1),
    }}


def _res_unit(p, x, dilation, use_snake, kernel=7):
    pad = (dilation * (kernel - 1)) // 2
    h = _act(p["layers"]["0"], x, use_snake)
    h = apply_conv1d(p["layers"]["1"], h, padding=pad, dilation=dilation)
    h = _act(p["layers"]["2"], h, use_snake)
    h = apply_conv1d(p["layers"]["3"], h)
    return x + h


def _pixel_unshuffle(x: Array, f: int) -> Array:
    b, w, c = x.shape
    return jnp.transpose(x.reshape(b, w // f, f, c),
                         (0, 1, 3, 2)).reshape(b, w // f, c * f)


def _pixel_shuffle(x: Array, f: int) -> Array:
    b, w, c = x.shape
    return jnp.transpose(x.reshape(b, w, c // f, f),
                         (0, 1, 3, 2)).reshape(b, w * f, c // f)


def _down_shortcut(x: Array, out_ch: int, f: int) -> Array:
    x = _pixel_unshuffle(x, f)
    b, n, c = x.shape
    return x.reshape(b, n, out_ch, c // out_ch).mean(axis=3)


def _up_shortcut(x: Array, out_ch: int, f: int) -> Array:
    reps = out_ch * f // x.shape[2]
    return _pixel_shuffle(jnp.repeat(x, reps, axis=2), f)


def init_vae(key, c: VaeConfig) -> dict:
    ks = iter(jax.random.split(key, 64 * len(c.c_mults) + 32))
    cm = [1] + list(c.c_mults)
    ch = c.channels
    snake = c.use_snake

    enc = {"layers": {"0": init_conv1d(next(ks), c.in_channels,
                                       cm[0] * ch, 7)}}
    for i in range(len(cm) - 1):
        stride = c.strides[i]
        enc["layers"][str(i + 1)] = {"layers": {
            "0": _res_unit_init(ks, cm[i] * ch, cm[i] * ch, snake),
            "1": _res_unit_init(ks, cm[i] * ch, cm[i] * ch, snake),
            "2": _res_unit_init(ks, cm[i] * ch, cm[i] * ch, snake),
            "3": _act_init(snake, cm[i] * ch),
            "4": init_conv1d(next(ks), cm[i] * ch, cm[i + 1] * ch,
                             2 * stride),
        }}
    enc["layers"][str(len(cm))] = init_conv1d(next(ks), cm[-1] * ch,
                                              c.encoder_latent_dim, 3)

    dec = {"layers": {"0": init_conv1d(next(ks), c.latent_dim,
                                       cm[-1] * ch, 7)}}
    for j, i in enumerate(range(len(cm) - 1, 0, -1)):
        stride = c.strides[i - 1]
        dec["layers"][str(j + 1)] = {"layers": {
            "0": _act_init(snake, cm[i] * ch),
            "1": init_conv_transpose1d(next(ks), cm[i] * ch,
                                       cm[i - 1] * ch, 2 * stride),
            "2": _res_unit_init(ks, cm[i - 1] * ch, cm[i - 1] * ch, snake),
            "3": _res_unit_init(ks, cm[i - 1] * ch, cm[i - 1] * ch, snake),
            "4": _res_unit_init(ks, cm[i - 1] * ch, cm[i - 1] * ch, snake),
        }}
    n = len(cm)
    dec["layers"][str(n)] = _act_init(snake, cm[0] * ch)
    dec["layers"][str(n + 1)] = init_conv1d(next(ks), cm[0] * ch,
                                            c.in_channels, 7, bias=False)
    return {"encoder": enc, "decoder": dec}


def vae_encode(p: dict, c: VaeConfig, audio: Array, key: Array) -> Array:
    """audio (B, L, 1) -> latent (B, T, latent_dim) (reparameterized)."""
    cm = [1] + list(c.c_mults)
    ch = c.channels
    snake = c.use_snake
    x = apply_conv1d(p["encoder"]["layers"]["0"], audio, padding=3)
    for i in range(len(cm) - 1):
        stride = c.strides[i]
        blk = p["encoder"]["layers"][str(i + 1)]["layers"]
        h = x
        for j, dil in enumerate((1, 3, 9)):
            h = _res_unit(blk[str(j)], h, dil, snake)
        h = _act(blk["3"], h, snake)
        h = apply_conv1d(blk["4"], h, stride=stride,
                         padding=math.ceil(stride / 2))
        if c.downsample_shortcut == "averaging":
            h = h + _down_shortcut(x, cm[i + 1] * ch, stride)
        x = h
    out = apply_conv1d(p["encoder"]["layers"][str(len(cm))], x, padding=1)
    if c.out_shortcut == "averaging":
        out = out + _down_shortcut(x, c.encoder_latent_dim, 1)
    mean, scale_param = jnp.split(out, 2, axis=-1)
    stdev = jax.nn.softplus(scale_param) + 1e-4
    latents = jax.random.normal(key, mean.shape) * stdev + mean
    return latents / c.scale


def vae_decode(p: dict, c: VaeConfig, latents: Array) -> Array:
    """latent (B, T, latent_dim) -> audio (B, T*ratio, 1)."""
    cm = [1] + list(c.c_mults)
    ch = c.channels
    snake = c.use_snake
    z = latents * c.scale
    x = apply_conv1d(p["decoder"]["layers"]["0"], z, padding=3)
    if c.in_shortcut == "duplicating":
        x = x + _up_shortcut(z, cm[-1] * ch, 1)
    for j, i in enumerate(range(len(cm) - 1, 0, -1)):
        stride = c.strides[i - 1]
        blk = p["decoder"]["layers"][str(j + 1)]["layers"]
        h = _act(blk["0"], x, snake)
        h = apply_conv_transpose1d(blk["1"], h, stride=stride,
                                   padding=math.ceil(stride / 2))
        for r, dil in enumerate((1, 3, 9)):
            h = _res_unit(blk[str(r + 2)], h, dil, snake)
        if c.upsample_shortcut == "duplicating":
            h = h + _up_shortcut(x, cm[i - 1] * ch, stride)
        x = h
    n = len(cm)
    x = _act(p["decoder"]["layers"][str(n)], x, snake)
    x = apply_conv1d(p["decoder"]["layers"][str(n + 1)], x, padding=3)
    return jnp.tanh(x) if c.final_tanh else x
