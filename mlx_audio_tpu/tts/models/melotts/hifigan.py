"""HiFi-GAN generator for MeloTTS (channel-last).

Parity: reference tts/models/melotts/hifigan.py — conv_pre(7), speaker
cond 1x1, ConvTranspose upsample stack, multi-receptive-field ResBlock1/2
averaged per stage, conv_post(7, no bias) + tanh (:122-193).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from ....nn import (apply_conv1d, apply_conv_transpose1d, init_conv1d,
                    init_conv_transpose1d)

Array = jax.Array
LRELU_SLOPE = 0.1


def _lrelu(x: Array) -> Array:
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def _pad_for(kernel: int, dilation: int = 1) -> int:
    return (kernel * dilation - dilation) // 2


def init_resblock1(key, channels, kernel, dilations):
    ks = iter(jax.random.split(key, 2 * len(dilations)))
    return {"convs1": {str(i): init_conv1d(next(ks), channels, channels,
                                           kernel)
                       for i in range(len(dilations))},
            "convs2": {str(i): init_conv1d(next(ks), channels, channels,
                                           kernel)
                       for i in range(len(dilations))}}


def apply_resblock1(p, x, kernel, dilations):
    for i, d in enumerate(dilations):
        h = apply_conv1d(p["convs1"][str(i)], _lrelu(x),
                         padding=_pad_for(kernel, d), dilation=d)
        h = apply_conv1d(p["convs2"][str(i)], _lrelu(h),
                         padding=_pad_for(kernel))
        x = x + h
    return x


def init_resblock2(key, channels, kernel, dilations):
    ks = iter(jax.random.split(key, len(dilations)))
    return {"convs": {str(i): init_conv1d(next(ks), channels, channels,
                                          kernel)
                      for i in range(len(dilations))}}


def apply_resblock2(p, x, kernel, dilations):
    for i, d in enumerate(dilations):
        h = apply_conv1d(p["convs"][str(i)], _lrelu(x),
                         padding=_pad_for(kernel, d), dilation=d)
        x = x + h
    return x


def init_generator(key, initial_channel, resblock, resblock_kernel_sizes,
                   resblock_dilation_sizes, upsample_rates,
                   upsample_initial_channel, upsample_kernel_sizes,
                   gin_channels=0):
    n_up = len(upsample_rates)
    n_res = n_up * len(resblock_kernel_sizes)
    ks = iter(jax.random.split(key, 4 + n_up + n_res))
    p = {"conv_pre": init_conv1d(next(ks), initial_channel,
                                 upsample_initial_channel, 7),
         "ups": {}, "resblocks": {}}
    for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
        p["ups"][str(i)] = init_conv_transpose1d(
            next(ks), upsample_initial_channel // (2 ** i),
            upsample_initial_channel // (2 ** (i + 1)), k)
    init_res = init_resblock1 if resblock == "1" else init_resblock2
    for i in range(n_up):
        ch = upsample_initial_channel // (2 ** (i + 1))
        for j, (k, d) in enumerate(zip(resblock_kernel_sizes,
                                       resblock_dilation_sizes)):
            p["resblocks"][str(i * len(resblock_kernel_sizes) + j)] = \
                init_res(next(ks), ch, k, d)
    p["conv_post"] = init_conv1d(next(ks), ch, 1, 7, bias=False)
    if gin_channels:
        p["cond"] = init_conv1d(next(ks), gin_channels,
                                upsample_initial_channel, 1)
    return p


def apply_generator(p, x: Array, cfg, g: Optional[Array] = None) -> Array:
    """x (B, T, C_latent) -> (B, samples, 1)."""
    x = apply_conv1d(p["conv_pre"], x, padding=3)
    if g is not None and "cond" in p:
        x = x + apply_conv1d(p["cond"], g)
    n_k = len(cfg.resblock_kernel_sizes)
    apply_res = apply_resblock1 if cfg.resblock == "1" else apply_resblock2
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        x = _lrelu(x)
        x = apply_conv_transpose1d(p["ups"][str(i)], x, stride=u,
                                   padding=(k - u) // 2)
        xs = None
        for j in range(n_k):
            out = apply_res(p["resblocks"][str(i * n_k + j)], x,
                            cfg.resblock_kernel_sizes[j],
                            cfg.resblock_dilation_sizes[j])
            xs = out if xs is None else xs + out
        x = xs / n_k
    x = apply_conv1d(p["conv_post"], _lrelu(x), padding=3)
    return jnp.tanh(x)
