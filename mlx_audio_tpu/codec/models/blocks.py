"""Shared functional blocks for codec families (SNAC/DAC/Encodec/Mimi...).

Weight-normalized convs are folded to dense kernels at load (like kokoro);
everything is channel-last (B, T, C). Parity targets: the per-family `nn`
helpers in /root/reference/mlx_audio/codec/models/*/layers.py.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ...nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    apply_embedding,
    apply_linear,
    init_conv1d,
    init_conv_transpose1d,
    init_embedding,
    init_linear,
)

Array = jax.Array


def snake(x: Array, alpha: Array) -> Array:
    """x + (1/alpha) sin^2(alpha x); alpha (C,)."""
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


def init_snake(channels: int) -> dict:
    return {"alpha": jnp.ones((channels,))}


def apply_snake(p: dict, x: Array) -> Array:
    return snake(x, p["alpha"].reshape(-1))


# -- residual unit (Snake -> conv k7 dil -> Snake -> conv 1x1), centered ----


def init_residual_unit(key, dim: int, dilation: int, kernel: int = 7,
                       groups: int = 1) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "block": {
            "0": init_snake(dim),
            "1": init_conv1d(k1, dim, dim, kernel, groups=groups),
            "2": init_snake(dim),
            "3": init_conv1d(k2, dim, dim, 1),
        },
    }


def apply_residual_unit(p: dict, x: Array, dilation: int, kernel: int = 7,
                        groups: int = 1) -> Array:
    pad = ((kernel - 1) * dilation) // 2
    b = p["block"]
    y = apply_snake(b["0"], x)
    y = apply_conv1d(b["1"], y, padding=pad, dilation=dilation, groups=groups)
    y = apply_snake(b["2"], y)
    y = apply_conv1d(b["3"], y)
    trim = (x.shape[-2] - y.shape[-2]) // 2
    if trim > 0:
        x = x[..., trim:-trim, :]
    return x + y


# -- vector quantization -----------------------------------------------------


def vq_encode(latents: Array, codebook: Array, normalized: bool = True) -> Array:
    """Nearest-codebook-entry indices. latents (B, T, D), codebook (N, D).

    normalized=True uses cosine (L2-normalized) distance (SNAC); False uses
    plain euclidean (Encodec/DAC-style euclidean codebooks).
    """
    if normalized:
        latents = latents / (jnp.linalg.norm(latents, axis=-1, keepdims=True)
                             + 1e-8)
        codebook = codebook / (jnp.linalg.norm(codebook, axis=-1,
                                               keepdims=True) + 1e-8)
    dist = (
        jnp.sum(latents ** 2, axis=-1, keepdims=True)
        - 2 * jnp.einsum("btd,nd->btn", latents, codebook)
        + jnp.sum(codebook ** 2, axis=-1)[None, None, :]
    )
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def avg_pool_time(x: Array, stride: int) -> Array:
    """(B, T, C) -> (B, T//stride, C) mean pooling."""
    b, t, c = x.shape
    t2 = t // stride
    return jnp.mean(x[:, : t2 * stride].reshape(b, t2, stride, c), axis=2)


def repeat_time(x: Array, stride: int) -> Array:
    return jnp.repeat(x, stride, axis=-2)
