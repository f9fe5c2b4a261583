"""TADA codec: DAC waveform coder + segment-masked local attention.

Parity: /root/reference/mlx_audio/tts/models/tada/codec.py
(Snake residual units, WavEncoder/DACDecoder stride stacks, interleaved
RoPE LocalSelfAttention with post-norm, create_segment_attention_mask v1/v2
:303-344, CodecDecoder.generate :346-390, CodecEncoder.forward :392-497).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_conv_transpose1d,
    init_embedding,
    init_layer_norm,
    init_linear,
)

Array = jax.Array


def _snake(alpha: Array, x: Array) -> Array:
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


def _init_res_unit(ks, dim: int, dilation: int) -> dict:
    return {"snake1": {"alpha": jnp.ones((1, 1, dim))},
            "conv1": init_conv1d(next(ks), dim, dim, 7),
            "snake2": {"alpha": jnp.ones((1, 1, dim))},
            "conv2": init_conv1d(next(ks), dim, dim, 1)}


def _res_unit(p, x, dilation: int) -> Array:
    pad = ((7 - 1) * dilation) // 2
    h = _snake(p["snake1"]["alpha"], x)
    h = apply_conv1d(p["conv1"], h, padding=pad, dilation=dilation)
    h = _snake(p["snake2"]["alpha"], h)
    return x + apply_conv1d(p["conv2"], h)


def init_wav_encoder(key, d_model: int, strides: List[int],
                     d_latent: int) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * len(strides)))
    p = {"conv_in": init_conv1d(next(ks), 1, d_model, 7)}
    blocks = {}
    d = d_model
    for i, s in enumerate(strides):
        d *= 2
        blocks[str(i)] = {
            "res1": _init_res_unit(ks, d // 2, 1),
            "res2": _init_res_unit(ks, d // 2, 3),
            "res3": _init_res_unit(ks, d // 2, 9),
            "snake": {"alpha": jnp.ones((1, 1, d // 2))},
            "conv": init_conv1d(next(ks), d // 2, d, 2 * s)}
    p["blocks"] = blocks
    p["snake_out"] = {"alpha": jnp.ones((1, 1, d))}
    p["conv_out"] = init_conv1d(next(ks), d, d_latent, 3)
    return p


def wav_encoder_forward(p: dict, strides: List[int], x: Array) -> Array:
    """(B, T, 1) -> (B, T/prod(strides), d_latent)."""
    x = apply_conv1d(p["conv_in"], x, padding=3)
    for i, s in enumerate(strides):
        blk = p["blocks"][str(i)]
        x = _res_unit(blk["res1"], x, 1)
        x = _res_unit(blk["res2"], x, 3)
        x = _res_unit(blk["res3"], x, 9)
        x = _snake(blk["snake"]["alpha"], x)
        x = apply_conv1d(blk["conv"], x, stride=s,
                         padding=math.ceil(s / 2))
    x = _snake(p["snake_out"]["alpha"], x)
    return apply_conv1d(p["conv_out"], x, padding=1)


def init_dac_decoder(key, d_model: int, strides: List[int],
                     d_latent: int) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * len(strides)))
    mult = 2 ** len(strides)
    p = {"conv_in": init_conv1d(next(ks), d_latent, d_model * mult, 7)}
    blocks = {}
    for i, s in enumerate(strides):
        dim = d_model * mult
        blocks[str(i)] = {
            "snake": {"alpha": jnp.ones((1, 1, dim))},
            "conv_t": init_conv_transpose1d(next(ks), dim, dim // 2, 2 * s),
            "res1": _init_res_unit(ks, dim // 2, 1),
            "res2": _init_res_unit(ks, dim // 2, 3),
            "res3": _init_res_unit(ks, dim // 2, 9)}
        mult //= 2
    p["blocks"] = blocks
    p["snake_out"] = {"alpha": jnp.ones((1, 1, d_model))}
    p["conv_out"] = init_conv1d(next(ks), d_model, 1, 7)
    return p


def dac_decoder_forward(p: dict, strides: List[int], x: Array) -> Array:
    """(B, L, d_latent) -> (B, L*prod(strides), 1) tanh waveform."""
    x = apply_conv1d(p["conv_in"], x, padding=3)
    for i, s in enumerate(strides):
        blk = p["blocks"][str(i)]
        x = _snake(blk["snake"]["alpha"], x)
        pad = math.ceil(s / 2)
        out_pad = s + 2 * pad - 2 * s
        y = apply_conv_transpose1d(blk["conv_t"], x, stride=s)
        # torch ConvTranspose1d(padding=pad, output_padding=out_pad) crops
        # `pad` at both ends then extends by out_pad on the right
        y = y[:, pad: y.shape[1] - pad + out_pad]
        x = y
        x = _res_unit(blk["res1"], x, 1)
        x = _res_unit(blk["res2"], x, 3)
        x = _res_unit(blk["res3"], x, 9)
    x = _snake(p["snake_out"]["alpha"], x)
    return jnp.tanh(apply_conv1d(p["conv_out"], x, padding=3))


# ------------------------------------------------- local attention stack

def init_local_attention(key, d_model: int, num_layers: int, num_heads: int,
                         d_ff: int) -> dict:
    ks = iter(jax.random.split(key, 8 * num_layers + 4))
    layers = {}
    for i in range(num_layers):
        layers[str(i)] = {
            "self_attn": {
                "qkv": init_linear(next(ks), d_model, 3 * d_model),
                "out_proj": init_linear(next(ks), d_model, d_model),
                "layer_norm": init_layer_norm(d_model)},
            "ffn_in": init_linear(next(ks), d_model, d_ff),
            "ffn_out": init_linear(next(ks), d_ff, d_model),
            "norm": init_layer_norm(d_model)}
    return {"layers": layers, "final_norm": init_layer_norm(d_model)}


def _pairwise_rope(x: Array) -> Array:
    """Interleaved-pair rope over (B, H, L, D) with base 10000."""
    b, h, l, d = x.shape
    inv = 1.0 / (10000.0 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = jnp.arange(l, dtype=jnp.float32)[:, None] * inv[None]
    cos = jnp.cos(freqs)[None, None]
    sin = jnp.sin(freqs)[None, None]
    xr = x.reshape(b, h, l, d // 2, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.reshape(b, h, l, d)


def local_attention_forward(p: dict, x: Array, num_heads: int,
                            mask: Optional[Array] = None) -> Array:
    """Post-norm transformer with per-layer interleaved rope; mask True =
    blocked (segment attention)."""
    b, l, d = x.shape
    dh = d // num_heads
    add = None
    if mask is not None:
        add = jnp.where(mask, -jnp.inf, 0.0)
        if add.ndim == 2:
            add = add[None, None]
        elif add.ndim == 3:
            add = add[:, None]
    for i in range(len(p["layers"])):
        lp = p["layers"][str(i)]
        a = lp["self_attn"]
        qkv = apply_linear(a["qkv"], x).reshape(b, l, 3, num_heads, dh)
        q, k, v = [qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3)]
        q = _pairwise_rope(q)
        k = _pairwise_rope(k)
        scores = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(dh)
        if add is not None:
            scores = scores + add
        w = jax.nn.softmax(scores, axis=-1)
        o = (w @ v).transpose(0, 2, 1, 3).reshape(b, l, d)
        x = apply_layer_norm(a["layer_norm"],
                             x + apply_linear(a["out_proj"], o))
        h = apply_linear(lp["ffn_out"],
                         jax.nn.gelu(apply_linear(lp["ffn_in"], x)))
        x = apply_layer_norm(lp["norm"], x + h)
    return apply_layer_norm(p["final_norm"], x)


def segment_attention_mask(token_mask: Array, version: str = "v2") -> Array:
    """(B, L) boundary mask -> (B, L, L) True = blocked (ref :303-344)."""
    block_ids = jnp.cumsum(token_mask, axis=1) - token_mask
    bi = block_ids[:, :, None]
    bj = block_ids[:, None, :]
    same = bj == bi
    if version == "v1":
        bj_ex = jnp.where(token_mask.astype(bool), -10, block_ids)[:, None, :]
        can = same | (bj_ex == bi + 1)
    elif version == "v2":
        can = same | (bj == bi - 1)
    else:
        raise ValueError(f"Unknown version: {version}")
    return ~can


__all__ = ["init_wav_encoder", "wav_encoder_forward", "init_dac_decoder",
           "dac_decoder_forward", "init_local_attention",
           "local_attention_forward", "segment_attention_mask"]
