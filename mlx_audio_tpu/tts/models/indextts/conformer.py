"""IndexTTS conditioning encoder: NeMo-style conformer + perceiver.

Parity: /root/reference/mlx_audio/tts/models/indextts/conformer.py
(Conv2dSubsampling :148, ConformerBlock :91, Conformer :210),
attention.py (RelPositionMultiHeadAttention :55 — SDPA on (q+u)·k with the
(q+v)·p position term folded in as an additive mask; RelPositionalEncoding
:131 returns absolute sinusoids from `offset`), perceiver.py
(PerceiverResampler :23 — 32 learned latents cross-attend [ctx|latents]).

TPU notes: the whole conditioning stack is a single feed-forward trace —
conv2d subsampling lands on the MXU as NHWC convs, the rel-pos bias is a
plain batched matmul, and the perceiver is two cross-attention blocks.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn import (
    apply_conv1d,
    apply_conv2d,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_conv2d,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention

Array = jax.Array

_SUBSAMPLE_LAYERS = {
    "conv2d": [(3, 2), (3, 2)],
    "conv2d2": [(3, 2)],
    "conv2d3": [(5, 3)],
    "conv2d4": [(3, 2), (3, 2)],
    "conv2d6": [(3, 2), (5, 3)],
    "conv2d8": [(3, 2), (3, 2), (3, 2)],
}


@dataclass
class ConformerArgs:
    input_size: int = 100
    output_size: int = 256
    num_blocks: int = 6
    linear_units: int = 2048
    attention_heads: int = 4
    pos_enc_layer_type: str = "rel_pos"
    input_layer: str = "conv2d"
    cnn_module_kernel: int = 15
    pos_emb_max_len: int = 2048
    use_bias: bool = True
    xscaling: bool = True
    macaron_style: bool = False
    perceiver_mult: int = 2

    @property
    def head_dim(self) -> int:
        return self.output_size // self.attention_heads

    @property
    def subsampled_freq(self) -> int:
        f = self.input_size
        for kernel, stride in _SUBSAMPLE_LAYERS[self.input_layer]:
            f = (f - kernel + stride) // stride
        return f


def _sinusoid_pe(length: int, dim: int) -> jnp.ndarray:
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / dim))
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


# ------------------------------------------------------------------- init

def init_conformer(key, a: ConformerArgs) -> dict:
    ks = iter(jax.random.split(key, 24 * a.num_blocks + 16))
    d = a.output_size

    embed = {"conv": {}}
    in_ch = 1
    for li, (kernel, _) in enumerate(_SUBSAMPLE_LAYERS[a.input_layer]):
        embed["conv"][str(2 * li)] = init_conv2d(next(ks), in_ch, d, kernel)
        in_ch = d
    embed["out"] = {"0": init_linear(next(ks), d * a.subsampled_freq, d)}

    def block():
        hd = a.head_dim
        p = {
            "norm_mha": init_layer_norm(d),
            "self_attn": {
                "linear_q": init_linear(next(ks), d, d, bias=a.use_bias),
                "linear_k": init_linear(next(ks), d, d, bias=a.use_bias),
                "linear_v": init_linear(next(ks), d, d, bias=a.use_bias),
                "linear_out": init_linear(next(ks), d, d, bias=a.use_bias),
                "linear_pos": init_linear(next(ks), d, d, bias=False),
                "pos_bias_u": jnp.zeros((a.attention_heads, hd)),
                "pos_bias_v": jnp.zeros((a.attention_heads, hd)),
            },
            "norm_conv": init_layer_norm(d),
            "conv_module": {
                "pointwise_conv1": init_conv1d(next(ks), d, 2 * d, 1,
                                               bias=a.use_bias),
                "depthwise_conv": init_conv1d(next(ks), 1, d,
                                              a.cnn_module_kernel,
                                              bias=a.use_bias),
                "norm": init_layer_norm(d),
                "pointwise_conv2": init_conv1d(next(ks), d, d, 1,
                                               bias=a.use_bias),
            },
            "norm_ff": init_layer_norm(d),
            "feed_forward": {
                "w_1": init_linear(next(ks), d, a.linear_units,
                                   bias=a.use_bias),
                "w_2": init_linear(next(ks), a.linear_units, d,
                                   bias=a.use_bias),
            },
            "norm_final": init_layer_norm(d),
        }
        if a.macaron_style:
            p["norm_ff_macaron"] = init_layer_norm(d)
            p["feed_forward_macaron"] = {
                "w_1": init_linear(next(ks), d, a.linear_units,
                                   bias=a.use_bias),
                "w_2": init_linear(next(ks), a.linear_units, d,
                                   bias=a.use_bias),
            }
        return p

    return {
        "embed": embed,
        "encoders": {str(i): block() for i in range(a.num_blocks)},
        "after_norm": init_layer_norm(d),
    }


# ---------------------------------------------------------------- forward

def _subsample(p: dict, a: ConformerArgs, x: Array) -> Array:
    """mel (B, T, input_size) -> (B, T', output_size)."""
    h = x[..., None]  # (B, T, F, 1) NHWC
    for li, (kernel, stride) in enumerate(_SUBSAMPLE_LAYERS[a.input_layer]):
        h = apply_conv2d(p["conv"][str(2 * li)], h,
                         stride=(stride, stride))
        h = jax.nn.relu(h)
    b, t, f, c = h.shape
    h = jnp.swapaxes(h, 2, 3).reshape(b, t, c * f)
    return apply_linear(p["out"]["0"], h)


def _rel_attn(p: dict, a: ConformerArgs, x: Array, pos_emb: Array) -> Array:
    b, t, d = x.shape
    h, hd = a.attention_heads, a.head_dim
    q = apply_linear(p["linear_q"], x).reshape(b, t, h, hd)
    k = apply_linear(p["linear_k"], x).reshape(b, t, h, hd)
    v = apply_linear(p["linear_v"], x).reshape(b, t, h, hd)
    pp = apply_linear(p["linear_pos"], pos_emb).reshape(
        1, -1, h, hd)
    q_u = q + p["pos_bias_u"]
    q_v = q + p["pos_bias_v"]
    scale = hd ** -0.5
    # position term as an additive bias on the content scores
    bias = jnp.einsum("bthd,bshd->bhts", q_v,
                      jnp.broadcast_to(pp, (b, *pp.shape[1:]))) * scale
    o = attention(q_u, k, v, mask=bias)
    return apply_linear(p["linear_out"], o.reshape(b, t, d))


def _conv_module(p: dict, a: ConformerArgs, x: Array) -> Array:
    h = apply_conv1d(p["pointwise_conv1"], x)
    gates = jnp.split(h, 2, axis=-1)
    h = gates[0] * jax.nn.sigmoid(gates[1])
    h = apply_conv1d(p["depthwise_conv"], h,
                     padding=(a.cnn_module_kernel - 1) // 2,
                     groups=a.output_size)
    h = apply_layer_norm(p["norm"], h)
    h = jax.nn.silu(h)
    return apply_conv1d(p["pointwise_conv2"], h)


def _ff(p: dict, x: Array) -> Array:
    return apply_linear(p["w_2"], jax.nn.silu(apply_linear(p["w_1"], x)))


def conformer_forward(p: dict, a: ConformerArgs, mel: Array) -> Array:
    """log-mel (B, T, input_size) -> conditioning states (B, T', d)."""
    x = _subsample(p["embed"], a, mel)
    scale = math.sqrt(a.output_size) if a.xscaling else 1.0
    x = x * scale
    pos_emb = _sinusoid_pe(x.shape[1], a.output_size)[None]
    ff_scale = 0.5 if a.macaron_style else 1.0
    for i in range(a.num_blocks):
        blk = p["encoders"][str(i)]
        if a.macaron_style:
            x = x + ff_scale * _ff(blk["feed_forward_macaron"],
                                   apply_layer_norm(blk["norm_ff_macaron"],
                                                    x))
        x = x + _rel_attn(blk["self_attn"], a,
                          apply_layer_norm(blk["norm_mha"], x), pos_emb)
        x = x + _conv_module(blk["conv_module"], a,
                             apply_layer_norm(blk["norm_conv"], x))
        x = x + ff_scale * _ff(blk["feed_forward"],
                               apply_layer_norm(blk["norm_ff"], x))
        x = apply_layer_norm(blk["norm_final"], x)
    return apply_layer_norm(p["after_norm"], x)


# --------------------------------------------------------------- perceiver

def init_perceiver(key, n_dim: int, n_dim_context: int, n_heads: int,
                   n_ff_mult: int, n_latents: int = 32, n_depth: int = 2,
                   n_dim_head: int = 64) -> dict:
    ks = iter(jax.random.split(key, 8 * n_depth + 8))
    d_ff = (n_dim * n_ff_mult * 2) // 3
    p = {"latents": jnp.zeros((n_latents, n_dim)),
         "norm": {"weight": jnp.ones(n_dim)},
         "layers": {}}
    if n_dim_context != n_dim:
        p["proj_context"] = init_linear(next(ks), n_dim_context, n_dim)
    for i in range(n_depth):
        p["layers"][str(i)] = {
            "0": {
                "linear_q": init_linear(next(ks), n_dim,
                                        n_dim_head * n_heads, bias=False),
                "linear_k": init_linear(next(ks), n_dim,
                                        n_dim_head * n_heads, bias=False),
                "linear_v": init_linear(next(ks), n_dim,
                                        n_dim_head * n_heads, bias=False),
                "linear_out": init_linear(next(ks), n_dim_head * n_heads,
                                          n_dim, bias=False),
            },
            "1": {
                "w_1": init_linear(next(ks), n_dim, d_ff * 2),
                "w_2": init_linear(next(ks), d_ff, n_dim),
            },
        }
    return p


def perceiver_forward(p: dict, x: Array, n_heads: int,
                      n_dim_head: int = 64) -> Array:
    """context (B, T, d_ctx) -> latents (B, n_latents, d)."""
    b = x.shape[0]
    lat = jnp.broadcast_to(p["latents"], (b, *p["latents"].shape))
    if "proj_context" in p:
        x = apply_linear(p["proj_context"], x)
    for i in sorted(p["layers"], key=int):
        layer = p["layers"][i]
        att, ff = layer["0"], layer["1"]
        kv = jnp.concatenate([x, lat], axis=-2)
        nl, s = lat.shape[1], kv.shape[1]
        q = apply_linear(att["linear_q"], lat).reshape(b, nl, n_heads,
                                                       n_dim_head)
        k = apply_linear(att["linear_k"], kv).reshape(b, s, n_heads,
                                                      n_dim_head)
        v = apply_linear(att["linear_v"], kv).reshape(b, s, n_heads,
                                                      n_dim_head)
        o = attention(q, k, v).reshape(b, nl, -1)
        lat = lat + apply_linear(att["linear_out"], o)
        h, gate = jnp.split(apply_linear(ff["w_1"], lat), 2, axis=-1)
        lat = lat + apply_linear(ff["w_2"], jax.nn.gelu(gate) * h)
    w = p["norm"]["weight"]
    x32 = lat.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + 1e-5)
    return (x32 * w).astype(lat.dtype)
