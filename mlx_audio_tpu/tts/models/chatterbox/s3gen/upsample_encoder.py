"""Upsample conformer encoder shared by chatterbox s3gen and stepaudio2.

Parity: reference tts/models/chatterbox/s3gen/transformer/upsample_encoder.py
and codec/models/stepaudio2/upsample_encoder_v2.py — linear embed +
LayerNorm + x*sqrt(d), ESPnet relative-position conformer blocks (attn+ffn
only, norms eps 1e-12), PreLookaheadLayer (right-context conv + causal
conv residual), repeat-upsample + causal conv (kernel 2s+1, left pad 2s),
second conformer stack, final LayerNorm.

The ESPnet rel-pos attention is the shared parakeet implementation
(linear_q/k/v/out/pos + pos_bias_u/v with the Transformer-XL shift).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .....nn import (apply_conv1d, apply_layer_norm, apply_linear,
                     init_conv1d, init_layer_norm, init_linear)
from .....stt.models.parakeet.conformer import (_rel_pos_attention,
                                                rel_pos_encoding)
from .....stt.models.parakeet.conformer import ConformerArgs as _PkArgs

Array = jax.Array


def init_espnet_block(ks, d: int, heads: int, ffn: int) -> dict:
    return {
        "self_attn": {
            "linear_q": init_linear(next(ks), d, d),
            "linear_k": init_linear(next(ks), d, d),
            "linear_v": init_linear(next(ks), d, d),
            "linear_out": init_linear(next(ks), d, d),
            "linear_pos": init_linear(next(ks), d, d, bias=False),
            "pos_bias_u": jnp.zeros((heads, d // heads)),
            "pos_bias_v": jnp.zeros((heads, d // heads))},
        "norm_mha": init_layer_norm(d),
        "norm_ff": init_layer_norm(d),
        "feed_forward": {"w_1": init_linear(next(ks), d, ffn),
                         "w_2": init_linear(next(ks), ffn, d)}}


def init_upsample_encoder(ks, d: int, heads: int, ffn: int,
                          num_blocks: int, num_up_blocks: int,
                          up_stride: int, pre_lookahead_len: int) -> dict:
    return {
        "embed": {"linear": init_linear(next(ks), d, d),
                  "norm": init_layer_norm(d)},
        "pre_lookahead_layer": {
            "conv1": init_conv1d(next(ks), d, d, pre_lookahead_len + 1),
            "conv2": init_conv1d(next(ks), d, d, 3)},
        "encoders": {str(i): init_espnet_block(ks, d, heads, ffn)
                     for i in range(num_blocks)},
        "up_layer": {"conv": init_conv1d(next(ks), d, d,
                                         up_stride * 2 + 1)},
        "up_embed": {"linear": init_linear(next(ks), d, d),
                     "norm": init_layer_norm(d)},
        "up_encoders": {str(i): init_espnet_block(ks, d, heads, ffn)
                        for i in range(num_up_blocks)},
        "after_norm": init_layer_norm(d)}


def espnet_stack(p_layers: dict, n: int, d: int, heads: int, x: Array,
                 pos_emb: Array, mask) -> Array:
    pa = _PkArgs(d_model=d, n_heads=heads)
    for i in range(n):
        blk = p_layers[str(i)]
        h = apply_layer_norm(blk["norm_mha"], x, eps=1e-12)
        x = x + _rel_pos_attention(blk["self_attn"], pa, h, pos_emb, mask)
        h = apply_layer_norm(blk["norm_ff"], x, eps=1e-12)
        f = blk["feed_forward"]
        x = x + apply_linear(f["w_2"],
                             jax.nn.silu(apply_linear(f["w_1"], h)))
    return x


def upsample_encode(p: dict, d: int, heads: int, num_blocks: int,
                    num_up_blocks: int, up_stride: int,
                    pre_lookahead_len: int, x: Array,
                    n_valid: Array) -> Array:
    """(B, T, d) embedded tokens -> (B, T*up_stride, d)."""
    t = x.shape[1]
    mask = (jnp.arange(t) < n_valid)[None, None, None, :]
    x = apply_layer_norm(p["embed"]["norm"],
                         apply_linear(p["embed"]["linear"], x), eps=1e-5)
    x = x * math.sqrt(d)
    pos_emb = jnp.asarray(rel_pos_encoding(t, d))
    pl = p["pre_lookahead_layer"]
    h = jnp.pad(x, ((0, 0), (0, pre_lookahead_len), (0, 0)))
    h = jax.nn.leaky_relu(apply_conv1d(pl["conv1"], h), 0.01)
    h = apply_conv1d(pl["conv2"], jnp.pad(h, ((0, 0), (2, 0), (0, 0))))
    x = h + x
    x = espnet_stack(p["encoders"], num_blocks, d, heads, x, pos_emb,
                     mask)
    s = up_stride
    x = jnp.repeat(x, s, axis=1)
    x = jnp.pad(x, ((0, 0), (2 * s, 0), (0, 0)))
    x = apply_conv1d(p["up_layer"]["conv"], x)
    t2 = x.shape[1]
    mask2 = (jnp.arange(t2) < n_valid * s)[None, None, None, :]
    x = apply_layer_norm(p["up_embed"]["norm"],
                         apply_linear(p["up_embed"]["linear"], x),
                         eps=1e-5)
    x = x * math.sqrt(d)
    pos2 = jnp.asarray(rel_pos_encoding(t2, d))
    x = espnet_stack(p["up_encoders"], num_up_blocks, d, heads, x, pos2,
                     mask2)
    return apply_layer_norm(p["after_norm"], x, eps=1e-5)


__all__ = ["init_espnet_block", "init_upsample_encoder", "espnet_stack",
           "upsample_encode"]
