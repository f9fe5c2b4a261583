"""Functional T5 encoder (text conditioning for SAM-Audio).

Parity: /root/reference/mlx_audio/sts/models/sam_audio/text_encoder.py
(T5LayerNorm :54, gated/ungated FF :71-139, relative-position-bucket
attention :141-306, T5Stack/T5Encoder :360-496).

TPU design: one bucketed jitted forward; the relative position bias is
computed once per (q_len, k_len) inside the jit with pure lax ops.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import apply_embedding, apply_linear, init_embedding, init_linear

Array = jax.Array


@dataclass
class T5Config(BaseModelArgs):
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    is_gated_act: bool = False
    dense_act_fn: str = "relu"


def _t5_layer_norm(p: dict, x: Array, eps: float) -> Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
            ).astype(x.dtype) * p["weight"]


def init_t5_encoder(key, cfg: T5Config) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    inner = cfg.d_kv * cfg.num_heads
    blocks = {}
    for i in range(cfg.num_layers):
        attn = {
            "q": init_linear(next(ks), cfg.d_model, inner, bias=False),
            "k": init_linear(next(ks), cfg.d_model, inner, bias=False),
            "v": init_linear(next(ks), cfg.d_model, inner, bias=False),
            "o": init_linear(next(ks), inner, cfg.d_model, bias=False),
        }
        if i == 0:
            attn["relative_attention_bias"] = init_embedding(
                next(ks), cfg.relative_attention_num_buckets, cfg.num_heads)
        if cfg.is_gated_act:
            ff = {"wi_0": init_linear(next(ks), cfg.d_model, cfg.d_ff,
                                      bias=False),
                  "wi_1": init_linear(next(ks), cfg.d_model, cfg.d_ff,
                                      bias=False),
                  "wo": init_linear(next(ks), cfg.d_ff, cfg.d_model,
                                    bias=False)}
        else:
            ff = {"wi": init_linear(next(ks), cfg.d_model, cfg.d_ff,
                                    bias=False),
                  "wo": init_linear(next(ks), cfg.d_ff, cfg.d_model,
                                    bias=False)}
        blocks[str(i)] = {
            "layer": {"0": {"SelfAttention": attn,
                            "layer_norm": {"weight": jnp.ones(cfg.d_model)}},
                      "1": {"DenseReluDense": ff,
                            "layer_norm": {"weight": jnp.ones(cfg.d_model)}}}
        }
    return {
        "shared": init_embedding(next(ks), cfg.vocab_size, cfg.d_model),
        "encoder": {"block": blocks,
                    "final_layer_norm": {"weight": jnp.ones(cfg.d_model)}},
    }


def _relative_position_bucket(rel_pos: Array, num_buckets: int,
                              max_distance: int) -> Array:
    """Bidirectional T5 bucketing (reference text_encoder.py:170-211)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    log_ratio = jnp.log(n.astype(jnp.float32) / max_exact + 1e-6) \
        / math.log(max_distance / max_exact)
    large = max_exact + (log_ratio * (num_buckets - max_exact)).astype(
        jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


def t5_encode(params: dict, cfg: T5Config, input_ids: Array,
              attention_mask: Optional[Array] = None) -> Array:
    """(B, L) token ids -> (B, L, d_model) hidden states."""
    x = apply_embedding(params["shared"], input_ids)
    b, L = input_ids.shape
    h, dk = cfg.num_heads, cfg.d_kv

    # relative position bias from layer 0's table, shared across layers
    pos = jnp.arange(L)
    rel = pos[None, :] - pos[:, None]                      # (L, L) mem - q
    buckets = _relative_position_bucket(
        rel, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    bias_table = params["encoder"]["block"]["0"]["layer"]["0"][
        "SelfAttention"]["relative_attention_bias"]["weight"]
    bias = bias_table[buckets]                             # (L, L, H)
    bias = jnp.transpose(bias, (2, 0, 1))[None]            # (1, H, L, L)
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                        -jnp.inf)
        bias = bias + pad

    for i in range(cfg.num_layers):
        blk = params["encoder"]["block"][str(i)]["layer"]
        a = blk["0"]["SelfAttention"]
        hn = _t5_layer_norm(blk["0"]["layer_norm"], x,
                            cfg.layer_norm_epsilon)
        q = apply_linear(a["q"], hn).reshape(b, L, h, dk).transpose(
            0, 2, 1, 3)
        k = apply_linear(a["k"], hn).reshape(b, L, h, dk).transpose(
            0, 2, 1, 3)
        v = apply_linear(a["v"], hn).reshape(b, L, h, dk).transpose(
            0, 2, 1, 3)
        # T5 uses unscaled dot product (scale folded into weights)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3) \
            .reshape(b, L, h * dk)
        x = x + apply_linear(a["o"], o)

        f = blk["1"]["DenseReluDense"]
        hn = _t5_layer_norm(blk["1"]["layer_norm"], x,
                            cfg.layer_norm_epsilon)
        if cfg.is_gated_act:
            act = (jax.nn.gelu(apply_linear(f["wi_0"], hn))
                   if cfg.dense_act_fn.startswith("gelu")
                   else jax.nn.relu(apply_linear(f["wi_0"], hn)))
            hidden = act * apply_linear(f["wi_1"], hn)
        else:
            hidden = jax.nn.relu(apply_linear(f["wi"], hn))
        x = x + apply_linear(f["wo"], hidden)

    return _t5_layer_norm(params["encoder"]["final_layer_norm"], x,
                          cfg.layer_norm_epsilon)


def sanitize_t5(weights: dict, prefix: str = "text_encoder.") -> dict:
    """HF T5 checkpoint names -> our tree (reference sanitize :458-496)."""
    out = {}
    for k, v in weights.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        k = k.replace("model.", "", 1) if k.startswith("model.") else k
        if "decoder" in k:
            continue
        if k == "encoder.embed_tokens.weight":
            k = "shared.weight"
        out[prefix + k] = jnp.asarray(v)
    return out


__all__ = ["T5Config", "init_t5_encoder", "t5_encode", "sanitize_t5"]
