"""Qwen3-TTS talker + code-predictor transformers (functional).

Parity: /root/reference/mlx_audio/tts/models/qwen3_tts/talker.py
(TalkerRotaryEmbedding/interleaved MRoPE :115-200, TalkerAttention with
QK-norm :228, Qwen3TTSTalkerModel :402, CodePredictor :705,
ForConditionalGeneration :810+).

MRoPE note: for TTS all three position streams are identical
(reference talker.py:450-461 stacks [pos, pos, pos]), so interleaved MRoPE is
numerically identical to plain RoPE over the same inv_freq — we use plain
RoPE and keep the interleave helper for any future mixed-position path.

Caches are fixed-capacity (ops/kvcache.py) so the whole token loop compiles
into a single XLA program.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn import (
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs
from .config import Qwen3TTSTalkerCodePredictorConfig, Qwen3TTSTalkerConfig

Array = jax.Array


# ---------------------------------------------------------------------------
# Shared qwen3-style block (QK-norm GQA attention + silu MLP)
# ---------------------------------------------------------------------------


def init_qwen3_layer(ks, hidden: int, n_heads: int, n_kv: int, head_dim: int,
                     inter: int, bias: bool) -> dict:
    return {
        "self_attn": {
            "q_proj": init_linear(next(ks), hidden, n_heads * head_dim, bias=bias),
            "k_proj": init_linear(next(ks), hidden, n_kv * head_dim, bias=bias),
            "v_proj": init_linear(next(ks), hidden, n_kv * head_dim, bias=bias),
            "o_proj": init_linear(next(ks), n_heads * head_dim, hidden, bias=bias),
            "q_norm": init_rms_norm(head_dim),
            "k_norm": init_rms_norm(head_dim),
        },
        "mlp": {
            "gate_proj": init_linear(next(ks), hidden, inter, bias=False),
            "up_proj": init_linear(next(ks), hidden, inter, bias=False),
            "down_proj": init_linear(next(ks), inter, hidden, bias=False),
        },
        "input_layernorm": init_rms_norm(hidden),
        "post_attention_layernorm": init_rms_norm(hidden),
    }


def qwen3_layer_forward(
    p: dict,
    x: Array,
    positions: Array,
    inv_freq: Array,
    n_heads: int,
    n_kv: int,
    head_dim: int,
    eps: float,
    cache: Optional[KVCache],
    offset,
    mask: Optional[Array],
    causal: bool,
) -> Tuple[Array, Optional[KVCache]]:
    b, t, _ = x.shape
    h = apply_rms_norm(p["input_layernorm"], x, eps)
    a = p["self_attn"]
    q = apply_linear(a["q_proj"], h).reshape(b, t, n_heads, head_dim)
    k = apply_linear(a["k_proj"], h).reshape(b, t, n_kv, head_dim)
    v = apply_linear(a["v_proj"], h).reshape(b, t, n_kv, head_dim)
    q = apply_rms_norm(a["q_norm"], q, eps)
    k = apply_rms_norm(a["k_norm"], k, eps)
    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)
    new_cache = None
    if cache is not None:
        new_cache = kv_update(cache, k, v, offset)
        if t == 1:
            out = decode_attention(q, new_cache.k, new_cache.v, offset + 1,
                                   lengths_mask=mask)
        else:
            s = new_cache.k.shape[1]
            pos_s = jnp.arange(s)[None, None, None, :]
            causal_m = pos_s <= (offset + jnp.arange(t))[None, None, :, None]
            valid = pos_s < (offset + t)
            add = jnp.where(causal_m & valid, 0.0, -jnp.inf)
            if mask is not None:
                add = add + mask
            out = attention(q, new_cache.k, new_cache.v, mask=add)
    else:
        out = attention(q, k, v, mask=mask, causal=causal)
    out = out.reshape(b, t, n_heads * head_dim)
    x = x + apply_linear(a["o_proj"], out)
    h = apply_rms_norm(p["post_attention_layernorm"], x, eps)
    m = p["mlp"]
    x = x + apply_linear(m["down_proj"],
                         jax.nn.silu(apply_linear(m["gate_proj"], h))
                         * apply_linear(m["up_proj"], h))
    return x, new_cache


# ---------------------------------------------------------------------------
# Talker
# ---------------------------------------------------------------------------


def init_talker(key, cfg: Qwen3TTSTalkerConfig) -> dict:
    ks = iter(jax.random.split(key, 16 * cfg.num_hidden_layers + 64))
    model = {
        "codec_embedding": init_embedding(next(ks), cfg.vocab_size,
                                          cfg.hidden_size),
        "text_embedding": init_embedding(next(ks), cfg.text_vocab_size,
                                         cfg.text_hidden_size),
        "layers": {
            str(i): init_qwen3_layer(
                ks, cfg.hidden_size, cfg.num_attention_heads,
                cfg.num_key_value_heads, cfg.head_dim, cfg.intermediate_size,
                cfg.attention_bias)
            for i in range(cfg.num_hidden_layers)
        },
        "norm": init_rms_norm(cfg.hidden_size),
    }
    cp = init_code_predictor(next(ks), cfg.code_predictor_config,
                             cfg.hidden_size)
    return {
        "model": model,
        "text_projection": {
            "linear_fc1": init_linear(next(ks), cfg.text_hidden_size,
                                      cfg.text_hidden_size, bias=True),
            "linear_fc2": init_linear(next(ks), cfg.text_hidden_size,
                                      cfg.hidden_size, bias=True),
        },
        "codec_head": init_linear(next(ks), cfg.hidden_size, cfg.vocab_size,
                                  bias=False),
        "code_predictor": cp,
    }


def text_projection(p: dict, x: Array) -> Array:
    """ResizeMLP (reference talker.py:338-364)."""
    h = jax.nn.silu(apply_linear(p["text_projection"]["linear_fc1"], x))
    return apply_linear(p["text_projection"]["linear_fc2"], h)


def talker_forward(
    p: dict,
    cfg: Qwen3TTSTalkerConfig,
    inputs_embeds: Array,
    caches: Optional[List[KVCache]],
    offset,
    lengths_mask: Optional[Array] = None,
    positions: Optional[Array] = None,
) -> Tuple[Array, Array, Optional[List[KVCache]]]:
    """-> (codec_logits (B, T, V), hidden (B, T, D), new_caches).

    `offset` is the cache write column; `positions` (B, T) overrides the RoPE
    positions when rows live at different logical times (continuous batching).
    """
    m = p["model"]
    b, t, _ = inputs_embeds.shape
    if positions is None:
        positions = offset + jnp.arange(t)[None, :]
    inv_freq = rope_freqs(cfg.head_dim, cfg.rope_theta)
    x = inputs_embeds
    new_caches = [] if caches is not None else None
    for i in range(cfg.num_hidden_layers):
        x, nc = qwen3_layer_forward(
            m["layers"][str(i)], x, positions, inv_freq,
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
            cfg.rms_norm_eps, caches[i] if caches is not None else None,
            offset, lengths_mask, causal=True)
        if new_caches is not None:
            new_caches.append(nc)
    x = apply_rms_norm(m["norm"], x, cfg.rms_norm_eps)
    logits = apply_linear(p["codec_head"], x)
    return logits, x, new_caches


# ---------------------------------------------------------------------------
# Code predictor
# ---------------------------------------------------------------------------


def init_code_predictor(key, cfg: Qwen3TTSTalkerCodePredictorConfig,
                        talker_hidden: int) -> dict:
    ks = iter(jax.random.split(key, 16 * cfg.num_hidden_layers
                               + 4 * cfg.num_code_groups + 16))
    p = {
        "model": {
            # per-group codec embeddings for groups 1..G-1
            "codec_embedding": {
                str(i): init_embedding(next(ks), cfg.vocab_size,
                                       cfg.hidden_size)
                for i in range(cfg.num_code_groups - 1)
            },
            "layers": {
                str(i): init_qwen3_layer(
                    ks, cfg.hidden_size, cfg.num_attention_heads,
                    cfg.num_key_value_heads, cfg.head_dim,
                    cfg.intermediate_size, cfg.attention_bias)
                for i in range(cfg.num_hidden_layers)
            },
            "norm": init_rms_norm(cfg.hidden_size),
        },
        "lm_head": {
            str(i): init_linear(next(ks), cfg.hidden_size, cfg.vocab_size,
                                bias=False)
            for i in range(cfg.num_code_groups - 1)
        },
    }
    if cfg.hidden_size != talker_hidden:
        p["small_to_mtp_projection"] = init_linear(
            next(ks), talker_hidden, cfg.hidden_size, bias=True)
    return p


def code_predictor_forward(
    p: dict,
    cfg: Qwen3TTSTalkerCodePredictorConfig,
    inputs_embeds: Array,
    caches: List[KVCache],
    offset,
    head_idx: int,
) -> Tuple[Array, List[KVCache]]:
    """One code-predictor step -> (logits of lm_head[head_idx], new caches)."""
    if "small_to_mtp_projection" in p:
        inputs_embeds = apply_linear(p["small_to_mtp_projection"],
                                     inputs_embeds)
    m = p["model"]
    b, t, _ = inputs_embeds.shape
    positions = offset + jnp.arange(t)[None, :]
    inv_freq = rope_freqs(cfg.head_dim, cfg.rope_theta)
    x = inputs_embeds
    new_caches = []
    for i in range(cfg.num_hidden_layers):
        x, nc = qwen3_layer_forward(
            m["layers"][str(i)], x, positions, inv_freq,
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
            cfg.rms_norm_eps, caches[i], offset, None, causal=True)
        new_caches.append(nc)
    x = apply_rms_norm(m["norm"], x, cfg.rms_norm_eps)
    logits = apply_linear(p["lm_head"][str(head_idx)], x[:, -1])
    return logits, new_caches
