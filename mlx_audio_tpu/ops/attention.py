"""Attention ops: batched prefill attention and cached decode attention.

XLA already fuses QK^T -> softmax -> V into efficient MXU programs for the
shapes used here; a Pallas flash kernel exists in ops/flash_attention.py for
long-context encoder workloads. GQA (n_q_heads > n_kv_heads) is handled by
head-group broadcasting without materializing repeated KV.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _gqa_einsum_scores(q: Array, k: Array) -> Array:
    """q: (B, T, Hq, D), k: (B, S, Hkv, D) -> scores (B, Hq, T, S)."""
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    if hq == hkv:
        return jnp.einsum("bthd,bshd->bhts", q, k)
    group = hq // hkv
    qg = q.reshape(b, t, hkv, group, d)
    s = jnp.einsum("bthgd,bshd->bhgts", qg, k)
    return s.reshape(b, hkv * group, t, s.shape[-1])


def _gqa_einsum_out(probs: Array, v: Array) -> Array:
    """probs: (B, Hq, T, S), v: (B, S, Hkv, D) -> (B, T, Hq, D)."""
    b, hq, t, s_len = probs.shape
    hkv = v.shape[2]
    if hq == hkv:
        return jnp.einsum("bhts,bshd->bthd", probs, v)
    group = hq // hkv
    pg = probs.reshape(b, hkv, group, t, s_len)
    o = jnp.einsum("bhgts,bshd->bthgd", pg, v)
    return o.reshape(b, t, hq, o.shape[-1])


def attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
) -> Array:
    """Scaled dot-product attention.

    q: (B, T, Hq, D); k/v: (B, S, Hkv, D); mask broadcastable to (B, Hq, T, S)
    (additive, -inf for masked). Returns (B, T, Hq, D).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = _gqa_einsum_scores(q * scale, k).astype(jnp.float32)
    if logit_softcap:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    if causal:
        t, s = scores.shape[-2:]
        offset = s - t
        cm = jnp.tril(jnp.ones((t, s), bool), k=offset)
        scores = jnp.where(cm, scores, -jnp.inf)
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return _gqa_einsum_out(probs, v)


def decode_attention(
    q: Array,
    k_cache: Array,
    v_cache: Array,
    length: Array,
    scale: Optional[float] = None,
    lengths_mask: Optional[Array] = None,
) -> Array:
    """Single-step attention against a fixed-size cache.

    q: (B, 1, Hq, D); k_cache/v_cache: (B, max_len, Hkv, D);
    length: scalar or (B,) — number of valid cache entries per row.
    lengths_mask: optional (B, max_len) bool overriding the length mask
    (continuous batching with left-padding).
    Masked positions beyond `length` contribute nothing; the full fixed-shape
    matmul keeps the op static for the XLA while-loop.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = _gqa_einsum_scores(q * scale, k_cache).astype(jnp.float32)
    max_len = k_cache.shape[1]
    if lengths_mask is None:
        pos = jnp.arange(max_len)
        if jnp.ndim(length) == 0:
            valid = pos < length
            valid = valid[None, None, None, :]
        else:
            valid = pos[None, :] < length[:, None]
            valid = valid[:, None, None, :]
    else:
        valid = lengths_mask[:, None, None, :]
    scores = jnp.where(valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return _gqa_einsum_out(probs, v_cache)
