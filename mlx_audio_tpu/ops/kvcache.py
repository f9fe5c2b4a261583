"""Static-shape KV caches for compiled autoregressive decoding.

TPU-native design: the cache is a fixed-capacity buffer pytree
(`(B, max_len, n_kv_heads, head_dim)` per layer) plus an integer write
offset, updated in place via `lax.dynamic_update_slice` with buffer donation.
The whole decode loop — including cache updates — compiles into one XLA
while-loop; nothing reallocates per token (unlike the reference's growing
mlx KVCache, SURVEY.md §2.10 "continuous batching w/ BatchKVCache").

Batched serving uses the same structure with a per-row `lengths` vector and
left-padded attention masks (parity target: the reference's BatchKVCache
merge/extract, /root/reference/mlx_audio/tts/models/qwen3_tts/
continuous_batching.py:275-319) — rows are admitted/retired by writing slices,
never by reshaping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class KVCache(NamedTuple):
    """Per-layer fixed-size cache. k/v: (B, max_len, n_kv_heads, head_dim)."""

    k: Array
    v: Array

    @staticmethod
    def init(batch: int, max_len: int, n_kv_heads: int, head_dim: int,
             dtype=jnp.bfloat16) -> "KVCache":
        shape = (batch, max_len, n_kv_heads, head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def kv_update(cache: KVCache, k_new: Array, v_new: Array, offset: Array) -> KVCache:
    """Write k_new/v_new (B, S, H, D) at time offset (scalar int32)."""
    k = jax.lax.dynamic_update_slice(
        cache.k, k_new.astype(cache.k.dtype), (0, offset, 0, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, v_new.astype(cache.v.dtype), (0, offset, 0, 0))
    return KVCache(k, v)


def kv_update_rows(cache: KVCache, k_new: Array, v_new: Array,
                   offsets: Array) -> KVCache:
    """Write k_new/v_new (B, S, H, D) at PER-ROW time offsets (B,) int32.

    The batched streaming-codec decoder runs rows admitted at different
    steps through one program; each row's new frames land at its own
    stream age. One scatter per tensor (vs B dynamic_update_slices)."""
    b, s = k_new.shape[0], k_new.shape[1]
    idx = offsets[:, None] + jnp.arange(s)[None, :]          # (B, S)
    rows = jnp.arange(b)[:, None]
    k = cache.k.at[rows, idx].set(k_new.astype(cache.k.dtype))
    v = cache.v.at[rows, idx].set(v_new.astype(cache.v.dtype))
    return KVCache(k, v)


def kv_update_row(cache: KVCache, row: Array, k_new: Array, v_new: Array,
                  offset: Array) -> KVCache:
    """Write one batch row's new kv (S, H, D) at (row, offset) — used by the
    continuous-batching admit path to splice a prefill into a live batch."""
    k = jax.lax.dynamic_update_slice(
        cache.k, k_new[None].astype(cache.k.dtype), (row, offset, 0, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, v_new[None].astype(cache.v.dtype), (row, offset, 0, 0))
    return KVCache(k, v)


def ring_update(cache: KVCache, k_new: Array, v_new: Array,
                offset: Array) -> KVCache:
    """Ring-buffer write: positions offset..offset+S-1 land at slot
    pos % cap (contiguous chunk, S <= cap, so slots are distinct).

    The TPU-native sliding-window cache (parity target: the reference's
    mlx_lm RotatingKVCache used by voxtral_realtime streaming): a fixed
    (B, cap, H, D) buffer lives for the whole session; steady state is
    O(1) scatter writes, never a reallocation or roll.

    Invariant: cap >= window + S, otherwise this chunk's writes evict
    keys still inside earlier queries' windows.
    """
    cap = cache.k.shape[1]
    s = k_new.shape[1]
    slots = (offset + jnp.arange(s)) % cap
    k = cache.k.at[:, slots].set(k_new.astype(cache.k.dtype))
    v = cache.v.at[:, slots].set(v_new.astype(cache.v.dtype))
    return KVCache(k, v)


def ring_mask(cap: int, window: int, offset: Array, n_valid: Array,
              q_len: int) -> Array:
    """Additive (1, 1, q_len, cap) mask for ring-cache attention.

    Queries sit at absolute positions offset..offset+q_len-1; slot s
    holds the most recent absolute position congruent to s written so
    far (total = offset + n_valid writes this call). A key is visible
    iff it was written, is causally before the query, and lies inside
    the sliding window.
    """
    total = offset + n_valid
    s = jnp.arange(cap)
    key_abs = s + ((total - 1 - s) // cap) * cap
    q_abs = offset + jnp.arange(q_len)
    d = q_abs[:, None] - key_abs[None, :]
    allow = (d >= 0) & (d < window) & (key_abs >= 0)[None, :]
    return jnp.where(allow, 0.0, -jnp.inf)[None, None]
