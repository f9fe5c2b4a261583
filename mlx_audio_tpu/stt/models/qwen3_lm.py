"""Shared compiled decode stepper for Qwen3-LM-decoder STT families.

Several audio-understanding families (moss_transcribe_diarize, moss_music,
higgs_audio_3, ...) share the same decode shape: a prompt-embedding prefill
into fixed-capacity KV caches, then DEC_CHUNK-step lax.scan chunks with
in-graph sampling and EOS masking. This factory builds the jitted pair once
per (bucket, sampling config).

TPU-first: the host loop only advances chunk offsets and checks the done
flag; everything else — cache updates, sampling, EOS handling — compiles
into one XLA program (the reference syncs on every token via mx.eval).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import apply_embedding
from ...ops.kvcache import KVCache
from ...ops.sampling import make_sampler

Array = jax.Array

DEC_CHUNK = 32
PROMPT_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)


def prompt_bucket(n: int) -> int:
    return next((b for b in PROMPT_BUCKETS if n <= b),
                ((n + 511) // 512) * 512)


def make_decode_fns(
    *,
    text_config,
    lm_params: Callable[[dict], dict],
    logits_fn: Callable[[dict, Array], Array],
    forward_fn,
    bucket: int,
    max_new: int = 2048,
    temperature: float = 0.0,
    top_p: float = 1.0,
    top_k: int = 0,
    min_p: float = 0.0,
    min_tokens_to_keep: int = 1,
    eos_ids: Tuple[int, ...] = (),
    repetition_penalty: float = 1.0,
    repetition_context_size: int = 20,
):
    """Build (prefill, chunk) jitted fns.

    forward_fn(params, embeds, caches, offset, pad_mask) -> (hidden, caches)
    logits_fn(params, hidden) -> logits

    With repetition_penalty != 1, the chunk carries a rolling
    (1, repetition_context_size) history of recent tokens in-graph.
    """
    tc = text_config
    cap = bucket + max_new
    sampler = make_sampler(temperature=temperature, top_p=top_p,
                           top_k=top_k, min_p=min_p,
                           min_tokens_to_keep=min_tokens_to_keep,
                           repetition_penalty=repetition_penalty)
    eos = jnp.asarray(eos_ids or (0,), jnp.int32)
    has_eos = bool(eos_ids)
    use_rep = repetition_penalty != 1.0

    def prefill(p, embeds, length):
        caches = [KVCache.init(1, cap, tc.num_key_value_heads, tc.head_dim,
                               jnp.float32)
                  for _ in range(tc.num_hidden_layers)]
        pad = jnp.where(jnp.arange(cap) < length, 0.0,
                        -jnp.inf)[None, None, None, :]
        hidden, caches = forward_fn(p, embeds, caches, 0, pad)
        idx = jnp.clip(length - 1, 0, bucket - 1)
        last = jax.lax.dynamic_slice_in_dim(hidden, idx, 1, axis=1)
        return logits_fn(p, last)[:, 0], caches

    def chunk(p, lg, caches, t0, rng, done, history=None):
        if history is None:
            history = jnp.full((1, max(repetition_context_size, 1)), -1,
                               jnp.int32)

        def body(carry, i):
            lg, caches, key, done, hist = carry
            key, sub = jax.random.split(key)
            tok = sampler(sub, lg, hist if use_rep else None) \
                .astype(jnp.int32)
            done2 = done
            if has_eos:
                done2 = jnp.logical_or(done, jnp.any(tok[0] == eos))
            hist = jnp.concatenate([hist[:, 1:], tok[:, None]], axis=1) \
                if use_rep else hist
            emb = apply_embedding(lm_params(p)["embed_tokens"], tok[:, None])
            hidden, caches = forward_fn(p, emb, caches, t0 + i, None)
            return (logits_fn(p, hidden)[:, -1], caches, key, done2,
                    hist), jnp.where(done2, -1, tok[0])

        (lg, caches, rng, done, history), toks = jax.lax.scan(
            body, (lg, caches, rng, done, history), jnp.arange(DEC_CHUNK))
        return lg, caches, rng, done, history, toks

    return jax.jit(prefill), jax.jit(chunk)


def run_decode(model, fns, embeds: np.ndarray, n: int, *, max_tokens: int,
               seed: int = 0, on_token=None,
               history: Optional[np.ndarray] = None) -> List[int]:
    """Drive the (prefill, chunk) pair until EOS/max_tokens."""
    prefill, chunk = fns
    lg, caches = prefill(model.params, jnp.asarray(embeds), jnp.int32(n))
    rng = jax.random.PRNGKey(seed)
    done = jnp.bool_(False)
    t = jnp.int32(n)
    hist = None if history is None else jnp.asarray(history, jnp.int32)
    out: List[int] = []
    while len(out) < max_tokens:
        lg, caches, rng, done, hist, toks = chunk(
            model.params, lg, caches, t, rng, done, hist)
        t = t + DEC_CHUNK
        arr = np.asarray(toks)
        new = [int(x) for x in arr[arr >= 0]][:max_tokens - len(out)]
        out.extend(new)
        if on_token is not None:
            for x in new:
                on_token(x)
        if bool(done):
            break
    return out


__all__ = ["DEC_CHUNK", "PROMPT_BUCKETS", "prompt_bucket",
           "make_decode_fns", "run_decode"]
