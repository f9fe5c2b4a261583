"""Token sampling: temperature / top-k / top-p / min-p / repetition penalty.

Jit-safe (static shapes, no data-dependent control flow) so samplers run
*inside* the compiled decode while-loop. Functional parity targets: the
reference's per-model samplers (qwen3_tts sample :801, whisper decoding
logit filters /root/reference/mlx_audio/stt/models/whisper/decoding.py:302-443).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def apply_repetition_penalty(
    logits: Array, history: Array, penalty: float
) -> Array:
    """Penalize logits of tokens present in `history` (B, H) (pad with -1)."""
    if penalty == 1.0:
        return logits
    vocab = logits.shape[-1]
    hist = jnp.where(history < 0, vocab, history)  # out-of-range -> dropped
    onehot = jax.nn.one_hot(hist, vocab + 1, dtype=bool)[..., :vocab]
    seen = jnp.any(onehot, axis=-2)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def top_k_top_p_filter(
    logits: Array,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    min_tokens_to_keep: int = 1,
) -> Array:
    """Mask logits outside top-k / nucleus top-p / min-p to -inf. (B, V).

    `min_tokens_to_keep` guarantees at least that many tokens survive the
    p-filters (mlx_lm sampler parity — the reference threads it through
    top_p/min_p, e.g. stt/models/qwen3_asr generate kwargs)."""
    vocab = logits.shape[-1]
    unfiltered = logits
    if top_k and top_k < vocab:
        # lax.top_k beats a full sort in both compile time and runtime —
        # the kth-largest value is all the threshold needs
        kth = jax.lax.top_k(logits, top_k)[0][..., -1]
        logits = jnp.where(logits < kth[..., None], -jnp.inf, logits)
    if min_p > 0.0:
        probs = jax.nn.softmax(logits, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        logits = jnp.where(probs < min_p * pmax, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep the top-1)
        keep_sorted = cum - probs < top_p
        threshold = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    if min_tokens_to_keep > 1 and (min_p > 0.0 or top_p < 1.0):
        nth = jax.lax.top_k(unfiltered,
                            min(min_tokens_to_keep, vocab))[0][..., -1]
        logits = jnp.where(unfiltered >= nth[..., None], unfiltered, logits)
    return logits


def sample_categorical(key: Array, logits: Array, temperature: float = 1.0) -> Array:
    """Temperature sampling; temperature 0 = argmax. Returns int32 (B,)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)


def make_sampler(
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    repetition_penalty: float = 1.0,
    min_tokens_to_keep: int = 1,
) -> Callable:
    """Build `sampler(key, logits, history=None) -> tokens` closed over the
    static sampling config (so it traces into the decode loop once)."""

    def sampler(key: Array, logits: Array, history: Optional[Array] = None) -> Array:
        lg = logits.astype(jnp.float32)
        if repetition_penalty != 1.0 and history is not None:
            lg = apply_repetition_penalty(lg, history, repetition_penalty)
        if temperature == 0.0:
            return jnp.argmax(lg, axis=-1).astype(jnp.int32)
        lg = lg / temperature
        lg = top_k_top_p_filter(lg, top_k=top_k, top_p=top_p, min_p=min_p,
                                min_tokens_to_keep=min_tokens_to_keep)
        return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)

    return sampler


def make_token_selector(
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    repetition_penalty: float = 1.0,
    repetition_context_size: int = 20,
    min_tokens_to_keep: int = 1,
):
    """In-loop sampled token selection for compiled AR decode while-loops.

    Returns ``(init_hist, select, push)``:

    - ``init_hist()`` → (1, ctx) int32 history buffer filled with -1 (pad),
    - ``select(rng, logits, hist)`` → ``(tok scalar int32, rng')`` — applies
      repetition penalty over ``hist`` then temperature/top-k/top-p/min-p
      sampling (pure argmax when every knob is neutral, so the greedy decode
      graph is unchanged),
    - ``push(hist, tok, is_eos)`` → rolled history (-1 pushed on EOS).

    One shared implementation for every LLM-decoder STT family (reference
    threads mlx_lm's make_sampler/make_logits_processors kwargs through each
    model's generate, e.g. stt/models/qwen3_asr/qwen3_asr.py,
    stt/models/granite_speech/granite_speech.py).
    """
    neutral = temperature <= 0.0 and repetition_penalty == 1.0
    sampler = make_sampler(
        temperature=temperature, top_k=top_k, top_p=top_p, min_p=min_p,
        min_tokens_to_keep=min_tokens_to_keep)

    def init_hist() -> Array:
        return jnp.full((1, max(int(repetition_context_size), 1)), -1,
                        jnp.int32)

    def select(rng: Array, logits: Array, hist: Array):
        if neutral:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)[0], rng
        lg = apply_repetition_penalty(
            logits.astype(jnp.float32), hist, repetition_penalty)
        if temperature > 0.0:
            rng, sub = jax.random.split(rng)
            return sampler(sub, lg)[0], rng
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)[0], rng

    def push(hist: Array, tok: Array, is_eos: Array) -> Array:
        if neutral:
            return hist
        return jnp.roll(hist, -1, axis=1).at[:, -1].set(
            jnp.where(is_eos, -1, tok))

    return init_hist, select, push
