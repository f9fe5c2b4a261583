"""Whisper decoding: options, logit filters, and the compiled AR loop.

Parity: /root/reference/mlx_audio/stt/models/whisper/decoding.py
(DecodingOptions :116, SuppressBlank/SuppressTokens/ApplyTimestampRules
:349-443, DecodingTask :445, GreedyDecoder :302). TPU redesign: the whole
sample loop — including every logit filter and the timestamp state machine —
runs inside ONE `lax.while_loop` jitted per prompt bucket; temperature is a
runtime scalar (greedy = temperature 0 via select), so the fallback ladder
re-runs the same compiled program instead of recompiling.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....ops.kvcache import KVCache

PROMPT_BUCKETS = (4, 8, 16, 32, 64, 128, 256)


def _bucket(n: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return PROMPT_BUCKETS[-1]


@dataclass(frozen=True)
class DecodingOptions:
    task: str = "transcribe"
    language: Optional[str] = None
    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None
    suppress_tokens: Optional[Union[str, Sequence[int]]] = "-1"
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0
    fp16: bool = False


@dataclass
class DecodingResult:
    tokens: List[int]
    text: str = ""
    language: str = "en"
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = 0.0
    compression_ratio: float = np.nan


def compression_ratio(text: str) -> float:
    b = text.encode("utf-8")
    return len(b) / len(zlib.compress(b)) if b else 0.0


def get_suppress_tokens(tokenizer, suppress_tokens="-1") -> Tuple[int, ...]:
    """Reference decoding.py:80-113 semantics."""
    if isinstance(suppress_tokens, str):
        suppress_tokens = [int(t) for t in suppress_tokens.split(",")
                           if t] if suppress_tokens else []
    else:
        suppress_tokens = list(suppress_tokens or [])
    if -1 in suppress_tokens:
        suppress_tokens = [t for t in suppress_tokens if t >= 0]
        suppress_tokens.extend(tokenizer.non_speech_tokens)
    suppress_tokens.extend([
        tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
        tokenizer.sot_prev, tokenizer.sot_lm,
    ])
    if tokenizer.no_speech is not None:
        suppress_tokens.append(tokenizer.no_speech)
    return tuple(sorted(set(suppress_tokens)))


class DecodingTask:
    """Greedy / best-of-N / beam decoding for one 30-s window, compiled.

    The greedy+temperature path is the transcribe default. beam_size runs a
    real compiled beam search (the reference raises NotImplementedError for
    beams, decoding.py:478); best_of runs N temperature samples ranked by
    the same length-penalty ranker. Either way the whole group loop —
    candidate scoring, beam reindexing of the KV caches, EOT freezing —
    is one `lax.while_loop`.
    """

    def __init__(self, model, options: DecodingOptions):
        if options.beam_size is not None and options.best_of is not None:
            raise ValueError("beam_size and best_of can't be given together")
        if options.temperature == 0 and options.best_of is not None:
            raise ValueError("best_of with greedy sampling (T=0) is not "
                             "compatible")
        if options.patience is not None and options.beam_size is None:
            raise ValueError("patience requires beam_size to be given")
        if options.length_penalty is not None and not (
                0 <= options.length_penalty <= 1):
            raise ValueError("length_penalty (alpha) must be in [0, 1]")
        self.model = model
        self.options = options
        language = options.language or "en"
        self.tokenizer = model.get_tokenizer(language=language,
                                             task=options.task)
        self.sample_len = options.sample_len or model.dims.n_text_ctx // 2
        self.n_group = options.beam_size or options.best_of or 1
        self.suppress = get_suppress_tokens(self.tokenizer,
                                            options.suppress_tokens)
        self.sot_sequence = (
            self.tokenizer.sot_sequence_including_notimestamps
            if options.without_timestamps else self.tokenizer.sot_sequence)
        precision = 0.02
        self.max_initial_ts_index = (
            round(options.max_initial_timestamp / precision)
            if options.max_initial_timestamp else None)
        try:
            self.blank_token = self.tokenizer.encode(" ")[0]
        except Exception:
            self.blank_token = 220

    # ------------------------------------------------------------------

    def _make_filters(self):
        """Build the jit-safe logit-filter function (shared by the greedy
        and group decoders)."""
        dims = self.model.dims
        tok = self.tokenizer
        eot = tok.eot
        ts_begin = tok.timestamp_begin
        no_ts = tok.no_timestamps
        n_vocab = dims.n_vocab
        suppress_ids = jnp.asarray(self.suppress + (no_ts,), jnp.int32)
        blank = self.blank_token
        use_ts = not self.options.without_timestamps
        max_init_idx = self.max_initial_ts_index

        def apply_filters(logits, n_sampled, last_tok, penult_tok, max_ts,
                          finished):
            logits = logits.astype(jnp.float32)
            # SuppressBlank at the first sampled position
            blank_mask = jnp.zeros((n_vocab,)).at[jnp.asarray([blank, eot])
                                                  ].set(-jnp.inf)
            logits = jnp.where(n_sampled == 0, logits + blank_mask[None],
                               logits)
            # SuppressTokens
            logits = logits.at[:, suppress_ids].set(-jnp.inf)
            if not use_ts:
                logits = logits.at[:, ts_begin:].set(-jnp.inf)
                return logits
            # --- ApplyTimestampRules (decoding.py:372-443) ---
            vocab_idx = jnp.arange(n_vocab)
            is_ts_col = vocab_idx >= ts_begin
            is_text_col = vocab_idx < eot
            last_was_ts = last_tok >= ts_begin
            penult_was_ts = jnp.where(n_sampled >= 2, penult_tok >= ts_begin,
                                      True)
            # last was ts and penult was ts -> no more timestamps now
            m1 = (last_was_ts & penult_was_ts & (n_sampled >= 1))
            logits = jnp.where(m1[:, None] & is_ts_col[None], -jnp.inf, logits)
            # last was ts and penult was text -> must emit the pairing ts
            m2 = (last_was_ts & ~penult_was_ts & (n_sampled >= 1))
            logits = jnp.where(m2[:, None] & is_text_col[None], -jnp.inf,
                               logits)
            # timestamps must be non-decreasing: mask ts < max_ts (or <= if
            # the last token was a timestamp)
            limit = jnp.where(last_was_ts, max_ts + 1, max_ts)
            ts_too_small = is_ts_col[None] & (vocab_idx[None] < limit[:, None])
            has_ts = max_ts > 0
            logits = jnp.where(has_ts[:, None] & ts_too_small, -jnp.inf,
                               logits)
            # first sampled token must be a timestamp, bounded by max_initial
            first = n_sampled == 0
            logits = jnp.where(first & is_text_col[None], -jnp.inf, logits)
            logits = jnp.where(first & (vocab_idx[None] == eot), -jnp.inf,
                               logits)
            if max_init_idx is not None:
                too_late = vocab_idx > ts_begin + max_init_idx
                logits = jnp.where(first & too_late[None], -jnp.inf, logits)
            # if total ts probability beats best text token -> force timestamp
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            ts_logprob = jax.nn.logsumexp(
                jnp.where(is_ts_col[None], logprobs, -jnp.inf), axis=-1)
            max_text = jnp.max(jnp.where(is_ts_col[None], -jnp.inf, logprobs),
                               axis=-1)
            force_ts = ts_logprob > max_text
            logits = jnp.where(force_ts[:, None] & ~is_ts_col[None], -jnp.inf,
                               logits)
            return logits

        return apply_filters

    def _build_decode_fn(self, pb: int):
        """Compile the prefill + sample while-loop for prompt bucket pb."""
        model = self.model
        dims = model.dims
        tok = self.tokenizer
        n_ctx = dims.n_text_ctx
        sample_len = min(self.sample_len, n_ctx - pb - 1)
        eot = tok.eot
        ts_begin = tok.timestamp_begin

        from .whisper import cross_kv, decoder_forward, encoder_forward

        apply_filters = self._make_filters()

        def sample(key, logits, temperature):
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            temp = jnp.maximum(temperature, 1e-6)
            drawn = jax.random.categorical(key, logits / temp,
                                           axis=-1).astype(jnp.int32)
            return jnp.where(temperature <= 0.0, greedy, drawn)

        def decode(params, mel, prompt_padded, plen, sot_index, key,
                   temperature):
            b = mel.shape[0]
            feats = encoder_forward(params, dims, mel)
            ckv = cross_kv(params, dims, feats)
            d = dims.n_text_state
            caches = [KVCache.init(b, n_ctx, 1, d, feats.dtype)
                      for _ in range(dims.n_text_layer)]

            # prefill the prompt bucket (right-padded; pads masked causally)
            positions = jnp.broadcast_to(jnp.arange(pb)[None], (b, pb))
            prefill_mask = jnp.where(
                (jnp.arange(n_ctx)[None, :] <= jnp.arange(pb)[:, None]),
                0.0, -jnp.inf)[None, None]
            logits_all, caches = decoder_forward(
                params, dims, prompt_padded, positions, ckv, caches, 0,
                prefill_mask)
            no_speech_prob = jax.nn.softmax(
                logits_all[jnp.arange(b), sot_index].astype(jnp.float32),
                axis=-1)[:, tok.no_speech]
            logits0 = logits_all[jnp.arange(b), plen - 1]

            tokens_buf = jnp.zeros((b, n_ctx), jnp.int32)
            tokens_buf = tokens_buf.at[:, :pb].set(prompt_padded)

            def cond(carry):
                (_, n_sampled, _, finished, _, _, _, _) = carry
                return (n_sampled < sample_len) & ~jnp.all(finished)

            def body(carry):
                (tokens_buf, n_sampled, caches, finished, sum_lp, max_ts,
                 logits, key) = carry
                cur_len = plen + n_sampled
                last = tokens_buf[jnp.arange(b), cur_len - 1]
                penult = tokens_buf[jnp.arange(b),
                                    jnp.maximum(cur_len - 2, 0)]
                f_logits = apply_filters(logits, n_sampled, last, penult,
                                         max_ts, finished)
                key, sub = jax.random.split(key)
                next_tok = sample(sub, f_logits, temperature)
                logprobs = jax.nn.log_softmax(f_logits, axis=-1)
                tok_lp = logprobs[jnp.arange(b), next_tok]
                sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
                next_tok = jnp.where(finished, eot, next_tok)
                new_finished = finished | (next_tok == eot)
                max_ts = jnp.where(
                    (next_tok >= ts_begin) & ~finished,
                    jnp.maximum(max_ts, next_tok), max_ts)
                tokens_buf = tokens_buf.at[jnp.arange(b), cur_len].set(
                    next_tok)
                # next logits: feed the sampled token at cur_len
                step_pos = jnp.broadcast_to(
                    jnp.asarray(cur_len)[None, None], (b, 1))
                step_mask = jnp.where(jnp.arange(n_ctx) <= cur_len, 0.0,
                                      -jnp.inf)
                step_mask = jnp.broadcast_to(
                    step_mask[None, None, None, :], (b, 1, 1, n_ctx))
                new_logits, caches2 = decoder_forward(
                    params, dims, next_tok[:, None], step_pos, ckv, caches,
                    cur_len, step_mask)
                return (tokens_buf, n_sampled + 1, caches2, new_finished,
                        sum_lp, max_ts, new_logits[:, 0], key)

            init = (tokens_buf, jnp.int32(0), caches,
                    jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32),
                    jnp.zeros((b,), jnp.int32), logits0, key)
            (tokens_buf, n_sampled, _, finished, sum_lp, _, _, _) = (
                jax.lax.while_loop(cond, body, init))
            return tokens_buf, n_sampled, sum_lp, no_speech_prob

        return jax.jit(decode)

    def _build_group_decode_fn(self, pb: int, beam: bool):
        """Compile the n_group decoder: beam search (beam=True) or
        best-of-N sampling. One encoder pass; the G decoder rows share the
        cross K/V; beam reindexing gathers the self-attention caches by
        source row inside the while-loop."""
        model = self.model
        dims = model.dims
        tok = self.tokenizer
        n_ctx = dims.n_text_ctx
        sample_len = min(self.sample_len, n_ctx - pb - 1)
        eot = tok.eot
        ts_begin = tok.timestamp_begin
        g = self.n_group

        from .whisper import cross_kv, decoder_forward, encoder_forward

        apply_filters = self._make_filters()

        def decode(params, mel, prompt_padded, plen, sot_index, key,
                   temperature):
            feats = encoder_forward(params, dims, mel)        # (1, T, D)
            ckv = [(jnp.broadcast_to(k, (g,) + k.shape[1:]),
                    jnp.broadcast_to(v, (g,) + v.shape[1:]))
                   for k, v in cross_kv(params, dims, feats)]
            d = dims.n_text_state
            caches = [KVCache.init(g, n_ctx, 1, d, feats.dtype)
                      for _ in range(dims.n_text_layer)]
            prompt_g = jnp.broadcast_to(prompt_padded, (g, pb))
            positions = jnp.broadcast_to(jnp.arange(pb)[None], (g, pb))
            prefill_mask = jnp.where(
                (jnp.arange(n_ctx)[None, :] <= jnp.arange(pb)[:, None]),
                0.0, -jnp.inf)[None, None]
            logits_all, caches = decoder_forward(
                params, dims, prompt_g, positions, ckv, caches, 0,
                prefill_mask)
            no_speech_prob = jax.nn.softmax(
                logits_all[0, sot_index[0]].astype(jnp.float32),
                axis=-1)[tok.no_speech]
            logits0 = logits_all[jnp.arange(g),
                                 jnp.broadcast_to(plen - 1, (g,))]

            tokens_buf = jnp.zeros((g, n_ctx), jnp.int32)
            tokens_buf = tokens_buf.at[:, :pb].set(prompt_g)
            # beam: only row 0 seeds candidates at step 0 (all rows are the
            # same prompt); best-of: every row samples independently
            sum_lp0 = (jnp.asarray([0.0] + [-jnp.inf] * (g - 1))
                       if beam else jnp.zeros((g,)))

            def cond(carry):
                (_, n_sampled, _, finished, _, _, _, _) = carry
                return (n_sampled < sample_len) & ~jnp.all(finished)

            def body(carry):
                (tokens_buf, n_sampled, caches, finished, sum_lp, max_ts,
                 logits, key) = carry
                cur_len = plen + n_sampled
                last = tokens_buf[jnp.arange(g), cur_len - 1]
                penult = tokens_buf[jnp.arange(g),
                                    jnp.maximum(cur_len - 2, 0)]
                f_logits = apply_filters(logits, n_sampled, last, penult,
                                         max_ts, finished)
                logprobs = jax.nn.log_softmax(f_logits, axis=-1)
                key, sub = jax.random.split(key)
                if beam:
                    # finished rows contribute exactly one frozen candidate
                    nv = logprobs.shape[-1]
                    frozen = jnp.full((g, nv), -jnp.inf) \
                        .at[:, eot].set(0.0)
                    cand = jnp.where(finished[:, None], frozen, logprobs) \
                        + sum_lp[:, None]
                    flat = cand.reshape(-1)
                    top_scores, top_idx = jax.lax.top_k(flat, g)
                    src = (top_idx // nv).astype(jnp.int32)
                    next_tok = (top_idx % nv).astype(jnp.int32)
                    # reindex everything by source beam
                    tokens_buf = jnp.take(tokens_buf, src, axis=0)
                    caches = [KVCache(jnp.take(c.k, src, axis=0),
                                      jnp.take(c.v, src, axis=0))
                              for c in caches]
                    finished = jnp.take(finished, src, axis=0)
                    max_ts = jnp.take(max_ts, src, axis=0)
                    sum_lp = top_scores
                    next_tok = jnp.where(finished, eot, next_tok)
                else:
                    temp = jnp.maximum(temperature, 1e-6)
                    next_tok = jax.random.categorical(
                        sub, f_logits / temp, axis=-1).astype(jnp.int32)
                    tok_lp = logprobs[jnp.arange(g), next_tok]
                    sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
                    next_tok = jnp.where(finished, eot, next_tok)
                new_finished = finished | (next_tok == eot)
                max_ts = jnp.where((next_tok >= ts_begin) & ~finished,
                                   jnp.maximum(max_ts, next_tok), max_ts)
                tokens_buf = tokens_buf.at[jnp.arange(g), cur_len].set(
                    next_tok)
                step_pos = jnp.broadcast_to(
                    jnp.asarray(cur_len)[None, None], (g, 1))
                step_mask = jnp.where(jnp.arange(n_ctx) <= cur_len, 0.0,
                                      -jnp.inf)
                step_mask = jnp.broadcast_to(
                    step_mask[None, None, None, :], (g, 1, 1, n_ctx))
                new_logits, caches2 = decoder_forward(
                    params, dims, next_tok[:, None], step_pos, ckv, caches,
                    cur_len, step_mask)
                return (tokens_buf, n_sampled + 1, caches2, new_finished,
                        sum_lp, max_ts, new_logits[:, 0], key)

            init = (tokens_buf, jnp.int32(0), caches,
                    jnp.zeros((g,), bool), sum_lp0,
                    jnp.zeros((g,), jnp.int32), logits0, key)
            (tokens_buf, n_sampled, _, _, sum_lp, _, _, _) = (
                jax.lax.while_loop(cond, body, init))
            return tokens_buf, n_sampled, sum_lp, no_speech_prob

        return jax.jit(decode)

    def _rank(self, token_rows: List[np.ndarray],
              sum_lp: np.ndarray) -> int:
        """MaximumLikelihoodRanker (reference decoding.py:212-236)."""
        alpha = self.options.length_penalty
        scores = []
        for toks, lp in zip(token_rows, sum_lp):
            n = len(toks) + 1
            penalty = n if alpha is None else ((5 + n) / 6) ** alpha
            scores.append(lp / penalty if penalty > 0 else -np.inf)
        return int(np.argmax(scores))

    def run(self, mel_segment, prompt: List[int],
            temperature: float = 0.0) -> DecodingResult:
        """Decode one (B=1) mel window with the given left-context prompt."""
        if self.n_group > 1 and (self.options.beam_size or temperature > 0):
            return self._run_group(mel_segment, prompt, temperature)
        return self._run_greedy(mel_segment, prompt, temperature)

    def _run_group(self, mel_segment, prompt: List[int],
                   temperature: float) -> DecodingResult:
        tok = self.tokenizer
        opts = self.options
        beam = opts.beam_size is not None and temperature == 0.0
        initial, plen, sot_index, pb = self._initial_tokens(prompt)
        key_ = ("group_decode", pb, beam, self.n_group,
                opts.without_timestamps, self.sample_len)
        fn = self.model._jit_cache.get(key_)
        if fn is None:
            fn = self._build_group_decode_fn(pb, beam)
            self.model._jit_cache[key_] = fn
        padded = np.zeros((1, pb), np.int32)
        padded[0, :plen] = initial
        tokens_buf, n_sampled, sum_lp, ns_prob = fn(
            self.model.params, mel_segment, jnp.asarray(padded),
            jnp.int32(plen), jnp.asarray([sot_index]),
            jax.random.PRNGKey(int(temperature * 1000) + 7),
            jnp.float32(temperature))
        tokens_buf = np.asarray(tokens_buf)
        sum_lp = np.asarray(sum_lp)
        rows = []
        for gi in range(self.n_group):
            toks = tokens_buf[gi, plen: plen + int(n_sampled)]
            eot_pos = np.where(toks == tok.eot)[0]
            rows.append(toks[: eot_pos[0]] if len(eot_pos) else toks)
        best = self._rank(rows, sum_lp)
        tokens = rows[best]
        text = tok.decode([t for t in tokens if t < tok.eot]).strip()
        return DecodingResult(
            tokens=[int(t) for t in tokens], text=text,
            language=opts.language or "en",
            avg_logprob=float(sum_lp[best]) / (len(tokens) + 1),
            no_speech_prob=float(np.asarray(ns_prob)),
            temperature=float(temperature),
            compression_ratio=compression_ratio(text))

    def _initial_tokens(self, prompt: List[int]):
        tok = self.tokenizer
        opts = self.options
        n_ctx = self.model.dims.n_text_ctx
        prompt = list(prompt)
        if prompt:
            prompt = [tok.sot_prev] + prompt[-(n_ctx // 2 - 1):]
        initial = prompt + list(self.sot_sequence)
        if opts.prefix:
            prefix = (tok.encode(" " + opts.prefix.strip())
                      if isinstance(opts.prefix, str) else list(opts.prefix))
            initial = initial + prefix
        return initial, len(initial), initial.index(tok.sot), \
            _bucket(len(initial))

    def _run_greedy(self, mel_segment, prompt: List[int],
                    temperature: float = 0.0) -> DecodingResult:
        tok = self.tokenizer
        opts = self.options
        n_ctx = self.model.dims.n_text_ctx
        prompt = list(prompt)
        if prompt:
            prompt = [tok.sot_prev] + prompt[-(n_ctx // 2 - 1):]
        initial = prompt + list(self.sot_sequence)
        if opts.prefix:
            prefix = (tok.encode(" " + opts.prefix.strip())
                      if isinstance(opts.prefix, str) else list(opts.prefix))
            initial = initial + prefix
        plen = len(initial)
        sot_index = initial.index(tok.sot)
        pb = _bucket(plen)

        fn = self.model._jit_cache.get(("decode", pb, opts.without_timestamps,
                                        self.sample_len))
        if fn is None:
            fn = self._build_decode_fn(pb)
            self.model._jit_cache[("decode", pb, opts.without_timestamps,
                                   self.sample_len)] = fn

        padded = np.zeros((1, pb), np.int32)
        padded[0, :plen] = initial
        tokens_buf, n_sampled, sum_lp, ns_prob = fn(
            self.model.params, mel_segment, jnp.asarray(padded),
            jnp.int32(plen), jnp.asarray([sot_index]),
            jax.random.PRNGKey(int(temperature * 1000) + 7),
            jnp.float32(temperature))

        tokens = np.asarray(tokens_buf)[0, plen: plen + int(n_sampled)]
        # trim at eot
        eot_pos = np.where(tokens == tok.eot)[0]
        if len(eot_pos):
            tokens = tokens[: eot_pos[0]]
        sum_lp = float(np.asarray(sum_lp)[0])
        avg_logprob = sum_lp / (len(tokens) + 1)
        text = tok.decode([t for t in tokens if t < tok.eot]).strip()
        return DecodingResult(
            tokens=[int(t) for t in tokens],
            text=text,
            language=opts.language or "en",
            avg_logprob=avg_logprob,
            no_speech_prob=float(np.asarray(ns_prob)[0]),
            temperature=float(temperature),
            compression_ratio=compression_ratio(text),
        )
