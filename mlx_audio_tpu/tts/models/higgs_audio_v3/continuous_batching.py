"""Higgs Audio v3 continuous batching: fixed-slot batched decode.

Parity: /root/reference/mlx_audio/tts/models/higgs_audio_v3/
continuous_batching.py (HiggsAudioV3BatchSession — step-wise, non-streaming:
audio is emitted once per sequence when it finishes). The reference merges /
filters a growing BatchKVCache as rows come and go; on TPU the batch shape
stays fixed for the whole session — one persistent jitted step over
(B, T)-static caches, with per-row validity masks, row-local RoPE positions,
and admission by splicing a batch-1 prefill into a slot's cache rows.
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....ops.kvcache import KVCache
from ...continuous import TTSBatchEvent, TTSBatchOptions
from .higgs_audio_v3 import reverse_delay_pattern

SESSION_LEN = 4096


class HiggsAudioV3BatchSession:
    """Fixed-slot continuous batch decode for one Higgs v3 instance."""

    def __init__(self, model, options: Optional[TTSBatchOptions] = None):
        self.model = model
        self.options = options or TTSBatchOptions()
        self.B = int(self.options.max_batch_size)
        tc = model.tc
        self.caches = [
            KVCache.init(self.B, SESSION_LEN, tc.num_key_value_heads,
                         tc.head_dim, jnp.float32)
            for _ in range(tc.num_hidden_layers)
        ]
        d = tc.hidden_size
        self.hidden = jnp.zeros((self.B, d), jnp.float32)
        self.valid = jnp.zeros((self.B, SESSION_LEN), bool)
        self.row_idx = jnp.zeros((self.B,), jnp.int32)
        self.countdown = jnp.full((self.B,), -1, jnp.int32)
        self.finished = jnp.ones((self.B,), bool)
        self.row_pos = jnp.zeros((self.B,), jnp.int32)
        self.key = jax.random.PRNGKey(0)
        self.t = 0  # global cache write column
        self.active = np.zeros(self.B, bool)
        self.requests: List[Optional[object]] = [None] * self.B
        self.rows: List[List[np.ndarray]] = [[] for _ in range(self.B)]
        self.start_times = [0.0] * self.B

    # -- protocol --------------------------------------------------------

    @property
    def idle(self) -> bool:
        return not self.active.any()

    @property
    def available_slots(self) -> int:
        if self.t + 64 >= SESSION_LEN:  # column budget nearly exhausted
            return 0
        return int((~self.active).sum())

    def submit(self, request) -> None:
        """Admit a broker InferenceRequest (text payload) into a free slot."""
        slot = int(np.argmax(~self.active))
        if self.active[slot]:
            raise RuntimeError("no free continuous-batch slots")
        kwargs = getattr(request, "normalized_kwargs", {}) or {}
        text = request.payload if hasattr(request, "payload") else \
            request.text
        refs = self.model._normalize_references(
            ref_audio=kwargs.get("ref_audio"),
            ref_text=kwargs.get("ref_text"),
            references=kwargs.get("references"),
            ref_audio_codes=kwargs.get("ref_audio_codes"))
        token_ids, segments = self.model.build_prompt(text, refs)
        embeds = self.model._prompt_embeds(token_ids, segments)
        self._admit(slot, embeds)
        self.requests[slot] = request
        self.rows[slot] = []
        self.start_times[slot] = time.time()
        self.active[slot] = True

    def add(self, item) -> None:  # TTSBatchItem protocol alias
        self.submit(item)

    def cancel(self, request_id: str) -> None:
        for slot, req in enumerate(self.requests):
            if req is not None and \
                    getattr(req, "request_id", None) == request_id:
                self._retire(slot)

    def fail(self, error: BaseException) -> None:
        for slot in range(self.B):
            req = self.requests[slot]
            if req is not None:
                if hasattr(req, "emit_error"):
                    req.emit_error(error)
                if hasattr(req, "emit_done"):
                    req.emit_done()
            self._retire(slot)

    # -- internals -------------------------------------------------------

    def _retire(self, slot: int) -> None:
        self.requests[slot] = None
        self.rows[slot] = []
        self.active[slot] = False
        self.finished = self.finished.at[slot].set(True)

    def _admit(self, slot: int, embeds) -> None:
        """Batch-1 prompt prefill spliced into the slot's cache rows at the
        current global column."""
        model = self.model
        plen = embeds.shape[1]
        pb = 1 << max(4, (plen - 1).bit_length())
        if self.t + pb + 64 > SESSION_LEN:
            raise RuntimeError("continuous-batch session column budget "
                               "exhausted; start a new session")
        embeds = jnp.pad(embeds, ((0, 0), (0, pb - plen), (0, 0)))
        fn = model._jit_cache.get(("hv3_admit", pb, self.B))
        if fn is None:
            fn = jax.jit(self._admit_jit, static_argnames=("pb",))
            model._jit_cache[("hv3_admit", pb, self.B)] = fn
        (self.caches, self.valid, self.hidden, self.row_idx, self.countdown,
         self.finished, self.row_pos) = fn(
            model.params, self.caches, self.valid, self.hidden, self.row_idx,
            self.countdown, self.finished, self.row_pos, embeds,
            jnp.int32(plen), jnp.int32(slot), jnp.int32(self.t), pb=pb)
        self.t += pb

    def _admit_jit(self, params, caches, valid, hidden, row_idx, countdown,
                   finished, row_pos, embeds, plen, slot, t0, *, pb):
        model = self.model
        tc = model.tc
        small = [KVCache.init(1, pb, tc.num_key_value_heads, tc.head_dim,
                              jnp.float32)
                 for _ in range(tc.num_hidden_layers)]
        pad_mask = jnp.where(jnp.arange(pb) < plen, 0.0,
                             -jnp.inf)[None, None, None, :]
        h, small = model._backbone_step(params, embeds, small, 0,
                                        mask=pad_mask)
        caches = [
            KVCache(
                jax.lax.dynamic_update_slice(
                    c.k, s.k.astype(c.k.dtype), (slot, t0, 0, 0)),
                jax.lax.dynamic_update_slice(
                    c.v, s.v.astype(c.v.dtype), (slot, t0, 0, 0)))
            for c, s in zip(caches, small)
        ]
        cols = jnp.arange(SESSION_LEN)
        row_valid = (cols >= t0) & (cols < t0 + plen)
        valid = valid.at[slot].set(valid[slot] | row_valid)
        hidden = hidden.at[slot].set(h[0, plen - 1])
        row_idx = row_idx.at[slot].set(0)
        countdown = countdown.at[slot].set(-1)
        finished = finished.at[slot].set(False)
        row_pos = row_pos.at[slot].set(plen)
        return caches, valid, hidden, row_idx, countdown, finished, row_pos

    def _make_step(self):
        model = self.model
        c = model.config
        n = c.audio_num_codebooks
        opts = self.options
        from ....ops.sampling import top_k_top_p_filter

        temperature = float(opts.temperature)
        top_k = int(opts.top_k)
        top_p = float(opts.top_p)

        def sample(k, lg):
            lg = lg.astype(jnp.float32)
            if temperature <= 1e-5 or top_k == 1:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            f = top_k_top_p_filter(lg / temperature, top_k=top_k,
                                   top_p=top_p if 0.0 < top_p < 1.0 else 1.0)
            return jax.random.categorical(k, f, axis=-1).astype(jnp.int32)

        def step(params, caches, valid, hidden, row_idx, countdown, finished,
                 row_pos, t, key):
            logits = model._audio_logits(params, hidden)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, n)
            row = jnp.stack([sample(keys[i], logits[:, i])
                             for i in range(n)], axis=-1)
            cb = jnp.arange(n)[None, :]
            row = jnp.where(cb > row_idx[:, None], c.audio_boc_token_id, row)
            in_delay = row_idx < n
            dec = (~in_delay) & (countdown >= 0)
            countdown2 = jnp.where(dec, countdown - 1, countdown)
            fin_now = dec & (countdown2 <= 0)
            set_eoc = ((~in_delay) & (~dec)
                       & (row[:, 0] == c.audio_eoc_token_id))
            countdown3 = jnp.where(set_eoc, jnp.int32(n - 2), countdown2)
            if n <= 2:
                fin_now = fin_now | set_eoc
            done2 = finished | fin_now
            embed_next = model._embed_audio_row(params, row)[:, None]
            attend = valid.at[:, t].set(True)
            h, caches = model._backbone_step(
                params, embed_next, caches, t, mask=attend,
                positions=row_pos[:, None])
            valid = valid.at[:, t].set(valid[:, t] | ~finished)
            hidden = h[:, -1]
            row_pos = row_pos + (~finished).astype(jnp.int32)
            row_idx = row_idx + 1
            return (caches, valid, hidden, row_idx, countdown3, done2,
                    row_pos, key, row, done2)

        return jax.jit(step)

    def step(self) -> List[TTSBatchEvent]:
        """One batched decode step; emit final audio for rows that finish
        (reference session is non-streaming: audio arrives once per
        sequence)."""
        if self.idle:
            return []
        model = self.model
        skey = ("hv3_step", self.B, self.options.temperature,
                self.options.top_k, self.options.top_p)
        fn = model._jit_cache.get(skey)
        if fn is None:
            fn = self._make_step()
            model._jit_cache[skey] = fn
        if self.t + 1 >= SESSION_LEN:
            self.fail(RuntimeError("session column budget exhausted"))
            return []
        prev_fin = np.asarray(self.finished)
        (self.caches, self.valid, self.hidden, self.row_idx, self.countdown,
         self.finished, self.row_pos, self.key, row, done) = fn(
            model.params, self.caches, self.valid, self.hidden, self.row_idx,
            self.countdown, self.finished, self.row_pos, jnp.int32(self.t),
            self.key)
        self.t += 1
        row_np = np.asarray(row)
        done_np = np.asarray(done)
        events: List[TTSBatchEvent] = []
        for slot in range(self.B):
            if not self.active[slot]:
                continue
            if not prev_fin[slot]:
                self.rows[slot].append(row_np[slot])
            hit_limit = len(self.rows[slot]) >= self.options.max_tokens
            if (done_np[slot] and not prev_fin[slot]) or hit_limit:
                events.extend(self._finish_slot(slot))
                if hit_limit:
                    self.finished = self.finished.at[slot].set(True)
        return events

    def _finish_slot(self, slot: int) -> List[TTSBatchEvent]:
        model = self.model
        nb = model.config.audio_num_codebooks
        delayed = np.stack(self.rows[slot], axis=0) if self.rows[slot] \
            else np.zeros((0, nb), np.int32)
        codes = reverse_delay_pattern(delayed) \
            if delayed.shape[0] >= nb else np.zeros((0, nb), np.int32)
        codes = np.clip(codes, 0, model.config.audio_codebook_size - 3)
        if model.codec is not None and len(codes):
            audio = np.asarray(model.codec.decode(codes)).reshape(-1)
        else:
            audio = np.zeros((len(codes) * 1920,), np.float32)
        req = self.requests[slot]
        rid = getattr(req, "request_id", str(slot)) if req else str(slot)
        events = []
        if req is not None and hasattr(req, "emit_data") and len(audio):
            req.emit_data({"audio": audio, "sample_rate": model.sample_rate,
                           "is_final": True})
        events.append(TTSBatchEvent(
            request_id=rid, kind="chunk", audio=audio,
            sample_rate=model.sample_rate, token_count=len(delayed)))
        events.append(TTSBatchEvent(request_id=rid, kind="done"))
        if req is not None and hasattr(req, "emit_done"):
            req.emit_done()
        self._retire(slot)
        return events
