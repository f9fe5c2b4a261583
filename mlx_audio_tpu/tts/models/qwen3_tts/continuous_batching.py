"""Continuous batching for Qwen3-TTS serving.

Parity: /root/reference/mlx_audio/tts/models/qwen3_tts/continuous_batching.py
(Qwen3TTSBatchSession :37 — admit pending :99, batched advance :169, EOS row
retirement via cache extraction :299-319, left-padded masks :275).

TPU redesign: instead of merging/extracting variable-shape BatchKVCaches per
admission (reallocation churn), the session owns **fixed slots** over a
shared global step axis: every slot writes its KV at the same global offset,
and per-slot validity masks carve out which cache positions each row may
attend to. Admission = a batch-1 prompt prefill spliced into the slot's rows
(ops/kvcache.kv_update_row); retirement = clearing the slot's mask. The
batched decode step is ONE compiled program reused for the session lifetime.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....ops.kvcache import KVCache
from ...continuous import TTSBatchEvent, TTSBatchItem, TTSBatchOptions
from .speech_tokenizer import init_stream_state

MAX_SESSION_STEPS = 4096
HISTORY_LEN = 64


class Qwen3TTSBatchSession:
    """Fixed-slot continuous batch decode for one model instance."""

    def __init__(self, model, options: TTSBatchOptions):
        self.model = model
        self.options = options
        self.B = options.max_batch_size
        tcfg = model.tcfg
        self._dtype = jnp.bfloat16 if any(
            v.dtype == jnp.bfloat16
            for v in jax.tree.leaves(model.params)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
        ) else jnp.float32
        from .talker import make_stacked_caches

        # session timeline capacity: right-size it to the deployment's
        # horizon — decode attention streams the whole fixed buffer every
        # frame, and the batched buffer is the dominant HBM consumer
        # (L x B x T x H x D x 2); max_cache_len=None keeps the 4096 default
        self.cache_len = int(getattr(options, "max_cache_len", None)
                             or MAX_SESSION_STEPS)
        # frames advanced per compiled step() call: one device->host sync
        # per chunk instead of 3+ per frame (each sync costs a full host
        # round-trip; per-frame stepping was latency-bound, not math-bound)
        self.frames_per_step = max(
            1, min(int(options.streaming_interval * 12.5) or 8, 25))
        self.caches = make_stacked_caches(
            tcfg.num_hidden_layers, self.B, self.cache_len,
            tcfg.num_key_value_heads, tcfg.head_dim, self._dtype)
        d = tcfg.hidden_size
        self.embed = jnp.zeros((self.B, 1, d), self._dtype)
        self.valid = jnp.zeros((self.B, self.cache_len), bool)
        self.active = np.zeros(self.B, bool)
        self.finished = jnp.ones((self.B,), bool)
        self.finished_np = np.ones(self.B, bool)
        self.history = jnp.full((self.B, HISTORY_LEN), -1, jnp.int32)
        self.key = jax.random.PRNGKey(0)
        self.t = 0  # global step offset
        self.row_len = jnp.zeros((self.B,), jnp.int32)  # per-row RoPE pos
        # per-row trailing text embeds live on device so the whole
        # embed-advance runs inside the compiled multi-frame scan
        self._tb = 16
        self.trailing = jnp.zeros((self.B, self._tb, d), self._dtype)
        self.t_idx = jnp.zeros((self.B,), jnp.int32)
        self.t_len = jnp.zeros((self.B,), jnp.int32)
        self.pad_embeds = jnp.zeros((self.B, d), self._dtype)
        self.requests: List[Optional[object]] = [None] * self.B
        self.codes: List[List[np.ndarray]] = [[] for _ in range(self.B)]
        # ONE batched codec stream state for the whole session (per-row
        # `offset` so rows admitted at different steps decode through one
        # program); rows are zero-reset in the admit jits. The codec KV
        # buffer is right-sized to the per-stream frame cap — the 4096
        # default reads 30x the needed KV bandwidth per step at b=8.
        codec_cache = min(
            4096, max(128, -(-int(options.max_tokens
                                  + 2 * self.frames_per_step) // 128) * 128))
        self.codec_state = init_stream_state(self.model.dcfg, batch=self.B,
                                             per_row_offset=True,
                                             cache_len=codec_cache)
        self.decoded = [0] * self.B
        self.start_times = [0.0] * self.B
        # admitted rows' first-frame codes awaiting one batched host fetch
        self._first_pending: List[tuple] = []
        # (slot, input_embeds, trailing, pad_embed) waiting for admission —
        # step() admits at most options.admits_per_step of these per call so
        # already-running rows keep streaming between prompt prefills
        self._admit_queue: List[tuple] = []

    # -- protocol ------------------------------------------------------------

    @property
    def idle(self) -> bool:
        return not self.active.any()

    @property
    def available_slots(self) -> int:
        return int((~self.active).sum())

    def submit(self, request) -> None:
        """Reserve a free slot and queue the prompt for staggered admission
        (the prefill itself runs inside step(), at most admits_per_step per
        call, so a burst of submissions never stalls running streams)."""
        slot = int(np.argmax(~self.active))
        if self.active[slot]:
            raise RuntimeError("no free continuous-batch slots")
        text = request.payload
        kwargs = request.normalized_kwargs
        input_embeds, trailing, pad_embed = self.model.prepare_inputs(
            text=text if isinstance(text, str) else None,
            text_ids=kwargs.get("text_ids")
            if not isinstance(text, str) else None,
            language=kwargs.get("language", "auto"),
            speaker=kwargs.get("voice") or kwargs.get("speaker"))
        self.requests[slot] = request
        self.codes[slot] = []
        self.decoded[slot] = 0
        self.start_times[slot] = time.time()
        self.active[slot] = True
        self._admit_queue.append((slot, input_embeds, trailing, pad_embed))

    def add(self, item: TTSBatchItem) -> None:  # protocol alias
        self.submit(item)

    def warmup(self, max_steps: int = 8) -> None:
        """Run one tiny request through the session and reset the timeline.

        Compiles the serial-admission/chunk/decode programs AND — the part
        a compile cache can't cover — allocates the session's large device
        buffers once, so the first real burst doesn't pay allocator stalls
        inside its first step (measured ~0.4 s of the b=8 step-0 drain on
        the tunneled backend). A production broker keeps one session alive,
        so post-warmup TTFA is what requests actually see."""

        class _Req:
            request_id = "__warmup__"
            payload = None
            normalized_kwargs = {"text_ids": np.arange(100, 108)[None]}

            def emit_data(self, *_a, **_k):
                pass

            def emit_done(self, *_a, **_k):
                pass

            def emit_error(self, *_a, **_k):
                pass

        self.submit(_Req())
        for _ in range(max_steps):
            self.step()
            if self.idle:
                break
        if not self.idle:
            self.cancel("__warmup__")
        self.reset_timeline()

    def reset_timeline(self) -> None:
        """Zero the shared timeline of an idle session so its full
        cache_len budget is available again (retired rows already cleared
        their per-row state; KV contents at invalid columns are masked)."""
        if self.active.any():
            raise RuntimeError("reset_timeline requires an idle session")
        self.t = 0
        self.valid = jnp.zeros_like(self.valid)
        self.row_len = jnp.zeros_like(self.row_len)

    def cancel(self, request_id: str) -> None:
        for slot, req in enumerate(self.requests):
            if req is not None and getattr(req, "request_id", None) == \
                    request_id:
                self._retire(slot, emit_done=False)

    def fail(self, error: BaseException) -> None:
        for slot in range(self.B):
            req = self.requests[slot]
            if req is not None:
                req.emit_error(error)
                req.emit_done()
            self._retire(slot, emit_done=False)

    # -- internals -----------------------------------------------------------

    def _admit(self, slot: int, input_embeds, trailing, pad_embed) -> None:
        """Prefill the prompt (batch-1) and splice it into slot's caches."""
        model = self.model
        plen = input_embeds.shape[1]
        pb = 1 << max(4, (plen - 1).bit_length())
        if self.t + pb + 1 + self.frames_per_step > self.cache_len:
            raise RuntimeError(
                f"session timeline exhausted (t={self.t}, cap="
                f"{self.cache_len}): recycle the session or raise "
                "TTSBatchOptions.max_cache_len")
        input_embeds = jnp.pad(
            input_embeds, ((0, 0), (0, pb - plen), (0, 0))).astype(self._dtype)
        fn = model._jit_cache.get(("cb_admit", pb, self.B, self.cache_len))
        if fn is None:
            fn = jax.jit(self._admit_jit, static_argnames=("pb",),
                         donate_argnums=(1, 2, 3, 4, 5, 14))
            model._jit_cache[("cb_admit", pb, self.B, self.cache_len)] = fn
        tb = trailing.shape[1]
        tbb = 1 << max(4, (tb - 1).bit_length())
        trailing = jnp.pad(trailing, ((0, 0), (0, tbb - tb), (0, 0)))
        (self.caches, self.embed, self.valid, self.finished, self.history,
         self.codec_state, first_codes, fin0) = fn(
            model.params, self.caches, self.embed, self.valid, self.finished,
            self.history, input_embeds, jnp.int32(plen), jnp.int32(slot),
            jnp.int32(self.t), trailing.astype(self._dtype),
            jnp.int32(tb), pad_embed.astype(self._dtype),
            jax.random.fold_in(self.key, self.t + slot), self.codec_state,
            pb=pb)
        # device-side trailing state for the in-scan embed advance;
        # t_idx starts at 1: _step0 consumed trailing[0] (matches the
        # single-stream GenCarry.trailing_idx init, qwen3_tts.py:1136)
        if tbb > self._tb:
            self.trailing = jnp.pad(
                self.trailing, ((0, 0), (0, tbb - self._tb), (0, 0)))
            self._tb = tbb
        self.trailing = self.trailing.at[slot].set(0.0).at[
            slot, :trailing.shape[1]].set(trailing[0].astype(self._dtype))
        self.t_idx = self.t_idx.at[slot].set(1)
        self.t_len = self.t_len.at[slot].set(tb)
        self.pad_embeds = self.pad_embeds.at[slot].set(
            pad_embed.reshape(-1).astype(self._dtype))
        # keep first_codes on device (fetched lazily at decode time) and
        # assume not-finished: admission stays sync-free (each host sync
        # costs a full round-trip). A pathological first-token EOS is still
        # handled — the device-side `finished` is already set, the next
        # chunk's trajectory reports it, and the slot retires then.
        if hasattr(first_codes, "copy_to_host_async"):
            first_codes.copy_to_host_async()
        self._first_pending.append(([slot], first_codes[None]))
        self.codes[slot] = []
        self.row_len = self.row_len.at[slot].set(plen)
        # next batched step writes this row's frame-1 KV at column t0+plen
        # (contiguous with the splice; advancing plen+1 here would leave a
        # hole column that the attend mask could never cover)
        self.t += plen
        self.finished_np[slot] = False

    def _admit_jit(self, params, caches, embed, valid, finished, history,
                   prompt_embeds, plen, slot, t0, trailing, tlen, pad_embed,
                   key, codec_state, *, pb):
        from .talker import make_stacked_caches, talker_forward

        model = self.model
        tcfg = model.tcfg
        # batch-1 prefill of the prompt
        small = make_stacked_caches(
            tcfg.num_hidden_layers, 1, pb, tcfg.num_key_value_heads,
            tcfg.head_dim, prompt_embeds.dtype)
        pmask = jnp.where(jnp.arange(pb)[None, None, None, :] < plen, 0.0,
                          -jnp.inf)
        logits, hidden, small = talker_forward(
            params["talker"], tcfg, prompt_embeds, small, 0,
            lengths_mask=pmask)
        # splice prompt KV into the slot rows at [t0, t0+pb): caches are
        # stacked (L, B, T, H, D); small is (L, 1, pb, H, D)
        caches = KVCache(
            jax.lax.dynamic_update_slice(
                caches.k, small.k.astype(caches.k.dtype),
                (0, slot, t0, 0, 0)),
            jax.lax.dynamic_update_slice(
                caches.v, small.v.astype(caches.v.dtype),
                (0, slot, t0, 0, 0)))
        valid = jax.lax.fori_loop(
            0, plen, lambda j, v: v.at[slot, t0 + j].set(True), valid)
        # sample the first frame for this row (step0 logic, batch 1)
        carry1, first_codes, fin = model._step0(
            params, logits[jnp.arange(1), plen - 1],
            hidden[jnp.arange(1), plen - 1], small, trailing, tlen,
            pad_embed, plen, key, temperature=self.options.temperature,
            top_k=self.options.top_k, top_p=self.options.top_p)
        first_codes = first_codes[0]                      # (G,) batch 1
        # place the next-input embed; step0 only samples from prefill
        # logits (no new KV): the first frame token's KV is written by the
        # next batched step at global column t0+plen, contiguously after
        # the prompt splice.
        embed = embed.at[slot].set(carry1.embed[0])
        finished = finished.at[slot].set(fin[0])
        history = history.at[slot].set(
            jnp.full((HISTORY_LEN,), -1, jnp.int32))
        history = history.at[slot, -1].set(first_codes[0])
        # fresh codec stream for this slot (state rows are per-request)
        codec_state = jax.tree.map(lambda x: x.at[slot].set(0), codec_state)
        return (caches, embed, valid, finished, history, codec_state,
                first_codes, fin[0])

    def _admit_many(self, group) -> None:
        """Prefill a burst of queued prompts in ONE batched dispatch.

        A cold burst of B requests serially prefilled costs B talker passes
        and stretches the last admitted stream's TTFA past 2 s (measured,
        b=8); the prompts are independent, so one (n, pb) batched forward
        streams the talker weights once for the whole group. Each row's KV
        is then spliced into its slot rows exactly as serial admission
        would have — same shared-timeline layout, same garbage-tail
        invariant (columns >= t stay invalid until a chunk writes them)."""
        if len(group) == 1:
            slot, ie, tr, pe = group[0]
            self._admit(slot, ie, tr, pe)
            return
        model = self.model
        n = len(group)
        plens = [ie.shape[1] for _, ie, _, _ in group]
        pb = 1 << max(4, (max(plens) - 1).bit_length())
        t0s, t = [], self.t
        for plen in plens:
            if t + pb + 1 + self.frames_per_step > self.cache_len:
                raise RuntimeError(
                    f"session timeline exhausted (t={t}, cap="
                    f"{self.cache_len}): recycle the session or raise "
                    "TTSBatchOptions.max_cache_len")
            t0s.append(t)
            t += plen
        embeds = jnp.stack([
            jnp.pad(ie[0], ((0, pb - ie.shape[1]), (0, 0)))
            for _, ie, _, _ in group]).astype(self._dtype)        # (n,pb,d)
        tbs = [tr.shape[1] for _, _, tr, _ in group]
        tbb = 1 << max(4, (max(tbs) - 1).bit_length())
        if tbb > self._tb:          # grow the session's trailing buffer
            self.trailing = jnp.pad(
                self.trailing, ((0, 0), (0, tbb - self._tb), (0, 0)))
            self._tb = tbb
        trail = jnp.stack([
            jnp.pad(tr[0], ((0, self._tb - tr.shape[1]), (0, 0)))
            for _, _, tr, _ in group]).astype(self._dtype)        # (n,_tb,d)
        pads = jnp.stack([pe.reshape(-1) for *_, pe in group]
                         ).astype(self._dtype)                    # (n,d)
        slots_a = jnp.asarray([s for s, *_ in group], jnp.int32)
        t0s_a = jnp.asarray(t0s, jnp.int32)
        plens_a = jnp.asarray(plens, jnp.int32)
        tlens_a = jnp.asarray(tbs, jnp.int32)
        key = jax.random.fold_in(self.key, self.t)
        fnkey = ("cb_admit_many", n, pb, self._tb, self.B, self.cache_len)
        fn = model._jit_cache.get(fnkey)
        if fn is None:
            fn = jax.jit(self._admit_many_jit, static_argnames=("pb",),
                         donate_argnums=(1, 2, 3, 4, 5, 14, 15, 16, 17, 18,
                                         19))
            model._jit_cache[fnkey] = fn
        (self.caches, self.embed, self.valid, self.finished, self.history,
         self.trailing, self.t_idx, self.t_len, self.pad_embeds,
         self.row_len, self.codec_state, first_codes) = fn(
            model.params, self.caches, self.embed, self.valid,
            self.finished, self.history, embeds, plens_a, slots_a, t0s_a,
            trail, tlens_a, pads, key, self.trailing, self.t_idx,
            self.t_len, self.pad_embeds, self.row_len, self.codec_state,
            pb=pb)
        if hasattr(first_codes, "copy_to_host_async"):
            first_codes.copy_to_host_async()
        # defer the host materialization: step() fetches the whole (n, G)
        # array in ONE transfer after the chunk sync (a per-row np.asarray
        # of device slices cost n sequential tunnel round trips)
        self._first_pending.append(
            ([slot for slot, *_ in group], first_codes))
        for slot, ie, tr, pe in group:
            self.codes[slot] = []
            self.finished_np[slot] = False
        self.t = t

    def _admit_many_jit(self, params, caches, embed, valid, finished,
                        history, prompt_embeds, plens, slots, t0s, trailing,
                        tlens, pad_embeds, key, sess_trailing, sess_t_idx,
                        sess_t_len, sess_pad_embeds, sess_row_len,
                        codec_state, *, pb):
        from .talker import make_stacked_caches, talker_forward

        model = self.model
        tcfg = model.tcfg
        n = prompt_embeds.shape[0]
        # one batched prefill of the whole group (weights stream once)
        small = make_stacked_caches(
            tcfg.num_hidden_layers, n, pb, tcfg.num_key_value_heads,
            tcfg.head_dim, prompt_embeds.dtype)
        pmask = jnp.where(
            jnp.arange(pb)[None, None, None, :]
            < plens[:, None, None, None], 0.0, -jnp.inf)
        logits, hidden, small = talker_forward(
            params["talker"], tcfg, prompt_embeds, small, 0,
            lengths_mask=pmask)
        # splice each row's KV at its own timeline offset; rows are laid out
        # in admission order, so later updates overwrite earlier rows'
        # padding garbage exactly as serial admission does
        for i in range(n):
            caches = KVCache(
                jax.lax.dynamic_update_slice(
                    caches.k, small.k[:, i:i + 1].astype(caches.k.dtype),
                    (0, slots[i], t0s[i], 0, 0)),
                jax.lax.dynamic_update_slice(
                    caches.v, small.v[:, i:i + 1].astype(caches.v.dtype),
                    (0, slots[i], t0s[i], 0, 0)))
        cols = jnp.arange(valid.shape[1])
        for i in range(n):
            row = (cols >= t0s[i]) & (cols < t0s[i] + plens[i])
            valid = valid.at[slots[i]].set(valid[slots[i]] | row)
        # batched step0: sample the first frame of every admitted row
        carry1, all_codes, fin = model._step0(
            params, logits[jnp.arange(n), plens - 1],
            hidden[jnp.arange(n), plens - 1], small, trailing,
            tlens[:, None, None], pad_embeds[:, None, :], jnp.int32(0),
            key, temperature=self.options.temperature,
            top_k=self.options.top_k, top_p=self.options.top_p)
        embed = embed.at[slots].set(carry1.embed)
        finished = finished.at[slots].set(fin)
        hist_rows = jnp.full((n, HISTORY_LEN), -1, jnp.int32).at[:, -1].set(
            all_codes[:, 0])
        history = history.at[slots].set(hist_rows)
        # per-row session state scatters, fused here so admission adds ZERO
        # extra device launches (each eager .at[].set is a separate tunnel
        # round trip; 5 scatters x n rows dominated the step-0 drain)
        sess_trailing = sess_trailing.at[slots].set(trailing)
        sess_t_idx = sess_t_idx.at[slots].set(1)
        sess_t_len = sess_t_len.at[slots].set(tlens)
        sess_pad_embeds = sess_pad_embeds.at[slots].set(
            pad_embeds.astype(sess_pad_embeds.dtype))
        sess_row_len = sess_row_len.at[slots].set(plens)
        # fresh codec streams for the admitted rows
        codec_state = jax.tree.map(lambda x: x.at[slots].set(0), codec_state)
        return (caches, embed, valid, finished, history, sess_trailing,
                sess_t_idx, sess_t_len, sess_pad_embeds, sess_row_len,
                codec_state, all_codes)

    def _make_step(self, k_frames: int):
        """ONE compiled program advancing k_frames for every slot: talker
        forward + code predictor + history/validity bookkeeping + the
        trailing-text embed advance, all inside a lax.scan. The host pays a
        single device sync per chunk (the packed codes+finished fetch)
        instead of 3+ per frame."""
        model = self.model
        tcfg, cpcfg = model.tcfg, model.cpcfg
        opts = self.options
        eos = tcfg.codec_eos_token_id
        n_groups = tcfg.num_code_groups
        suppress = jnp.asarray(model._suppress_mask())
        from ....ops.sampling import apply_repetition_penalty, top_k_top_p_filter
        from ....nn import apply_embedding
        from .talker import code_predictor_sample, talker_forward

        def sample(k, lg):
            lg = lg.astype(jnp.float32)
            if opts.temperature == 0.0:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg = top_k_top_p_filter(lg / opts.temperature, top_k=opts.top_k,
                                    top_p=opts.top_p)
            return jax.random.categorical(k, lg, axis=-1).astype(jnp.int32)

        def chunk(params, caches, embed, valid, finished, history, t,
                  row_len, trailing, t_idx, t_len, pad_embeds, key):
            def one_frame(carry, _):
                (caches, embed, valid, finished, history, t, row_len,
                 t_idx, key) = carry
                # each row attends to its own valid positions + the token
                # written at global column t; RoPE uses row-local positions
                attend = valid.at[:, t].set(True)
                logits, hidden, caches = talker_forward(
                    params["talker"], tcfg, embed, caches, t,
                    lengths_mask=attend, positions=row_len[:, None])
                lg = logits[:, -1] + suppress
                if opts.repetition_penalty != 1.0:
                    lg = apply_repetition_penalty(lg, history,
                                                  opts.repetition_penalty)
                key, k0 = jax.random.split(key)
                tok0 = sample(k0, lg)
                cp = params["talker"]["code_predictor"]
                emb_fn = lambda ids: apply_embedding(
                    params["talker"]["model"]["codec_embedding"], ids)
                code0_embed = emb_fn(tok0[:, None])
                cp_codes, cp_emb_sum, key = code_predictor_sample(
                    cp, cpcfg, hidden[:, -1:], code0_embed, key,
                    sample, n_groups)
                all_codes = jnp.concatenate([tok0[:, None], cp_codes],
                                            axis=-1)
                now_fin = finished | (tok0 == eos)
                history = jnp.where(
                    finished[:, None], history,
                    jnp.roll(history, -1, axis=-1).at[:, -1].set(tok0))
                valid = valid.at[:, t].set(valid[:, t] | ~finished)
                # next-input embed: per-row trailing text + codec embeds
                idx = jnp.minimum(t_idx, trailing.shape[1] - 1)
                text_e = jnp.take_along_axis(
                    trailing, idx[:, None, None].repeat(
                        trailing.shape[-1], -1), axis=1)  # (B, 1, D)
                text_e = jnp.where((t_idx < t_len)[:, None, None], text_e,
                                   pad_embeds[:, None, :])
                embed = (text_e + code0_embed
                         + cp_emb_sum).astype(embed.dtype)
                row_len = row_len + (~finished).astype(row_len.dtype)
                new_carry = (caches, embed, valid, now_fin, history, t + 1,
                             row_len, t_idx + 1, key)
                return new_carry, (all_codes, now_fin)

            carry = (caches, embed, valid, finished, history, t, row_len,
                     t_idx, key)
            carry, (codes, fins) = jax.lax.scan(one_frame, carry, None,
                                                length=k_frames)
            (caches, embed, valid, finished, history, t, row_len,
             t_idx, key) = carry
            # pack (K, B, G) codes + (K, B) finished into one int32 fetch
            packed = jnp.concatenate(
                [codes, fins[..., None].astype(jnp.int32)], axis=-1)
            return (caches, embed, valid, finished, history, row_len,
                    t_idx, key, packed)

        return jax.jit(chunk, donate_argnums=(1,))

    def shard_for_mesh(self, mesh, axis: str = "dp") -> None:
        """Lay the session out for data-parallel serving on a device mesh:
        params replicated, every per-slot state array sharded on its batch
        axis (one slot group per device). The compiled multi-frame step then
        runs SPMD with no cross-device collectives in the hot loop — each
        row's KV, masks and sampling state are row-local (SURVEY §2.10 DP
        plan; exercised by __graft_entry__.dryrun_multichip leg 6)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = mesh.shape[axis]
        if self.B % n:
            raise ValueError(
                f"max_batch_size={self.B} not divisible by mesh "
                f"axis {axis}={n}")
        rep = NamedSharding(mesh, P())

        def dp(x, batch_axis=0):
            spec = [None] * x.ndim
            spec[batch_axis] = axis
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))

        self.model.params = jax.tree.map(
            lambda x: jax.device_put(x, rep)
            if isinstance(x, jax.Array) else x, self.model.params)
        self.model._jit_cache.clear()
        self.caches = KVCache(dp(self.caches.k, 1), dp(self.caches.v, 1))
        for name in ("embed", "valid", "finished", "history", "row_len",
                     "trailing", "t_idx", "t_len", "pad_embeds"):
            setattr(self, name, dp(getattr(self, name)))
        # batched codec stream state: every leaf is batch-leading
        self.codec_state = jax.tree.map(dp, self.codec_state)
        self.key = jax.device_put(self.key, rep)

    def _materialize_first_codes(self):
        """Fetch admitted rows' first-frame codes: one (n, G) transfer per
        admission group, inserted ahead of any chunk blocks."""
        for slots, dev in self._first_pending:
            arr = np.asarray(dev)
            for i, slot in enumerate(slots):
                if self.active[slot]:
                    self.codes[slot].insert(0, arr[i][None])
        self._first_pending = []

    def _decode_batch(self, rows):
        """Decode `rows` = [(slot, n_frames)] (n_frames <= frames_per_step)
        in ONE row-masked batched program; returns the (B, k*spf) device
        audio. Rows not in `rows` keep their stream state frozen. Short
        final blocks are zero-padded to k — the codec is causal, so the
        first n_frames*spf samples are exact, and the polluted post-EOS
        state is reset at the row's next admission anyway."""
        model = self.model
        k = self.frames_per_step
        g = model.tcfg.num_code_groups
        blocks = np.zeros((self.B, g, k), np.int32)
        mask = np.zeros((self.B,), bool)
        for slot, nf in rows:
            blk = np.concatenate(
                [np.asarray(c) for c in self.codes[slot]], axis=0)[
                self.decoded[slot]: self.decoded[slot] + nf]
            blocks[slot, :, :nf] = blk.T
            mask[slot] = True
            self.decoded[slot] += nf
        fn = model._get_batch_stream_decoder(self.B, k)
        self.codec_state, audio = fn(model.params, self.codec_state,
                                     jnp.asarray(blocks), jnp.asarray(mask))
        return audio

    def step(self) -> List[TTSBatchEvent]:
        """One compiled multi-frame chunk + per-slot codec streaming.

        At most options.admits_per_step queued prompts are prefilled first,
        then every admitted row advances k_frames — staggered admission
        keeps early streams' audio flowing while later prompts prefill."""
        if self.idle:
            return []
        _t0 = time.perf_counter()
        model = self.model
        n_admit = max(1, int(getattr(self.options, "admits_per_step", 2)
                             or 1))
        if self._admit_queue:
            # staggering protects LIVE streams from prefill stalls; a cold
            # burst has none to protect, so admit the whole queue in one
            # batched prefill (serial admission put the last stream's TTFA
            # past 2 s at b=8 — measured; batched puts every stream's first
            # frame in this same step)
            live = any(self.active[s] and len(self.codes[s]) > 0
                       and not self.finished_np[s] for s in range(self.B))
            take = min(n_admit, len(self._admit_queue)) if live \
                else len(self._admit_queue)
            group = []
            for _ in range(take):
                slot, ie, tr, pe = self._admit_queue.pop(0)
                if not self.active[slot]:  # cancelled while queued
                    continue
                group.append((slot, ie, tr, pe))
            if group:
                self._admit_many(group)
        k_frames = self.frames_per_step
        spf = model.total_upsample
        if self.t + k_frames > self.cache_len:
            # timeline exhausted: flush + finish everything still active.
            # Per-row pending never exceeds ~k+1 (decode runs every step),
            # so a couple of batched k-frame passes drain everything.
            events: List[TTSBatchEvent] = []
            self._materialize_first_codes()
            chunks: Dict[int, List[np.ndarray]] = {}
            while True:
                rows = []
                for slot in range(self.B):
                    if not self.active[slot]:
                        continue
                    pend = (sum(c.shape[0] for c in self.codes[slot])
                            - self.decoded[slot])
                    if pend > 0:
                        rows.append((slot, min(pend, k_frames)))
                if not rows:
                    break
                audio_dev = self._decode_batch(rows)
                audio_np = np.asarray(audio_dev)
                for slot, nf in rows:
                    chunks.setdefault(slot, []).append(
                        audio_np[slot, :nf * spf])
            for slot in range(self.B):
                if not self.active[slot]:
                    continue
                req = self.requests[slot]
                parts = chunks.get(slot)
                if parts and req is not None:
                    req.emit_data({"audio": np.concatenate(parts),
                                   "sample_rate": model.sample_rate,
                                   "is_final": True})
                self.finished = self.finished.at[slot].set(True)
                self.finished_np[slot] = True
                self._finish_slot(slot)
                events.append(TTSBatchEvent(
                    request_id=getattr(req, "request_id", str(slot))
                    if req else str(slot), kind="done"))
            return events
        key = ("cb_step", self.B, k_frames, self._tb, self.cache_len,
               self.options.temperature, self.options.top_k,
               self.options.top_p, self.options.repetition_penalty)
        fn = model._jit_cache.get(key)
        if fn is None:
            fn = self._make_step(k_frames)
            model._jit_cache[key] = fn
        _t_dispatch = time.perf_counter()
        (self.caches, self.embed, self.valid, self.finished, self.history,
         self.row_len, self.t_idx, self.key, packed) = fn(
            model.params, self.caches, self.embed, self.valid,
            self.finished, self.history, jnp.int32(self.t), self.row_len,
            self.trailing, self.t_idx, self.t_len, self.pad_embeds,
            self.key)
        _t_sync = time.perf_counter()
        packed_np = np.asarray(packed)          # the chunk's one device sync
        _t_mat = time.perf_counter()
        self._materialize_first_codes()
        # per-step wall attribution (admit/dispatch/drain/fetch), kept
        # fresh for profiling and the bench's sync accounting
        self.last_step_timing = {
            "admit_s": _t_dispatch - _t0,
            "dispatch_s": _t_sync - _t_dispatch,
            "chunk_sync_s": _t_mat - _t_sync,
            "first_mat_s": time.perf_counter() - _t_mat,
        }
        g = model.tcfg.num_code_groups
        codes_np = packed_np[..., :g]           # (K, B, G)
        fin_traj = packed_np[..., g].astype(bool)
        # finished state at the START of each frame (frame 0 = pre-chunk)
        starts = np.vstack([self.finished_np[None], fin_traj[:-1]])
        prev_fin = self.finished_np
        self.finished_np = fin_traj[-1].copy()
        self.t += k_frames
        events = []
        finals: Dict[int, bool] = {}
        to_finish: List[tuple] = []             # (slot, req)
        full_rows: List[tuple] = []             # (slot, k) regular blocks
        tail_rows: List[tuple] = []             # (slot, nf<k) final tails
        for slot in range(self.B):
            if not self.active[slot]:
                continue
            req = self.requests[slot]
            n_before = sum(c.shape[0] for c in self.codes[slot])
            keep = ~starts[:, slot] & ~fin_traj[:, slot]
            allowed = max(0, self.options.max_tokens - n_before)
            block = codes_np[keep, slot][:allowed]
            if len(block):
                self.codes[slot].append(block)
            n_valid = n_before + len(block)
            newly_fin = fin_traj[-1, slot] and not prev_fin[slot]
            hit_max = n_valid >= self.options.max_tokens
            fin = newly_fin or hit_max
            pend = n_valid - self.decoded[slot]
            if pend >= k_frames:
                full_rows.append((slot, k_frames))
                pend -= k_frames
            if fin and pend > 0:
                tail_rows.append((slot, pend))
            if fin:
                finals[slot] = True
            if hit_max and not fin_traj[-1, slot]:
                self.finished = self.finished.at[slot].set(True)
                self.finished_np[slot] = True
            if fin:
                to_finish.append((slot, req))
        # ONE batched decode for the regular k-frame blocks (per-slot
        # decodes cost B launches + B fetches per step), plus one more for
        # the finishing rows' short tails when streams end this step
        _t_dec = time.perf_counter()
        chunks: Dict[int, List[np.ndarray]] = {}
        for rows in (full_rows, tail_rows):
            if not rows:
                continue
            audio_np = np.asarray(self._decode_batch(rows))
            for slot, nf in rows:
                chunks.setdefault(slot, []).append(audio_np[slot, :nf * spf])
        self.last_step_timing["decode_s"] = time.perf_counter() - _t_dec
        for slot, parts in chunks.items():
            req = self.requests[slot]
            audio = parts[0] if len(parts) == 1 else np.concatenate(parts)
            if len(audio) and req is not None:
                req.emit_data({"audio": audio,
                               "sample_rate": model.sample_rate,
                               "is_final": bool(finals.get(slot))})
                events.append(TTSBatchEvent(
                    request_id=getattr(req, "request_id", str(slot)),
                    kind="chunk", audio=audio,
                    sample_rate=model.sample_rate,
                    token_count=self.decoded[slot]))
        # retire finishing slots only after their final audio was emitted
        for slot, req in to_finish:
            self._finish_slot(slot)
            events.append(TTSBatchEvent(
                request_id=getattr(req, "request_id", str(slot))
                if req else str(slot), kind="done"))
        return events

    def _finish_slot(self, slot: int) -> None:
        req = self.requests[slot]
        if req is not None:
            req.emit_done()
        self._retire(slot, emit_done=False)

    def _retire(self, slot: int, emit_done: bool = True) -> None:
        if emit_done and self.requests[slot] is not None:
            self.requests[slot].emit_done()
        self.active[slot] = False
        self.requests[slot] = None
        self.row_len = self.row_len.at[slot].set(0)
        self.valid = self.valid.at[slot].set(False)
        self.finished = self.finished.at[slot].set(True)
        self.finished_np[slot] = True
        self.t_len = self.t_len.at[slot].set(0)
        self.codes[slot] = []
