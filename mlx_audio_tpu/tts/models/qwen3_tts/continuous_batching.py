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

        self.caches = make_stacked_caches(
            tcfg.num_hidden_layers, self.B, MAX_SESSION_STEPS,
            tcfg.num_key_value_heads, tcfg.head_dim, self._dtype)
        d = tcfg.hidden_size
        self.embed = jnp.zeros((self.B, 1, d), self._dtype)
        self.valid = jnp.zeros((self.B, MAX_SESSION_STEPS), bool)
        self.active = np.zeros(self.B, bool)
        self.finished = jnp.ones((self.B,), bool)
        self.history = jnp.full((self.B, HISTORY_LEN), -1, jnp.int32)
        self.key = jax.random.PRNGKey(0)
        self.t = 0  # global step offset
        self.row_len = np.zeros(self.B, np.int64)
        self.requests: List[Optional[object]] = [None] * self.B
        self.codes: List[List[np.ndarray]] = [[] for _ in range(self.B)]
        self.codec_states = [None] * self.B
        self.decoded = [0] * self.B
        self.start_times = [0.0] * self.B

    # -- protocol ------------------------------------------------------------

    @property
    def idle(self) -> bool:
        return not self.active.any()

    @property
    def available_slots(self) -> int:
        return int((~self.active).sum())

    def submit(self, request) -> None:
        """Admit a broker InferenceRequest (text payload) into a free slot."""
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
        self._admit(slot, input_embeds, trailing, pad_embed)
        self.requests[slot] = request
        self.codes[slot] = []
        self.codec_states[slot] = init_stream_state(self.model.dcfg, batch=1)
        self.decoded[slot] = 0
        self.start_times[slot] = time.time()
        self.active[slot] = True

    def add(self, item: TTSBatchItem) -> None:  # protocol alias
        self.submit(item)

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
        input_embeds = jnp.pad(
            input_embeds, ((0, 0), (0, pb - plen), (0, 0))).astype(self._dtype)
        fn = model._jit_cache.get(("cb_admit", pb, self.B))
        if fn is None:
            fn = jax.jit(self._admit_jit, static_argnames=("pb",),
                         donate_argnums=(1, 2, 3, 4, 5))
            model._jit_cache[("cb_admit", pb, self.B)] = fn
        tb = trailing.shape[1]
        tbb = 1 << max(4, (tb - 1).bit_length())
        trailing = jnp.pad(trailing, ((0, 0), (0, tbb - tb), (0, 0)))
        (self.caches, self.embed, self.valid, self.finished, self.history,
         first_codes, fin0) = fn(
            model.params, self.caches, self.embed, self.valid, self.finished,
            self.history, input_embeds, jnp.int32(plen), jnp.int32(slot),
            jnp.int32(self.t), trailing.astype(self._dtype),
            jnp.int32(tb), pad_embed.astype(self._dtype),
            jax.random.fold_in(self.key, self.t + slot), pb=pb)
        self._slot_trailing = getattr(self, "_slot_trailing", {})
        self._slot_trailing[slot] = (trailing.astype(self._dtype), tb, 0)
        self.codes[slot] = [np.asarray(first_codes)[None]]
        self.row_len[slot] = plen
        self.t += plen + 1
        if bool(np.asarray(fin0)):
            self._finish_slot(slot)

    def _admit_jit(self, params, caches, embed, valid, finished, history,
                   prompt_embeds, plen, slot, t0, trailing, tlen, pad_embed,
                   key, *, pb):
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
        # place the next-input embed + mark position t0+plen valid
        embed = embed.at[slot].set(carry1.embed[0])
        valid = valid.at[slot, t0 + plen].set(True)
        # ... and write the kv produced by step0? step0 only samples from
        # prefill logits; no new kv beyond the prompt. The sampled frame's
        # token kv is written by the next batched step.
        finished = finished.at[slot].set(fin[0])
        history = history.at[slot].set(
            jnp.full((HISTORY_LEN,), -1, jnp.int32))
        history = history.at[slot, -1].set(first_codes[0])
        return caches, embed, valid, finished, history, first_codes, fin[0]

    def _make_step(self):
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

        def step(params, caches, embed, valid, finished, history, t,
                 row_len, key):
            b = embed.shape[0]
            # each row attends to its own valid positions + the token being
            # written at global cache column t; RoPE uses row-local positions
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
            cp_codes, _, key = code_predictor_sample(
                cp, cpcfg, hidden[:, -1:], emb_fn(tok0[:, None]), key,
                sample, n_groups)
            all_codes = jnp.concatenate([tok0[:, None], cp_codes], axis=-1)
            now_fin = finished | (tok0 == eos)
            history = jnp.where(
                finished[:, None], history,
                jnp.roll(history, -1, axis=-1).at[:, -1].set(tok0))
            valid = valid.at[:, t].set(valid[:, t] | ~finished)
            return (caches, all_codes, now_fin, history, valid, key)

        return jax.jit(step, donate_argnums=(1,))

    def step(self) -> List[TTSBatchEvent]:
        """One batched decode step + per-slot codec streaming."""
        if self.idle:
            return []
        model = self.model
        fn = model._jit_cache.get(("cb_step", self.B, self.options.temperature,
                                   self.options.top_k, self.options.top_p,
                                   self.options.repetition_penalty))
        if fn is None:
            fn = self._make_step()
            model._jit_cache[("cb_step", self.B, self.options.temperature,
                              self.options.top_k, self.options.top_p,
                              self.options.repetition_penalty)] = fn
        (self.caches, all_codes, now_fin, self.history, self.valid,
         self.key) = fn(model.params, self.caches, self.embed, self.valid,
                        self.finished, self.history, jnp.int32(self.t),
                        jnp.asarray(self.row_len, jnp.int32), self.key)
        self.row_len += (~np.asarray(self.finished)).astype(np.int64)
        # next-input embeds must advance per row (trailing text embeds)
        self._advance_embeds(all_codes)
        prev_fin = np.asarray(self.finished)
        self.finished = now_fin
        fin_np = np.asarray(now_fin)
        codes_np = np.asarray(all_codes)
        self.t += 1
        events: List[TTSBatchEvent] = []
        chunk_frames = max(int(self.options.streaming_interval * 12.5), 4)
        for slot in range(self.B):
            if not self.active[slot]:
                continue
            if not prev_fin[slot] and not fin_np[slot]:
                self.codes[slot].append(codes_np[slot][None])
            n_valid = sum(c.shape[0] for c in self.codes[slot])
            req = self.requests[slot]
            if fin_np[slot] and not prev_fin[slot] or \
                    n_valid - self.decoded[slot] >= chunk_frames:
                audio = self._decode_slot(slot, n_valid)
                if audio is not None and len(audio) and req is not None:
                    req.emit_data({
                        "audio": audio, "sample_rate": model.sample_rate,
                        "is_final": bool(fin_np[slot])})
                    events.append(TTSBatchEvent(
                        request_id=getattr(req, "request_id", str(slot)),
                        kind="chunk", audio=audio,
                        sample_rate=model.sample_rate, token_count=n_valid))
            if fin_np[slot] and not prev_fin[slot]:
                self._finish_slot(slot)
                events.append(TTSBatchEvent(
                    request_id=getattr(req, "request_id", str(slot))
                    if req else str(slot), kind="done"))
            elif n_valid >= self.options.max_tokens:
                audio = self._decode_slot(slot, n_valid)
                if audio is not None and len(audio) and req is not None:
                    req.emit_data({"audio": audio,
                                   "sample_rate": model.sample_rate,
                                   "is_final": True})
                self.finished = self.finished.at[slot].set(True)
                self._finish_slot(slot)
        return events

    def _advance_embeds(self, all_codes) -> None:
        """Build each row's next input embed = trailing text + codec sum."""
        model = self.model
        fn = model._jit_cache.get(("cb_embed", self.B))
        if fn is None:
            from ....nn import apply_embedding

            def embed_fn(params, codes, trailing, t_idx, t_len, pad_embed):
                cp_emb = params["talker"]["code_predictor"]["model"][
                    "codec_embedding"]["weight"]  # (G-1, V, D)
                codec_e = apply_embedding(
                    params["talker"]["model"]["codec_embedding"],
                    codes[:, 0:1])
                # vectorized per-group gather: sum_g cp_emb[g][codes[:,g+1]]
                g1 = model.tcfg.num_code_groups - 1
                gathered = jax.vmap(
                    lambda tbl, ids: tbl[ids], in_axes=(0, 1),
                    out_axes=1)(cp_emb, codes[:, 1:g1 + 1])  # (B, G-1, D)
                codec_e = codec_e + gathered.sum(axis=1, keepdims=True)
                tb = trailing.shape[1]
                idx = jnp.minimum(t_idx, tb - 1)
                text_e = jnp.take_along_axis(
                    trailing, idx[:, None, None].repeat(
                        trailing.shape[-1], -1), axis=1)
                text_e = jnp.where((t_idx < t_len)[:, None, None], text_e,
                                   pad_embed)
                return text_e + codec_e

            fn = jax.jit(embed_fn)
            model._jit_cache[("cb_embed", self.B)] = fn
        # assemble per-slot trailing state into batch tensors
        d = model.tcfg.hidden_size
        tb_max = max((tr.shape[1] for tr, _, _ in
                      getattr(self, "_slot_trailing", {}).values()),
                     default=16)
        trailing = jnp.zeros((self.B, tb_max, d), self._dtype)
        t_idx = np.zeros(self.B, np.int32)
        t_len = np.zeros(self.B, np.int32)
        pad = jnp.zeros((1, 1, d), self._dtype)
        for slot, (tr, ln, idx) in getattr(self, "_slot_trailing",
                                           {}).items():
            trailing = trailing.at[slot, : tr.shape[1]].set(
                tr[0].astype(self._dtype))
            t_idx[slot] = idx
            t_len[slot] = ln
            self._slot_trailing[slot] = (tr, ln, idx + 1)
        self.embed = fn(model.params, all_codes, trailing,
                        jnp.asarray(t_idx), jnp.asarray(t_len), pad)

    def _decode_slot(self, slot: int, n_valid: int) -> Optional[np.ndarray]:
        model = self.model
        if n_valid <= self.decoded[slot]:
            return None
        block = np.concatenate(self.codes[slot], axis=0)[
            self.decoded[slot]: n_valid]
        codes = jnp.asarray(block.T[None])
        fn = model._get_stream_decoder(codes.shape[-1])
        self.codec_states[slot], audio = fn(model.params,
                                            self.codec_states[slot], codes)
        self.decoded[slot] = n_valid
        return np.asarray(audio[0])

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
        self.row_len[slot] = 0
        self.valid = self.valid.at[slot].set(False)
        self.finished = self.finished.at[slot].set(True)
        self.codec_states[slot] = None
        self.codes[slot] = []
