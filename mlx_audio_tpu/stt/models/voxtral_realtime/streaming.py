"""Cache-aware live streaming for Voxtral Realtime.

Parity: reference stt/models/voxtral_realtime/streaming.py — feed()/close()
queue raw samples cheaply, step() does bounded work and returns text deltas
(:388-533); incremental mel (:82-218), streaming conv stem with per-conv
history (:221-340), per-layer sliding-window encoder caches (:342-386), and
the decoder prefill-then-lockstep continuation (:599-733).

TPU design: the encoder stream runs in FIXED 64-frame chunks through ONE
jitted program whose per-layer state is a RingKVCache (ops/kvcache.py
ring_update/ring_mask) — a fixed (1, cap, H, D) buffer with slot = pos %%
cap, so a session of any length reuses one compiled step and O(1) writes
(the reference reallocates/rolls its rotating cache in Python).  Mel and
conv-stem history are tiny host-side numpy tails; start/end reflect padding
collapses to zeros because the stream is seeded/flushed with silence,
matching the offline path bit-for-bit.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import StreamingEvent
from ....nn import apply_linear, apply_rms_norm
from ....ops.attention import attention
from ....ops.kvcache import KVCache, kv_update, ring_mask, ring_update
from ....ops.rope import apply_rope_interleaved, rope_freqs
from .voxtral_realtime import (RAW_AUDIO_LENGTH_PER_TOK, SAMPLE_RATE,
                               ada_scales, compute_time_embedding,
                               conv_stem, decoder_forward,
                               downsample_project, voxtral_mel,
                               _num_delay_tokens)

Array = jax.Array

ENC_CHUNK = 64          # conv frames per compiled encoder step
RING_CAP = 1024         # >= sliding_window 750 + ENC_CHUNK
DEC_BUCKET = 16         # lockstep decode steps per compiled chunk (>= the
                        # ~13 adapter frames a 1 s feed produces, so a live
                        # session pays ONE dispatch+fetch per second)


def encoder_stream_step(p: dict, e, x: Array, caches: List[KVCache],
                        offset: Array, n_valid: Array):
    """One compiled streaming-encoder step over (1, ENC_CHUNK, dim).

    Writes into per-layer ring caches at absolute conv-frame positions
    and attends through the sliding window; pad frames (beyond n_valid)
    are excluded by the ring mask's write count.
    """
    t = x.shape[1]
    inv_freq = rope_freqs(e.head_dim, e.rope_theta)
    positions = (offset + jnp.arange(t))[None]
    cap = caches[0].k.shape[1]
    mask = ring_mask(cap, e.sliding_window, offset, n_valid, t)
    new = []
    for i in range(e.n_layers):
        blk = p["transformer_layers"][str(i)]
        h = apply_rms_norm(blk["attention_norm"], x, e.norm_eps)
        a = blk["attention"]
        q = apply_linear(a["wq"], h).reshape(1, t, e.n_heads, e.head_dim)
        k = apply_linear(a["wk"], h).reshape(1, t, e.n_heads, e.head_dim)
        v = apply_linear(a["wv"], h).reshape(1, t, e.n_heads, e.head_dim)
        q = apply_rope_interleaved(q, positions, inv_freq)
        k = apply_rope_interleaved(k, positions, inv_freq)
        nc = ring_update(caches[i], k, v, offset)
        new.append(nc)
        o = attention(q, nc.k, nc.v, mask=mask).reshape(1, t, -1)
        x = x + apply_linear(a["wo"], o)
        h = apply_rms_norm(blk["ffn_norm"], x, e.norm_eps)
        x = x + apply_linear(
            blk["feed_forward_w2"],
            jax.nn.silu(apply_linear(blk["feed_forward_w1"], h))
            * apply_linear(blk["feed_forward_w3"], h))
    return apply_rms_norm(p["transformer_norm"], x, e.norm_eps), new


class VoxtralStreamingSession:
    """feed()/close()/step() live transcription (reference :388-533).

    step() drains queued audio through mel -> conv -> ring-cached
    encoder -> adapter frames, prefills the decoder once enough frames
    exist, then decodes up to max_decode_tokens lockstep tokens and
    returns the text deltas.
    """

    def __init__(self, model, *, max_tokens: int = 4096,
                 transcription_delay_ms: Optional[int] = None,
                 max_session_tokens: int = 2048):
        self.model = model
        cfg = model.config
        self.max_tokens = max_tokens
        delay_ms = transcription_delay_ms or cfg.transcription_delay_ms
        self._n_delay = _num_delay_tokens(delay_ms)
        self._n_left = cfg.n_left_pad_tokens
        self._prompt_len = 1 + self._n_left + self._n_delay
        self._cap = max_session_tokens

        e = cfg.encoder_args
        self._ring_cap = max(RING_CAP, e.sliding_window + ENC_CHUNK)
        self._enc_caches = [
            KVCache.init(1, self._ring_cap, e.n_heads, e.head_dim,
                         dtype=jnp.float32) for _ in range(e.n_layers)]
        self._dec_caches = None
        self._scales = jnp.asarray(np.asarray(ada_scales(
            model.params["decoder"], cfg.decoder,
            jnp.asarray(compute_time_embedding(float(self._n_delay),
                                               cfg.decoder.dim)))))

        # host-side stream state
        self._audio_q: List[np.ndarray] = []
        self._lock = threading.Lock()
        self._closed = False
        self._flushed = False
        self._raw = np.zeros(0, np.float32)       # unconsumed samples
        self._mel_hist = np.zeros((0, cfg.audio_encoding_args
                                   .num_mel_bins), np.float32)
        self._mel_parity = 0                       # emitted mel frames
        self._conv_buf = np.zeros((0, e.dim), np.float32)
        self._enc_off = 0                          # conv frames encoded
        self._adapter: List[np.ndarray] = []
        self._n_adapter = 0
        self._prefilled = False
        self._pos = self._prompt_len
        self._next_tok: Optional[int] = None
        self.generated: List[int] = []
        self._prev_text = ""
        self._done = False
        self._seeded = False
        self._mel_lead = 0

        # jitted programs are shared at the MODEL level: /v1/realtime opens
        # a fresh session per turn, and a per-session cache would re-trace
        # every program (conv/enc/prefill/step) on each turn — tens of ms
        # of avoidable first-chunk latency even with a warm XLA cache. All
        # programs are pure functions of (params, state), so sharing across
        # sessions is safe; session state lives in the caches, not the fns.
        if not hasattr(model, "_stream_fns"):
            model._stream_fns = {}
        self._fns: Dict = model._stream_fns

    # -------------------------------------------------------- public

    @property
    def input_sample_rate(self) -> int:
        """Expected feed() rate (reference session protocol,
        server.py:1554-1560 consumes this)."""
        return SAMPLE_RATE

    @property
    def done(self) -> bool:
        return self._done

    @property
    def text(self) -> str:
        """Committed transcript so far (server finalize reads this)."""
        return self._prev_text

    def feed(self, samples: np.ndarray) -> None:
        if samples is None:
            return
        samples = np.asarray(samples, np.float32).reshape(-1)
        if samples.size == 0:
            return
        with self._lock:
            self._audio_q.append(samples)

    def close(self) -> None:
        with self._lock:
            self._closed = True

    def step(self, *, max_decode_tokens: int = 4) -> List[StreamingEvent]:
        """Bounded work; returns delta events, plus one final event when
        the turn completes (shared StreamingEvent protocol — server.py
        `/v1/realtime` and whisper's session consume the same shape)."""
        if self._done:
            return []
        self._ingest()
        events: List[StreamingEvent] = []
        if not self._prefilled:
            if self._n_adapter < self._prompt_len:
                if self._flushed:
                    self._done = True
                    events.append(StreamingEvent("final", self._prev_text))
                return events
            self._prefill()
        events.extend(StreamingEvent("delta", d)
                      for d in self._decode_some(max_decode_tokens))
        if self._done:
            events.append(StreamingEvent("final", self._prev_text))
        return events

    # --------------------------------------------------------- audio

    def _ingest(self) -> None:
        if not self._seeded:
            # stream starts with the left pad; the offline reflect pad is
            # zeros because the pad is silence
            self._raw = np.concatenate([
                np.zeros(200, np.float32),
                np.zeros(self._n_left * RAW_AUDIO_LENGTH_PER_TOK,
                         np.float32)])
            self._seeded = True
        while True:
            with self._lock:
                if not self._audio_q:
                    closed = self._closed
                    break
                chunk = self._audio_q.pop(0)
            self._raw = np.concatenate([self._raw, chunk])
        self._emit_mel(final=False)
        if closed and not self._flushed:
            self._flushed = True
            n_right = (self._n_delay + 1) + 10
            fed = len(self._raw) - 200 + self._mel_lead
            align = (RAW_AUDIO_LENGTH_PER_TOK
                     - fed % RAW_AUDIO_LENGTH_PER_TOK) \
                % RAW_AUDIO_LENGTH_PER_TOK
            self._raw = np.concatenate([
                self._raw,
                np.zeros(align + n_right * RAW_AUDIO_LENGTH_PER_TOK + 200,
                         np.float32)])
            self._emit_mel(final=True)
        self._run_encoder(flush=self._flushed)

    def _emit_mel(self, final: bool) -> None:
        """Turn buffered raw samples into mel frames (hop 160, win 400).

        self._raw always begins exactly at the window start of the next
        frame to emit; each emitted frame consumes one hop.
        """
        n_frames = max(0, (len(self._raw) - 240) // 160)  # full windows
        if final:
            # offline drops the trailing centered frame: emit one fewer
            n_frames = max(0, n_frames - 1)
        if n_frames == 0:
            return
        seg = self._raw[: (n_frames - 1) * 160 + 400]
        if len(seg) < (n_frames - 1) * 160 + 400:
            seg = np.pad(seg, (0, (n_frames - 1) * 160 + 400 - len(seg)))
        frames = np.lib.stride_tricks.sliding_window_view(
            seg, 400)[:: 160][:n_frames]
        nwin = np.arange(400, dtype=np.float32)
        win = 0.5 * (1 - np.cos(2 * np.pi * nwin / 400))
        spec = np.fft.rfft(frames * win, axis=-1)
        power = np.abs(spec) ** 2
        from ....dsp import mel_filters
        aec = self.model.config.audio_encoding_args
        fb = np.asarray(mel_filters(aec.sampling_rate, 400,
                                    aec.num_mel_bins, f_min=0,
                                    f_max=8000, norm="slaney",
                                    mel_scale="slaney"))
        mel = power @ fb.T
        log = np.log10(np.maximum(mel, 1e-10))
        log = np.maximum(log, aec.global_log_mel_max - 8.0)
        mel = ((log + 4.0) / 4.0).astype(np.float32)
        self._raw = self._raw[n_frames * 160:]
        self._mel_lead += n_frames * 160
        self._mel_hist = np.concatenate([self._mel_hist, mel])
        # feed conv stem in even frame counts (stride-2 parity)
        usable = (self._mel_hist.shape[0] // 2) * 2
        if usable == 0:
            return
        seg = self._mel_hist[:usable]
        self._mel_hist = self._mel_hist[usable:]
        self._conv_step(seg)

    def _conv_step(self, mel: np.ndarray) -> None:
        """Causal conv stem over an EVEN chunk of new mel frames.

        History algebra: conv1 (k3 s1, left-pad 2) needs the previous 2
        mel frames; conv2 (k3 s2, left-pad 1) needs the previous 1 conv1
        frame. Both start as zeros, which equals the offline zero pads,
        so streamed == offline exactly.
        """
        if not hasattr(self, "_mel_hist2"):
            self._mel_hist2 = np.zeros((2, mel.shape[1]), np.float32)
            self._y1_hist1 = np.zeros(
                (1, self.model.config.encoder_args.dim), np.float32)
        fn = self._fns.get(("conv", mel.shape[0]))
        if fn is None:
            def conv_fn(params, m, h_mel, h_y1):
                from ....nn.layers import apply_conv1d
                x = jnp.concatenate([h_mel, m], axis=0)[None]
                y1 = jax.nn.gelu(
                    apply_conv1d(params["conv_layers_0_conv"]["conv"], x),
                    approximate=False)          # valid: y1[a..b-1]
                z = jnp.concatenate([h_y1, y1[0]], axis=0)[None]
                y2 = jax.nn.gelu(
                    apply_conv1d(params["conv_layers_1_conv"]["conv"], z,
                                 stride=2), approximate=False)
                return y2[0], y1[0, -1:]

            fn = jax.jit(conv_fn)
            self._fns[("conv", mel.shape[0])] = fn
        out, y1_last = fn(self.model.params["encoder"], jnp.asarray(mel),
                          jnp.asarray(self._mel_hist2),
                          jnp.asarray(self._y1_hist1))
        self._mel_hist2 = mel[-2:]
        self._y1_hist1 = np.asarray(y1_last)
        self._conv_buf = np.concatenate([self._conv_buf,
                                         np.asarray(out)])

    def _run_encoder(self, flush: bool) -> None:
        e = self.model.config.encoder_args
        while self._conv_buf.shape[0] >= ENC_CHUNK or \
                (flush and self._conv_buf.shape[0] > 0):
            n = min(ENC_CHUNK, self._conv_buf.shape[0])
            chunk = self._conv_buf[:n]
            self._conv_buf = self._conv_buf[n:]
            padded = np.zeros((1, ENC_CHUNK, e.dim), np.float32)
            padded[0, :n] = chunk
            fn = self._fns.get("enc")
            if fn is None:
                fn = jax.jit(lambda p, x, c, o, nv: encoder_stream_step(
                    p["encoder"], e, x, c, o, nv))
                self._fns["enc"] = fn
            out, self._enc_caches = fn(self.model.params,
                                       jnp.asarray(padded),
                                       self._enc_caches,
                                       jnp.int32(self._enc_off),
                                       jnp.int32(n))
            self._enc_off += n
            enc_np = np.asarray(out)[0, :n]
            if not hasattr(self, "_enc_buf"):
                self._enc_buf = np.zeros((0, e.dim), np.float32)
            self._enc_buf = np.concatenate([self._enc_buf, enc_np])
            usable = (self._enc_buf.shape[0]
                      // e.downsample_factor) * e.downsample_factor
            if usable:
                grp = self._enc_buf[:usable]
                self._enc_buf = self._enc_buf[usable:]
                fnp = self._fns.get(("proj", usable))
                if fnp is None:
                    fnp = jax.jit(lambda p, x: downsample_project(
                        p["encoder"], e, x))
                    self._fns[("proj", usable)] = fnp
                ad = np.asarray(fnp(self.model.params,
                                    jnp.asarray(grp[None])))[0]
                self._adapter.append(ad)
                self._n_adapter += ad.shape[0]
            if flush and self._conv_buf.shape[0] == 0:
                break

    # -------------------------------------------------------- decoder

    def _adapter_cat(self) -> np.ndarray:
        if len(self._adapter) > 1:
            self._adapter = [np.concatenate(self._adapter)]
        return self._adapter[0]

    def _prefill(self) -> None:
        cfg = self.model.config
        d = cfg.decoder
        # cap is baked into the closure, so the model-shared cache keys on
        # it (sessions may differ in max_session_tokens)
        fn = self._fns.get(("prefill", self._cap))
        if fn is None:
            cap = self._cap

            def prefill(p, embeds, scales):
                caches = [KVCache.init(1, cap, d.n_kv_heads, d.head_dim,
                                       dtype=jnp.float32)
                          for _ in range(d.n_layers)]
                h, caches = decoder_forward(p["decoder"], d, embeds,
                                            scales, caches, jnp.int32(0))
                logits = h[:, -1] @ p["decoder"]["tok_embeddings"][
                    "weight"].T
                return logits, caches

            fn = jax.jit(prefill)
            self._fns[("prefill", self._cap)] = fn
        adapter = self._adapter_cat()
        ids = [cfg.bos_token_id] + [cfg.streaming_pad_token_id] \
            * (self._prompt_len - 1)
        emb = np.asarray(self.model.params["decoder"]["tok_embeddings"]
                         ["weight"][np.asarray(ids)])
        prefix = adapter[:self._prompt_len] + emb
        lg, self._dec_caches = fn(self.model.params,
                                  jnp.asarray(prefix[None]),
                                  self._scales)
        self._next_tok = int(np.asarray(jnp.argmax(lg, -1))[0])
        self._prefilled = True

    def _decode_some(self, max_decode_tokens: int) -> List[str]:
        """Decode up to max_decode_tokens in compiled chunks.

        The hot loop runs as a lax.scan of DEC_BUCKET lockstep steps inside
        ONE jitted program — one dispatch and one small fetch per step()
        call instead of two host syncs per token (the embedding-row fetch
        plus the argmax fetch). k (the number of live steps this chunk) is
        host-known from adapter availability; only EOS is data-dependent
        and is masked in-graph. Dispatches past EOS or past k write junk
        KV at positions >= the resume point, which is safe: every such slot
        is rewritten by its own real step before any later step attends to
        it, and the carried token is frozen by the `adv` mask.
        """
        cfg = self.model.config
        d = cfg.decoder
        eos = cfg.eos_token_id
        deltas: List[str] = []

        def emit_text() -> None:
            text = self.model._tokenizer.decode(
                [t for t in self.generated if t != eos])
            if len(text) > len(self._prev_text):
                deltas.append(text[len(self._prev_text):])
                self._prev_text = text

        budget = max_decode_tokens
        while budget > 0 and not self._done:
            if self._n_adapter <= self._pos and not self._flushed:
                break                      # pause until more audio arrives
            k = min(budget, DEC_BUCKET, self._n_adapter - self._pos,
                    self.max_tokens - len(self.generated),
                    (self._cap - 1) - self._pos)
            if k <= 0:
                # flushed tail / session cap / token budget: emit the
                # pending token, then the turn is over
                self.generated.append(self._next_tok)
                emit_text()
                self._done = True
                break
            fn = self._fns.get(("dchunk", DEC_BUCKET))
            if fn is None:
                def chunk_fn(p, tok0, adapter_sl, k, pos0, caches, scales):
                    emb_w = p["decoder"]["tok_embeddings"]["weight"]

                    def body(carry, i):
                        tok, caches, eos_seen = carry
                        live = jnp.logical_and(i < k,
                                               jnp.logical_not(eos_seen))
                        emit = jnp.where(live, tok, -1)
                        is_eos = tok == eos
                        eos_seen = jnp.logical_or(
                            eos_seen, jnp.logical_and(live, is_eos))
                        embed = adapter_sl[i] + emb_w[tok]
                        h, caches2 = decoder_forward(
                            p["decoder"], d, embed[None, None], scales,
                            caches, pos0 + i)
                        logits = h[:, 0] @ emb_w.T
                        nxt = jnp.argmax(logits, -1)[0].astype(jnp.int32)
                        adv = jnp.logical_and(live,
                                              jnp.logical_not(is_eos))
                        tok = jnp.where(adv, nxt, tok)
                        return (tok, caches2, eos_seen), emit

                    (tok, caches, _), emits = jax.lax.scan(
                        body, (tok0, caches, jnp.bool_(False)),
                        jnp.arange(DEC_BUCKET))
                    return jnp.concatenate([emits, tok[None]]), caches

                fn = jax.jit(chunk_fn)
                self._fns[("dchunk", DEC_BUCKET)] = fn
            adapter = self._adapter_cat()
            sl = np.zeros((DEC_BUCKET, d.dim), np.float32)
            sl[:k] = adapter[self._pos:self._pos + k]
            out, self._dec_caches = fn(
                self.model.params, jnp.int32(self._next_tok),
                jnp.asarray(sl), jnp.int32(k), jnp.int32(self._pos),
                self._dec_caches, self._scales)
            out = np.asarray(out)                  # the chunk's ONE sync
            emitted = [int(t) for t in out[:k] if t != -1]
            self.generated.extend(emitted)
            emit_text()
            if emitted and emitted[-1] == eos:
                self._pos += len(emitted) - 1      # EOS emit never dispatched
                self._done = True
                break
            self._pos += k
            self._next_tok = int(out[DEC_BUCKET])
            budget -= k
            if len(self.generated) >= self.max_tokens:
                self._done = True
        return deltas


__all__ = ["VoxtralStreamingSession", "StreamingEvent",
           "encoder_stream_step", "ENC_CHUNK", "DEC_BUCKET"]
