"""Dia: dialogue TTS (T5-style encoder-decoder over 9 DAC codebooks).

Parity: reference tts/models/dia/ — DenseGeneral JAX-layout kernels
(layers.py:27-59; checkpoints load without remapping), timescale RoPE
(:146-186), GQA decoder self-attention with unscaled dot product
(:375-390, scale_factor 1.0), precomputed GQA-repeated cross KV
(:664-695), per-channel embedding sum + joint (C, V) logits head
(:633-662), classifier-free guidance over an uncond/cond pair with
top-k filtering above token 1025 (dia.py:500-520), BOS forcing before
each channel's delay (:535-541), the EOS delay-pattern completion state
machine (:556-583), [S1]/[S2] byte-level text prep (:176-201) and turn
splitting (:203-224), and the delay-pattern build/revert (audio.py).

TPU design: the encoder runs once at the static text_length; decoding is
compiled `lax.scan` chunks over fixed-capacity KV caches — CFG pair as a
static batch of 2, per-channel sampling, BOS forcing, and the EOS
delay-completion countdown all in-graph; the host only reads a per-chunk
stop flag. The delay revert is a vectorized gather.
"""

from __future__ import annotations

import re
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import apply_rms_norm, init_rms_norm
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import rope_freqs
from ....ops.sampling import make_sampler
from ..base import GenerationResult, format_duration
from .config import DiaConfig

Array = jax.Array

CHUNK = 32
EXTRA_STEPS_AFTER_EOS = 30


def _dense(x: Array, w: Array, axes: int = 1) -> Array:
    """DenseGeneral: contract the last `axes` dims of x with the first
    `axes` dims of w (kernel layout (in..., out...))."""
    return jax.lax.dot_general(
        x, w, (((tuple(range(x.ndim - axes, x.ndim))),
                tuple(range(axes))), ((), ())))


def _rope(x: Array, positions: Array, inv_freq: Array) -> Array:
    """Split-half rotary with timescale freqs; x (B, T, H, D)."""
    ang = positions[..., None].astype(jnp.float32) * inv_freq
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


# ------------------------------------------------------------------ init

def _init_attn(ks, q_dim, kv_dim, nq, nkv, hd, out_dim):
    s = 0.02
    return {"q_proj": {"weight": jax.random.normal(
                next(ks), (q_dim, nq, hd)) * s},
            "k_proj": {"weight": jax.random.normal(
                next(ks), (kv_dim, nkv, hd)) * s},
            "v_proj": {"weight": jax.random.normal(
                next(ks), (kv_dim, nkv, hd)) * s},
            "o_proj": {"weight": jax.random.normal(
                next(ks), (nq, hd, out_dim)) * s}}


def _init_mlp(ks, embed, hidden):
    s = 0.02
    return {"wi_fused": {"weight": jax.random.normal(
                next(ks), (embed, 2, hidden)) * s},
            "wo": {"weight": jax.random.normal(
                next(ks), (hidden, embed)) * s}}


def init_dia(key, cfg: DiaConfig) -> dict:
    m = cfg.model
    enc, dec = m.encoder, m.decoder
    ks = iter(jax.random.split(
        key, 16 + 10 * enc.n_layer + 16 * dec.n_layer + cfg.data.channels))
    p_enc = {"embedding": {"weight": jax.random.normal(
                 next(ks), (m.src_vocab_size, enc.n_embd)) * 0.02},
             "layers": {}, "norm": init_rms_norm(enc.n_embd)}
    for i in range(enc.n_layer):
        p_enc["layers"][str(i)] = {
            "pre_sa_norm": init_rms_norm(enc.n_embd),
            "self_attention": _init_attn(ks, enc.n_embd, enc.n_embd,
                                         enc.n_head, enc.n_head,
                                         enc.head_dim, enc.n_embd),
            "post_sa_norm": init_rms_norm(enc.n_embd),
            "mlp": _init_mlp(ks, enc.n_embd, enc.n_hidden),
        }
    p_dec = {"embeddings": {str(i): {"weight": jax.random.normal(
                 next(ks), (m.tgt_vocab_size, dec.n_embd)) * 0.02}
                 for i in range(cfg.data.channels)},
             "layers": {}, "norm": init_rms_norm(dec.n_embd),
             "logits_dense": {"weight": jax.random.normal(
                 next(ks), (dec.n_embd, cfg.data.channels,
                            m.tgt_vocab_size)) * 0.02}}
    for i in range(dec.n_layer):
        p_dec["layers"][str(i)] = {
            "pre_sa_norm": init_rms_norm(dec.n_embd),
            "self_attention": _init_attn(
                ks, dec.n_embd, dec.n_embd, dec.gqa_query_heads,
                dec.kv_heads, dec.gqa_head_dim, dec.n_embd),
            "pre_ca_norm": init_rms_norm(dec.n_embd),
            "cross_attention": _init_attn(
                ks, dec.n_embd, enc.n_embd, dec.cross_query_heads,
                dec.cross_query_heads, dec.cross_head_dim, dec.n_embd),
            "pre_mlp_norm": init_rms_norm(dec.n_embd),
            "mlp": _init_mlp(ks, dec.n_embd, dec.n_hidden),
        }
    return {"encoder": p_enc, "decoder": p_dec}


# --------------------------------------------------------------- forward

def _mlp(p: dict, x: Array) -> Array:
    fused = _dense(x, p["wi_fused"]["weight"])      # (..., 2, hidden)
    hidden = jax.nn.silu(fused[..., 0, :]) * fused[..., 1, :]
    return _dense(hidden, p["wo"]["weight"])


def encoder_forward(params: dict, cfg: DiaConfig, src: Array,
                    padding_mask: Array) -> Array:
    """src (B, S) byte ids -> (B, S, E). Unscaled dot-product attention
    with the JAX segment-id mask (pad rows attend pads)."""
    m = cfg.model
    enc = m.encoder
    p = params["encoder"]
    eps = m.normalization_layer_epsilon
    x = p["embedding"]["weight"][src]
    b, s = src.shape
    positions = jnp.arange(s)[None, :].repeat(b, 0)
    inv_freq = rope_freqs(enc.head_dim, float(m.rope_max_timescale))

    pm = padding_mask
    allow = (pm[:, :, None] & pm[:, None, :]) | \
        (~pm[:, :, None] & ~pm[:, None, :])
    mask = allow[:, None, :, :]

    for i in range(enc.n_layer):
        lp = p["layers"][str(i)]
        h = apply_rms_norm(lp["pre_sa_norm"], x, eps)
        a = lp["self_attention"]
        q = _rope(_dense(h, a["q_proj"]["weight"]), positions, inv_freq)
        k = _rope(_dense(h, a["k_proj"]["weight"]), positions, inv_freq)
        v = _dense(h, a["v_proj"]["weight"])
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)     # scale 1.0!
        scores = jnp.where(mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        x = x + _dense(o, a["o_proj"]["weight"], axes=2)
        h = apply_rms_norm(lp["post_sa_norm"], x, eps)
        x = x + _mlp(lp["mlp"], h)
    return apply_rms_norm(p["norm"], x, eps)


def precompute_cross_kv(params: dict, cfg: DiaConfig, enc_out: Array,
                        positions: Array) -> List[Tuple[Array, Array]]:
    m = cfg.model
    inv_freq = rope_freqs(m.decoder.cross_head_dim,
                          float(m.rope_max_timescale))
    out = []
    for i in range(m.decoder.n_layer):
        a = params["decoder"]["layers"][str(i)]["cross_attention"]
        k = _dense(enc_out, a["k_proj"]["weight"])
        if m.decoder.cross_rope:
            k = _rope(k, positions, inv_freq)
        v = _dense(enc_out, a["v_proj"]["weight"])
        out.append((k, v))              # (B, S, H, D)
    return out


def decoder_step(params: dict, cfg: DiaConfig, tokens: Array, t: Array,
                 caches: List[KVCache], cross_kv, cross_mask: Array
                 ) -> Tuple[Array, List[KVCache]]:
    """tokens (B, 1, C) at position t -> logits (B, C, V)."""
    m = cfg.model
    dec = m.decoder
    p = params["decoder"]
    eps = m.normalization_layer_epsilon
    b = tokens.shape[0]
    x = jnp.zeros((b, 1, dec.n_embd))
    for i in range(cfg.data.channels):
        x = x + p["embeddings"][str(i)]["weight"][tokens[:, :, i]]
    pos = jnp.reshape(t, (1, 1)).repeat(b, 0)
    inv_sa = rope_freqs(dec.gqa_head_dim, float(m.rope_max_timescale))
    inv_ca = rope_freqs(dec.cross_head_dim, float(m.rope_max_timescale))

    new_caches = []
    for i in range(dec.n_layer):
        lp = p["layers"][str(i)]
        h = apply_rms_norm(lp["pre_sa_norm"], x, eps)
        a = lp["self_attention"]
        q = _rope(_dense(h, a["q_proj"]["weight"]), pos, inv_sa)
        k = _rope(_dense(h, a["k_proj"]["weight"]), pos, inv_sa)
        v = _dense(h, a["v_proj"]["weight"])
        cache = kv_update(caches[i], k, v, t)
        new_caches.append(cache)
        valid = jnp.arange(cache.k.shape[1]) < t + 1
        scores = jnp.einsum("bqhd,bkhd->bhqk",
                            q.reshape(b, 1, dec.gqa_query_heads,
                                      dec.gqa_head_dim),
                            jnp.repeat(cache.k,
                                       dec.gqa_query_heads // dec.kv_heads,
                                       axis=2))
        scores = jnp.where(valid[None, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs,
                       jnp.repeat(cache.v,
                                  dec.gqa_query_heads // dec.kv_heads,
                                  axis=2))
        x = x + _dense(o, a["o_proj"]["weight"], axes=2)

        h = apply_rms_norm(lp["pre_ca_norm"], x, eps)
        a = lp["cross_attention"]
        q = _dense(h, a["q_proj"]["weight"])
        if dec.cross_rope:
            q = _rope(q, pos, inv_ca)
        ck, cv = cross_kv[i]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, ck)
        scores = jnp.where(cross_mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, cv)
        x = x + _dense(o, a["o_proj"]["weight"], axes=2)

        h = apply_rms_norm(lp["pre_mlp_norm"], x, eps)
        x = x + _mlp(lp["mlp"], h)
    x = apply_rms_norm(p["norm"], x, eps)
    return _dense(x, p["logits_dense"]["weight"])[:, 0], new_caches


# -------------------------------------------------------- delay pattern

def revert_delay(codes: np.ndarray, delay_pattern: List[int],
                 pad_value: int) -> np.ndarray:
    """(T, C) delayed codes -> time-aligned (T', C): out[t, c] =
    codes[t + delay[c], c] (reference audio.py revert indices)."""
    t, c = codes.shape
    max_d = max(delay_pattern)
    t_out = t - max_d
    if t_out <= 0:
        return np.zeros((0, c), codes.dtype)
    out = np.empty((t_out, c), codes.dtype)
    for i, d in enumerate(delay_pattern):
        out[:, i] = codes[d: d + t_out, i]
    return out


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    def __init__(self, config=None, **kwargs):
        if config is None:
            config = DiaConfig.from_dict(kwargs) if kwargs else DiaConfig()
        elif isinstance(config, dict):
            config = DiaConfig.from_dict(config)
        super().__init__(config)
        self._dac = None
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.model.sample_rate

    def init_params(self, key):
        return init_dia(key, self.config)

    # ------------------------------------------------------- text prep

    def _prepare_text(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        d = self.config.data
        raw = text.encode("utf-8").replace(b"[S1]", b"\x01") \
            .replace(b"[S2]", b"\x02")
        toks = list(raw)[: d.text_length]
        padded = np.full(d.text_length, d.text_pad_value, np.int32)
        padded[: len(toks)] = toks
        return padded, padded != d.text_pad_value

    @staticmethod
    def split_turns(text: str) -> List[str]:
        pattern = re.compile(
            r"\[S1\]\s*(.*?)\s*\[S2\]\s*(.*?)(?=(?:\[S1\])|$)", re.DOTALL)
        segments = [f"[S1] {a.strip()} [S2] {b.strip()}"
                    for a, b in pattern.findall(text)]
        if len(segments) > 1:
            merged = []
            for i in range(0, len(segments), 2):
                merged.append(" ".join(segments[i: i + 2]))
            segments = merged
        return segments

    # ------------------------------------------------- compiled decode

    def _decode_fns(self, max_tokens: int, cfg_scale: float,
                    temperature: float, top_p: float, top_k: int,
                    bos_forcing: bool = True):
        key_ = (max_tokens, cfg_scale, temperature, top_p, top_k,
                bos_forcing)
        fns = self._jit_cache.get(key_)
        if fns is None:
            cfg = self.config
            d = cfg.data
            dec = cfg.model.decoder
            V = cfg.model.tgt_vocab_size
            delays = jnp.asarray(d.delay_pattern)
            max_delay = max(d.delay_pattern)
            sampler = make_sampler(temperature=temperature, top_p=top_p,
                                   top_k=top_k)

            def setup(params, src, src_mask):
                enc_out = encoder_forward(params, cfg, src, src_mask)
                positions = jnp.arange(src.shape[1])[None, :] \
                    .repeat(2, 0)
                cross_kv = precompute_cross_kv(params, cfg, enc_out,
                                               positions)
                caches = [KVCache.init(2, max_tokens, dec.kv_heads,
                                       dec.gqa_head_dim,
                                       dtype=jnp.float32)
                          for _ in range(dec.n_layer)]
                return cross_kv, caches

            def prefill(params, rows, caches, cross_kv, cross_mask):
                # teacher-forced pass over the audio-prompt rows (2, L, C)
                # writing decoder self-attn KV (reference dia.py:427-446)
                def body(caches, xs):
                    i, row = xs
                    _, caches = decoder_step(params, cfg, row[:, None, :],
                                             i, caches, cross_kv,
                                             cross_mask)
                    return caches, None

                idx = jnp.arange(rows.shape[1])
                caches, _ = jax.lax.scan(
                    body, caches, (idx, jnp.swapaxes(rows, 0, 1)))
                return caches

            def chunk(params, cur, t0, caches, cross_kv, cross_mask,
                      rng, eos_step, done):
                def body(carry, i):
                    cur, caches, key, eos_step, done = carry
                    step = t0 + i
                    logits, caches = decoder_step(
                        params, cfg, cur[:, None, :], step, caches,
                        cross_kv, cross_mask)
                    uncond, cond = logits[0], logits[1]       # (C, V)
                    lg = cond + cfg_scale * (cond - uncond)
                    keep = jnp.arange(V) < 1025
                    lg = jnp.where(keep[None, :], lg, -jnp.inf)
                    key, sub = jax.random.split(key)
                    pred = sampler(sub, lg).astype(jnp.int32)  # (C,)
                    if bos_forcing:
                        # BOS forcing before each channel's delay; disabled
                        # when an audio prompt supplied the ramp (reference
                        # dia.py:529-536)
                        pred = jnp.where(step >= delays, pred,
                                         d.audio_bos_value)
                    # EOS completion: channel 0 EOS starts the countdown
                    new_eos = jnp.where(
                        (eos_step < 0) & (pred[0] == d.audio_eos_value),
                        step, eos_step)
                    after = step - new_eos          # 0 at the EOS step
                    pred = jnp.where(
                        (new_eos >= 0) & (after == delays),
                        d.audio_eos_value, pred)
                    pred = jnp.where(
                        (new_eos >= 0) & (after > delays),
                        d.audio_pad_value, pred)
                    done2 = jnp.logical_or(
                        done, (new_eos >= 0) & (after >= max_delay))
                    out = jnp.where(done, -1, pred)
                    nxt = jnp.broadcast_to(pred[None, :],
                                           (2, d.channels))
                    return (nxt, caches, key, new_eos, done2), out

                (cur, caches, rng, eos_step, done), toks = jax.lax.scan(
                    body, (cur, caches, rng, eos_step, done),
                    jnp.arange(CHUNK))
                return cur, caches, rng, eos_step, done, toks

            fns = (jax.jit(setup), jax.jit(chunk), jax.jit(prefill))
            self._jit_cache[key_] = fns
        return fns

    def _audio_prompt_codes(self, ref_audio: np.ndarray) -> np.ndarray:
        """ref audio -> delayed (T, C) DAC codes with the per-channel BOS
        ramp (reference audio.py:96-150 audio_to_codebook)."""
        if self._dac is None:
            raise RuntimeError("no DAC codec bound (model._dac)")
        d = self.config.data
        _, codes = self._dac.encode(
            np.asarray(ref_audio, np.float32).reshape(1, -1))
        codes = np.asarray(codes)[0].T.astype(np.int32)    # (T, C)
        t_len, ch = codes.shape
        delays = np.asarray(d.delay_pattern)[:ch]
        tt = np.arange(t_len)[:, None] - delays[None, :]
        gathered = codes[np.clip(tt, 0, t_len - 1), np.arange(ch)[None, :]]
        return np.where(tt < 0, d.audio_bos_value, gathered).astype(np.int32)

    def generate_codes(self, text: str, max_tokens: Optional[int] = None,
                       cfg_scale: float = 3.0, temperature: float = 1.3,
                       top_p: float = 0.95, cfg_filter_top_k: int = 35,
                       seed: int = 0,
                       prompt_codes: Optional[np.ndarray] = None
                       ) -> np.ndarray:
        """text -> time-aligned (T, C) DAC codes. `prompt_codes` (delayed
        rows from _audio_prompt_codes) voice-condition the decoder: they
        are teacher-forced into the KV caches before sampling and BOS
        forcing is disabled (reference dia.py:402-446, 529-536)."""
        cfg = self.config
        d = cfg.data
        max_tokens = max_tokens or d.audio_length
        max_tokens = ((max_tokens + CHUNK - 1) // CHUNK) * CHUNK

        bos_row = np.full((1, d.channels), d.audio_bos_value, np.int32)
        if prompt_codes is not None:
            rows = np.concatenate([bos_row, np.asarray(prompt_codes,
                                                       np.int32)], axis=0)
            lb = ((len(rows) + CHUNK - 1) // CHUNK) * CHUNK
            rows_p = np.concatenate(
                [rows, np.repeat(rows[-1:], lb - len(rows), axis=0)], axis=0)
            cap = max_tokens + lb
        else:
            rows, rows_p, lb, cap = bos_row, None, 0, max_tokens

        tokens, mask = self._prepare_text(text)
        src = np.zeros((2, d.text_length), np.int32)
        src[1] = tokens                                   # row 0 = uncond
        src_mask = np.zeros((2, d.text_length), bool)
        src_mask[1] = mask
        src_mask[0] = mask        # reference reuses the cond mask

        setup, chunk, prefill = self._decode_fns(
            cap, cfg_scale, temperature, top_p, cfg_filter_top_k,
            bos_forcing=prompt_codes is None)
        cross_kv, caches = setup(self.params, jnp.asarray(src),
                                 jnp.asarray(src_mask))
        cross_mask = jnp.asarray(src_mask)

        if prompt_codes is not None:
            tiled = jnp.asarray(np.broadcast_to(
                rows_p[None], (2,) + rows_p.shape))
            caches = prefill(self.params, tiled, caches, cross_kv,
                             cross_mask)
            cur = jnp.asarray(np.broadcast_to(rows[-1][None],
                                              (2, d.channels)))
            t = jnp.int32(len(rows) - 1)
        else:
            cur = jnp.full((2, d.channels), d.audio_bos_value, jnp.int32)
            t = jnp.int32(0)
        rng = jax.random.PRNGKey(seed)
        eos_step = jnp.int32(-1)
        done = jnp.bool_(False)
        out_rows: List[np.ndarray] = []
        while len(out_rows) * CHUNK < max_tokens:
            cur, caches, rng, eos_step, done, toks = chunk(
                self.params, cur, t, caches, cross_kv, cross_mask, rng,
                eos_step, done)
            out_rows.append(np.asarray(toks))
            t = t + CHUNK
            if bool(done):
                break
        gen = np.concatenate(out_rows, axis=0)            # (T, C)
        gen = gen[(gen >= 0).all(axis=1)]
        aligned = revert_delay(gen, d.delay_pattern, d.audio_pad_value)
        # keep rows before any EOS/PAD on channel 0
        valid = aligned[:, 0] < d.audio_eos_value
        if not valid.all():
            aligned = aligned[: int(np.argmin(valid))]
        return np.clip(aligned, 0, 1023)

    def generate(self, text: str, voice: Optional[str] = None,
                 temperature: float = 1.3, top_p: float = 0.95,
                 split_pattern: str = "\n",
                 max_tokens: Optional[int] = None, verbose: bool = False,
                 cfg_scale: float = 3.0, seed: int = 0,
                 ref_audio=None, ref_text: Optional[str] = None, **kwargs):
        prompt_codes = None
        if ref_audio is not None:
            if not isinstance(ref_audio, np.ndarray):
                from ....utils import load_audio
                ref_audio = np.asarray(load_audio(
                    ref_audio, sample_rate=self.sample_rate))
            prompt_codes = self._audio_prompt_codes(ref_audio)
        prompt = text.replace("\\n", "\n").replace("\\t", "\t")
        segments = []
        for piece in prompt.split(split_pattern):
            if "[S1]" in piece and "[S2]" in piece:
                segments.extend(self.split_turns(piece))
            else:
                segments.append(piece)

        for idx, segment in enumerate(segments):
            t0 = time.perf_counter()
            seg_text = segment if ref_text is None else \
                (ref_text.strip() + " " + segment)
            codes = self.generate_codes(seg_text, max_tokens=max_tokens,
                                        cfg_scale=cfg_scale,
                                        temperature=temperature,
                                        top_p=top_p, seed=seed + idx,
                                        prompt_codes=prompt_codes)
            if self._dac is None:
                raise RuntimeError("no DAC codec bound (model._dac)")
            audio = np.asarray(self._dac.decode(
                self._dac.from_codes(
                    jnp.asarray(codes.T[None])))).reshape(-1)
            dt = time.perf_counter() - t0
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=jnp.asarray(audio), samples=len(audio),
                sample_rate=self.sample_rate, segment_idx=idx,
                token_count=int(codes.shape[0]),
                audio_duration=format_duration(dur),
                real_time_factor=round(dt / max(dur, 1e-9), 2),
                prompt={"tokens": int(codes.shape[0]),
                        "tokens-per-sec": round(codes.shape[0] / dt, 2)
                        if dt else 0.0},
                audio_samples={"samples": len(audio),
                               "samples-per-sec":
                                   round(len(audio) / dt, 2) if dt else 0},
                processing_time_seconds=dt, peak_memory_usage=0.0)

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """Original nari-labs checkpoints ship JAX-layout DenseGeneral
        kernels already (reference dia.py:109-110 sanitize is the
        identity; we only strip an optional `model.` prefix). The HF
        transformers layout (nari-labs/Dia-1.6B-0626) uses torch (out, in)
        linears, a fused channel-major codebook embedding, and
        gate_up/down MLP names — converted here."""
        if any(".mlp.gate_up_proj." in k for k in weights):
            return self._sanitize_hf(weights)
        out = {}
        for k, v in weights.items():
            if k.startswith("model."):
                k = k[len("model."):]
            out[k] = v
        return out

    def _sanitize_hf(self, weights: Dict) -> Dict:
        import numpy as np

        m = self.config.model
        d = self.config.data

        def attn_in(w, heads, hd):     # torch (H*hd, D) -> (D, H, hd)
            w = np.asarray(w)
            return w.T.reshape(w.shape[1], heads, hd)

        def attn_out(w, heads, hd):    # torch (D, H*hd) -> (H, hd, D)
            w = np.asarray(w)
            return w.T.reshape(heads, hd, w.shape[0])

        out = {}
        for k, w in weights.items():
            if k.startswith("model."):
                k = k[len("model."):]
            enc = k.startswith("encoder.")
            if ".self_attention." in k or ".cross_attention." in k:
                cross = ".cross_attention." in k
                if enc:
                    hd = m.encoder.head_dim
                elif cross:
                    hd = m.decoder.cross_head_dim
                else:
                    hd = m.decoder.gqa_head_dim
                w = np.asarray(w)
                # infer head counts from the tensor itself (robust to the
                # separate cross_num_key_value_heads in the HF config)
                if k.endswith((".q_proj.weight", ".k_proj.weight",
                               ".v_proj.weight")):
                    out[k] = jnp.asarray(attn_in(w, w.shape[0] // hd, hd))
                elif k.endswith(".o_proj.weight"):
                    out[k] = jnp.asarray(attn_out(w, w.shape[1] // hd, hd))
                else:
                    out[k] = w
                continue
            if k.endswith(".mlp.gate_up_proj.weight"):
                w = np.asarray(w)              # (2H, D) [gate; up]
                h = w.shape[0] // 2
                out[k.replace(".gate_up_proj.", ".wi_fused.")] = jnp.asarray(
                    w.T.reshape(w.shape[1], 2, h))
                continue
            if k.endswith(".mlp.down_proj.weight"):
                out[k.replace(".down_proj.", ".wo.")] = jnp.asarray(
                    np.asarray(w).T)
                continue
            if k == "decoder.embeddings.embed.weight":
                w = np.asarray(w)              # (C*V, D) channel-major
                v = w.shape[0] // d.channels
                for c in range(d.channels):
                    out[f"decoder.embeddings.{c}.weight"] = jnp.asarray(
                        w[c * v: (c + 1) * v])
                continue
            if k == "logits_dense.weight":
                w = np.asarray(w)              # (C*V, D) channel-major
                v = w.shape[0] // d.channels
                out["decoder.logits_dense.weight"] = jnp.asarray(
                    w.T.reshape(w.shape[1], d.channels, v))
                continue
            out[k] = w
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        from pathlib import Path
        dac_path = Path(model_path) / "codec"
        if dac_path.exists():
            try:
                from ....utils import base_load_model
                model._dac = base_load_model(
                    str(dac_path), category="codec",
                    model_remapping={"dac": "descript",
                                     "descript": "descript"})
            except Exception:
                model._dac = None
        return model


__all__ = ["Model", "DiaConfig", "encoder_forward", "decoder_step",
           "revert_delay", "precompute_cross_kv", "init_dia"]
