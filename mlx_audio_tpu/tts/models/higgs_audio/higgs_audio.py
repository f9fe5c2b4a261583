"""Higgs Audio v2 (3B): dual-FFN Llama TTS with delay-pattern codebooks.

Parity: /root/reference/mlx_audio/tts/models/higgs_audio/
(HiggsDualFFNDecoderLayer higgs_audio.py:51 — shared attention, per-path
norms+MLPs routed by audio_out_mask; HiggsAudioDecoderProjector :107;
AUDIO_INIT + delay ramp-in/ramp-out + RAS generation state machine
:271-411; serve.py — ChatML voice-clone/smart-voice prompts :87-238,
HiggsAudioServer :240, overlap-add streaming iter_overlap_add_pcm :593).

TPU design: the ENTIRE per-frame decode — dual-FFN backbone step, K-way
codebook sampling (temperature/top-p/top-k with greedy warmup), in-graph
RAS repetition avoidance over a rolling (K, W) window, delay ramp-in and
EOS ramp-out counters — compiles into lax.scan chunks; the host only
checks the per-chunk done flag and streams audio out. The reference syncs
per frame. Llama-3 rope scaling comes from the shared ops/rope helper.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs, rope_freqs_llama3
from ..base import GenerationResult, format_duration, peak_memory_gb

Array = jax.Array

MAX_CACHE_LEN = 4096
CHUNK_FRAMES = 16
PROMPT_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _bucket(n, buckets=PROMPT_BUCKETS):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class HiggsTextConfig(BaseModelArgs):
    hidden_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 24
    num_key_value_heads: int = 8
    intermediate_size: int = 8192
    vocab_size: int = 128256
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = True
    rope_scaling: Optional[dict] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "higgs_audio"
    text_config: Optional[dict] = None
    audio_num_codebooks: int = 8
    audio_codebook_size: int = 1024
    audio_stream_bos_id: int = 1024
    audio_stream_eos_id: int = 1025
    use_delay_pattern: bool = True
    sample_rate: int = 24000
    model_path: str = ""

    def __post_init__(self):
        self.text = HiggsTextConfig.from_dict(self.text_config or {})

    @property
    def stride(self) -> int:
        return self.audio_codebook_size + 2


# ---------------------------------------------------------------- params

def init_higgs_v2(key, cfg: ModelConfig) -> dict:
    t = cfg.text
    ks = iter(jax.random.split(key, 16 + 16 * t.num_hidden_layers))
    hd = t.head_dim
    layers = {}
    for i in range(t.num_hidden_layers):
        layers[str(i)] = {
            "input_layernorm": init_rms_norm(t.hidden_size),
            "audio_input_layernorm": init_rms_norm(t.hidden_size),
            "self_attn": {
                "q_proj": init_linear(next(ks), t.hidden_size,
                                      t.num_attention_heads * hd,
                                      bias=False),
                "k_proj": init_linear(next(ks), t.hidden_size,
                                      t.num_key_value_heads * hd,
                                      bias=False),
                "v_proj": init_linear(next(ks), t.hidden_size,
                                      t.num_key_value_heads * hd,
                                      bias=False),
                "o_proj": init_linear(next(ks), t.num_attention_heads * hd,
                                      t.hidden_size, bias=False)},
            "post_attention_layernorm": init_rms_norm(t.hidden_size),
            "audio_post_attention_layernorm": init_rms_norm(t.hidden_size),
            "mlp": _init_mlp(ks, t),
            "audio_mlp": _init_mlp(ks, t),
        }
    return {
        "embed_tokens": init_embedding(next(ks), t.vocab_size,
                                       t.hidden_size),
        "audio_codebook_embeddings": init_embedding(
            next(ks), cfg.audio_num_codebooks * cfg.stride, t.hidden_size),
        "layers": layers,
        "norm": init_rms_norm(t.hidden_size),
        "audio_decoder_proj": {
            "text_lm_head": init_linear(next(ks), t.hidden_size,
                                        t.vocab_size, bias=False),
            "audio_lm_head": init_linear(
                next(ks), t.hidden_size,
                cfg.audio_num_codebooks * cfg.stride, bias=False)},
    }


def _init_mlp(ks, t):
    return {"gate_proj": init_linear(next(ks), t.hidden_size,
                                     t.intermediate_size, bias=False),
            "up_proj": init_linear(next(ks), t.hidden_size,
                                   t.intermediate_size, bias=False),
            "down_proj": init_linear(next(ks), t.intermediate_size,
                                     t.hidden_size, bias=False)}


def _mlp(p, x):
    return apply_linear(
        p["down_proj"],
        jax.nn.silu(apply_linear(p["gate_proj"], x))
        * apply_linear(p["up_proj"], x))


def _inv_freq(t: HiggsTextConfig) -> Array:
    rs = t.rope_scaling or {}
    if rs.get("rope_type") == "llama3":
        return rope_freqs_llama3(
            t.head_dim, t.rope_theta, factor=rs.get("factor", 8.0),
            low_freq_factor=rs.get("low_freq_factor", 1.0),
            high_freq_factor=rs.get("high_freq_factor", 4.0),
            original_max_position=rs.get(
                "original_max_position_embeddings", 8192))
    return rope_freqs(t.head_dim, t.rope_theta)


def higgs_forward(params: dict, cfg: ModelConfig, embeds: Array,
                  audio_out_mask: Array, caches: Optional[List[KVCache]],
                  offset, pad_mask: Optional[Array] = None
                  ) -> Tuple[Array, Optional[List[KVCache]]]:
    """Dual-FFN stack: embeds (B, T, D), audio_out_mask (B, T) bool."""
    t = cfg.text
    hd = t.head_dim
    b, tl, _ = embeds.shape
    x = embeds
    positions = offset + jnp.arange(tl)[None, :]
    inv_freq = _inv_freq(t)
    m = audio_out_mask[..., None]
    new_caches = [] if caches is not None else None
    for i in range(t.num_hidden_layers):
        lp = params["layers"][str(i)]
        hn = jnp.where(
            m, apply_rms_norm(lp["audio_input_layernorm"], x,
                              t.rms_norm_eps),
            apply_rms_norm(lp["input_layernorm"], x, t.rms_norm_eps))
        sa = lp["self_attn"]
        q = apply_linear(sa["q_proj"], hn).reshape(
            b, tl, t.num_attention_heads, hd)
        k = apply_linear(sa["k_proj"], hn).reshape(
            b, tl, t.num_key_value_heads, hd)
        v = apply_linear(sa["v_proj"], hn).reshape(
            b, tl, t.num_key_value_heads, hd)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
        if caches is not None:
            nc = kv_update(caches[i], k, v, offset)
            new_caches.append(nc)
            if tl == 1:
                o = decode_attention(q, nc.k, nc.v, offset + 1)
            else:
                s = nc.k.shape[1]
                pos_s = jnp.arange(s)[None, None, None, :]
                causal = pos_s <= (offset
                                   + jnp.arange(tl))[None, None, :, None]
                add = jnp.where(causal, 0.0, -jnp.inf)
                if pad_mask is not None:
                    add = add + pad_mask
                o = attention(q, nc.k, nc.v, mask=add)
        else:
            o = attention(q, k, v, causal=True)
        x = x + apply_linear(sa["o_proj"], o.reshape(b, tl, -1))
        post = jnp.where(
            m, apply_rms_norm(lp["audio_post_attention_layernorm"], x,
                              t.rms_norm_eps),
            apply_rms_norm(lp["post_attention_layernorm"], x,
                           t.rms_norm_eps))
        x = x + jnp.where(m, _mlp(lp["audio_mlp"], post),
                          _mlp(lp["mlp"], post))
    return apply_rms_norm(params["norm"], x, t.rms_norm_eps), new_caches


def revert_delay_pattern(delayed: np.ndarray) -> np.ndarray:
    """(K, N) delayed -> (K, N-K+1) aligned (codebook k read at +k)."""
    k, n = delayed.shape
    t = n - k + 1
    if t <= 0:
        return np.zeros((k, 0), delayed.dtype)
    return np.stack([delayed[i, i: i + t] for i in range(k)], axis=0)


def apply_delay_pattern(codes: np.ndarray, bos: int, eos: int) -> np.ndarray:
    """(K, T) aligned -> (K, T+K-1) delayed: row k shifted right k, BOS
    above the diagonal, EOS below (reference generation.py
    build_delay_pattern_mask)."""
    k, t = codes.shape
    out = np.full((k, t + k - 1), eos, dtype=codes.dtype)
    for i in range(k):
        out[i, :i] = bos
        out[i, i: i + t] = codes[i]
    return out


class FrameCarry(NamedTuple):
    caches: List[KVCache]
    embed: Array          # (1, 1, D)
    offset: Array
    step: Array
    num_delay: Array
    num_remaining: Array  # -1 = ramp-out not started
    done: Array
    ras_window: Array     # (K, W) recent tokens
    key: Array


class Model(FunctionalModel):
    """Higgs Audio v2 (voice cloning + smart voice)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None
        self.codec = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_higgs_v2(key, self.config)

    def sanitize(self, weights):
        out = {k: jnp.asarray(v) for k, v in weights.items()
               if not k.endswith("rotary_emb.inv_freq")}
        # tie_word_embeddings=True (reference config.py:29): the published
        # checkpoint omits the text head — alias the embedding buffer
        # (zero-copy: both leaves reference one device array).
        tied = "audio_decoder_proj.text_lm_head.weight"
        if tied not in out and "embed_tokens.weight" in out:
            out[tied] = out["embed_tokens.weight"]
        return out

    def model_quant_predicate(self, path, w):
        """Audio head + codebook embeddings stay unquantized
        (reference model.py:69-81)."""
        return not any(p in path for p in
                       ("audio_codebook_embeddings", "audio_lm_head"))

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model.tokenizer = None
        return model

    # --------------------------------------------------------- embeddings

    def _embed_frame(self, params, frame: Array) -> Array:
        """(K,) delayed codes -> (1, 1, D) summed codebook embedding."""
        cfg = self.config
        offsets = jnp.arange(cfg.audio_num_codebooks) * cfg.stride
        e = apply_embedding(params["audio_codebook_embeddings"],
                            frame + offsets)
        return jnp.sum(e, axis=0)[None, None]

    def _audio_logits(self, params, hidden: Array) -> Array:
        """(1, D) -> (K, C+2)."""
        cfg = self.config
        flat = apply_linear(params["audio_decoder_proj"]["audio_lm_head"],
                            hidden)
        return flat.reshape(cfg.audio_num_codebooks, cfg.stride)

    # ------------------------------------------------------------- prompt

    def build_prompt(self, text: str, ref_audio: Optional[np.ndarray] = None,
                     ref_text: Optional[str] = None,
                     ref_codes: Optional[np.ndarray] = None
                     ) -> Tuple[Array, Array]:
        """-> (embeds (1, T, D), audio_out_mask (1, T)).

        Voice-clone (ref audio/codes given): ChatML user(ref_text) /
        assistant(<ref audio codes>) / user(target) / assistant <audio_out>.
        Smart-voice otherwise (reference serve.py:142-238)."""
        if self.tokenizer is None:
            raise RuntimeError("higgs_audio needs the HF text tokenizer")
        cfg = self.config
        p = self.params

        def embed_text(s: str) -> Tuple[Array, int]:
            ids = self.tokenizer.encode(s, add_special_tokens=False)
            e = apply_embedding(p["embed_tokens"],
                                jnp.asarray([ids], jnp.int32))[0]
            return e, len(ids)

        if ref_audio is None and ref_codes is None:
            prompt = ("<|begin_of_text|><|start_header_id|>user"
                      f"<|end_header_id|>\n\n{text}<|eot_id|>"
                      "<|start_header_id|>assistant<|end_header_id|>\n\n"
                      "<|audio_out_bos|>")
            emb, n = embed_text(prompt)
            return emb[None], jnp.zeros((1, n), bool)

        if ref_codes is None:
            if self.codec is None:
                raise RuntimeError("voice cloning needs the codec bound "
                                   "(model.codec = ...)")
            ref_codes = np.asarray(self.codec.encode(
                np.asarray(ref_audio, np.float32).reshape(1, -1)))
            ref_codes = ref_codes.reshape(
                cfg.audio_num_codebooks, -1)
        ref_codes = np.asarray(ref_codes, np.int32)
        bos_col = np.full((cfg.audio_num_codebooks, 1),
                          cfg.audio_stream_bos_id, np.int32)
        eos_col = np.full((cfg.audio_num_codebooks, 1),
                          cfg.audio_stream_eos_id, np.int32)
        wrapped = np.concatenate([bos_col, ref_codes, eos_col], axis=1)
        delayed = apply_delay_pattern(wrapped[:, 1:-1],
                                      cfg.audio_stream_bos_id,
                                      cfg.audio_stream_eos_id)
        delayed = np.concatenate([bos_col, delayed, eos_col], axis=1)
        offsets = (np.arange(cfg.audio_num_codebooks) * cfg.stride)[:, None]
        audio_emb = np.asarray(apply_embedding(
            p["audio_codebook_embeddings"],
            jnp.asarray(delayed + offsets))).sum(axis=0)   # (T_ref_d, D)

        prefix = ("<|begin_of_text|><|start_header_id|>user"
                  f"<|end_header_id|>\n\n{ref_text or ''}<|eot_id|>"
                  "<|start_header_id|>assistant<|end_header_id|>\n\n"
                  "<|audio_out_bos|>")
        middle = ("<|audio_eos|><|eot_id|>"
                  "<|start_header_id|>user<|end_header_id|>\n\n"
                  f"{text}<|eot_id|>"
                  "<|start_header_id|>assistant<|end_header_id|>\n\n"
                  "<|audio_out_bos|>")
        pre_emb, n_pre = embed_text(prefix)
        mid_emb, n_mid = embed_text(middle)
        embeds = jnp.concatenate(
            [pre_emb, jnp.asarray(audio_emb), mid_emb], axis=0)[None]
        mask = jnp.concatenate([
            jnp.zeros((n_pre,), bool),
            jnp.ones((audio_emb.shape[0],), bool),
            jnp.zeros((n_mid,), bool)])[None]
        return embeds, mask

    # ------------------------------------------------------------ compiled

    def _prefill_fn(self, pb: int, cache_len: int = MAX_CACHE_LEN):
        cfg = self.config

        def prefill(params, embeds, mask, plen, key):
            t = cfg.text
            # cache in the params' compute dtype and sized to this request's
            # horizon: decode attention reads the whole fixed buffer every
            # frame, so an always-4096 f32 cache would burn ~8x the HBM
            # bandwidth a bf16 right-sized one does
            kv_dtype = params["embed_tokens"]["weight"].dtype
            caches = [KVCache.init(1, cache_len,
                                   t.num_key_value_heads, t.head_dim,
                                   kv_dtype)
                      for _ in range(t.num_hidden_layers)]
            pad = jnp.where(jnp.arange(cache_len) < plen, 0.0,
                            -jnp.inf)[None, None, None, :]
            _, caches = higgs_forward(params, cfg, embeds, mask, caches, 0,
                                      pad_mask=pad)
            # frame 0 is the synthetic all-BOS AUDIO_INIT (never sampled)
            frame0 = jnp.full((cfg.audio_num_codebooks,),
                              cfg.audio_stream_bos_id, jnp.int32)
            embed0 = self._embed_frame(params, frame0)
            return FrameCarry(
                caches=caches, embed=embed0, offset=plen,
                step=jnp.int32(0), num_delay=jnp.int32(0),
                num_remaining=jnp.int32(-1), done=jnp.bool_(False),
                ras_window=jnp.full(
                    (cfg.audio_num_codebooks, 8),
                    cfg.audio_stream_bos_id, jnp.int32),
                key=key), frame0

        return jax.jit(prefill)

    def _chunk_fn(self, chunk: int, temperature: float, top_p: float,
                  top_k: int, ras_win_len: int, ras_max_repeat: int,
                  warmup: int):
        cfg = self.config
        K = cfg.audio_num_codebooks
        BOS = cfg.audio_stream_bos_id
        EOS = cfg.audio_stream_eos_id
        from ....ops.sampling import top_k_top_p_filter

        def sample_frame(key, logits, step):
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lg = logits.astype(jnp.float32) / max(temperature, 1e-6)
            lg = top_k_top_p_filter(lg, top_k=top_k or 0,
                                    top_p=top_p if top_p else 1.0)
            drawn = jax.random.categorical(key, lg, axis=-1).astype(
                jnp.int32)
            use_greedy = jnp.logical_or(step < warmup, temperature <= 0.0)
            return jnp.where(use_greedy, greedy, drawn), greedy

        def chunk_step(params, carry: FrameCarry):
            def step(c: FrameCarry, _):
                hidden, caches = higgs_forward(
                    params, cfg, c.embed, jnp.ones((1, 1), bool),
                    c.caches, c.offset)
                logits = self._audio_logits(params, hidden[0, -1])
                key, sub = jax.random.split(c.key)
                tok, greedy = sample_frame(sub, logits, c.step)
                # RAS: if a codebook repeats >= max_repeat times in the
                # recent window, fall back to greedy for that codebook
                if ras_win_len > 0:
                    win = c.ras_window[:, -ras_win_len:]
                    count = jnp.sum(win == tok[:, None], axis=1)
                    tok = jnp.where(count >= ras_max_repeat, greedy, tok)
                # delay ramp-in: tail codebooks forced to BOS
                idx = jnp.arange(K)
                ramping = c.num_delay + 1 < K
                tok = jnp.where(ramping & (idx > c.num_delay), BOS, tok)
                num_delay = jnp.where(ramping, c.num_delay + 1, c.num_delay)
                # EOS ramp-out
                started = c.num_remaining >= 0
                tok = jnp.where(started & (idx < K - c.num_remaining),
                                EOS, tok)
                eos_mask = tok == EOS
                any_eos = jnp.any(eos_mask)
                last_eos = (K - 1) - jnp.argmax(eos_mask[::-1])
                tok = jnp.where(~started & any_eos & (idx < last_eos),
                                EOS, tok)
                num_remaining = jnp.where(
                    started, c.num_remaining - 1,
                    jnp.where(any_eos, K - last_eos - 1, jnp.int32(-1)))
                done = c.done | (started & (c.num_remaining <= 0))
                window = jnp.concatenate(
                    [c.ras_window[:, 1:], tok[:, None]], axis=1)
                new = FrameCarry(
                    caches=caches, embed=self._embed_frame(params, tok),
                    offset=c.offset + 1, step=c.step + 1,
                    num_delay=num_delay, num_remaining=num_remaining,
                    done=done, ras_window=window, key=key)
                return new, (tok, done)

            carry2, (frames, dones) = jax.lax.scan(step, carry, None,
                                                   length=chunk)
            return carry2, frames, dones

        # donate the carry: the KV caches alias in-place across chunk calls
        # instead of double-buffering hundreds of MB per step
        return jax.jit(chunk_step, donate_argnums=(1,))

    # ------------------------------------------------------------ generate

    def generate_frames(self, embeds: Array, mask: Array, *,
                        max_new_frames: int = 900,
                        temperature: float = 0.7, top_p: float = 0.95,
                        top_k: int = 0, ras_win_len: int = 7,
                        ras_max_repeat: int = 2,
                        sampling_warmup_frames: int = 0,
                        seed: int = 0) -> Iterator[np.ndarray]:
        """Yield delayed (chunk, K) frame blocks (frame 0 = AUDIO_INIT)."""
        cfg = self.config
        plen = embeds.shape[1]
        pb = _bucket(plen)
        cache_len = min(_bucket(pb + max_new_frames
                                + cfg.audio_num_codebooks + CHUNK_FRAMES),
                        MAX_CACHE_LEN)
        embeds = jnp.pad(embeds, ((0, 0), (0, pb - plen), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pb - mask.shape[1])))
        pf = self._jit_cache.get(("prefill", pb, cache_len))
        if pf is None:
            pf = self._prefill_fn(pb, cache_len)
            self._jit_cache[("prefill", pb, cache_len)] = pf
        carry, frame0 = pf(self.params, embeds, mask, jnp.int32(plen),
                           jax.random.PRNGKey(seed))
        yield np.asarray(frame0)[None]

        key_ = ("chunk", CHUNK_FRAMES, temperature, top_p, top_k,
                ras_win_len, ras_max_repeat, sampling_warmup_frames)
        st = self._jit_cache.get(key_)
        if st is None:
            st = self._chunk_fn(CHUNK_FRAMES, temperature, top_p, top_k,
                                ras_win_len, ras_max_repeat,
                                sampling_warmup_frames)
            self._jit_cache[key_] = st
        n = 0
        while n < max_new_frames:
            carry, frames, dones = st(self.params, carry)
            f = np.asarray(frames)
            d = np.asarray(dones)
            if d.any():
                k = int(np.argmax(d)) + 1
                yield f[:k]
                return
            yield f
            n += len(f)

    def generate(self, text: str, *, ref_audio=None, ref_text=None,
                 ref_codes=None, voice: Optional[str] = None,
                 temperature: float = 0.7, top_p: float = 0.95,
                 top_k: int = 0, max_new_frames: int = 900,
                 max_tokens: Optional[int] = None,
                 ras_win_len: int = 7, ras_max_repeat: int = 2,
                 stream: bool = False, streaming_interval: float = 0.64,
                 overlap_ms: float = 40.0, fade_in_ms: float = 30.0,
                 fade_out_ms: float = 15.0,
                 references=None, seed: int = 0, verbose: bool = False,
                 **kwargs) -> Iterator[GenerationResult]:
        t0 = time.time()
        cfg = self.config
        if max_tokens is not None:
            max_new_frames = max_tokens
        if references and ref_audio is None and ref_codes is None:
            # the reference's `references=[...]` alias (its model.py accepts a
            # list of {audio|path, text} dicts or bare audio paths); v2's
            # prompt format conditions on a single reference, so take the
            # first entry
            ref = references[0] if isinstance(
                references, (list, tuple)) else references
            if isinstance(ref, dict):
                ref_audio = next((ref[k] for k in
                                  ("audio", "audio_path", "path", "ref_audio")
                                  if ref.get(k) is not None), None)
                ref_codes = ref.get("codes", ref_codes)
                ref_text = ref.get("text", ref_text)
            else:
                ref_audio = ref
        if isinstance(ref_audio, (str, Path)):
            from ....utils import load_audio

            ref_audio = np.asarray(load_audio(str(ref_audio),
                                              sample_rate=self.sample_rate))
        embeds, mask = self.build_prompt(text, ref_audio=ref_audio,
                                         ref_text=ref_text,
                                         ref_codes=ref_codes)
        gen = self.generate_frames(
            embeds, mask, max_new_frames=max_new_frames,
            temperature=temperature, top_p=top_p, top_k=top_k,
            ras_win_len=ras_win_len, ras_max_repeat=ras_max_repeat,
            seed=seed)

        if stream:
            yield from self._stream_overlap_add(
                gen, t0, emit_every_frames=max(
                    int(streaming_interval * 25), 4),
                overlap_ms=overlap_ms)
            return

        frames = np.concatenate(list(gen), axis=0)     # (N, K) delayed
        codes = self._frames_to_codes(frames)
        audio = self._decode_codes(codes)
        # edge fades (reference model.py:134-135, 195-209)
        sr = self.sample_rate
        n_in = int(fade_in_ms * sr / 1000.0)
        n_out = int(fade_out_ms * sr / 1000.0)
        audio = np.asarray(audio, np.float32).copy()
        if n_in > 0 and audio.size > n_in:
            audio[:n_in] *= np.linspace(0.0, 1.0, n_in, dtype=np.float32)
        if n_out > 0 and audio.size > n_out:
            audio[-n_out:] *= np.linspace(1.0, 0.0, n_out, dtype=np.float32)
        dt = time.time() - t0
        yield self._result(audio, 0, codes.shape[1], dt, codes=codes,
                           final=True)

    def _frames_to_codes(self, frames: np.ndarray) -> np.ndarray:
        """Delayed frame stack (N, K) -> aligned (K, T) with boundary trim
        (reference generate :458-470)."""
        cfg = self.config
        aligned = revert_delay_pattern(frames.T.astype(np.int32))
        if aligned.shape[1] >= 2:
            aligned = aligned[:, 1:-1]
        return np.clip(aligned, 0, cfg.audio_codebook_size - 1)

    def _decode_codes(self, codes: np.ndarray) -> np.ndarray:
        if self.codec is not None and codes.shape[1]:
            return np.asarray(self.codec.decode(
                jnp.asarray(codes[None]))).reshape(-1)
        # codec-less fallback keeps the pipeline runnable (tests / bench)
        return np.zeros((codes.shape[1] * 960,), np.float32)

    def _stream_overlap_add(self, frame_gen, t0, *,
                            emit_every_frames: int = 16,
                            overlap_ms: float = 40.0,
                            fade_in_ms: float = 5.0
                            ) -> Iterator[GenerationResult]:
        """Mid-generation overlap-add streaming (reference serve.py:593):
        re-decode the accumulated sequence every emit_every_frames and
        crossfade the previous decode's tail with the new decode."""
        sr = self.sample_rate
        overlap = int(overlap_ms * sr / 1000.0)
        n_fade = int(fade_in_ms * sr / 1000.0)
        frames: List[np.ndarray] = []
        emitted = 0
        tail: Optional[np.ndarray] = None
        seg = 0
        last_emit = 0
        seg_t0 = time.time()
        K = self.config.audio_num_codebooks

        def decode_now():
            codes = self._frames_to_codes(np.concatenate(frames, axis=0))
            if codes.shape[1] == 0:
                return None, codes
            return self._decode_codes(codes), codes

        done = False
        for block in frame_gen:
            frames.append(block)
            total = sum(len(b) for b in frames)
            if total <= K + 1 or total - last_emit < emit_every_frames:
                continue
            last_emit = total
            pcm, codes = decode_now()
            if pcm is None:
                continue
            if seg == 0 and n_fade > 0 and pcm.size > n_fade:
                pcm[:n_fade] *= np.linspace(0, 1, n_fade, dtype=np.float32)
            if tail is not None and overlap > 0:
                ov = min(overlap, len(tail), len(pcm) - emitted)
                if ov > 0:
                    w = np.linspace(0, 1, ov, dtype=np.float32)
                    pcm[emitted:emitted + ov] = (
                        tail[:ov] * (1 - w) + pcm[emitted:emitted + ov] * w)
            emit_end = max(len(pcm) - overlap, emitted)
            chunk = pcm[emitted:emit_end]
            tail = pcm[emit_end:]
            emitted = emit_end
            if len(chunk):
                dt = time.time() - seg_t0
                seg_t0 = time.time()
                yield self._result(chunk, seg, codes.shape[1], dt,
                                   streaming=True)
                seg += 1
        pcm, codes = decode_now()
        if pcm is not None and len(pcm) > emitted:
            dt = time.time() - seg_t0
            yield self._result(pcm[emitted:], seg, codes.shape[1], dt,
                               streaming=True, final=True)

    def _result(self, audio, seg, n_codes, dt, codes=None, streaming=False,
                final=False) -> GenerationResult:
        dur = len(audio) / self.sample_rate
        return GenerationResult(
            audio=np.asarray(audio), samples=len(audio),
            sample_rate=self.sample_rate, segment_idx=seg,
            token_count=int(n_codes),
            audio_duration=format_duration(dur),
            # reference flips convention per path: streaming chunks report
            # audio/elapsed (model.py:346), the non-stream result reports
            # elapsed/audio (model.py:264)
            real_time_factor=(round(dur / dt, 3) if streaming and dt > 0
                              else round(dt / dur, 3) if dur > 0 else 0.0),
            prompt={"tokens": int(n_codes),
                    "tokens-per-sec": round(n_codes / dt, 2) if dt else 0,
                    **({"codes": codes} if codes is not None else {})},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)
                           if dt else 0},
            processing_time_seconds=dt,
            peak_memory_usage=peak_memory_gb(),
            is_streaming_chunk=streaming, is_final_chunk=final)


class HiggsAudioServer:
    """Serving wrapper with reference caching + overlap-add streaming
    (reference serve.py:240-592)."""

    def __init__(self, model: Model):
        self.model = model
        self._reference: Optional[Tuple[np.ndarray, str]] = None

    def prepare_reference(self, ref_audio, ref_text: str = "") -> None:
        cfg = self.model.config
        if self.model.codec is None:
            raise RuntimeError("codec not bound")
        codes = np.asarray(self.model.codec.encode(
            np.asarray(ref_audio, np.float32).reshape(1, -1)))
        self._reference = (codes.reshape(cfg.audio_num_codebooks, -1),
                           ref_text)

    def clear_reference(self) -> None:
        self._reference = None

    def generate(self, target_text: str, **kwargs) -> GenerationResult:
        ref_codes, ref_text = self._reference or (None, None)
        return next(self.model.generate(
            target_text, ref_codes=ref_codes, ref_text=ref_text, **kwargs))

    def generate_stream_overlap_add(self, target_text: str, **kwargs
                                    ) -> Iterator[GenerationResult]:
        ref_codes, ref_text = self._reference or (None, None)
        yield from self.model.generate(
            target_text, ref_codes=ref_codes, ref_text=ref_text,
            stream=True, **kwargs)


__all__ = ["Model", "ModelConfig", "HiggsAudioServer", "HiggsTextConfig",
           "higgs_forward", "init_higgs_v2", "revert_delay_pattern",
           "apply_delay_pattern"]
