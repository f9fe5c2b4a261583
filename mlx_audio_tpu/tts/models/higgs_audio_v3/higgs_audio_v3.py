"""Higgs Audio v3 (4B): Qwen3 backbone + delay-pattern multicodebook TTS.

Parity: /root/reference/mlx_audio/tts/models/higgs_audio_v3 (config.py:9-99,
model.py:43-165 — fused multimodal embedding doubling as the audio head,
sanitize :111; generation.py delay pattern apply/reverse :23-53, delayed
row sampler :124-150; prompt.py ChatML builder).

TPU redesign: the per-row decode (backbone step + 8-codebook row sampling
with delay forcing) compiles into lax.scan chunks; the delay pattern is
enforced with index masks inside the compiled step (BOC forced for
codebook k during the first k steps; EOC on codebook 0 starts the drain).
Acoustic decode runs through a pluggable codec (the higgs acoustic
tokenizer family lands next; codes are always available on the result).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_embedding, apply_rms_norm, init_embedding, init_rms_norm
from ....ops.kvcache import KVCache
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..qwen3_tts.talker import init_qwen3_layer, qwen3_layer_forward

Array = jax.Array

MAX_CACHE_LEN = 4096
CHUNK_ROWS = 16


@dataclass
class TextConfig:
    hidden_size: int = 2560
    num_hidden_layers: int = 36
    intermediate_size: int = 9728
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    vocab_size: int = 151936
    tie_word_embeddings: bool = True


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "higgs_audio_v3"
    text_config: Any = field(default_factory=dict)
    audio_token_id: int = -100
    audio_num_codebooks: int = 8
    audio_codebook_size: int = 1026
    audio_boc_token_id: int = 1024
    audio_eoc_token_id: int = 1025
    use_delay_pattern: bool = True
    sample_rate: int = 24000
    model_path: str = ""

    def __post_init__(self):
        if isinstance(self.text_config, dict):
            tc = {k: v for k, v in self.text_config.items()
                  if k in TextConfig.__dataclass_fields__}
            self.text_config = TextConfig(**tc)


def apply_delay_pattern(codes: np.ndarray, boc: int,
                        eoc: Optional[int] = None) -> np.ndarray:
    """Raw codes (T, N) -> delayed rows (T + N - 1, N): codebook k shifted
    down k rows, BOC-filled above and EOC-filled below the diagonal band
    (reference generation.py:23-40)."""
    t, n = codes.shape
    out = np.full((t + n - 1, n), boc if eoc is None else eoc,
                  dtype=codes.dtype)
    for k in range(n):
        if k:
            out[:k, k] = boc
        out[k: k + t, k] = codes[:, k]
    return out


def reverse_delay_pattern(delayed: np.ndarray) -> np.ndarray:
    """Delayed rows (L, N) -> raw codes (L - N + 1, N)."""
    length, n = delayed.shape
    t = length - n + 1
    if t <= 0:
        return np.zeros((0, n), delayed.dtype)
    return np.stack([delayed[k: k + t, k] for k in range(n)], axis=-1)


class Model(FunctionalModel):
    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tc = config.text_config
        self.tokenizer = None
        self.codec = None  # pluggable acoustic tokenizer

    @property
    def sample_rate(self):
        return self.config.sample_rate

    # -- params --------------------------------------------------------------

    def init_params(self, key):
        c = self.config
        t = self.tc
        ks = iter(jax.random.split(key, 16 * t.num_hidden_layers + 8))
        layers = {
            str(i): init_qwen3_layer(ks, t.hidden_size,
                                     t.num_attention_heads,
                                     t.num_key_value_heads, t.head_dim,
                                     t.intermediate_size, False)
            for i in range(t.num_hidden_layers)
        }
        return {
            "backbone": {
                "embed_tokens": init_embedding(next(ks), t.vocab_size,
                                               t.hidden_size),
                "layers": layers,
                "norm": init_rms_norm(t.hidden_size),
            },
            "multimodal_embedding": init_embedding(
                next(ks), c.audio_num_codebooks * c.audio_codebook_size,
                t.hidden_size),
        }

    def sanitize(self, weights):
        """Checkpoint remap (reference model.py:111-135)."""
        out = {}
        for k, w in weights.items():
            if k.startswith("tied.embedding.text_embedding."):
                out["backbone.embed_tokens." +
                    k[len("tied.embedding.text_embedding."):]] = w
            elif k.startswith("body.layers."):
                out["backbone.layers." + k[len("body.layers."):]] = w
            elif k.startswith("body.norm."):
                out["backbone.norm." + k[len("body.norm."):]] = w
            elif k.startswith("tied.embedding.modality_embeddings.0.embedding."):
                out["multimodal_embedding." +
                    k[len("tied.embedding.modality_embeddings.0.embedding."):]
                    ] = w
            elif k.startswith(("tied.embedding.modality_embeddings.0.model.",
                               "tied.head.")):
                continue
            else:
                out[k] = w
        return out

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model.tokenizer = None
        return model

    # -- embeddings / heads --------------------------------------------------

    def _embed_audio_row(self, params, row: Array) -> Array:
        """row (B, N) codes -> summed fused embedding (B, D)."""
        c = self.config
        offsets = (jnp.arange(c.audio_num_codebooks)
                   * c.audio_codebook_size)[None, :]
        return jnp.sum(apply_embedding(params["multimodal_embedding"],
                                       row + offsets), axis=-2)

    def _audio_logits(self, params, hidden: Array) -> Array:
        """hidden (B, D) -> logits (B, N, codebook_size) via the tied
        multimodal embedding used as a linear head."""
        c = self.config
        w = params["multimodal_embedding"]["weight"]
        flat = jnp.einsum("bd,vd->bv", hidden, w.astype(hidden.dtype))
        return flat.reshape(hidden.shape[0], c.audio_num_codebooks,
                            c.audio_codebook_size)

    def _backbone_step(self, params, embeds, caches, offset, mask=None,
                       positions=None):
        t = self.tc
        from ....ops.rope import rope_freqs

        x = embeds
        if positions is None:
            positions = offset + jnp.arange(embeds.shape[1])[None, :]
        inv_freq = rope_freqs(t.head_dim, t.rope_theta)
        new_caches = []
        for i in range(t.num_hidden_layers):
            x, nc = qwen3_layer_forward(
                params["backbone"]["layers"][str(i)], x, positions, inv_freq,
                t.num_attention_heads, t.num_key_value_heads, t.head_dim,
                t.rms_norm_eps, caches[i], offset, mask, causal=True)
            new_caches.append(nc)
        return apply_rms_norm(params["backbone"]["norm"], x,
                              t.rms_norm_eps), new_caches

    # -- compiled generation -------------------------------------------------

    def _make_chunk_stepper(self, chunk: int, temperature: float,
                            top_k: int, top_p: float):
        """SGLang-compatible delayed sampler steps (reference
        generation.py:115-158): sample a row from the CURRENT hidden (the
        first row conditions on the prompt's last hidden), force BOC on
        codebook k for the first k rows, then after codebook 0 emits EOC
        keep sampling exactly N-2 drain rows before finishing."""
        c = self.config
        n = c.audio_num_codebooks
        from ....ops.sampling import top_k_top_p_filter

        def sample(k, lg):
            lg = lg.astype(jnp.float32)
            if temperature <= 1e-5 or top_k == 1:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            f = top_k_top_p_filter(lg / temperature, top_k=top_k,
                                   top_p=top_p if 0.0 < top_p < 1.0 else 1.0)
            return jax.random.categorical(k, f, axis=-1).astype(jnp.int32)

        def chunk_step(params, carry):
            def step(cr, _):
                (caches, hidden, pos, row_idx, countdown, done, key) = cr
                logits = self._audio_logits(params, hidden)
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, n)
                row = jnp.stack([sample(keys[i], logits[:, i])
                                 for i in range(n)], axis=-1)
                # delay phase: codebook k emits BOC for the first k rows
                cb = jnp.arange(n)[None, :]
                row = jnp.where(cb > row_idx, c.audio_boc_token_id, row)
                in_delay = row_idx < n
                dec = (~in_delay) & (countdown >= 0)
                countdown2 = jnp.where(dec, countdown - 1, countdown)
                finished = dec & (countdown2 <= 0)
                set_eoc = ((~in_delay) & (~dec)
                           & (row[:, 0] == c.audio_eoc_token_id))
                countdown3 = jnp.where(set_eoc, jnp.int32(n - 2), countdown2)
                if n <= 2:
                    finished = finished | set_eoc
                done2 = done | finished
                embed_next = self._embed_audio_row(params, row)[:, None]
                h, caches = self._backbone_step(params, embed_next, caches,
                                                pos)
                return ((caches, h[:, -1], pos + 1, row_idx + 1, countdown3,
                         done2, key), (row, done2))

            carry2, (rows, fins) = jax.lax.scan(step, carry, None,
                                                length=chunk)
            return carry2, rows, fins

        return jax.jit(chunk_step)

    def _make_batch_chunk_stepper(self, chunk: int, temperature: float,
                                  top_k: int, top_p: float):
        """Batched variant of the chunk stepper for left-padded prompts:
        per-row pad widths drive a persistent attention mask and row-local
        RoPE positions, so each row decodes exactly as it would alone
        (parity: reference batch_generate model.py:547-735, which uses
        BatchKVCache left-padding; here the pad mask + fixed-slot cache is
        the TPU equivalent)."""
        c = self.config
        n = c.audio_num_codebooks
        from ....ops.sampling import top_k_top_p_filter

        def sample(k, lg):
            lg = lg.astype(jnp.float32)
            if temperature <= 1e-5 or top_k == 1:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            f = top_k_top_p_filter(lg / temperature, top_k=top_k,
                                   top_p=top_p if 0.0 < top_p < 1.0 else 1.0)
            return jax.random.categorical(k, f, axis=-1).astype(jnp.int32)

        cols = jnp.arange(MAX_CACHE_LEN)[None, :]

        def chunk_step(params, carry):
            def step(cr, _):
                (caches, hidden, pos, row_idx, countdown, done, key,
                 pad_w) = cr
                logits = self._audio_logits(params, hidden)
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, n)
                row = jnp.stack([sample(keys[i], logits[:, i])
                                 for i in range(n)], axis=-1)
                cb = jnp.arange(n)[None, :]
                row = jnp.where(cb > row_idx, c.audio_boc_token_id, row)
                in_delay = row_idx < n
                dec = (~in_delay) & (countdown >= 0)
                countdown2 = jnp.where(dec, countdown - 1, countdown)
                finished = dec & (countdown2 <= 0)
                set_eoc = ((~in_delay) & (~dec)
                           & (row[:, 0] == c.audio_eoc_token_id))
                countdown3 = jnp.where(set_eoc, jnp.int32(n - 2), countdown2)
                if n <= 2:
                    finished = finished | set_eoc
                done2 = done | finished
                embed_next = self._embed_audio_row(params, row)[:, None]
                attend = (cols >= pad_w[:, None]) & (cols <= pos)
                h, caches = self._backbone_step(
                    params, embed_next, caches, pos, mask=attend,
                    positions=(pos - pad_w)[:, None])
                return ((caches, h[:, -1], pos + 1, row_idx + 1, countdown3,
                         done2, key, pad_w), (row, done2))

            carry2, (rows, fins) = jax.lax.scan(step, carry, None,
                                                length=chunk)
            return carry2, rows, fins

        return jax.jit(chunk_step)

    # -- prompt (reference prompt.py) -----------------------------------------

    def _prompt_specials(self) -> Dict[str, int]:
        if self.tokenizer is None:
            raise ValueError("No tokenizer; pass text_ids directly.")
        vocab = dict(self.tokenizer.get_added_vocab()) \
            if hasattr(self.tokenizer, "get_added_vocab") else {}
        required = ("<|tts|>", "<|ref_audio|>", "<|text|>", "<|audio|>")
        missing = [t for t in required if t not in vocab]
        if missing:
            raise ValueError(
                f"Tokenizer is missing Higgs v3 specials: {missing}")
        return vocab

    def build_prompt(self, text: str, references=()):
        """<|tts|> [<|ref_text|> text] [<|ref_audio|> codes] <|text|> text
        <|audio|> with AUDIO_PLACEHOLDER (-100) rows for reference codes
        (reference prompt.py:48-70). Returns (token_ids, segments)."""
        vocab = self._prompt_specials()

        def enc(s):
            return list(self.tokenizer.encode(s, add_special_tokens=False))

        ids: List[int] = [int(vocab["<|tts|>"])]
        segments = []
        for ref in references:
            if ref.get("text") and "<|ref_text|>" in vocab:
                ids.append(int(vocab["<|ref_text|>"]))
                ids.extend(enc(ref["text"]))
            ids.append(int(vocab["<|ref_audio|>"]))
            start = len(ids)
            codes = np.asarray(ref["codes"], np.int32)
            ids.extend([-100] * codes.shape[0])
            segments.append((start, codes))
        ids.append(int(vocab["<|text|>"]))
        ids.extend(enc(text))
        ids.append(int(vocab["<|audio|>"]))
        return ids, segments

    def _prompt_embeds(self, token_ids: List[int], segments) -> Array:
        """Splice reference-code embeddings over the placeholder rows
        (reference model.py:165-189). Returns (1, L, D)."""
        p = self.params
        pieces = []
        cursor = 0
        for start, codes in segments:
            if start > cursor:
                pieces.append(apply_embedding(
                    p["backbone"]["embed_tokens"],
                    jnp.asarray(token_ids[cursor:start], jnp.int32)))
            pieces.append(self._embed_audio_row(p, jnp.asarray(codes)))
            cursor = start + codes.shape[0]
        tail = token_ids[cursor:]
        if any(t == -100 for t in tail):
            raise ValueError("Internal prompt error: unresolved placeholder")
        if tail:
            pieces.append(apply_embedding(
                p["backbone"]["embed_tokens"],
                jnp.asarray(tail, jnp.int32)))
        return jnp.concatenate(pieces, axis=0)[None]

    # -- reference audio (reference model.py:191-339) -------------------------

    def _normalize_audio(self, audio) -> np.ndarray:
        if isinstance(audio, (str, )) or hasattr(audio, "__fspath__"):
            from ....utils import load_audio
            audio = load_audio(str(audio), sample_rate=self.sample_rate)
        arr = np.asarray(audio, np.float32)
        if arr.ndim == 2:
            arr = arr.mean(axis=0) if arr.shape[0] <= 2 else arr.mean(axis=-1)
        return arr.reshape(-1)

    def encode_reference_audio(self, audio) -> np.ndarray:
        """Reference audio -> delayed Higgs v3 codes (T+N-1, N); reusable
        via generate(..., ref_audio_codes=...) (reference model.py:210-228)."""
        if self.codec is None:
            raise RuntimeError("Codec missing; load via tts.utils.load().")
        arr = self._normalize_audio(audio)
        if arr.shape[0] < self.sample_rate:
            arr = np.pad(arr, (0, self.sample_rate - arr.shape[0]))
        codes = np.asarray(self.codec.encode(arr)).astype(np.int32)  # (T, N)
        return apply_delay_pattern(codes, self.config.audio_boc_token_id,
                                   self.config.audio_eoc_token_id)

    def _normalize_reference_codes(self, codes) -> np.ndarray:
        arr = np.asarray(codes, np.int32)
        n = self.config.audio_num_codebooks
        if arr.ndim != 2 or arr.shape[1] != n:
            raise ValueError(
                f"reference audio codes must be [T, {n}], got {arr.shape}")
        return arr

    def _normalize_references(self, ref_audio=None, ref_text=None,
                              references=None, ref_audios=None,
                              ref_texts=None, ref_audio_codes=None,
                              ref_audio_codes_list=None) -> List[dict]:
        """Collapse the reference's many aliases into [{codes, text}]
        (reference model.py:249-339)."""
        def as_list(v):
            if v is None:
                return []
            return list(v) if isinstance(v, (list, tuple)) else [v]

        audios = as_list(ref_audios if ref_audios is not None else ref_audio)
        if ref_audio_codes_list is not None:
            code_values = as_list(ref_audio_codes_list)
        elif ref_audio_codes is not None:
            code_values = [ref_audio_codes]
        else:
            code_values = []
        if audios and code_values:
            raise ValueError(
                "Use either ref_audio or ref_audio_codes, not both")
        texts = as_list(ref_texts if ref_texts is not None else ref_text)
        items = ([{"codes": self._normalize_reference_codes(c)}
                  for c in code_values]
                 or [{"codes": self.encode_reference_audio(a)}
                     for a in audios])
        if texts:
            if len(texts) != len(items):
                raise ValueError("ref_text must have the same length as "
                                 "ref_audio/ref_audio_codes")
            for item, t in zip(items, texts):
                item["text"] = t
        for ref in as_list(references):
            if isinstance(ref, dict):
                if "codes" in ref and ref["codes"] is not None:
                    codes = self._normalize_reference_codes(ref["codes"])
                else:
                    src = next((ref[k] for k in
                                ("audio", "audio_path", "path", "ref_audio")
                                if ref.get(k) is not None), None)
                    if src is None:
                        raise ValueError(
                            "reference dict needs 'codes' or 'audio'")
                    codes = self.encode_reference_audio(src)
                items.append({"codes": codes, "text": ref.get("text")})
            else:
                items.append({"codes": self.encode_reference_audio(ref)})
        return items

    def _apply_fades(self, audio: np.ndarray, fade_in_ms: float,
                     fade_out_ms: float) -> np.ndarray:
        """Linear fade-in/out (reference model.py:352-367)."""
        audio = np.asarray(audio, np.float32).copy()
        n_in = int(fade_in_ms * self.sample_rate / 1000.0)
        n_out = int(fade_out_ms * self.sample_rate / 1000.0)
        if n_in > 0 and audio.size > n_in:
            audio[:n_in] *= np.linspace(0.0, 1.0, n_in, dtype=np.float32)
        if n_out > 0 and audio.size > n_out:
            audio[-n_out:] *= np.linspace(1.0, 0.0, n_out, dtype=np.float32)
        return audio

    def generate(
        self,
        text: Optional[str] = None,
        voice: Optional[str] = None,
        *,
        text_ids: Optional[np.ndarray] = None,
        ref_audio=None,
        ref_text=None,
        references=None,
        ref_audios=None,
        ref_texts=None,
        ref_audio_codes=None,
        ref_audio_codes_list=None,
        max_new_tokens: Optional[int] = None,
        max_new_frames: Optional[int] = None,
        max_tokens: Optional[int] = None,
        temperature: float = 1.0,
        top_p: Optional[float] = None,
        top_k: Optional[int] = None,
        seed: Optional[int] = None,
        fade_in_ms: float = 30.0,
        fade_out_ms: float = 15.0,
        stream: bool = False,
        **kwargs,
    ):
        """Reference model.py:737-851; `voice` is accepted-and-ignored there
        too (no preset voices — conditioning comes from references)."""
        del voice, kwargs
        t0 = time.time()
        limit = int(max_new_tokens if max_new_tokens is not None
                    else max_new_frames if max_new_frames is not None
                    else max_tokens if max_tokens is not None else 2048)

        if text_ids is None:
            refs = self._normalize_references(
                ref_audio=ref_audio, ref_text=ref_text,
                references=references, ref_audios=ref_audios,
                ref_texts=ref_texts, ref_audio_codes=ref_audio_codes,
                ref_audio_codes_list=ref_audio_codes_list)
            token_ids, segments = self.build_prompt(text, refs)
            embeds = self._prompt_embeds(token_ids, segments)
        else:
            text_ids = np.asarray(text_ids).reshape(1, -1)
            embeds = apply_embedding(self.params["backbone"]["embed_tokens"],
                                     jnp.asarray(text_ids, jnp.int32))
        plen = embeds.shape[1]
        pb = 1 << max(4, (plen - 1).bit_length())
        embeds = jnp.pad(embeds, ((0, 0), (0, pb - plen), (0, 0)))

        prefill = self._jit_cache.get(("prefill", pb))
        if prefill is None:
            prefill = jax.jit(self._prefill)
            self._jit_cache[("prefill", pb)] = prefill
        carry = prefill(self.params, embeds, jnp.int32(plen),
                        jax.random.PRNGKey(0 if seed is None else int(seed)))

        tk = 0 if top_k is None else int(top_k)
        tp = 0.0 if top_p is None else float(top_p)
        skey = ("chunk", CHUNK_ROWS, float(temperature), tk, tp)
        st = self._jit_cache.get(skey)
        if st is None:
            st = self._make_chunk_stepper(CHUNK_ROWS, float(temperature),
                                          tk, tp)
            self._jit_cache[skey] = st

        rows_out = []
        done = False
        n = 0
        while not done and n < limit:
            carry, rows, fins = st(self.params, carry)
            r = np.asarray(rows)[:, 0]
            f = np.asarray(fins)[:, 0]
            k = int(np.argmax(f)) + 1 if f.any() else len(r)
            k = min(k, limit - n)
            rows_out.append(r[:k])
            n += k
            done = bool(f.any())
        nb = self.config.audio_num_codebooks
        delayed = (np.concatenate(rows_out, axis=0)
                   if rows_out else np.zeros((0, nb), np.int32))
        # undo the delay directly: the triangular slices drop the EOC row
        # and the BOC delay ramp (reference _decode_audio model.py:340-351)
        codes = reverse_delay_pattern(delayed) \
            if delayed.shape[0] >= nb else np.zeros((0, nb), np.int32)
        codes = np.clip(codes, 0, self.config.audio_codebook_size - 3)

        if self.codec is not None and len(codes):
            # codec contract: (T, n_books) codes -> waveform (reference
            # _decode_audio model.py:340-351 passes raw [T, N] too)
            audio = np.asarray(self.codec.decode(codes)).reshape(-1)
        else:
            audio = np.zeros((len(codes) * 1920,), np.float32)
        audio = self._apply_fades(audio, fade_in_ms, fade_out_ms)
        seg = time.time() - t0
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=len(delayed),
            audio_duration=format_duration(dur),
            real_time_factor=round(seg / dur, 3) if dur else 0.0,
            prompt={"tokens": plen, "completion_tokens": len(delayed),
                    "tokens-per-sec":
                    round(plen / seg, 2) if seg else 0, "codes": codes},
            audio_samples={"samples": len(audio), "samples-per-sec":
                           round(len(audio) / seg, 2) if seg else 0},
            processing_time_seconds=seg,
            peak_memory_usage=peak_memory_gb(),
            is_streaming_chunk=bool(stream),
            is_final_chunk=True,
        )

    def _prefill(self, params, embeds, plen, key):
        """Prompt embeds (B, pb, D) -> decode carry whose hidden is the
        prompt's LAST hidden state — the first audio row is sampled from it
        directly (reference model.py:786-792), no extra step in between."""
        t = self.tc
        b = embeds.shape[0]
        caches = [KVCache.init(b, MAX_CACHE_LEN, t.num_key_value_heads,
                               t.head_dim, jnp.float32)
                  for _ in range(t.num_hidden_layers)]
        pad_mask = jnp.where(jnp.arange(MAX_CACHE_LEN) < plen, 0.0,
                             -jnp.inf)[None, None, None, :]
        h, caches = self._backbone_step(params, embeds, caches, 0,
                                        mask=pad_mask)
        last_h = h[jnp.arange(b), plen - 1]
        return (caches, last_h, plen, jnp.int32(0),
                jnp.full((b,), -1, jnp.int32), jnp.zeros((b,), bool), key)

    def _prefill_batch(self, params, embeds, pad_w, key):
        """LEFT-padded prompt embeds (B, pb, D) -> batched decode carry.

        pad_w (B,) is each row's left-pad width; every prompt ends at
        column pb-1, so the per-row last hidden is simply h[:, -1]. RoPE
        positions are row-local (col - pad_w) and the pad columns stay
        masked for the whole decode (reference batch_generate left-padding,
        model.py:650-663)."""
        t = self.tc
        b, pb, _ = embeds.shape
        caches = [KVCache.init(b, MAX_CACHE_LEN, t.num_key_value_heads,
                               t.head_dim, jnp.float32)
                  for _ in range(t.num_hidden_layers)]
        cols = jnp.arange(MAX_CACHE_LEN)[None, :]
        col_ok = (cols >= pad_w[:, None]) & (cols < pb)      # (B, MAX)
        # pad-position QUERIES must keep at least one finite score — a fully
        # masked softmax row is NaN and 0*NaN poisons every later layer's
        # cached values; let them attend anywhere (their outputs are unused)
        pad_q = jnp.arange(pb)[None, :] < pad_w[:, None]     # (B, pb)
        allowed = col_ok[:, None, :] | pad_q[:, :, None]     # (B, pb, MAX)
        pad_mask = jnp.where(allowed, 0.0, -jnp.inf)[:, None, :, :]
        positions = jnp.maximum(
            jnp.arange(pb)[None, :] - pad_w[:, None], 0)
        h, caches = self._backbone_step(params, embeds, caches, 0,
                                        mask=pad_mask, positions=positions)
        return (caches, h[:, -1], jnp.int32(pb), jnp.int32(0),
                jnp.full((b,), -1, jnp.int32), jnp.zeros((b,), bool), key,
                pad_w.astype(jnp.int32))

    # -- batch generation (reference model.py:517-735) ------------------------

    @staticmethod
    def _normalize_batch_arg(name, value, batch_size: int) -> list:
        if value is None:
            return [None] * batch_size
        if isinstance(value, (list, tuple)):
            if len(value) != batch_size:
                raise ValueError(
                    f"{name} length ({len(value)}) must match texts length "
                    f"({batch_size})")
            return list(value)
        return [value] * batch_size

    def _normalize_batch_references(self, *, batch_size: int, ref_audio=None,
                                    ref_text=None, references=None,
                                    ref_audios=None, ref_texts=None,
                                    ref_audio_codes=None,
                                    ref_audio_codes_list=None) -> List[list]:
        """Per-sequence reference lists (reference model.py:390-460): a
        shared clone prompt is normalized once and fanned out; per-item
        lists are normalized row by row."""
        audio_items = self._normalize_batch_arg(
            "ref_audios", ref_audios if ref_audios is not None else ref_audio,
            batch_size)
        text_items = self._normalize_batch_arg(
            "ref_texts", ref_texts if ref_texts is not None else ref_text,
            batch_size)

        def all_equal(vals):
            return all(isinstance(v, (str, int, float, bool, type(None)))
                       for v in vals) and len(set(vals)) <= 1

        if references is None and (
                (ref_audios is None and ref_texts is None)
                or (all_equal(audio_items) and all_equal(text_items))):
            shared = self._normalize_references(
                ref_audio=audio_items[0], ref_text=text_items[0],
                ref_audio_codes=ref_audio_codes,
                ref_audio_codes_list=ref_audio_codes_list)
            return [shared] * batch_size
        return [self._normalize_references(
            ref_audio=audio_items[i], ref_text=text_items[i],
            references=references, ref_audio_codes=ref_audio_codes,
            ref_audio_codes_list=ref_audio_codes_list)
            for i in range(batch_size)]

    def supports_tts_batch(self, *, stream: bool = False,
                           voice: Optional[str] = None,
                           instruct: Optional[str] = None,
                           speed: Optional[float] = 1.0,
                           gender: Optional[str] = None,
                           pitch: Optional[float] = 1.0,
                           **kwargs) -> bool:
        """Capability sniffing for the server batch router (reference
        model.py:517-537)."""
        del kwargs
        if stream or voice is not None or instruct is not None:
            return False
        if gender not in (None, "male"):
            return False
        if speed not in (None, 1.0) or pitch not in (None, 1.0):
            return False
        return True

    def supports_tts_continuous_batch(self, **kwargs) -> bool:
        return self.supports_tts_batch(**kwargs)

    def create_tts_batch_session(self, options=None):
        from .continuous_batching import HiggsAudioV3BatchSession

        return HiggsAudioV3BatchSession(self, options)

    def batch_generate(self, texts, voices=None, instructs=None, speeds=None,
                       genders=None, pitches=None, ref_audio=None,
                       ref_text=None, references=None, ref_audios=None,
                       ref_texts=None, ref_audio_codes=None,
                       ref_audio_codes_list=None,
                       max_new_tokens: Optional[int] = None,
                       max_new_frames: Optional[int] = None,
                       max_tokens: Optional[int] = None,
                       temperature: float = 1.0,
                       top_p: Optional[float] = None,
                       top_k: Optional[int] = None,
                       seed: Optional[int] = None,
                       fade_in_ms: float = 30.0, fade_out_ms: float = 15.0,
                       stream: bool = False, **kwargs):
        """All sequences decode in ONE left-padded batch through the shared
        compiled stepper (reference model.py:547-735; the reference shrinks
        the batch as rows finish — on TPU the batch shape stays fixed and
        finished rows ride along masked)."""
        del kwargs
        if stream:
            raise NotImplementedError(
                "Higgs Audio v3 batch streaming is not implemented.")
        bsz = len(texts)
        if bsz == 0:
            return
        t0 = time.time()
        for nm, vals in (("voices", voices), ("instructs", instructs)):
            for v in self._normalize_batch_arg(nm, vals, bsz):
                if v is not None:
                    raise ValueError(
                        f"Higgs Audio v3 batch_generate does not support "
                        f"{nm}")
        for g in self._normalize_batch_arg("genders", genders, bsz):
            if g not in (None, "male"):
                raise ValueError(
                    "Higgs Audio v3 batch_generate does not support gender")
        for nm, vals in (("speeds", speeds), ("pitches", pitches)):
            for v in self._normalize_batch_arg(nm, vals, bsz):
                if v not in (None, 1.0):
                    raise ValueError("Higgs Audio v3 batch_generate does "
                                     "not support speed or pitch")
        limit = int(max_new_tokens if max_new_tokens is not None
                    else max_new_frames if max_new_frames is not None
                    else max_tokens if max_tokens is not None else 2048)
        refs_by_seq = self._normalize_batch_references(
            batch_size=bsz, ref_audio=ref_audio, ref_text=ref_text,
            references=references, ref_audios=ref_audios,
            ref_texts=ref_texts, ref_audio_codes=ref_audio_codes,
            ref_audio_codes_list=ref_audio_codes_list)

        embeds_list, plens = [], []
        for text, refs in zip(texts, refs_by_seq):
            token_ids, segments = self.build_prompt(text, refs)
            e = self._prompt_embeds(token_ids, segments)
            embeds_list.append(e)
            plens.append(e.shape[1])
        pb = 1 << max(4, (max(plens) - 1).bit_length())
        pad_w = np.asarray([pb - p for p in plens], np.int32)
        batch = jnp.concatenate(
            [jnp.pad(e, ((0, 0), (pb - e.shape[1], 0), (0, 0)))
             for e in embeds_list], axis=0)

        prefill = self._jit_cache.get(("bprefill", pb, bsz))
        if prefill is None:
            prefill = jax.jit(self._prefill_batch)
            self._jit_cache[("bprefill", pb, bsz)] = prefill
        carry = prefill(self.params, batch, jnp.asarray(pad_w),
                        jax.random.PRNGKey(0 if seed is None else int(seed)))

        tk = 0 if top_k is None else int(top_k)
        tp = 0.0 if top_p is None else float(top_p)
        skey = ("bchunk", CHUNK_ROWS, bsz, float(temperature), tk, tp)
        st = self._jit_cache.get(skey)
        if st is None:
            st = self._make_batch_chunk_stepper(CHUNK_ROWS,
                                                float(temperature), tk, tp)
            self._jit_cache[skey] = st

        all_rows, all_fins = [], []
        n = 0
        while n < limit:
            carry, rows, fins = st(self.params, carry)
            all_rows.append(np.asarray(rows))   # (chunk, B, N)
            all_fins.append(np.asarray(fins))   # (chunk, B)
            n += CHUNK_ROWS
            if all_fins[-1][-1].all():
                break
        rows_np = np.concatenate(all_rows, axis=0)
        fins_np = np.concatenate(all_fins, axis=0)
        nb = self.config.audio_num_codebooks

        from ..base import BatchGenerationResult

        for b in range(bsz):
            f = fins_np[:, b]
            k = int(np.argmax(f)) + 1 if f.any() else rows_np.shape[0]
            k = min(k, limit)
            delayed = rows_np[:k, b]
            codes = reverse_delay_pattern(delayed) \
                if delayed.shape[0] >= nb else np.zeros((0, nb), np.int32)
            codes = np.clip(codes, 0, self.config.audio_codebook_size - 3)
            if self.codec is not None and len(codes):
                audio = np.asarray(self.codec.decode(codes)).reshape(-1)
            else:
                audio = np.zeros((len(codes) * 1920,), np.float32)
            audio = self._apply_fades(audio, fade_in_ms, fade_out_ms)
            seg = time.time() - t0
            dur = len(audio) / self.sample_rate
            yield BatchGenerationResult(
                audio=audio, sequence_idx=b, samples=len(audio),
                sample_rate=self.sample_rate, token_count=int(k),
                audio_duration=format_duration(dur),
                processing_time_seconds=seg,
                peak_memory_usage=peak_memory_gb(),
                is_final_chunk=True)
