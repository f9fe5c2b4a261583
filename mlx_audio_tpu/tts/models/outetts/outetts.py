"""OuteTTS: llama-backbone token TTS over a 2-codebook DAC codec.

Parity: reference tts/models/outetts/outetts.py — llama/qwen backbone via
mlx_lm (:34-49; llama is the flagship Llama-OuteTTS-1.0-1B), sentence
chunking (:88-106), sampling defaults (temperature 0.4, top_p 0.9,
min_p 0.05, top_k 40, repetition penalty 1.1 over a 64-token window,
:152-185), streaming at ~2 s intervals of decoded audio (:200-236), c1/c2
interleaved code extraction + DAC decode (:238-248), and speaker JSON
voices (audio_processor.load_speaker; the ref-audio -> whisper speaker
capture path is gated on an STT model being available).

TPU design: generation runs as compiled chunk steppers — bucketed prefill,
then `lax.scan` blocks of CHUNK tokens with sampling, the rolling 64-token
repetition-penalty window, and stop detection in-graph; the host only
checks a per-chunk stop flag. The DAC decode of accumulated codes happens
per streaming interval, exactly like the reference.
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....ops.kvcache import KVCache
from ....ops.sampling import apply_repetition_penalty, make_sampler
from ..base import GenerationResult, format_duration
from ..llama import ModelConfig as LlamaConfig
from ..llama.llama import (init_caches, init_llama, llama_forward,
                           logits_from_hidden)
from .prompt import PromptProcessor, normalize_text

Array = jax.Array

CHUNK = 32
PROMPT_BUCKETS = (256, 512, 1024, 2048, 4096)
REP_WINDOW = 64


@dataclass
class ModelConfig(LlamaConfig):
    model_type: str = "outetts"
    tokenizer_name: str = ""
    sample_rate: int = 24000


class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None
        self._codec = None
        self._prompt_proc: Optional[PromptProcessor] = None
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_llama(key, self.config)

    # --------------------------------------------------------- prompts

    def _processor(self) -> PromptProcessor:
        if self._prompt_proc is None:
            if self._tokenizer is None:
                raise RuntimeError(
                    "outetts needs its HF tokenizer (place tokenizer files "
                    "in the model directory)")
            self._prompt_proc = PromptProcessor(self._tokenizer)
        return self._prompt_proc

    @staticmethod
    def chunk_text(text: str, max_words: int = 30) -> List[str]:
        sentences = [s.strip() for s in
                     re.split(r"[.!?。！？︕︖]+", text) if s.strip()]
        chunks, cur, n = [], [], 0
        for s in sentences:
            words = s.split()
            if n + len(words) > max_words and cur:
                chunks.append(" ".join(cur))
                cur, n = [], 0
            cur.extend(words)
            n += len(words)
        if cur:
            chunks.append(" ".join(cur))
        return chunks or [normalize_text(text)]

    def load_speaker(self, path: str) -> dict:
        return json.loads(Path(path).read_text())

    # ------------------------------------------------- compiled decode

    def _stepper(self, bucket: int, max_tokens: int, temperature: float,
                 top_p: float, top_k: int, min_p: float, rep_pen: float,
                 stop_ids: tuple):
        key_ = ("step", bucket, max_tokens, temperature, top_p, top_k,
                min_p, rep_pen, stop_ids)
        fn = self._jit_cache.get(key_)
        if fn is None:
            cfg = self.config
            cap = bucket + max_tokens
            sampler = make_sampler(temperature=temperature, top_p=top_p,
                                   top_k=top_k, min_p=min_p)
            stops = jnp.asarray(stop_ids, jnp.int32)

            def prefill(p, prompt, length, rng):
                caches = init_caches(cfg, 1, cap, dtype=jnp.float32)
                # additive (B, cache_len) padding mask; the llama prefill
                # path composes it with its own causal window
                pad_mask = jnp.where(
                    jnp.arange(cap)[None, :] < length[:, None],
                    0.0, jnp.finfo(jnp.float32).min)
                hidden, caches = llama_forward(
                    p, cfg, prompt, caches=caches, offset=jnp.int32(0),
                    mask=pad_mask)
                last = jnp.take_along_axis(
                    hidden, (length - 1)[:, None, None]
                    .astype(jnp.int32).repeat(hidden.shape[-1], 2), axis=1)
                logits = logits_from_hidden(p, cfg, last)[:, 0]
                history = jnp.full((1, REP_WINDOW), -1, jnp.int32)
                return logits, caches, history

            def chunk(p, logits, caches, history, t0, rng, done0):
                def body(carry, i):
                    lg, caches, hist, key, done = carry
                    key, sub = jax.random.split(key)
                    lg = apply_repetition_penalty(lg, hist, rep_pen)
                    nxt = sampler(sub, lg).astype(jnp.int32)
                    is_stop = jnp.any(nxt[0] == stops)
                    done2 = jnp.logical_or(done, is_stop)
                    hist = jnp.roll(hist, -1, axis=1).at[:, -1].set(
                        jnp.where(done2, -1, nxt[0]))
                    lg2, caches = _step(p, nxt[:, None], caches, t0 + i)
                    tok_out = jnp.where(done2, -1, nxt[0])
                    return (lg2, caches, hist, key, done2), tok_out

                def _step(p, token, caches, offset):
                    hidden, caches = llama_forward(
                        p, cfg, token, caches=caches, offset=offset)
                    return logits_from_hidden(p, cfg, hidden)[:, -1], caches

                (lg, caches, history, rng, done), toks = jax.lax.scan(
                    body, (logits, caches, history, rng, done0),
                    jnp.arange(CHUNK))
                return lg, caches, history, rng, done, toks

            fn = (jax.jit(prefill), jax.jit(chunk))
            self._jit_cache[key_] = fn
        return fn

    def _decode_tokens(self, prompt_ids: np.ndarray, max_tokens: int,
                       temperature: float, top_p: float, top_k: int,
                       min_p: float, rep_pen: float, seed: int):
        """Yields accumulating generated-token lists chunk by chunk."""
        tok = self._tokenizer
        st = self._processor().st
        stop_ids = []
        for s in (st.audio_end, st.eos):
            ids = tok.encode(s, add_special_tokens=False)
            if len(ids) == 1:
                stop_ids.append(int(ids[0]))
        if getattr(tok, "eos_token_id", None) is not None:
            stop_ids.append(int(tok.eos_token_id))
        stop_ids = tuple(sorted(set(stop_ids)))

        n = len(prompt_ids)
        bucket = next((b for b in PROMPT_BUCKETS if n <= b),
                      ((n + 511) // 512) * 512)
        prompt = np.full((1, bucket), 0, np.int32)
        prompt[0, :n] = prompt_ids
        prefill, chunk = self._stepper(bucket, max_tokens, temperature,
                                       top_p, top_k, min_p, rep_pen,
                                       stop_ids)
        rng = jax.random.PRNGKey(seed)
        logits, caches, history = prefill(self.params, jnp.asarray(prompt),
                                          jnp.asarray([n]), rng)
        generated: List[int] = []
        done = jnp.bool_(False)
        t = jnp.int32(n)
        while len(generated) < max_tokens:
            steps = min(CHUNK, max_tokens - len(generated))
            logits, caches, history, rng, done, toks = chunk(
                self.params, logits, caches, history, t, rng, done)
            t = t + CHUNK
            arr = np.asarray(toks)[:steps]
            arr = arr[arr >= 0]
            generated.extend(arr.tolist())
            yield list(generated)
            if bool(done):
                break

    # --------------------------------------------------------- generate

    def generate(self, text: str, voice: Optional[str] = None,
                 temperature: float = 0.4, top_p: float = 0.9,
                 max_tokens: int = 1200, verbose: bool = False,
                 ref_audio: Optional[str] = None, stream: bool = False,
                 streaming_interval: float = 2.0, seed: int = 0, **kwargs):
        proc = self._processor()
        speaker = None
        if voice is not None and voice.endswith(".json"):
            speaker = self.load_speaker(voice)

        top_k = int(kwargs.get("top_k", 40))
        min_p = float(kwargs.get("min_p", 0.05))
        rep_pen = float(kwargs.get("repetition_penalty", 1.1))
        interval_tokens = max(1, int(streaming_interval * 137.5))

        for seg_idx, segment in enumerate(self.chunk_text(text)):
            prompt = proc.get_completion_prompt(segment, speaker)
            ids = np.asarray(self._tokenizer.encode(
                prompt, add_special_tokens=False), np.int32)
            t0 = time.perf_counter()
            yielded_tokens = 0
            yielded_frames = 0
            final_tokens: List[int] = []
            for generated in self._decode_tokens(
                    ids, max_tokens, temperature, top_p, top_k, min_p,
                    rep_pen, seed + seg_idx):
                final_tokens = generated
                if stream and (len(generated) - yielded_tokens
                               >= interval_tokens):
                    audio = self._codes_to_audio(generated)
                    if audio is not None and len(audio) > yielded_frames:
                        yield self._result(audio[yielded_frames:], t0,
                                           len(generated) - yielded_tokens,
                                           seg_idx)
                        yielded_tokens = len(generated)
                        yielded_frames = len(audio)
                        t0 = time.perf_counter()
            audio = self._codes_to_audio(final_tokens)
            if audio is not None and len(audio) > yielded_frames:
                yield self._result(audio[yielded_frames:], t0,
                                   len(final_tokens) - yielded_tokens,
                                   seg_idx)

    def _codes_to_audio(self, tokens: List[int]) -> Optional[np.ndarray]:
        codes = self._processor().extract_audio_from_tokens(tokens)
        if not codes[0]:
            return None
        if self._codec is None:
            raise RuntimeError("no DAC codec bound (model._codec)")
        c = jnp.asarray(np.asarray(codes, np.int32)[None])
        audio = self._codec.decode(self._codec.from_codes(c))
        return np.asarray(audio).reshape(-1)

    def _result(self, audio: np.ndarray, t0: float, token_count: int,
                seg_idx: int) -> GenerationResult:
        dt = time.perf_counter() - t0
        dur = len(audio) / self.sample_rate
        return GenerationResult(
            audio=jnp.asarray(audio), samples=len(audio),
            sample_rate=self.sample_rate, segment_idx=seg_idx,
            token_count=token_count, audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 2) if dt else 0.0,
            prompt={"tokens": token_count,
                    "tokens-per-sec": round(token_count / dt, 2)
                    if dt else 0.0},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)
                           if dt else 0.0},
            processing_time_seconds=dt, peak_memory_usage=0.0)

    # loading -----------------------------------------------------------

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            if k.startswith("model.model.") or k.startswith("model.lm_head"):
                k = k[len("model."):]
            elif not k.startswith("model.") and not k.startswith("lm_head"):
                k = "model." + k
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        model_path = Path(model_path)
        try:
            from transformers import AutoTokenizer
            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path))
        except Exception:
            model._tokenizer = None
        dac_path = model_path / "codec"
        if dac_path.exists():
            try:
                from ....utils import base_load_model
                model._codec = base_load_model(
                    str(dac_path), category="codec",
                    model_remapping={"dac": "descript",
                                     "descript": "descript"})
            except Exception:
                model._codec = None
        return model


__all__ = ["Model", "ModelConfig"]
