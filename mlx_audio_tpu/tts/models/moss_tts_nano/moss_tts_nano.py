"""MOSS-TTS-Nano: GPT2 global LM + 1-layer GPT2 local head over RVQ channels.

Parity: /root/reference/mlx_audio/tts/models/moss_tts_nano/moss_tts_nano.py
(build_inference_input_ids :230-293 voice_clone/continuation prompt rows,
generate_audio_token_ids :335-457 frame loop, sentence-chunked generate
:459-547). Tied heads: text head = wte.T, audio head c = audio_embeddings[c].T
(ref :171-176).

TPU design: one jitted `frame_step` computes the WHOLE frame — global GPT2
decode step against a fixed KVCache, then the local transformer unrolled over
the n_vq+1 channel positions (each a tiny full-attention forward on a static
prefix) with in-graph sampling incl. a rolling repetition-penalty history —
so the host loop only inspects the stop flag. The reference syncs per channel
(n_vq+1 device round-trips per frame)."""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Generator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import apply_embedding, init_embedding
from ....ops.kvcache import KVCache
from ....ops.sampling import apply_repetition_penalty, top_k_top_p_filter
from ..base import GenerationResult, format_duration, peak_memory_gb
from .config import ModelConfig
from .gpt2 import gpt2_forward, gpt2_make_caches, init_gpt2
from .text import (
    build_assistant_prompt_prefix,
    build_prompt_token_ids,
    build_user_prompt_after_reference,
    build_user_prompt_prefix,
    encode_text,
    lightweight_normalize_text,
    load_tokenizer,
    split_text_into_best_sentences,
)

Array = jax.Array

MAX_CACHE_LEN = 8192
HISTORY_WIN = 128
PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 4096)


def _bucket(n: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return PROMPT_BUCKETS[-1]


class Model(FunctionalModel):
    """MOSS-TTS-Nano (~500M GPT2, 16 RVQ channels @48 kHz)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None
        self.audio_tokenizer = None

    @property
    def sample_rate(self) -> int:
        return int(self.config.audio_tokenizer_sample_rate)

    # ------------------------------------------------------------ params

    def init_params(self, key):
        cfg = self.config
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "transformer": init_gpt2(k1, cfg.gpt2_config,
                                     use_token_embedding=True),
            "local_transformer": init_gpt2(k2, cfg.local_gpt2_config(),
                                           use_token_embedding=False),
            "audio_embeddings": {
                str(i): init_embedding(k, size, cfg.gpt2_config.n_embd)
                for i, (k, size) in enumerate(zip(
                    jax.random.split(k3, cfg.n_vq),
                    cfg.audio_codebook_sizes))},
        }

    def sanitize(self, weights):
        """Drop untied heads / unused position tables (ref :67-84)."""
        out = {}
        for k, v in weights.items():
            if k == "text_lm_head.weight" or k.startswith("audio_lm_heads."):
                continue
            if k == "local_transformer.wte.weight":
                continue
            if k.endswith(".wpe.weight"):
                continue
            out[k] = jnp.asarray(v)
        return out

    def model_quant_predicate(self, path, w):
        return not any(p in path for p in ("audio_embeddings",
                                           "audio_tokenizer"))

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            model.tokenizer = load_tokenizer(Path(model_path))
        except (FileNotFoundError, ImportError):
            model.tokenizer = None
        return model

    # ------------------------------------------------------------ codec

    def _ensure_audio_tokenizer(self, source=None):
        if self.audio_tokenizer is None:
            raise RuntimeError(
                "MOSS-TTS-Nano needs the MOSS audio tokenizer bound "
                "(model.audio_tokenizer = ...)")
        return self.audio_tokenizer

    def encode_reference_audio(self, ref_audio, *, sample_rate=None,
                               num_quantizers=None, source=None):
        tok = self._ensure_audio_tokenizer(source)
        return tok.encode_audio(ref_audio, sample_rate=sample_rate,
                                num_quantizers=num_quantizers
                                or self.config.n_vq)

    def decode_audio_token_ids(self, codes, *, num_quantizers=None,
                               source=None):
        tok = self._ensure_audio_tokenizer(source)
        return tok.decode_audio_codes(codes, num_quantizers=num_quantizers
                                      or self.config.n_vq)

    # ------------------------------------------------------------ prompt

    def _build_text_rows(self, ids: Sequence[int]) -> np.ndarray:
        cfg = self.config
        rows = np.full((len(ids), cfg.n_vq + 1), cfg.audio_pad_token_id,
                       np.int32)
        if len(ids):
            rows[:, 0] = np.asarray(list(ids), np.int32)
        return rows

    def _build_audio_prefix_rows(self, codes: np.ndarray,
                                 slot_token_id: int) -> np.ndarray:
        cfg = self.config
        codes = np.asarray(codes, np.int32)
        if codes.ndim != 2:
            raise ValueError(f"prompt_audio_codes must be [frames, n_vq], "
                             f"got {codes.shape}")
        rows = np.full((codes.shape[0], cfg.n_vq + 1), cfg.audio_pad_token_id,
                       np.int32)
        rows[:, 0] = int(slot_token_id)
        c = min(codes.shape[1], cfg.n_vq)
        rows[:, 1:1 + c] = codes[:, :c]
        return rows

    def build_inference_input_ids(self, *, text: str, tokenizer,
                                  mode: str = "voice_clone",
                                  prompt_text: Optional[str] = None,
                                  prompt_audio_codes=None
                                  ) -> Tuple[np.ndarray, np.ndarray]:
        """(1, T, n_vq+1) rows + (1, T) mask (ref :230-293)."""
        cfg = self.config
        mode = str(mode or "voice_clone").strip().lower()
        if mode not in {"voice_clone", "continuation"}:
            raise ValueError("mode must be 'voice_clone' or 'continuation'")
        if mode == "voice_clone":
            if prompt_audio_codes is None:
                raise ValueError("voice_clone mode requires prompt_audio_codes")
            if prompt_text is not None:
                raise ValueError("voice_clone mode does not accept prompt_text")
            text_ids = encode_text(tokenizer, text)
            prefix = build_user_prompt_prefix(tokenizer, cfg) + \
                [cfg.audio_start_token_id]
            suffix = ([cfg.audio_end_token_id]
                      + build_user_prompt_after_reference(tokenizer)
                      + text_ids
                      + build_assistant_prompt_prefix(tokenizer, cfg)
                      + [cfg.audio_start_token_id])
            sections = [
                self._build_text_rows(prefix),
                self._build_audio_prefix_rows(
                    np.asarray(prompt_audio_codes),
                    cfg.audio_user_slot_token_id),
                self._build_text_rows(suffix)]
        else:
            if (prompt_text is None) != (prompt_audio_codes is None):
                raise ValueError(
                    "continuation mode accepts target text only, or both "
                    "prompt_text and prompt_audio_codes")
            eff = text if prompt_text is None else prompt_text + text
            ids = build_prompt_token_ids(tokenizer, cfg,
                                         encode_text(tokenizer, eff))
            sections = [self._build_text_rows(ids),
                        self._build_text_rows([cfg.audio_start_token_id])]
            if prompt_audio_codes is not None:
                sections.append(self._build_audio_prefix_rows(
                    np.asarray(prompt_audio_codes),
                    cfg.audio_assistant_slot_token_id))
        rows = np.concatenate(sections, axis=0)[None]
        return rows, np.ones(rows.shape[:2], bool)

    # ---------------------------------------------------------- compiled

    def _embed_rows(self, params, rows: Array) -> Array:
        """(B, T, n_vq+1) int rows -> (B, T, D) summed embeddings."""
        cfg = self.config
        e = apply_embedding(params["transformer"]["wte"], rows[..., 0])
        for c in range(cfg.n_vq):
            ids = rows[..., c + 1]
            valid = ids != cfg.audio_pad_token_id
            safe = jnp.where(valid, ids, 0)
            e = e + apply_embedding(params["audio_embeddings"][str(c)],
                                    safe) * valid[..., None]
        return e

    def _prefill_fn(self, pb: int):
        cfg = self.config

        def prefill(params, rows, plen):
            embeds = self._embed_rows(params, rows)
            caches = gpt2_make_caches(cfg.gpt2_config, 1, MAX_CACHE_LEN)
            pad = jnp.where(jnp.arange(MAX_CACHE_LEN) < plen, 0.0,
                            -jnp.inf)[None, None, None, :]
            hidden, caches = gpt2_forward(
                params["transformer"], cfg.gpt2_config, embeds,
                caches=caches, offset=0, pad_mask=pad)
            idx = jnp.clip(plen - 1, 0, pb - 1)
            return caches, jax.lax.dynamic_slice_in_dim(
                hidden, idx, 1, axis=1)  # (1, 1, D)

        return jax.jit(prefill)

    def _local_pass(self, params, buf: Array, n_valid: int) -> Array:
        """Local transformer over the first n_valid positions of the fixed
        (1, n_vq+1, D) buffer; returns hidden at position n_valid-1."""
        cfg = self.config
        hidden, _ = gpt2_forward(params["local_transformer"],
                                 cfg.local_gpt2_config(),
                                 buf[:, :n_valid], caches=None, offset=0)
        return hidden[:, -1]

    def _frame_fn(self, nq: int, do_sample: bool, text_temperature: float,
                  text_top_p: float, text_top_k: int,
                  audio_temperature: float, audio_top_p: float,
                  audio_top_k: int, audio_repetition_penalty: float):
        cfg = self.config
        D = cfg.gpt2_config.n_embd

        def sample(key, logits, temperature, top_p, top_k, history=None):
            lg = logits.astype(jnp.float32)
            if history is not None and audio_repetition_penalty != 1.0:
                lg = apply_repetition_penalty(lg, history,
                                              audio_repetition_penalty)
            if not do_sample or temperature <= 0:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg = lg / temperature
            lg = top_k_top_p_filter(lg, top_k=top_k or 0,
                                    top_p=top_p if top_p else 1.0)
            return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)

        def frame(params, caches, offset, hidden, history, key):
            """Sample one frame from `hidden` (1, 1, D), then advance the
            global LM one step on the sampled row -> next hidden."""
            buf = jnp.zeros((1, cfg.n_vq + 1, D), hidden.dtype)
            buf = buf.at[:, 0].set(hidden[:, -1])
            local_h = self._local_pass(params, buf, 1)
            wte = params["transformer"]["wte"]["weight"]
            cand = jnp.asarray([cfg.audio_assistant_slot_token_id,
                                cfg.audio_end_token_id], jnp.int32)
            text_logits = (local_h @ wte[cand].T)  # (1, 2)
            key, sub = jax.random.split(key)
            text_tok = cand[sample(sub, text_logits, text_temperature,
                                   text_top_p, min(text_top_k, 2))[0]]

            cur = wte[text_tok][None]                       # (1, D)
            toks = []
            for c in range(nq):
                buf = buf.at[:, c + 1].set(cur)
                local_h = self._local_pass(params, buf, c + 2)
                emb_w = params["audio_embeddings"][str(c)]["weight"]
                logits = local_h @ emb_w.T                  # (1, V_c)
                key, sub = jax.random.split(key)
                tok = sample(sub, logits, audio_temperature, audio_top_p,
                             audio_top_k, history=history[None, c])
                toks.append(tok[0])
                cur = emb_w[tok[0]][None]
            frame_toks = jnp.stack(toks)                    # (nq,)
            history = jnp.concatenate(
                [history[:, 1:], frame_toks[:, None]], axis=1)

            row = jnp.full((1, 1, cfg.n_vq + 1), cfg.audio_pad_token_id,
                           jnp.int32)
            row = row.at[0, 0, 0].set(
                jnp.int32(cfg.audio_assistant_slot_token_id))
            row = jax.lax.dynamic_update_slice(
                row, frame_toks[None, None].astype(jnp.int32), (0, 0, 1))
            embeds = self._embed_rows(params, row)
            next_hidden, caches = gpt2_forward(
                params["transformer"], cfg.gpt2_config, embeds,
                caches=caches, offset=offset)
            return caches, text_tok, frame_toks, next_hidden, history, key

        return jax.jit(frame, donate_argnums=(1,))

    # ---------------------------------------------------------- generate

    def generate_audio_token_ids(self, *, prompt_input_ids,
                                 attention_mask=None, nq=None,
                                 max_new_frames: int = 375,
                                 do_sample: bool = True,
                                 text_temperature: float = 1.0,
                                 text_top_p: float = 1.0,
                                 text_top_k: int = 50,
                                 audio_temperature: float = 0.8,
                                 audio_top_p: float = 0.95,
                                 audio_top_k: int = 25,
                                 audio_repetition_penalty: float = 1.2,
                                 seed: int = 0) -> np.ndarray:
        cfg = self.config
        rows = np.asarray(prompt_input_ids, np.int32)
        if rows.ndim == 2:
            rows = rows[None]
        if rows.shape[0] != 1:
            raise NotImplementedError("batched nano generation TBD")
        nq = int(nq or cfg.n_vq)
        if not 1 <= nq <= cfg.n_vq:
            raise ValueError(f"nq must be in [1, {cfg.n_vq}]")

        plen = rows.shape[1]
        pb = _bucket(plen)
        padded = np.full((1, pb, cfg.n_vq + 1), cfg.audio_pad_token_id,
                         np.int32)
        padded[:, :, 0] = cfg.pad_token_id
        padded[0, :plen] = rows[0]
        pf = self._jit_cache.setdefault(("prefill", pb), self._prefill_fn(pb))
        caches, hidden = pf(self.params, jnp.asarray(padded),
                            jnp.int32(plen))

        skey = (("frame", nq, do_sample, text_temperature, text_top_p,
                 text_top_k, audio_temperature, audio_top_p, audio_top_k,
                 audio_repetition_penalty))
        step = self._jit_cache.get(skey)
        if step is None:
            step = self._frame_fn(nq, do_sample, text_temperature,
                                  text_top_p, text_top_k, audio_temperature,
                                  audio_top_p, audio_top_k,
                                  audio_repetition_penalty)
            self._jit_cache[skey] = step

        history = jnp.full((cfg.n_vq, HISTORY_WIN), -1, jnp.int32)
        key = jax.random.PRNGKey(seed)
        offset = plen
        frames: List[np.ndarray] = []
        for _ in range(int(max_new_frames)):
            caches, text_tok, frame_toks, hidden, history, key = step(
                self.params, caches, jnp.int32(offset), hidden, history, key)
            if int(text_tok) != cfg.audio_assistant_slot_token_id:
                break
            f = np.asarray(frame_toks, np.int32)
            if nq < cfg.n_vq:
                f = np.concatenate([f, np.full((cfg.n_vq - nq,),
                                               cfg.audio_pad_token_id,
                                               np.int32)])
            frames.append(f)
            offset += 1

        if not frames:
            return np.zeros((1, 0, cfg.n_vq), np.int32)
        return np.stack(frames, axis=0)[None]

    def generate(self, text: str, ref_audio=None, ref_text=None,
                 prompt_audio_codes=None, mode: str = "voice_clone",
                 stream: bool = False, max_tokens: int = 375, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        if stream:
            raise NotImplementedError("nano streaming TBD (ref parity)")
        if self.tokenizer is None:
            raise ValueError("Tokenizer is not initialized.")
        cfg = self.config
        if prompt_audio_codes is None:
            if ref_audio is not None:
                prompt_audio_codes = self.encode_reference_audio(
                    ref_audio, sample_rate=kwargs.get("ref_audio_sample_rate"),
                    num_quantizers=cfg.n_vq,
                    source=kwargs.get("audio_tokenizer_source"))
            elif str(mode or "voice_clone").strip().lower() == "voice_clone":
                raise ValueError("voice_clone generation requires ref_audio "
                                 "or prompt_audio_codes.")

        t0 = time.perf_counter()
        mode = str(mode or "voice_clone").strip().lower()
        chunks = split_text_into_best_sentences(
            self.tokenizer, lightweight_normalize_text(text),
            max_tokens=int(kwargs.get("voice_clone_max_text_tokens", 75)))
        all_tokens = []
        prompt_tokens = 0
        for chunk in chunks:
            rows, _ = self.build_inference_input_ids(
                text=chunk, tokenizer=self.tokenizer, mode=mode,
                prompt_text=ref_text if mode == "continuation" else None,
                prompt_audio_codes=prompt_audio_codes)
            prompt_tokens += rows.shape[1]
            all_tokens.append(self.generate_audio_token_ids(
                prompt_input_ids=rows, max_new_frames=int(max_tokens),
                do_sample=bool(kwargs.get("do_sample", True)),
                text_temperature=float(kwargs.get("text_temperature", 1.0)),
                text_top_p=float(kwargs.get("text_top_p", 1.0)),
                text_top_k=int(kwargs.get("text_top_k", 50)),
                audio_temperature=float(kwargs.get(
                    "audio_temperature", kwargs.get("temperature", 0.8))),
                audio_top_p=float(kwargs.get("audio_top_p",
                                             kwargs.get("top_p", 0.95))),
                audio_top_k=int(kwargs.get("audio_top_k",
                                           kwargs.get("top_k", 25))),
                audio_repetition_penalty=float(kwargs.get(
                    "audio_repetition_penalty",
                    kwargs.get("repetition_penalty", 1.2))),
                seed=int(kwargs.get("seed", 0))))

        codes = (np.concatenate(all_tokens, axis=1) if all_tokens
                 else np.zeros((1, 0, cfg.n_vq), np.int32))
        if self.audio_tokenizer is not None and codes.shape[1]:
            audio = np.asarray(self.decode_audio_token_ids(
                jnp.asarray(codes[0]), num_quantizers=cfg.n_vq)).reshape(-1)
        else:
            audio = np.zeros((codes.shape[1] * self.sample_rate // 12,),
                             np.float32)
        dt = max(time.perf_counter() - t0, 1e-6)
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=int(codes.shape[1]),
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3) if dt else 0.0,
            prompt={"tokens": prompt_tokens,
                    "tokens-per-sec": round(prompt_tokens / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb())


__all__ = ["Model", "ModelConfig"]
