"""Fish Speech S1 (fish_qwen3_omni): dual-AR semantic+residual token TTS.

Parity: /root/reference/mlx_audio/tts/models/fish_qwen3_omni/
(DualARTransformer fish_speech.py:209-361 — slow qwen3-style LM over
(1+num_codebooks)-row tokens with scaled VQ-sum embeddings, fast 4-layer
residual decoder over codebooks; RAS semantic re-sampling :29 & :540-580;
chat prompt frame with modality tokens prompt.py; speaker-turn batching
:528-536; batch_generate :1060-1180; FishS1DAC codec decode).

TPU design: one compiled program per semantic frame — the slow LM decode
step, biased semantic sampling with the RAS high-temperature fallback
(both draws computed in-graph, selected by a window-membership flag), and
the fast decoder unrolled over its ≤num_codebooks positions. The host only
checks im_end.
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from typing import Generator, List, Optional, Tuple

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
from ....ops.sampling import top_k_top_p_filter
from ..base import BatchGenerationResult, GenerationResult, format_duration, \
    peak_memory_gb

Array = jax.Array

RAS_WIN_SIZE = 10
RAS_HIGH_TEMP = 1.0
RAS_HIGH_TOP_P = 0.9
MAX_CACHE_LEN = 4096
PROMPT_BUCKETS = (64, 128, 256, 512, 1024, 2048)

IM_START = "<|im_start|>"
IM_END = "<|im_end|>"
MODALITY_TOKENS = {"text": "<|text|>", "voice": "<|voice|>",
                   "interleave": "<|interleave|>"}


def _bucket(n):
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return PROMPT_BUCKETS[-1]


@dataclass
class FishTextConfig(BaseModelArgs):
    model_type: str = "fish_qwen3"
    vocab_size: int = 155776
    n_layer: int = 36
    n_head: int = 32
    dim: int = 2560
    intermediate_size: int = 9728
    n_local_heads: int = 8
    head_dim: int = 128
    rope_base: float = 1000000.0
    norm_eps: float = 1e-6
    max_seq_len: int = 32768
    tie_word_embeddings: bool = True
    attention_qkv_bias: bool = False
    attention_o_bias: bool = False
    attention_qk_norm: bool = True


@dataclass
class FishAudioDecoderConfig(FishTextConfig):
    model_type: str = "fish_qwen3_audio_decoder"
    vocab_size: int = 4096
    n_layer: int = 4
    max_seq_len: int = 11
    tie_word_embeddings: bool = False
    attention_qk_norm: bool = False
    text_dim: int = 2560
    num_codebooks: int = 10


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "fish_speech"
    model_path: Optional[str] = None
    pad_token_id: int = 151669
    eos_token_id: int = 151645
    audio_pad_token_id: int = 151677
    semantic_start_token_id: int = 151678
    semantic_end_token_id: int = 155773
    sample_rate: int = 44100
    text_config: FishTextConfig = field(default_factory=FishTextConfig)
    audio_decoder_config: FishAudioDecoderConfig = field(
        default_factory=FishAudioDecoderConfig)

    def __post_init__(self):
        if isinstance(self.text_config, dict):
            self.text_config = FishTextConfig.from_dict(self.text_config)
        if isinstance(self.audio_decoder_config, dict):
            self.audio_decoder_config = FishAudioDecoderConfig.from_dict(
                self.audio_decoder_config)


# ------------------------------------------------------------ fish blocks

def init_fish_block(ks, cfg: FishTextConfig) -> dict:
    total = (cfg.n_head + 2 * cfg.n_local_heads) * cfg.head_dim
    p = {
        "attention": {
            "wqkv": init_linear(next(ks), cfg.dim, total,
                                bias=cfg.attention_qkv_bias),
            "wo": init_linear(next(ks), cfg.n_head * cfg.head_dim, cfg.dim,
                              bias=cfg.attention_o_bias)},
        "feed_forward": {
            "w1": init_linear(next(ks), cfg.dim, cfg.intermediate_size,
                              bias=False),
            "w2": init_linear(next(ks), cfg.intermediate_size, cfg.dim,
                              bias=False),
            "w3": init_linear(next(ks), cfg.dim, cfg.intermediate_size,
                              bias=False)},
        "attention_norm": init_rms_norm(cfg.dim),
        "ffn_norm": init_rms_norm(cfg.dim)}
    if cfg.attention_qk_norm:
        p["attention"]["q_norm"] = init_rms_norm(cfg.head_dim)
        p["attention"]["k_norm"] = init_rms_norm(cfg.head_dim)
    return p


def _fish_rope(x: Array, offset, base: float) -> Array:
    """(B, T, H, D): interleaved even/odd pair rotation."""
    b, t, h, d = x.shape
    inv = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    pos = offset + jnp.arange(t, dtype=jnp.float32)
    ang = pos[:, None] * inv[None]
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    xf = x.astype(jnp.float32).reshape(b, t, h, d // 2, 2)
    e, o = xf[..., 0], xf[..., 1]
    out = jnp.stack([e * cos - o * sin, o * cos + e * sin], axis=-1)
    return out.reshape(b, t, h, d).astype(x.dtype)


def fish_forward(params: dict, cfg: FishTextConfig, x: Array,
                 caches: Optional[List[KVCache]] = None, offset=0,
                 pad_mask: Optional[Array] = None
                 ) -> Tuple[Array, Optional[List[KVCache]]]:
    b, t, _ = x.shape
    hd = cfg.head_dim
    nh, nkv = cfg.n_head, cfg.n_local_heads
    new_caches = [] if caches is not None else None
    for i in range(cfg.n_layer):
        lp = params["layers"][str(i)]
        h = apply_rms_norm(lp["attention_norm"], x, cfg.norm_eps)
        a = lp["attention"]
        qkv = apply_linear(a["wqkv"], h)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
        q = q.reshape(b, t, nh, hd)
        k = k.reshape(b, t, nkv, hd)
        v = v.reshape(b, t, nkv, hd)
        if "q_norm" in a:
            q = apply_rms_norm(a["q_norm"], q, cfg.norm_eps)
            k = apply_rms_norm(a["k_norm"], k, cfg.norm_eps)
        q = _fish_rope(q, offset, cfg.rope_base)
        k = _fish_rope(k, offset, cfg.rope_base)
        if caches is not None:
            nc = kv_update(caches[i], k, v, offset)
            new_caches.append(nc)
            if t == 1:
                o = decode_attention(q, nc.k, nc.v, offset + 1)
            else:
                s = nc.k.shape[1]
                pos_s = jnp.arange(s)[None, None, None, :]
                causal = pos_s <= (offset + jnp.arange(t))[None, None, :,
                                                           None]
                valid = pos_s < (offset + t)
                add = jnp.where(causal & valid, 0.0, -jnp.inf)
                if pad_mask is not None:
                    add = add + pad_mask
                o = attention(q, nc.k, nc.v, mask=add)
        else:
            o = attention(q, k, v, causal=True, mask=pad_mask)
        x = x + apply_linear(a["wo"], o.reshape(b, t, -1))
        h = apply_rms_norm(lp["ffn_norm"], x, cfg.norm_eps)
        f = lp["feed_forward"]
        x = x + apply_linear(f["w2"],
                             jax.nn.silu(apply_linear(f["w1"], h))
                             * apply_linear(f["w3"], h))
    return apply_rms_norm(params["norm"], x, cfg.norm_eps), new_caches


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """Fish Speech S1 (voice cloning, style instruct, multi-speaker)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None
        self.codec = None
        self.im_end_id = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def num_codebooks(self) -> int:
        return self.config.audio_decoder_config.num_codebooks

    def init_params(self, key):
        cfg = self.config
        tc, ac = cfg.text_config, cfg.audio_decoder_config
        ks = iter(jax.random.split(key, 16 * (tc.n_layer + ac.n_layer)
                                   + 16))
        p = {
            "embeddings": init_embedding(next(ks), tc.vocab_size, tc.dim),
            "codebook_embeddings": init_embedding(
                next(ks), ac.vocab_size * ac.num_codebooks, tc.dim),
            "layers": {str(i): init_fish_block(ks, tc)
                       for i in range(tc.n_layer)},
            "norm": init_rms_norm(tc.dim),
            "fast_embeddings": init_embedding(next(ks), ac.vocab_size,
                                              ac.dim),
            "fast_layers": {str(i): init_fish_block(ks, ac)
                            for i in range(ac.n_layer)},
            "fast_norm": init_rms_norm(ac.dim),
            "fast_output": init_linear(next(ks), ac.dim, ac.vocab_size,
                                       bias=False),
        }
        if tc.dim != ac.dim:
            p["fast_project_in"] = init_linear(next(ks), tc.dim, ac.dim,
                                               bias=False)
        return p

    def sanitize(self, weights):
        out = {}
        for k, v in weights.items():
            if k.startswith("model."):
                k = k[len("model."):]
            elif k.startswith("text_model.model."):
                k = k[len("text_model.model."):]
            elif k.startswith("audio_decoder."):
                suffix = k[len("audio_decoder."):]
                k = suffix if suffix.startswith("codebook_embeddings.") \
                    else f"fast_{suffix}"
            out[k] = jnp.asarray(v)
        return out

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
            model.im_end_id = model.tokenizer.convert_tokens_to_ids(IM_END)
        except Exception:
            model.tokenizer = None
        try:
            from ....codec.models.fish_s1_dac import Model as FishDAC

            from ....utils import base_load_model  # noqa: F401

            model.codec = None  # bound lazily via server / caller
            del FishDAC
        except Exception:
            model.codec = None
        return model

    # ---------------------------------------------------------- embedding

    def _embed_rows(self, p, rows: Array) -> Array:
        """(B, 1+nc, T) int rows -> (B, T, dim) (ref _embed :271-289)."""
        cfg = self.config
        ac = cfg.audio_decoder_config
        semantic = rows[:, 0]                       # (B, T)
        offs = (jnp.arange(ac.num_codebooks) * ac.vocab_size)[None, :, None]
        vq = apply_embedding(p["codebook_embeddings"],
                             rows[:, 1:] + offs).sum(axis=1)   # (B, T, D)
        sem_mask = ((semantic >= cfg.semantic_start_token_id)
                    & (semantic <= cfg.semantic_end_token_id))[..., None]
        vq = jnp.where(sem_mask, vq, 0.0)
        x = apply_embedding(p["embeddings"], semantic) + vq
        scale = math.sqrt(ac.num_codebooks + 1)
        return jnp.where(sem_mask, x / scale, x)

    def _semantic_bias(self):
        cfg = self.config
        v = cfg.text_config.vocab_size
        bias = np.full((v,), -1e9, np.float32)
        bias[cfg.semantic_start_token_id:cfg.semantic_end_token_id + 1] = 0.0
        if self.im_end_id is not None and 0 <= self.im_end_id < v:
            bias[self.im_end_id] = 0.0
        return bias

    # ------------------------------------------------------------- prompt

    def _encode_text(self, s: str) -> List[int]:
        return list(self.tokenizer.encode(s, add_special_tokens=False))

    def build_prompt_rows(self, segments) -> np.ndarray:
        """segments: list of ("text", str) | ("vq", (nc, T) codes).
        -> (1+nc, T) rows."""
        cfg = self.config
        nc = self.num_codebooks
        cols = []
        for kind, val in segments:
            if kind == "text":
                ids = np.asarray(self._encode_text(val), np.int32)
                block = np.zeros((1 + nc, len(ids)), np.int32)
                block[0] = ids
            else:
                codes = np.asarray(val, np.int32)
                block = np.zeros((1 + nc, codes.shape[1]), np.int32)
                block[0] = codes[0] + cfg.semantic_start_token_id
                block[1:] = codes
            cols.append(block)
        return np.concatenate(cols, axis=1)

    def _conversation_rows(self, text: str, prompt_texts, prompt_tokens,
                           instruct: Optional[str]) -> np.ndarray:
        segs = []
        style = (instruct or "").strip()
        if prompt_texts and prompt_tokens:
            tagged = [t if "<|speaker:" in t else f"<|speaker:{i}|>{t}"
                      for i, t in enumerate(prompt_texts)]
            sys_prompt = ("convert the provided text to speech reference "
                          "to the following:\n\n")
            if style:
                sys_prompt += f"Style instruction: {style}\n\n"
            sys_prompt += "Text:\n"
            segs.append(("text", f"{IM_START}system\n" + sys_prompt
                         + "\n".join(tagged) + "\n\nSpeech:\n"))
            segs.append(("vq", np.concatenate(prompt_tokens, axis=1)))
            segs.append(("text", IM_END + "\n"))
        else:
            sys_prompt = "convert the provided text to speech"
            if style:
                sys_prompt += f"\n\nStyle instruction: {style}"
            segs.append(("text", f"{IM_START}system\n{sys_prompt}"
                         + IM_END + "\n"))
        segs.append(("text", f"{IM_START}user\n{text}{IM_END}\n"))
        segs.append(("text", f"{IM_START}assistant\n"
                     + MODALITY_TOKENS["voice"]))
        return self.build_prompt_rows(segs)

    # ------------------------------------------------------------ compiled

    def _fns(self, temperature: float, top_p: float, top_k: int):
        cfg = self.config
        tc, ac = cfg.text_config, cfg.audio_decoder_config
        nc = ac.num_codebooks
        bias = jnp.asarray(self._semantic_bias())
        sem_start = cfg.semantic_start_token_id
        sem_end = cfg.semantic_end_token_id

        def sample(key, logits, temp, tp, tk):
            lg = logits.astype(jnp.float32)
            if temp <= 0:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg = top_k_top_p_filter(lg / temp, top_k=tk or 0,
                                    top_p=tp if tp else 1.0)
            return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)

        def fast_decode(p, hidden, sem_code, key):
            """Unrolled residual decoding over codebooks (no cache: ≤nc+1
            positions of a 4-layer stack)."""
            h0 = hidden
            if "fast_project_in" in p:
                h0 = apply_linear(p["fast_project_in"], h0)
            buf = h0[:, None]                              # (1, 1, D)
            toks = [sem_code]
            cur = apply_embedding(p["fast_embeddings"], sem_code)[:, None]
            for c in range(nc - 1):
                buf = jnp.concatenate([buf, cur], axis=1)
                fh, _ = fish_forward(
                    {"layers": p["fast_layers"], "norm": p["fast_norm"]},
                    ac, buf, caches=None)
                logits = apply_linear(p["fast_output"], fh[:, -1])
                key, sub = jax.random.split(key)
                tok = sample(sub, logits, temperature, top_p, top_k)
                toks.append(tok)
                cur = apply_embedding(p["fast_embeddings"], tok)[:, None]
            return jnp.stack(toks, axis=1), key            # (1, nc)

        def prefill(p, rows, n, pb):
            embeds = self._embed_rows(p, rows)
            caches = [KVCache.init(1, MAX_CACHE_LEN, tc.n_local_heads,
                                   tc.head_dim, jnp.float32)
                      for _ in range(tc.n_layer)]
            pad = jnp.where(jnp.arange(MAX_CACHE_LEN) < n, 0.0,
                            -jnp.inf)[None, None, None, :]
            hidden, caches = fish_forward(p, tc, embeds, caches, 0, pad)
            idx = jnp.clip(n - 1, 0, pb - 1)
            last = jax.lax.dynamic_slice_in_dim(hidden, idx, 1, axis=1)
            logits = last @ p["embeddings"]["weight"].T
            return caches, logits[:, 0], last[:, 0]

        def frame(p, caches, offset, logits, hidden, ras_window, key):
            biased = logits + bias[None]
            key, k1, k2 = jax.random.split(key, 3)
            normal = sample(k1, biased, temperature, top_p, top_k)
            high = sample(k2, biased, RAS_HIGH_TEMP, RAS_HIGH_TOP_P, top_k)
            in_win = jnp.any(ras_window == normal[0])
            is_sem = (normal[0] >= sem_start) & (normal[0] <= sem_end)
            sem_tok = jnp.where(in_win & is_sem, high, normal)   # (1,)
            ras_window = jnp.concatenate([ras_window[1:], sem_tok])

            sem_code = jnp.clip(sem_tok - sem_start, 0,
                                ac.vocab_size - 1).astype(jnp.int32)
            codebooks, key = fast_decode(p, hidden, sem_code, key)

            row = jnp.concatenate([sem_tok[:, None], codebooks],
                                  axis=1)[:, :, None]        # (1, 1+nc, 1)
            embeds = self._embed_rows(p, row)
            hidden2, caches = fish_forward(p, tc, embeds, caches, offset)
            logits2 = hidden2[:, -1] @ p["embeddings"]["weight"].T
            return (caches, logits2, hidden2[:, -1], codebooks, sem_tok[0],
                    ras_window, key)

        return jax.jit(prefill, static_argnums=(3,)), \
            jax.jit(frame, donate_argnums=(1,))

    # ------------------------------------------------------------ generate

    def _generate_codes(self, rows: np.ndarray, batch_text: str,
                        max_new_tokens: int, temperature: float,
                        top_p: float, top_k: int, seed: int) -> np.ndarray:
        cfg = self.config
        n = rows.shape[1]
        pb = _bucket(n)
        padded = np.zeros((1, rows.shape[0], pb), np.int32)
        padded[0, :, :n] = rows
        key_ = ("fns", temperature, top_p, top_k)
        fns = self._jit_cache.get(key_)
        if fns is None:
            fns = self._fns(temperature, top_p, top_k)
            self._jit_cache[key_] = fns
        prefill, frame = fns
        caches, logits, hidden = prefill(self.params, jnp.asarray(padded),
                                         jnp.int32(n), pb)
        budget = min(max_new_tokens,
                     max(32, len(self._encode_text(batch_text)) * 12))
        ras = jnp.full((RAS_WIN_SIZE,), -1, jnp.int32)
        key = jax.random.PRNGKey(seed)
        steps = []
        offset = n
        im_end = self.im_end_id if self.im_end_id is not None else -1
        for _ in range(budget):
            caches, logits, hidden, codebooks, sem_tok, ras, key = frame(
                self.params, caches, jnp.int32(offset), logits, hidden,
                ras, key)
            if int(sem_tok) == im_end:
                break
            steps.append(np.asarray(codebooks)[0])
            offset += 1
        if not steps:
            raise RuntimeError(
                f"No audio tokens were generated for: {batch_text!r}")
        return np.stack(steps, axis=1)                     # (nc, T)

    def _decode_codes(self, codes: np.ndarray) -> np.ndarray:
        if self.codec is not None:
            return np.asarray(self.codec.decode(codes[None])).reshape(-1)
        # codec-less fallback (tests / bench): 512 samples per frame
        return np.zeros((codes.shape[1] * 512,), np.float32)

    @staticmethod
    def _adjust_speed(audio: np.ndarray, speed: float) -> np.ndarray:
        if abs(speed - 1.0) < 1e-6:
            return audio
        old = len(audio)
        new = max(1, int(old / speed))
        pos = np.linspace(0, old - 1, new)
        left = np.floor(pos).astype(int)
        right = np.minimum(left + 1, old - 1)
        w = pos - left
        return (1 - w) * audio[left] + w * audio[right]

    @staticmethod
    def split_text_by_speaker(text: str) -> List[str]:
        parts = re.split(r"(<\|speaker:\d+\|>)", text)
        turns, i = [], 0
        while i < len(parts):
            part = parts[i].strip()
            if re.match(r"<\|speaker:\d+\|>", part):
                if i + 1 < len(parts):
                    turns.append((part + parts[i + 1]).strip())
                    i += 2
                else:
                    turns.append(part)
                    i += 1
            else:
                i += 1
        return turns

    @staticmethod
    def group_turns(turns: List[str], max_speakers: int = 5,
                    max_bytes: int = 200) -> List[str]:
        batches, cur, n = [], [], 0
        for turn in turns:
            tb = len(turn.encode("utf-8"))
            if cur and (len(cur) >= max_speakers or n + tb > max_bytes):
                batches.append("\n".join(cur))
                cur, n = [turn], tb
            else:
                cur.append(turn)
                n += tb
        if cur:
            batches.append("\n".join(cur))
        return batches

    def _split_text(self, text: str, chunk_length: int) -> List[str]:
        turns = self.split_text_by_speaker(text)
        return self.group_turns(turns, max_bytes=chunk_length) if turns \
            else [text]

    def _reference_prompt(self, ref_audio, ref_text):
        prompt_texts, prompt_tokens = [], []
        if ref_audio is not None:
            if self.codec is None:
                raise ValueError("Codec not loaded.")
            if isinstance(ref_audio, str):
                from ....utils import load_audio

                ref_audio = np.asarray(load_audio(
                    ref_audio, sample_rate=self.sample_rate))
            codes, lengths = self.codec.encode(
                np.asarray(ref_audio, np.float32).reshape(1, -1))
            codes = np.asarray(codes)
            n = int(np.asarray(lengths).reshape(-1)[0]) \
                if lengths is not None else codes.shape[-1]
            prompt_tokens.append(codes[0][:, :n])
            prompt_texts.append(ref_text or "")
        return prompt_texts, prompt_tokens

    def generate(self, text: str, voice=None, ref_audio=None, ref_text=None,
                 instruct: Optional[str] = None, max_tokens: int = 1024,
                 temperature: float = 0.7, top_p: float = 0.7,
                 top_k: int = 30, speed: float = 1.0,
                 chunk_length: int = 300, seed: int = 0, stream=False,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        del voice
        if stream:
            raise NotImplementedError("Fish Speech streaming TBD")
        if self.tokenizer is None:
            raise ValueError("Tokenizer not loaded.")
        prompt_texts, prompt_tokens = self._reference_prompt(ref_audio,
                                                             ref_text)
        history_segments = []
        for seg_idx, batch_text in enumerate(self._split_text(text,
                                                              chunk_length)):
            t0 = time.perf_counter()
            base = self._conversation_rows(batch_text, prompt_texts,
                                           prompt_tokens, instruct)
            rows = np.concatenate(history_segments + [base], axis=1) \
                if history_segments else base
            codes = self._generate_codes(rows, batch_text, max_tokens,
                                         temperature, top_p, top_k,
                                         seed + seg_idx)
            audio = self._adjust_speed(self._decode_codes(codes), speed)
            history_segments.append(self.build_prompt_rows(
                [("text", f"{IM_START}assistant\n"
                  + MODALITY_TOKENS["voice"]), ("vq", codes),
                 ("text", IM_END + "\n")]))
            dt = max(time.perf_counter() - t0, 1e-6)
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=audio, samples=len(audio),
                sample_rate=self.sample_rate, segment_idx=seg_idx,
                token_count=int(codes.shape[1]),
                audio_duration=format_duration(dur),
                real_time_factor=round(dur / dt, 3),
                prompt={"tokens": len(self._encode_text(batch_text)),
                        "tokens-per-sec": round(
                            len(self._encode_text(batch_text)) / dt, 2)},
                audio_samples={"samples": len(audio),
                               "samples-per-sec": round(len(audio) / dt,
                                                        2)},
                processing_time_seconds=dt,
                peak_memory_usage=peak_memory_gb())

    def batch_generate(self, texts: List[str], voices=None, ref_audios=None,
                       ref_texts=None, instructs=None,
                       max_tokens: int = 1024, temperature: float = 0.7,
                       top_p: float = 0.7, top_k: int = 30,
                       speed: float = 1.0, chunk_length: int = 300,
                       seed: int = 0, **kwargs
                       ) -> Generator[BatchGenerationResult, None, None]:
        """Multi-sequence generation (ref :1060-1180). Sequences run through
        the same compiled per-frame program; results carry sequence_idx."""
        def norm(v):
            if v is None:
                return [None] * len(texts)
            return list(v) if isinstance(v, (list, tuple)) else \
                [v] * len(texts)

        ras = norm(ref_audios)
        rts = norm(ref_texts)
        ins = norm(instructs)
        for idx, text in enumerate(texts):
            for res in self.generate(
                    text, ref_audio=ras[idx], ref_text=rts[idx],
                    instruct=ins[idx], max_tokens=max_tokens,
                    temperature=temperature, top_p=top_p, top_k=top_k,
                    speed=speed, chunk_length=chunk_length,
                    seed=seed + idx):
                yield BatchGenerationResult(
                    audio=res.audio, sequence_idx=idx, samples=res.samples,
                    sample_rate=res.sample_rate,
                    token_count=res.token_count,
                    audio_duration=res.audio_duration,
                    processing_time_seconds=res.processing_time_seconds,
                    peak_memory_usage=res.peak_memory_usage)


__all__ = ["Model", "ModelConfig", "FishTextConfig",
           "FishAudioDecoderConfig", "fish_forward", "init_fish_block"]
