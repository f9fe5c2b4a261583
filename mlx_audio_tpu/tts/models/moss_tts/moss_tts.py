"""MOSS-TTS / MOSS-TTSD: Qwen3 LM with multichannel RVQ heads.

Parity: /root/reference/mlx_audio/tts/models/moss_tts/moss_tts.py —
three checkpoint layouts:
- delay pattern (``moss_tts_delay``): n_vq+1 heads on the global LM, delayed
  codebooks, text-channel state machine (ref generate_delay_pattern_ids
  :730-906);
- legacy local transformer: tiny Qwen3 local stack + per-channel MLPs
  (ref _local_forward :652-707, generate_local_ids :1061-1181);
- v1.5 local transformer (``moss_tts_local``): 1-layer GPT2 local head with
  fixed RVQ depth + streaming (ref _v15_local_forward :590-650,
  _iter_v15_local_rows :908-1018, streaming :1254-1397).

TPU design: the delay-pattern decode compiles the ENTIRE per-frame step —
Qwen3 decode step, the delayed-lengths/is_audio/is_stopping text state
machine, n_vq-way vectorized channel sampling with rolling
repetition-penalty windows — into lax.scan chunks (host only checks the
done flag). Audio heads and channel embeddings are STACKED (n_vq, V, D)
tensors so per-frame logits are one einsum on the MXU instead of n_vq
small matmuls. Local-transformer variants run one jit per frame with the
channel loop unrolled in-graph (the reference syncs per channel).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Generator, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache
from ....ops.rope import apply_rope, rope_freqs
from ....ops.sampling import apply_repetition_penalty, top_k_top_p_filter
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..moss_tts_nano.gpt2 import gpt2_forward, gpt2_make_caches, init_gpt2
from ..qwen3_tts.talker import init_qwen3_layer, qwen3_layer_forward
from .config import ModelConfig, Qwen3LMConfig
from .processor import (
    MossTTSDelayProcessor,
    MossTTSLocalProcessor,
    MossTTSLocalV15Processor,
    apply_de_delay_pattern,
)

Array = jax.Array

MAX_CACHE_LEN = 8192
CHUNK_FRAMES = 8
HISTORY_WIN = 128
SENTINEL = np.int32(2 ** 30)
PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 4096)


def _bucket(n: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return PROMPT_BUCKETS[-1]


# --------------------------------------------------------------- qwen3 LM

def init_qwen3_lm(key, cfg: Qwen3LMConfig) -> dict:
    ks = iter(jax.random.split(key, 16 * cfg.num_hidden_layers + 8))
    return {
        "embed_tokens": init_embedding(next(ks), cfg.vocab_size,
                                       cfg.hidden_size),
        "layers": {str(i): init_qwen3_layer(
            ks, cfg.hidden_size, cfg.num_attention_heads,
            cfg.num_key_value_heads, cfg.head_dim, cfg.intermediate_size,
            cfg.attention_bias) for i in range(cfg.num_hidden_layers)},
        "norm": init_rms_norm(cfg.hidden_size),
    }


def qwen3_lm_forward(params: dict, cfg: Qwen3LMConfig, embeds: Array,
                     caches: Optional[List[KVCache]], offset,
                     pad_mask: Optional[Array] = None
                     ) -> Tuple[Array, Optional[List[KVCache]]]:
    b, t, _ = embeds.shape
    x = embeds
    positions = offset + jnp.arange(t)[None, :]
    inv_freq = rope_freqs(cfg.head_dim, cfg.rope_theta)
    new_caches = [] if caches is not None else None
    for i in range(cfg.num_hidden_layers):
        x, nc = qwen3_layer_forward(
            params["layers"][str(i)], x, positions, inv_freq,
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
            cfg.rms_norm_eps, caches[i] if caches is not None else None,
            offset, pad_mask, causal=True)
        if caches is not None:
            new_caches.append(nc)
    return apply_rms_norm(params["norm"], x, cfg.rms_norm_eps), new_caches


def _make_lm_caches(cfg: Qwen3LMConfig, batch: int, max_len: int
                    ) -> List[KVCache]:
    return [KVCache.init(batch, max_len, cfg.num_key_value_heads,
                         cfg.head_dim, jnp.float32)
            for _ in range(cfg.num_hidden_layers)]


# ------------------------------------------------ local qwen3 (no rope)

def _local_qwen3_forward(params: dict, cfg: Qwen3LMConfig, x: Array) -> Array:
    """Legacy local transformer: qwen3 blocks WITHOUT rope (ref
    MossTTSLocalAttention :75-110 has q/k-norm but no positions)."""
    b, t, _ = x.shape
    hd = cfg.head_dim
    for i in range(cfg.num_hidden_layers):
        p = params["layers"][str(i)]
        h = apply_rms_norm(p["input_layernorm"], x, cfg.rms_norm_eps)
        a = p["self_attn"]
        q = apply_linear(a["q_proj"], h).reshape(
            b, t, cfg.num_attention_heads, hd)
        k = apply_linear(a["k_proj"], h).reshape(
            b, t, cfg.num_key_value_heads, hd)
        v = apply_linear(a["v_proj"], h).reshape(
            b, t, cfg.num_key_value_heads, hd)
        q = apply_rms_norm(a["q_norm"], q, cfg.rms_norm_eps)
        k = apply_rms_norm(a["k_norm"], k, cfg.rms_norm_eps)
        o = attention(q, k, v, causal=True)
        x = x + apply_linear(a["o_proj"], o.reshape(b, t, -1))
        h = apply_rms_norm(p["post_attention_layernorm"], x,
                           cfg.rms_norm_eps)
        m = p["mlp"]
        x = x + apply_linear(m["down_proj"],
                             jax.nn.silu(apply_linear(m["gate_proj"], h))
                             * apply_linear(m["up_proj"], h))
    return apply_rms_norm(params["norm"], x, cfg.rms_norm_eps)


def _init_local_qwen3(key, cfg: Qwen3LMConfig) -> dict:
    ks = iter(jax.random.split(key, 16 * cfg.num_hidden_layers + 4))
    return {
        "layers": {str(i): init_qwen3_layer(
            ks, cfg.hidden_size, cfg.num_attention_heads,
            cfg.num_key_value_heads, cfg.head_dim, cfg.intermediate_size,
            False) for i in range(cfg.num_hidden_layers)},
        "norm": init_rms_norm(cfg.hidden_size),
    }


def _init_mlp(ks, in_dim: int, hidden: int, out_dim: int) -> dict:
    return {"gate_proj": init_linear(next(ks), in_dim, hidden, bias=False),
            "up_proj": init_linear(next(ks), in_dim, hidden, bias=False),
            "down_proj": init_linear(next(ks), hidden, out_dim, bias=False)}


def _mlp(p: dict, x: Array) -> Array:
    return apply_linear(p["down_proj"],
                        jax.nn.silu(apply_linear(p["gate_proj"], x))
                        * apply_linear(p["up_proj"], x))


# ------------------------------------------------------------- carries

class DelayCarry(NamedTuple):
    caches: List[KVCache]
    row: Array            # (1, 1, n_vq+1) previous step's row
    offset: Array
    step: Array
    is_audio: Array
    is_stopping: Array
    audio_lengths: Array
    delayed_lengths: Array
    history: Array        # (n_vq, W)
    key: Array
    done: Array


class Model(FunctionalModel):
    """MOSS-TTS family model (delay / legacy-local / v1.5-local)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        if config.language_config is None:
            raise ValueError("MOSS-TTS requires language_config")
        super().__init__(config)
        self.tokenizer = None
        self.audio_tokenizer = None
        self.generation_config: Dict[str, object] = {}

    @property
    def sample_rate(self) -> int:
        return int(self.config.sampling_rate)

    @property
    def channels(self) -> int:
        return 1 + int(self.config.n_vq)

    def _codebook_sizes(self) -> List[int]:
        cfg = self.config
        return (cfg.audio_codebook_sizes
                or [cfg.audio_vocab_size] * cfg.n_vq)

    # ------------------------------------------------------------ params

    def init_params(self, key):
        cfg = self.config
        lc = cfg.language_config
        ks = iter(jax.random.split(key, 64))
        sizes = self._codebook_sizes()
        if cfg.is_v15_local_transformer:
            if len(set(sizes)) != 1:
                raise NotImplementedError(
                    "stacked v15 heads require uniform codebook sizes")
            v = sizes[0]
            return {
                "transformer": init_qwen3_lm(next(ks), lc),
                "audio_embeddings": init_embedding(
                    next(ks), cfg.n_vq * v, lc.hidden_size),
                "text_lm_head": init_linear(next(ks), lc.hidden_size,
                                            lc.vocab_size, bias=False),
                "audio_lm_heads": init_linear(
                    next(ks), lc.hidden_size, cfg.n_vq * v, bias=False),
                **({"local_text_lm_head": init_linear(
                    next(ks), lc.hidden_size, 2, bias=False)}
                   if self._binary_text_head() else {}),
                "local_transformer": init_gpt2(
                    next(ks), cfg.local_gpt2_config(),
                    use_token_embedding=False),
            }
        if cfg.is_legacy_local_transformer:
            va = cfg.audio_vocab_size + 1
            local_cfg = cfg.local_transformer_config()
            return {
                "model": {
                    "text_embedding": init_embedding(
                        next(ks), lc.vocab_size, lc.hidden_size),
                    "audio_embeddings": init_embedding(
                        next(ks), cfg.n_vq * va, lc.hidden_size),
                    "language_model": init_qwen3_lm(next(ks), lc),
                },
                "local_transformer": _init_local_qwen3(next(ks), local_cfg),
                "speech_embedding_to_local_mlp": _init_mlp(
                    ks, lc.hidden_size, cfg.additional_mlp_ffn_hidden_size,
                    cfg.local_hidden_size),
                "local_to_speech_embedding_mlps": {
                    str(i): _init_mlp(ks, cfg.local_hidden_size,
                                      cfg.additional_mlp_ffn_hidden_size,
                                      lc.hidden_size)
                    for i in range(self.channels)},
                "layer_norm_before_lm_heads": {
                    str(i): init_rms_norm(lc.hidden_size)
                    for i in range(self.channels)},
                "text_lm_head": init_linear(next(ks), lc.hidden_size,
                                            lc.vocab_size, bias=False),
                "audio_lm_heads": init_linear(
                    next(ks), lc.hidden_size, cfg.n_vq * va, bias=False),
            }
        # delay pattern
        va = cfg.audio_vocab_size + 1
        return {
            "language_model": init_qwen3_lm(next(ks), lc),
            "audio_embeddings": init_embedding(next(ks), cfg.n_vq * va,
                                               lc.hidden_size),
            "text_lm_head": init_linear(next(ks), lc.hidden_size,
                                        lc.vocab_size, bias=False),
            "audio_lm_heads": init_linear(next(ks), lc.hidden_size,
                                          cfg.n_vq * va, bias=False),
        }

    def _binary_text_head(self) -> bool:
        return str(self.config.local_text_head_mode).strip().lower() == \
            "binary"

    def sanitize(self, weights):
        """Map upstream keys to the stacked-tensor layout.

        Upstream (ref sanitize :381-387 + init :213-303):
        - delay: model.emb_ext.{c}.weight, model.lm_heads.{i}.weight
        - legacy: model.embedding_list.{i}.weight, lm_heads.{i}.weight, ...
        - v15: audio_embeddings.{c}.weight, audio_lm_heads.{c}.weight, ...
        Per-channel tables stack into (n_vq*V, D) embeddings and
        (n_vq*V, D) fused heads so decode logits are one matmul.
        """
        cfg = self.config
        va = cfg.audio_vocab_size + 1
        sizes = self._codebook_sizes()
        out, emb_rows, head_rows = {}, {}, {}
        for key, w in weights.items():
            w = jnp.asarray(w)
            if key.startswith("model.") and not cfg.is_local_transformer:
                key = key[len("model."):]
            parts = key.split(".")
            if cfg.is_v15_local_transformer and parts[0] in (
                    "audio_embeddings", "audio_lm_heads"):
                (emb_rows if parts[0] == "audio_embeddings"
                 else head_rows)[int(parts[1])] = w
                continue
            if not cfg.is_local_transformer and parts[0] == "emb_ext":
                emb_rows[int(parts[1])] = w
                continue
            if parts[0] == "lm_heads":
                idx = int(parts[1])
                if idx == 0:
                    out["text_lm_head.weight"] = w
                else:
                    head_rows[idx - 1] = w
                continue
            if parts[0] == "embedding_list" or key.startswith(
                    "model.embedding_list."):
                idx = int(parts[-2])
                if idx == 0:
                    out["model.text_embedding.weight"] = w
                else:
                    emb_rows[idx - 1] = w
                continue
            out[key] = w
        if emb_rows:
            stacked = jnp.concatenate(
                [emb_rows[c] for c in range(len(emb_rows))], axis=0)
            tgt = ("audio_embeddings.weight"
                   if not cfg.is_legacy_local_transformer
                   else "model.audio_embeddings.weight")
            out[tgt] = stacked
        if head_rows:
            out["audio_lm_heads.weight"] = jnp.concatenate(
                [head_rows[c] for c in range(len(head_rows))], axis=0)
        del va, sizes
        return out

    def model_quant_predicate(self, path, w):
        return not any(p in path for p in ("audio_embeddings",
                                           "audio_tokenizer"))

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model.tokenizer = None
        import json

        gc = Path(model_path) / "generation_config.json"
        if gc.exists():
            try:
                cfg = json.loads(gc.read_text())
                model.generation_config = cfg if isinstance(cfg, dict) else {}
            except (OSError, ValueError):
                model.generation_config = {}
        return model

    def _gc(self, key: str, default):
        v = self.generation_config.get(key, default)
        return default if v is None else v

    def _processor(self):
        cfg = self.config
        if cfg.is_v15_local_transformer:
            return MossTTSLocalV15Processor(self.tokenizer, cfg)
        if cfg.is_legacy_local_transformer:
            return MossTTSLocalProcessor(self.tokenizer, cfg)
        return MossTTSDelayProcessor(self.tokenizer, cfg)

    # ------------------------------------------------------------ codec

    def _ensure_audio_tokenizer(self, source=None):
        if self.audio_tokenizer is None:
            raise RuntimeError(
                "MOSS-TTS needs the MOSS audio tokenizer bound "
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

    # -------------------------------------------------------- embeddings

    def _embed_rows_delay(self, params, rows: Array) -> Array:
        """Delay layout: text emb + per-channel emb (pad code IS a row)."""
        cfg = self.config
        va = cfg.audio_vocab_size + 1
        e = apply_embedding(params["language_model"]["embed_tokens"],
                            rows[..., 0])
        offs = jnp.arange(cfg.n_vq, dtype=jnp.int32) * va
        flat = rows[..., 1:] + offs  # (B, T, n_vq)
        return e + apply_embedding(params["audio_embeddings"],
                                   flat).sum(axis=-2)

    def _embed_rows_legacy(self, params, rows: Array) -> Array:
        cfg = self.config
        va = cfg.audio_vocab_size + 1
        e = apply_embedding(params["model"]["text_embedding"], rows[..., 0])
        offs = jnp.arange(cfg.n_vq, dtype=jnp.int32) * va
        flat = rows[..., 1:] + offs
        return e + apply_embedding(params["model"]["audio_embeddings"],
                                   flat).sum(axis=-2)

    def _embed_rows_v15(self, params, rows: Array) -> Array:
        """v15: pad channel entries are masked out (ref :525-537)."""
        cfg = self.config
        v = self._codebook_sizes()[0]
        e = apply_embedding(params["transformer"]["embed_tokens"],
                            rows[..., 0])
        ids = rows[..., 1:]
        valid = ids != cfg.audio_pad_token_id
        offs = jnp.arange(cfg.n_vq, dtype=jnp.int32) * v
        flat = jnp.where(valid, ids, 0) + offs
        emb = apply_embedding(params["audio_embeddings"], flat)
        return e + (emb * valid[..., None]).sum(axis=-2)

    # ------------------------------------------------- delay-pattern jit

    def _delay_prefill_fn(self, pb: int):
        cfg = self.config
        lc = cfg.language_config

        def prefill(params, rows, plen):
            embeds = self._embed_rows_delay(params, rows)
            caches = _make_lm_caches(lc, 1, MAX_CACHE_LEN)
            pad = jnp.where(jnp.arange(MAX_CACHE_LEN) < plen, 0.0,
                            -jnp.inf)[None, None, None, :]
            _, caches = qwen3_lm_forward(params["language_model"], lc,
                                         embeds, caches, 0, pad)
            return caches

        return jax.jit(prefill)

    def _delay_chunk_fn(self, chunk: int, text_temperature: float,
                        text_top_p: float, text_top_k: int,
                        audio_temperature: float, audio_top_p: float,
                        audio_top_k: int, audio_repetition_penalty: float):
        cfg = self.config
        lc = cfg.language_config
        n_vq = cfg.n_vq
        va = cfg.audio_vocab_size + 1
        PAD_CODE = cfg.audio_pad_code
        text_do = text_temperature > 0
        audio_do = audio_temperature > 0
        tt = text_temperature if text_do else 1.0
        at = audio_temperature if audio_do else 1.0

        exclude_outside = jnp.asarray(
            [cfg.pad_token_id, cfg.audio_assistant_gen_slot_token_id,
             cfg.audio_assistant_delay_slot_token_id,
             cfg.audio_end_token_id], jnp.int32)
        keep_inside = jnp.asarray(
            [cfg.audio_assistant_gen_slot_token_id,
             cfg.audio_assistant_delay_slot_token_id], jnp.int32)

        def mask_only(logits, ids):
            keep = jnp.zeros((logits.shape[-1],), bool).at[ids].set(True)
            return jnp.where(keep[None], logits, -jnp.inf)

        def mask_out(logits, ids):
            drop = jnp.zeros((logits.shape[-1],), bool).at[ids].set(True)
            return jnp.where(drop[None], -jnp.inf, logits)

        def sample(key, logits, temperature, top_p, top_k, do,
                   history=None, rep=1.0):
            lg = logits.astype(jnp.float32)
            if history is not None and rep != 1.0:
                lg = apply_repetition_penalty(lg, history, rep)
            greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            if not do:
                return greedy
            lg = top_k_top_p_filter(lg / temperature, top_k=top_k or 0,
                                    top_p=top_p if top_p else 1.0)
            return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)

        def step(params, c: DelayCarry):
            embeds = self._embed_rows_delay(params, c.row)
            hidden, caches = qwen3_lm_forward(
                params["language_model"], lc, embeds, c.caches, c.offset)
            h = hidden[:, -1]                                # (1, D)
            text_logits = apply_linear(params["text_lm_head"], h)
            audio_flat = apply_linear(params["audio_lm_heads"], h)
            audio_logits = audio_flat.reshape(n_vq, va)

            # ---- text channel state machine (ref :795-839)
            key, k1, k2 = jax.random.split(c.key, 3)
            tl = text_logits
            tl = jnp.where(c.is_audio, mask_only(tl, keep_inside),
                           mask_out(tl, exclude_outside))
            tl = jnp.where(c.step == 0,
                           mask_out(tl, keep_inside[1:]),  # delay slot
                           tl)
            tl = jnp.where(c.step <= n_vq,
                           mask_out(tl, jnp.asarray([cfg.im_end_token_id],
                                                    jnp.int32)), tl)
            sampled_text = sample(k1, tl, tt, text_top_p, text_top_k,
                                  text_do)[0]
            in_delay = c.delayed_lengths < n_vq
            at_delay_end = c.delayed_lengths == n_vq
            past_delay = c.delayed_lengths > n_vq
            next_text = jnp.where(
                c.is_stopping, jnp.int32(cfg.pad_token_id),
                jnp.where(in_delay,
                          jnp.int32(cfg.audio_assistant_delay_slot_token_id),
                          jnp.where(at_delay_end,
                                    jnp.int32(cfg.audio_end_token_id),
                                    sampled_text)))
            is_audio = jnp.where(
                ~c.is_stopping & at_delay_end, False,
                jnp.where(next_text == cfg.audio_start_token_id, True,
                          c.is_audio))
            is_stopping = c.is_stopping | (next_text == cfg.im_end_token_id)

            # ---- audio channels (ref :841-869), vectorized over n_vq
            ch = jnp.arange(n_vq)
            pre = c.audio_lengths > ch
            post = jnp.where(c.delayed_lengths == SENTINEL, True,
                             ch > c.delayed_lengths - 1)
            active = pre & post
            al = audio_logits.at[:, PAD_CODE].set(-jnp.inf)
            toks = sample(k2, al, at, audio_top_p, audio_top_k, audio_do,
                          history=c.history,
                          rep=audio_repetition_penalty)
            toks = jnp.where(active, toks, jnp.int32(PAD_CODE))

            # ---- counters (ref :871-888)
            audio_lengths = jnp.where(
                jnp.isin(next_text, jnp.asarray(
                    [cfg.audio_start_token_id,
                     cfg.audio_assistant_gen_slot_token_id,
                     cfg.audio_assistant_delay_slot_token_id], jnp.int32)),
                c.audio_lengths + 1, c.audio_lengths)
            audio_lengths = jnp.where(next_text == cfg.audio_end_token_id,
                                      0, audio_lengths)
            dl = jnp.where(
                (c.delayed_lengths == SENTINEL)
                & (next_text == cfg.audio_assistant_delay_slot_token_id),
                0, c.delayed_lengths)
            dl = jnp.where(dl != SENTINEL, dl + 1, dl)
            dl = jnp.where(dl > n_vq, SENTINEL, dl)

            row = jnp.concatenate(
                [next_text[None], toks], axis=0)[None, None]  # (1,1,ch)
            history = jnp.concatenate([c.history[:, 1:], toks[:, None]],
                                      axis=1)
            done = c.done | is_stopping
            new = DelayCarry(
                caches=caches, row=row, offset=c.offset + 1,
                step=c.step + 1, is_audio=is_audio, is_stopping=is_stopping,
                audio_lengths=audio_lengths, delayed_lengths=dl,
                history=history, key=key, done=done)
            return new, (row[0, 0], done)

        def chunk_step(params, carry):
            carry2, (rows, dones) = jax.lax.scan(
                lambda cc, _: step(params, cc), carry, None, length=chunk)
            return carry2, rows, dones

        return jax.jit(chunk_step)

    def generate_delay_pattern_ids(
            self, input_ids, *, max_new_tokens: int = 4096,
            text_temperature: float = 1.5, text_top_p: float = 1.0,
            text_top_k: int = 50, audio_temperature: float = 1.7,
            audio_top_p: float = 0.8, audio_top_k: int = 25,
            audio_repetition_penalty: float = 1.0, seed: int = 0
    ) -> List[Tuple[int, np.ndarray]]:
        """Compiled delay-pattern decode -> [(start_length, rows)]."""
        cfg = self.config
        rows = np.asarray(input_ids, np.int32)
        if rows.ndim != 3:
            raise ValueError(f"Expected rank-3 input_ids, got {rows.shape}")
        if rows.shape[0] != 1:
            raise NotImplementedError("MOSS-TTS batch generation TBD")
        if rows.shape[-1] != cfg.n_vq + 1:
            raise ValueError(f"Expected {cfg.n_vq + 1} channels, "
                             f"got {rows.shape[-1]}")
        plen = rows.shape[1]
        pb = _bucket(plen)
        padded = np.full((1, pb, cfg.n_vq + 1), cfg.audio_pad_code, np.int32)
        padded[:, :, 0] = cfg.pad_token_id
        padded[0, :plen] = rows[0]
        pf = self._jit_cache.setdefault(("delay_prefill", pb),
                                        self._delay_prefill_fn(pb))
        # prefill covers rows [0, plen-1); the final prompt row is the first
        # step input (its cache slot is rewritten at offset plen-1)
        caches = pf(self.params, jnp.asarray(padded), jnp.int32(plen - 1))

        text_col = rows[0, :, 0]
        last_text = int(text_col[-1])
        is_cont = last_text in {cfg.audio_start_token_id,
                                cfg.audio_assistant_gen_slot_token_id}
        starts = np.flatnonzero(text_col == cfg.audio_start_token_id)
        audio_start_idx = int(starts[-1]) if len(starts) else -1
        is_audio = bool(is_cont and audio_start_idx != -1)
        audio_lengths = plen - audio_start_idx if is_audio else 0

        skey = ("delay_chunk", text_temperature, text_top_p, text_top_k,
                audio_temperature, audio_top_p, audio_top_k,
                audio_repetition_penalty)
        st = self._jit_cache.get(skey)
        if st is None:
            st = self._delay_chunk_fn(
                CHUNK_FRAMES, text_temperature, text_top_p, text_top_k,
                audio_temperature, audio_top_p, audio_top_k,
                audio_repetition_penalty)
            self._jit_cache[skey] = st

        carry = DelayCarry(
            caches=caches, row=jnp.asarray(rows[:, -1:]),
            offset=jnp.int32(plen - 1), step=jnp.int32(0),
            is_audio=jnp.bool_(is_audio), is_stopping=jnp.bool_(False),
            audio_lengths=jnp.int32(audio_lengths),
            delayed_lengths=jnp.int32(SENTINEL),
            history=jnp.full((cfg.n_vq, HISTORY_WIN), -1, jnp.int32),
            key=jax.random.PRNGKey(seed), done=jnp.bool_(False))

        out_rows: List[np.ndarray] = []
        n = 0
        while n < max_new_tokens:
            carry, chunk_rows, dones = st(self.params, carry)
            r = np.asarray(chunk_rows)
            d = np.asarray(dones)
            if d.any():
                out_rows.append(r[:int(np.argmax(d)) + 1])
                break
            out_rows.append(r)
            n += len(r)
        gen = np.concatenate([rows[0]] + out_rows, axis=0)

        im_starts = np.flatnonzero(text_col == cfg.im_start_token_id)
        start_idx = int(im_starts[-1]) + 3 if len(im_starts) else plen
        return [(plen - start_idx, gen[start_idx:])]

    # ------------------------------------------- local-variant frame jits

    def _v15_frame_fn(self, do_sample: bool, text_temperature: float,
                      text_top_p: float, text_top_k: int,
                      audio_temperature: float, audio_top_p: float,
                      audio_top_k: int, audio_repetition_penalty: float):
        cfg = self.config
        lc = cfg.language_config
        gcfg = cfg.local_gpt2_config()
        n_vq = cfg.n_vq
        v = self._codebook_sizes()[0]
        D = lc.hidden_size
        text_do = do_sample and text_temperature > 0
        audio_do = do_sample and audio_temperature > 0

        def sample(key, logits, temperature, top_p, top_k, do,
                   history=None):
            lg = logits.astype(jnp.float32)
            if history is not None and audio_repetition_penalty != 1.0:
                lg = apply_repetition_penalty(lg, history,
                                              audio_repetition_penalty)
            if not do:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg = top_k_top_p_filter(lg / max(temperature, 1e-6),
                                    top_k=top_k or 0,
                                    top_p=top_p if top_p else 1.0)
            return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)

        def local_pass(params, buf, n_valid):
            h, _ = gpt2_forward(params["local_transformer"], gcfg,
                                buf[:, :n_valid], caches=None, offset=0)
            return h[:, -1]

        def frame(params, caches, offset, hidden, history, key):
            buf = jnp.zeros((1, n_vq + 1, D), hidden.dtype)
            buf = buf.at[:, 0].set(hidden[:, -1])
            local_h = local_pass(params, buf, 1)
            cand = jnp.asarray([cfg.audio_assistant_slot_token_id,
                                cfg.audio_end_token_id], jnp.int32)
            if self._binary_text_head() and "local_text_lm_head" in params:
                tl = apply_linear(params["local_text_lm_head"], local_h)
            else:
                tl = apply_linear(params["text_lm_head"], local_h)[..., cand]
            key, sub = jax.random.split(key)
            text_tok = cand[sample(sub, tl, text_temperature, text_top_p,
                                   min(text_top_k, 2), text_do)[0]]

            head_w = params["audio_lm_heads"]["weight"].reshape(n_vq, v, D)
            emb_w = params["audio_embeddings"]["weight"].reshape(n_vq, v, D)
            toks = []
            cur_h = local_h
            for c in range(n_vq):
                logits = cur_h @ head_w[c].T                # (1, v)
                key, sub = jax.random.split(key)
                tok = sample(sub, logits, audio_temperature, audio_top_p,
                             audio_top_k, audio_do, history=history[None, c])
                toks.append(tok[0])
                if c + 1 < n_vq:
                    buf = buf.at[:, c + 1].set(emb_w[c][tok[0]][None])
                    cur_h = local_pass(params, buf, c + 2)
            frame_toks = jnp.stack(toks)
            history = jnp.concatenate([history[:, 1:], frame_toks[:, None]],
                                      axis=1)
            row = jnp.concatenate(
                [text_tok[None], frame_toks], axis=0)[None, None]
            embeds = self._embed_rows_v15(params, row)
            next_hidden, caches = qwen3_lm_forward(
                params["transformer"], lc, embeds, caches, offset)
            return caches, text_tok, frame_toks, next_hidden, history, key

        return jax.jit(frame, donate_argnums=(1,))

    def _legacy_frame_fn(self, nq: int, text_temperature: float,
                         text_top_p: float, text_top_k: int,
                         text_repetition_penalty: float,
                         audio_temperature: float, audio_top_p: float,
                         audio_top_k: int, audio_repetition_penalty: float):
        cfg = self.config
        lc = cfg.language_config
        local_cfg = cfg.local_transformer_config()
        n_vq = cfg.n_vq
        va = cfg.audio_vocab_size + 1
        LD = int(cfg.local_hidden_size)
        text_do = text_temperature > 0
        audio_do = audio_temperature > 0
        active_channels = 1 + nq

        def sample(key, logits, temperature, top_p, top_k, do, history,
                   rep):
            lg = logits.astype(jnp.float32)
            if rep != 1.0 and do:
                lg = apply_repetition_penalty(lg, history, rep)
            if not do:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg = top_k_top_p_filter(lg / max(temperature, 1e-6),
                                    top_k=top_k or 0,
                                    top_p=top_p if top_p else 1.0)
            return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)

        def frame(params, caches, offset, hidden, text_history,
                  audio_history, key):
            g = hidden[:, -1]                              # (1, D)
            buf = jnp.zeros((1, active_channels, LD), g.dtype)
            cur = _mlp(params["speech_embedding_to_local_mlp"], g)
            toks = []
            emb_w = params["model"]["audio_embeddings"]["weight"] \
                .reshape(n_vq, va, -1)
            for c in range(active_channels):
                buf = buf.at[:, c].set(cur)
                lh = _local_qwen3_forward(params["local_transformer"],
                                          local_cfg, buf[:, :c + 1])[:, -1]
                lh = _mlp(params["local_to_speech_embedding_mlps"][str(c)],
                          lh)
                lh = apply_rms_norm(
                    params["layer_norm_before_lm_heads"][str(c)], lh,
                    lc.rms_norm_eps)
                key, sub = jax.random.split(key)
                if c == 0:
                    logits = apply_linear(params["text_lm_head"], lh)
                    tok = sample(sub, logits, text_temperature, text_top_p,
                                 text_top_k, text_do, text_history[None],
                                 text_repetition_penalty)
                    emb = apply_embedding(params["model"]["text_embedding"],
                                          tok)
                else:
                    hw = params["audio_lm_heads"]["weight"] \
                        .reshape(n_vq, va, -1)
                    logits = (lh @ hw[c - 1].T).at[:, cfg.audio_pad_code] \
                        .set(-jnp.inf)
                    tok = sample(sub, logits, audio_temperature,
                                 audio_top_p, audio_top_k, audio_do,
                                 audio_history[None, c - 1],
                                 audio_repetition_penalty)
                    emb = emb_w[c - 1][tok[0]][None]
                toks.append(tok[0])
                cur = _mlp(params["speech_embedding_to_local_mlp"], emb)
            text_tok = toks[0]
            frame_toks = jnp.stack(toks[1:]) if nq else \
                jnp.zeros((0,), jnp.int32)
            pad_tail = jnp.zeros((n_vq - nq,), jnp.int32)
            row = jnp.concatenate([text_tok[None], frame_toks, pad_tail]
                                  )[None, None]
            text_history = jnp.concatenate(
                [text_history[1:], text_tok[None]])
            audio_history = audio_history.at[:nq, :-1] \
                .set(audio_history[:nq, 1:])
            audio_history = audio_history.at[:nq, -1].set(frame_toks)
            embeds = self._embed_rows_legacy(params, row)
            next_hidden, caches = qwen3_lm_forward(
                params["model"]["language_model"], lc, embeds, caches,
                offset)
            return (caches, text_tok, row[0, 0], next_hidden, text_history,
                    audio_history, key)

        return jax.jit(frame, donate_argnums=(1,))

    # ------------------------------------------------------- id generation

    def _prefill_variant(self, rows: np.ndarray, embed_fn, lm_params,
                         tag: str):
        cfg = self.config
        lc = cfg.language_config
        plen = rows.shape[1]
        pb = _bucket(plen)
        padded = np.full((1, pb, cfg.n_vq + 1),
                         cfg.audio_pad_token_id
                         if cfg.is_v15_local_transformer
                         else cfg.audio_pad_code, np.int32)
        padded[:, :, 0] = cfg.pad_token_id
        padded[0, :plen] = rows[0]

        key = (tag, pb)
        pf = self._jit_cache.get(key)
        if pf is None:
            def prefill(params, prows, n):
                embeds = embed_fn(params, prows)
                caches = _make_lm_caches(lc, 1, MAX_CACHE_LEN)
                pad = jnp.where(jnp.arange(MAX_CACHE_LEN) < n, 0.0,
                                -jnp.inf)[None, None, None, :]
                hidden, caches = qwen3_lm_forward(
                    lm_params(params), lc, embeds, caches, 0, pad)
                idx = jnp.clip(n - 1, 0, pb - 1)
                return caches, jax.lax.dynamic_slice_in_dim(hidden, idx, 1,
                                                            axis=1)

            pf = jax.jit(prefill)
            self._jit_cache[key] = pf
        return pf(self.params, jnp.asarray(padded), jnp.int32(plen)), plen

    def generate_v15_local_ids(self, input_ids, *, max_new_tokens=4096,
                               do_sample=True, text_temperature=1.0,
                               text_top_p=1.0, text_top_k=50,
                               audio_temperature=1.7, audio_top_p=0.8,
                               audio_top_k=25, audio_repetition_penalty=1.0,
                               seed: int = 0, n_vq_for_inference=None,
                               on_frame=None
                               ) -> List[Tuple[int, np.ndarray]]:
        cfg = self.config
        if n_vq_for_inference is not None and \
                int(n_vq_for_inference) != cfg.n_vq:
            raise ValueError(
                "MOSS-TTS-Local-Transformer-v1.5 has a fixed RVQ depth "
                f"(n_vq={cfg.n_vq}, got {n_vq_for_inference})")
        rows = np.asarray(input_ids, np.int32)
        if rows.ndim != 3 or rows.shape[0] != 1:
            raise NotImplementedError("v15 generation is single-sequence")
        (caches, hidden), plen = self._prefill_variant(
            rows, self._embed_rows_v15, lambda p: p["transformer"],
            "v15_prefill")
        skey = ("v15_frame", do_sample, text_temperature, text_top_p,
                text_top_k, audio_temperature, audio_top_p, audio_top_k,
                audio_repetition_penalty)
        step = self._jit_cache.get(skey)
        if step is None:
            step = self._v15_frame_fn(do_sample, text_temperature,
                                      text_top_p, text_top_k,
                                      audio_temperature, audio_top_p,
                                      audio_top_k, audio_repetition_penalty)
            self._jit_cache[skey] = step
        history = jnp.full((cfg.n_vq, HISTORY_WIN), -1, jnp.int32)
        key = jax.random.PRNGKey(seed)
        offset = plen
        frames: List[np.ndarray] = []
        for _ in range(int(max_new_tokens)):
            caches, text_tok, frame_toks, hidden, history, key = step(
                self.params, caches, jnp.int32(offset), hidden, history, key)
            if int(text_tok) != cfg.audio_assistant_slot_token_id:
                break
            f = np.asarray(frame_toks, np.int32)
            frames.append(f)
            if on_frame is not None:
                on_frame(f)
            offset += 1

        gen_rows = [rows[0]]
        for f in frames:
            r = np.empty((1, cfg.n_vq + 1), np.int32)
            r[0, 0] = cfg.audio_assistant_slot_token_id
            r[0, 1:] = f
            gen_rows.append(r)
        gen = np.concatenate(gen_rows, axis=0)
        text_col = rows[0, :, 0]
        starts = np.flatnonzero(text_col == cfg.audio_start_token_id)
        if len(starts):
            start_idx = int(starts[-1])
            start_length = plen - start_idx - 1
        else:
            start_idx, start_length = plen, 0
        return [(start_length, gen[start_idx:])]

    def generate_local_ids(self, input_ids, *, max_new_tokens=4096,
                           text_temperature=1.5, text_top_p=1.0,
                           text_top_k=50, text_repetition_penalty=1.0,
                           audio_temperature=1.0, audio_top_p=0.95,
                           audio_top_k=50, audio_repetition_penalty=1.1,
                           n_vq_for_inference=None, seed: int = 0
                           ) -> List[Tuple[int, np.ndarray]]:
        cfg = self.config
        rows = np.asarray(input_ids, np.int32)
        if rows.ndim != 3 or rows.shape[0] != 1:
            raise NotImplementedError("legacy generation is single-sequence")
        nq = max(1, min(cfg.n_vq, int(n_vq_for_inference or cfg.n_vq)))
        (caches, hidden), plen = self._prefill_variant(
            rows, self._embed_rows_legacy,
            lambda p: p["model"]["language_model"], "legacy_prefill")
        skey = ("legacy_frame", nq, text_temperature, text_top_p, text_top_k,
                text_repetition_penalty, audio_temperature, audio_top_p,
                audio_top_k, audio_repetition_penalty)
        step = self._jit_cache.get(skey)
        if step is None:
            step = self._legacy_frame_fn(
                nq, text_temperature, text_top_p, text_top_k,
                text_repetition_penalty, audio_temperature, audio_top_p,
                audio_top_k, audio_repetition_penalty)
            self._jit_cache[skey] = step
        text_history = jnp.full((HISTORY_WIN,), -1, jnp.int32)
        audio_history = jnp.full((cfg.n_vq, HISTORY_WIN), -1, jnp.int32)
        key = jax.random.PRNGKey(seed)
        offset = plen
        out_rows: List[np.ndarray] = []
        for _ in range(int(max_new_tokens)):
            (caches, text_tok, row, hidden, text_history, audio_history,
             key) = step(self.params, caches, jnp.int32(offset), hidden,
                         text_history, audio_history, key)
            out_rows.append(np.asarray(row, np.int32))
            offset += 1
            if int(text_tok) == cfg.audio_end_token_id:
                break
        gen = np.concatenate([rows[0]] + [r[None] for r in out_rows], axis=0)
        text_col = rows[0, :, 0]
        starts = np.flatnonzero(text_col == cfg.audio_start_token_id)
        if len(starts):
            start_idx = int(starts[-1])
            start_length = plen - start_idx - 1
        else:
            start_idx, start_length = plen, 0
        return [(start_length, gen[start_idx:])]

    # ----------------------------------------------------- audio decoding

    def _decode_generated_audio(self, outputs, *, source=None
                                ) -> Tuple[np.ndarray, int]:
        """(ref :1183-1229) de-delay, split non-pad runs, decode, trim."""
        cfg = self.config
        segments, token_count = [], 0
        for start_length, gen in outputs:
            codes = np.asarray(gen)[:, 1:].astype(np.int32)
            if not cfg.is_local_transformer:
                codes = apply_de_delay_pattern(codes)
            is_pad = np.all(codes == cfg.audio_pad_code, axis=1)
            idx = np.flatnonzero(~is_pad)
            if not len(idx):
                continue
            breaks = np.flatnonzero(np.diff(idx) != 1) + 1
            for run in np.split(idx, breaks):
                seg_codes = codes[run[0]:run[-1] + 1]
                token_count += len(seg_codes)
                audio = np.asarray(self.decode_audio_token_ids(
                    jnp.asarray(seg_codes), num_quantizers=cfg.n_vq,
                    source=source)).reshape(-1)
                if start_length > 0 and not segments and len(seg_codes):
                    ratio = min(max(start_length / len(seg_codes), 0.0), 1.0)
                    audio = audio[int(len(audio) * ratio):]
                segments.append(audio)
        if not segments:
            return np.zeros((0,), np.float32), 0
        return np.concatenate(segments), token_count

    # ------------------------------------------------------------ result

    def _result(self, audio, t0, token_count, prompt_tokens, seg=0,
                streaming=False, final=False) -> GenerationResult:
        dt = max(time.perf_counter() - t0, 1e-6)
        audio = np.asarray(audio).reshape(-1)
        dur = len(audio) / self.sample_rate
        return GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=seg, token_count=token_count,
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3) if dt else 0.0,
            prompt={"tokens": prompt_tokens,
                    "tokens-per-sec": round(prompt_tokens / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb(),
            is_streaming_chunk=streaming, is_final_chunk=final)

    # ---------------------------------------------------------- generate

    def generate(self, text: str, ref_audio=None, ref_text=None,
                 prompt_audio_codes=None, mode: str = "generation",
                 stream: bool = False, max_tokens: Optional[int] = None,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        if self.tokenizer is None:
            raise ValueError("Tokenizer is not initialized.")
        cfg = self.config
        t0 = time.perf_counter()
        processor = self._processor()

        refs = ref_audio if isinstance(ref_audio, (list, tuple)) else \
            ([ref_audio] if ref_audio is not None else [])
        if prompt_audio_codes is None and refs:
            prompt_audio_codes = [
                np.asarray(self.encode_reference_audio(
                    r, sample_rate=kwargs.get("ref_audio_sample_rate"),
                    num_quantizers=cfg.n_vq,
                    source=kwargs.get("audio_tokenizer_source")))
                for r in refs]
            if len(prompt_audio_codes) == 1:
                prompt_audio_codes = prompt_audio_codes[0]

        mode = str(mode or "generation").strip().lower()
        if mode in {"voice_clone", "direct"}:
            mode = "generation"
        if mode not in {"generation", "continuation"}:
            raise ValueError("mode must be generation or continuation")
        ref_texts = ref_text if isinstance(ref_text, list) else \
            ([ref_text] if ref_text else [])
        codes_list = prompt_audio_codes if isinstance(
            prompt_audio_codes, (list, tuple)) else \
            ([prompt_audio_codes] if prompt_audio_codes is not None else [])
        codes_list = [np.asarray(c, np.int32) for c in codes_list]
        if mode == "continuation" and len(codes_list) > 1:
            raise ValueError("continuation mode accepts one reference")

        user_kwargs = {
            "text": (text if mode == "generation"
                     else (ref_texts[0] if ref_texts else "") + text),
            "tokens": kwargs.get("tokens"),
            "instruction": kwargs.get("instruction"),
            "quality": kwargs.get("quality"),
            "sound_event": kwargs.get("sound_event"),
            "ambient_sound": kwargs.get("ambient_sound"),
            "language": kwargs.get("language"),
            "scene": kwargs.get("scene"),
        }
        if mode == "generation" and codes_list:
            user_kwargs["reference"] = codes_list
        if mode == "generation":
            conv = [processor.build_user_message(**user_kwargs)]
        else:
            if not codes_list:
                raise ValueError("continuation mode requires ref_audio or "
                                 "prompt_audio_codes")
            conv = [processor.build_user_message(**user_kwargs),
                    processor.build_assistant_message(codes_list)]
        batch = processor([conv], mode=mode)
        input_ids = batch["input_ids"]
        prompt_tokens = int(input_ids.shape[1])
        max_new = int(max_tokens if max_tokens is not None
                      else self._gc("max_new_tokens", 4096))

        if stream:
            if not cfg.is_v15_local_transformer:
                raise NotImplementedError(
                    "MOSS-TTS streaming is implemented for "
                    "MOSS-TTS-Local-Transformer-v1.5 only")
            yield from self._stream_v15(input_ids, t0, prompt_tokens,
                                        max_new, kwargs)
            return

        if cfg.is_v15_local_transformer:
            outputs = self.generate_v15_local_ids(
                input_ids, max_new_tokens=max_new,
                do_sample=bool(kwargs.get("do_sample", True)),
                text_temperature=float(kwargs.get("text_temperature", 1.0)),
                text_top_p=float(kwargs.get("text_top_p", 1.0)),
                text_top_k=int(kwargs.get("text_top_k", 50)),
                audio_temperature=float(kwargs.get(
                    "audio_temperature", kwargs.get("temperature", 1.7))),
                audio_top_p=float(kwargs.get("audio_top_p",
                                             kwargs.get("top_p", 0.8))),
                audio_top_k=int(kwargs.get("audio_top_k",
                                           kwargs.get("top_k", 25))),
                audio_repetition_penalty=float(kwargs.get(
                    "audio_repetition_penalty",
                    kwargs.get("repetition_penalty", 1.0))),
                seed=int(kwargs.get("seed", 0)),
                n_vq_for_inference=kwargs.get("n_vq_for_inference"))
        elif cfg.is_legacy_local_transformer:
            outputs = self.generate_local_ids(
                input_ids, max_new_tokens=max_new,
                text_temperature=float(kwargs.get("text_temperature", 1.5)),
                text_top_p=float(kwargs.get("text_top_p", 1.0)),
                text_top_k=int(kwargs.get("text_top_k", 50)),
                text_repetition_penalty=float(
                    kwargs.get("text_repetition_penalty", 1.0)),
                audio_temperature=float(kwargs.get("audio_temperature", 1.0)),
                audio_top_p=float(kwargs.get("audio_top_p", 0.95)),
                audio_top_k=int(kwargs.get("audio_top_k", 50)),
                audio_repetition_penalty=float(
                    kwargs.get("audio_repetition_penalty", 1.1)),
                n_vq_for_inference=kwargs.get("n_vq_for_inference"),
                seed=int(kwargs.get("seed", 0)))
        else:
            outputs = self.generate_delay_pattern_ids(
                input_ids, max_new_tokens=max_new,
                text_temperature=float(kwargs.get(
                    "text_temperature", self._gc("temperature", 1.5))),
                text_top_p=float(kwargs.get("text_top_p",
                                            self._gc("top_p", 1.0))),
                text_top_k=int(kwargs.get("text_top_k", 50)),
                audio_temperature=float(kwargs.get(
                    "audio_temperature", self._gc("temperature", 1.7))),
                audio_top_p=float(kwargs.get("audio_top_p",
                                             self._gc("top_p", 0.8))),
                audio_top_k=int(kwargs.get("audio_top_k",
                                           self._gc("top_k", 25))),
                audio_repetition_penalty=float(kwargs.get(
                    "audio_repetition_penalty",
                    self._gc("repetition_penalty", 1.0))),
                seed=int(kwargs.get("seed", 0)))
        audio, token_count = self._decode_generated_audio(
            outputs, source=kwargs.get("audio_tokenizer_source"))
        yield self._result(audio, t0, token_count, prompt_tokens, final=True)

    def _stream_v15(self, input_ids, t0, prompt_tokens, max_new, kwargs
                    ) -> Generator[GenerationResult, None, None]:
        """Chunked streaming decode with context re-decode
        (ref _generate_v15_local_streaming_results :1254-1397)."""
        cfg = self.config
        fps = 12.5
        spf = max(1, int(round(self.sample_rate / fps)))
        interval = float(kwargs.get("streaming_interval", 2.0) or 2.0)
        steady = max(1, int(round(interval * fps)))
        first = int(kwargs.get("streaming_first_chunk_frames")
                    or min(4, steady))
        context = max(0, int(kwargs.get("streaming_context_frames", 8) or 0))

        frames: List[np.ndarray] = []
        state = {"emitted": 0, "chunk": 0, "t0": t0}
        results: List[GenerationResult] = []

        def flush(final: bool):
            end = len(frames)
            if end <= state["emitted"] and not final:
                return
            if end > state["emitted"]:
                cstart = max(0, state["emitted"] - context)
                codes = np.stack(frames[cstart:end]).astype(np.int32)
                audio = np.asarray(self.decode_audio_token_ids(
                    jnp.asarray(codes), num_quantizers=cfg.n_vq,
                    source=kwargs.get("audio_tokenizer_source"))).reshape(-1)
                trim = (state["emitted"] - cstart) * spf
                audio = audio[min(trim, len(audio)):]
                results.append(self._result(
                    audio, state["t0"], end - state["emitted"],
                    prompt_tokens if state["chunk"] == 0 else 0,
                    seg=state["chunk"], streaming=True, final=final))
                state["emitted"] = end
                state["chunk"] += 1
                state["t0"] = time.perf_counter()
            elif final:
                results.append(self._result(
                    np.zeros((0,), np.float32), state["t0"], 0,
                    prompt_tokens if state["chunk"] == 0 else 0,
                    seg=max(state["chunk"] - 1, 0), streaming=True,
                    final=True))

        def on_frame(f):
            frames.append(f)
            threshold = first if state["chunk"] == 0 else steady
            if len(frames) - state["emitted"] >= threshold:
                flush(False)

        gen = self.generate_v15_local_ids(
            input_ids, max_new_tokens=max_new,
            do_sample=bool(kwargs.get("do_sample", True)),
            text_temperature=float(kwargs.get("text_temperature", 1.0)),
            text_top_p=float(kwargs.get("text_top_p", 1.0)),
            text_top_k=int(kwargs.get("text_top_k", 50)),
            audio_temperature=float(kwargs.get(
                "audio_temperature", kwargs.get("temperature", 1.7))),
            audio_top_p=float(kwargs.get("audio_top_p",
                                         kwargs.get("top_p", 0.8))),
            audio_top_k=int(kwargs.get("audio_top_k",
                                       kwargs.get("top_k", 25))),
            audio_repetition_penalty=float(kwargs.get(
                "audio_repetition_penalty",
                kwargs.get("repetition_penalty", 1.0))),
            seed=int(kwargs.get("seed", 0)), on_frame=on_frame)
        del gen
        flush(True)
        # on_frame fired synchronously during generate_v15_local_ids; emit
        # accumulated chunks in order.
        yield from results


__all__ = ["Model", "ModelConfig", "Qwen3LMConfig", "init_qwen3_lm",
           "qwen3_lm_forward"]
