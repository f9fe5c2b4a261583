"""OmniVoice: MaskGIT-style NAR TTS over 8 RVQ codebooks with a
bidirectional Qwen3 backbone and the HiggsAudio codec.

Parity: /root/reference/mlx_audio/tts/models/omnivoice/
(omnivoice.py — unified text+audio grid, style/lang/instruct prompt,
nonverbal tag tokenization, generate/generate_batch; generation.py —
cosine-shifted schedule, CFG in log-prob space, Gumbel class/position
sampling, per-codebook layer penalty; backbone.py — bidirectional Qwen3).

TPU design: the reference syncs per unmask step and per batch row; here
the FULL iterative unmask (all steps, all rows) is one `lax.scan` — the
per-step reveal-k schedule rides in as scan xs, CFG runs cond+uncond in
the same trace, and the per-row target windows are handled with
take_along_axis gathers + batched dynamic_update_slice scatters.
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Generator, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_embedding, apply_linear, init_embedding, init_linear
from ....ops.attention import attention
from ..base import GenerationResult, format_duration, peak_memory_gb

Array = jax.Array

_NONVERBAL_PATTERN = re.compile(
    r"\[(laughter|sigh|confirmation-en|question-en|question-ah|"
    r"question-oh|question-ei|question-yi|surprise-ah|surprise-oh|"
    r"surprise-wa|surprise-yo|dissatisfaction-hnn)\]")

SAMPLES_PER_TOKEN = 960


@dataclass
class BackboneConfig(BaseModelArgs):
    hidden_size: int = 1024
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    intermediate_size: int = 3072
    vocab_size: int = 151676
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    max_position_embeddings: int = 40960


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "omnivoice"
    audio_vocab_size: int = 1025           # 1024 codes + mask
    audio_mask_id: int = 1024
    num_audio_codebook: int = 8
    audio_codebook_weights: List[int] = field(
        default_factory=lambda: [8, 8, 6, 6, 4, 4, 2, 2])
    sample_rate: int = 24000
    llm_config: Optional[Dict] = None
    model_path: Optional[str] = None

    @property
    def backbone_config(self) -> BackboneConfig:
        return BackboneConfig.from_dict(self.llm_config or {})


# ------------------------------------------------------------- backbone

def _rms(x: Array, w: Array, eps: float) -> Array:
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (x32 * w).astype(x.dtype)


def _rope_half(x: Array, cos: Array, sin: Array) -> Array:
    # x (B, T, H, D); rotate-half (NeoX) style
    h = x.shape[-1] // 2
    x1, x2 = x[..., :h], x[..., h:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


def init_backbone(key, c: BackboneConfig) -> dict:
    ks = iter(jax.random.split(key, 12 * c.num_hidden_layers + 8))
    d, hd = c.hidden_size, c.head_dim
    layers = {}
    for i in range(c.num_hidden_layers):
        layers[str(i)] = {
            "self_attn": {
                "q_proj": init_linear(next(ks), d,
                                      c.num_attention_heads * hd,
                                      bias=False),
                "k_proj": init_linear(next(ks), d,
                                      c.num_key_value_heads * hd,
                                      bias=False),
                "v_proj": init_linear(next(ks), d,
                                      c.num_key_value_heads * hd,
                                      bias=False),
                "o_proj": init_linear(next(ks),
                                      c.num_attention_heads * hd, d,
                                      bias=False),
                "q_norm": {"weight": jnp.ones(hd)},
                "k_norm": {"weight": jnp.ones(hd)},
            },
            "mlp": {
                "gate_proj": init_linear(next(ks), d, c.intermediate_size,
                                         bias=False),
                "up_proj": init_linear(next(ks), d, c.intermediate_size,
                                       bias=False),
                "down_proj": init_linear(next(ks), c.intermediate_size, d,
                                         bias=False),
            },
            "input_layernorm": {"weight": jnp.ones(d)},
            "post_attention_layernorm": {"weight": jnp.ones(d)},
        }
    return {
        "embed_tokens": init_embedding(next(ks), c.vocab_size, d),
        "layers": layers,
        "norm": {"weight": jnp.ones(d)},
    }


def backbone_forward(p: dict, c: BackboneConfig, embeds: Array) -> Array:
    """(B, S, D) -> (B, S, D). Full bidirectional attention, no mask
    (reference backbone.py:82)."""
    b, s, _ = embeds.shape
    hd = c.head_dim
    inv = 1.0 / (c.rope_theta ** (jnp.arange(0, hd, 2,
                                             dtype=jnp.float32) / hd))
    ang = jnp.arange(s, dtype=jnp.float32)[:, None] * inv[None]
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)],
                          axis=-1)[None, :, None, :]
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)],
                          axis=-1)[None, :, None, :]
    x = embeds
    eps = c.rms_norm_eps
    for i in range(c.num_hidden_layers):
        lp = p["layers"][str(i)]
        a = lp["self_attn"]
        h = _rms(x, lp["input_layernorm"]["weight"], eps)
        q = apply_linear(a["q_proj"], h).reshape(
            b, s, c.num_attention_heads, hd)
        k = apply_linear(a["k_proj"], h).reshape(
            b, s, c.num_key_value_heads, hd)
        v = apply_linear(a["v_proj"], h).reshape(
            b, s, c.num_key_value_heads, hd)
        q = _rms(q, a["q_norm"]["weight"], eps)
        k = _rms(k, a["k_norm"]["weight"], eps)
        q = _rope_half(q, cos, sin)
        k = _rope_half(k, cos, sin)
        o = attention(q, k, v).reshape(b, s, -1)
        x = x + apply_linear(a["o_proj"], o)
        h = _rms(x, lp["post_attention_layernorm"]["weight"], eps)
        x = x + apply_linear(lp["mlp"]["down_proj"],
                             jax.nn.silu(apply_linear(
                                 lp["mlp"]["gate_proj"], h))
                             * apply_linear(lp["mlp"]["up_proj"], h))
    return _rms(x, p["norm"]["weight"], eps)


# ----------------------------------------------------------- text utils

def combine_text(text: str, ref_text: Optional[str] = None) -> str:
    full = (ref_text.strip() + " " + text.strip()) if ref_text else \
        text.strip()
    full = re.sub(r"[\r\n]+", "", full)
    full = re.sub(r"[ \t]+", " ", full)
    cjk = r"[一-鿿]"
    return re.sub(rf"(?<={cjk})\s+|\s+(?={cjk})", "", full)


def tokenize_with_nonverbal_tags(text: str, tokenizer) -> List[int]:
    """Keep [laughter]-style tags atomic (reference omnivoice.py:124)."""
    parts: List[int] = []
    last = 0
    for m in _NONVERBAL_PATTERN.finditer(text):
        if m.start() > last:
            parts.extend(tokenizer(text[last:m.start()],
                                   add_special_tokens=False).input_ids)
        parts.extend(tokenizer(m.group(),
                               add_special_tokens=False).input_ids)
        last = m.end()
    if last < len(text):
        parts.extend(tokenizer(text[last:],
                               add_special_tokens=False).input_ids)
    if not parts:
        parts = list(tokenizer(text, add_special_tokens=False).input_ids)
    return parts


def _ensure_list(x, n: int):
    if x is None:
        return [None] * n
    if not isinstance(x, list):
        return [x] * n
    if len(x) != n:
        raise ValueError(f"Expected list of length {n}, got {len(x)}")
    return x


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """OmniVoice NAR diffusion TTS (k2-fsa/OmniVoice)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.text_tokenizer = None
        self.audio_tokenizer = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        cfg = self.config
        bc = cfg.backbone_config
        keys = jax.random.split(key, 2 * cfg.num_audio_codebook + 2)
        return {
            "backbone": init_backbone(keys[0], bc),
            "audio_embeddings": {
                str(i): init_embedding(keys[1 + i], cfg.audio_vocab_size,
                                       bc.hidden_size)
                for i in range(cfg.num_audio_codebook)},
            "audio_heads": {
                str(i): init_linear(
                    keys[1 + cfg.num_audio_codebook + i], bc.hidden_size,
                    cfg.audio_vocab_size, bias=False)
                for i in range(cfg.num_audio_codebook)},
        }

    def sanitize(self, weights):
        cfg = self.config
        C, V = cfg.num_audio_codebook, cfg.audio_vocab_size
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k == "codebook_layer_offsets":
                continue
            if k == "audio_embeddings.weight":
                for i in range(C):
                    out[f"audio_embeddings.{i}.weight"] = \
                        v[i * V:(i + 1) * V]
                continue
            if k == "audio_heads.weight":
                for i in range(C):
                    out[f"audio_heads.{i}.weight"] = v[i * V:(i + 1) * V]
                continue
            if k.startswith("llm."):
                k = "backbone." + k[4:]
            out[k] = v
        return out

    # --------------------------------------------------------- forward

    def _forward(self, p, ids: Array, audio_mask: Array) -> Array:
        """unified ids (B, L, C) + audio mask (B, L) -> logits
        (B, L, C, V)."""
        cfg = self.config
        bc = cfg.backbone_config
        C = cfg.num_audio_codebook
        text_e = apply_embedding(p["backbone"]["embed_tokens"],
                                 jnp.clip(ids[..., 0], 0,
                                          bc.vocab_size - 1))
        audio_e = sum(apply_embedding(p["audio_embeddings"][str(i)],
                                      ids[..., i]) for i in range(C))
        embeds = jnp.where(audio_mask[..., None], audio_e, text_e)
        hidden = backbone_forward(p["backbone"], bc, embeds)
        heads = jnp.stack([p["audio_heads"][str(i)]["weight"]
                           for i in range(C)])            # (C, V, D)
        return jnp.einsum("bld,cvd->blcv", hidden, heads)

    # ----------------------------------------------------------- unmask

    @staticmethod
    def _time_steps(num_steps: int, t_shift: float) -> List[float]:
        ts = [i / num_steps for i in range(num_steps + 1)]
        return [t_shift * t / (1.0 + (t_shift - 1.0) * t) for t in ts]

    def _unmask_fn(self, L: int, U: int, num_steps: int,
                   guidance_scale: float, class_temperature: float,
                   position_temperature: float,
                   layer_penalty_factor: float):
        cfg = self.config
        C, V, mask_id = (cfg.num_audio_codebook, cfg.audio_vocab_size,
                         cfg.audio_mask_id)
        layer_pen = jnp.arange(C, dtype=jnp.float32) * layer_penalty_factor
        topk_k = max(1, math.ceil(0.1 * V))

        def gumbel(key, shape):
            u = jax.random.uniform(key, shape)
            return -jnp.log(-jnp.log(u + 1e-10) + 1e-10)

        def run(p, ids, cond_mask, u_start, t_lens, k_sched, key):
            B = ids.shape[0]
            uncond_mask = jnp.ones((B, U), bool)
            gidx = jnp.clip(u_start[:, None] + jnp.arange(U)[None],
                            0, L + U - 1)                  # (B, U)
            valid_u = jnp.arange(U)[None] < t_lens[:, None]

            def ext(a, fill):
                pad = jnp.full((B, U) + a.shape[2:], fill, a.dtype)
                return jnp.concatenate([a, pad], axis=1)

            def step(carry, k):
                ids, key = carry
                logits = self._forward(p, ids, cond_mask)
                lp = jax.nn.log_softmax(logits, axis=-1)
                gi = gidx[..., None, None]
                lc = jnp.take_along_axis(
                    ext(lp, 0.0), jnp.broadcast_to(gi, (B, U, C, V)),
                    axis=1)
                u_ids = jnp.take_along_axis(
                    ext(ids, mask_id),
                    jnp.broadcast_to(gidx[..., None], (B, U, C)), axis=1)
                if guidance_scale != 0:
                    lu = jax.nn.log_softmax(
                        self._forward(p, u_ids, uncond_mask), axis=-1)
                    lp_t = jax.nn.log_softmax(
                        lc + guidance_scale * (lc - lu), axis=-1)
                else:
                    lp_t = lc
                lp_t = jnp.where(jnp.arange(V) == mask_id, -jnp.inf, lp_t)
                key, k1, k2 = jax.random.split(key, 3)
                if class_temperature > 0.0:
                    thr = jax.lax.top_k(lp_t, topk_k)[0][..., -1:]
                    filt = jnp.where(lp_t >= thr, lp_t, -jnp.inf)
                    new_toks = jnp.argmax(
                        filt / class_temperature + gumbel(k1, filt.shape),
                        axis=-1)
                else:
                    new_toks = jnp.argmax(lp_t, axis=-1)   # (B, U, C)
                conf = jnp.max(lp_t, axis=-1) - layer_pen[None, None]
                if position_temperature > 0.0:
                    conf = conf / position_temperature + \
                        gumbel(k2, conf.shape)
                still = (u_ids == mask_id) & valid_u[..., None]
                score = jnp.where(still, conf, -jnp.inf).reshape(B, U * C)
                srt = jnp.sort(score, axis=-1)[:, ::-1]
                kc = jnp.clip(k, 1, U * C)
                thr = jnp.take_along_axis(srt, kc[:, None] - 1, axis=1)
                reveal = (score >= thr).reshape(B, U, C) & still
                upd = jnp.where(reveal, new_toks.astype(jnp.int32), u_ids)
                ids_ext = jax.vmap(
                    lambda row, urow, s: jax.lax.dynamic_update_slice(
                        row, urow, (s, 0)))(ext(ids, mask_id), upd,
                                            u_start)
                return (ids_ext[:, :L], key), None

            (ids, _), _ = jax.lax.scan(step, (ids, key), k_sched)
            return ids

        return jax.jit(run)

    def _run_unmask(self, rows: List[dict], target_lens: List[int],
                    num_steps: int, guidance_scale: float,
                    class_temperature: float, position_temperature: float,
                    layer_penalty_factor: float, t_shift: float,
                    seed: int) -> List[np.ndarray]:
        cfg = self.config
        C, mask_id = cfg.num_audio_codebook, cfg.audio_mask_id
        B = len(rows)
        L = max(r["input_ids"].shape[1] for r in rows)
        U = max(target_lens)
        L = max(L, U)

        ids = np.full((B, L, C), mask_id, np.int32)
        cond_mask = np.zeros((B, L), bool)
        u_start = np.zeros((B,), np.int32)
        for i, r in enumerate(rows):
            cl = r["input_ids"].shape[1]
            ids[i, :cl] = np.asarray(r["input_ids"][0])
            cond_mask[i, :cl] = np.asarray(r["audio_mask"][0])
            u_start[i] = cl - target_lens[i]

        ts = self._time_steps(num_steps, t_shift)
        k_sched = np.zeros((num_steps, B), np.int32)
        for i, tl in enumerate(target_lens):
            total = tl * C
            for s in range(num_steps):
                k = max(1, math.ceil(total * (ts[s + 1] - ts[s])))
                k_sched[s, i] = total if s == num_steps - 1 else k

        fn_key = ("unmask", B, L, U, num_steps, guidance_scale,
                  class_temperature, position_temperature,
                  layer_penalty_factor)
        fn = self._jit_cache.get(fn_key)
        if fn is None:
            fn = self._unmask_fn(L, U, num_steps, guidance_scale,
                                 class_temperature, position_temperature,
                                 layer_penalty_factor)
            self._jit_cache[fn_key] = fn
        out = np.asarray(fn(self.params, jnp.asarray(ids),
                            jnp.asarray(cond_mask), jnp.asarray(u_start),
                            jnp.asarray(target_lens, jnp.int32),
                            jnp.asarray(k_sched),
                            jax.random.PRNGKey(seed)))
        results = []
        for i, r in enumerate(rows):
            cl = r["input_ids"].shape[1]
            toks = out[i, cl - target_lens[i]:cl]
            results.append(np.where(toks == mask_id, 0, toks))
        return results

    # ----------------------------------------------------- prompt build

    def _tokenize_style_and_text(self, text, language="None",
                                 instruct="None", denoise=True,
                                 ref_text=None):
        if self.text_tokenizer is None:
            raise ValueError("text_tokenizer is required; pass one or load "
                             "the model via load_model()")
        style = ("<|denoise|>" if denoise else "") + \
            f"<|lang_start|>{language}<|lang_end|>" + \
            f"<|instruct_start|>{instruct}<|instruct_end|>"
        style_ids = list(self.text_tokenizer(
            style, add_special_tokens=False).input_ids)
        wrapped = f"<|text_start|>{combine_text(text, ref_text)}" \
            f"<|text_end|>"
        text_ids = tokenize_with_nonverbal_tags(wrapped,
                                                self.text_tokenizer)
        return style_ids, text_ids

    def _prepare_inputs(self, style_ids, text_ids, T,
                        ref_tokens=None) -> dict:
        cfg = self.config
        C, mask_id = cfg.num_audio_codebook, cfg.audio_mask_id
        n_text = len(style_ids) + len(text_ids)
        blocks = [np.repeat(np.asarray(style_ids + text_ids,
                                       np.int32)[None, :, None], C, 2)]
        if ref_tokens is not None and len(ref_tokens):
            blocks.append(np.asarray(ref_tokens, np.int32)[None])
        blocks.append(np.full((1, T, C), mask_id, np.int32))
        input_ids = np.concatenate(blocks, axis=1)
        L = input_ids.shape[1]
        audio_mask = np.concatenate(
            [np.zeros((1, n_text), bool), np.ones((1, L - n_text), bool)],
            axis=1)
        return {"input_ids": input_ids, "audio_mask": audio_mask}

    def _target_len(self, text: str, duration_s: Optional[float]) -> int:
        if duration_s is not None:
            return math.ceil(duration_s * self.config.sample_rate
                             / SAMPLES_PER_TOKEN)
        from .duration import RuleDurationEstimator

        raw = RuleDurationEstimator().estimate_duration(
            text or "", "Nice to meet you.", 25)
        return max(10, int(raw * 1.15))

    def _encode_ref(self, ref_audio, max_duration_s: float):
        from .utils import create_voice_clone_prompt

        if self.audio_tokenizer is None:
            raise ValueError("audio tokenizer (HiggsAudio codec) required "
                             "for voice cloning via ref_audio")
        if isinstance(ref_audio, (str, Path)):
            return create_voice_clone_prompt(
                str(ref_audio), tokenizer=self.audio_tokenizer,
                max_duration_s=max_duration_s)
        return np.asarray(self.audio_tokenizer.encode(
            np.asarray(ref_audio, np.float32).reshape(-1)), np.int32)

    # ---------------------------------------------------------- generate

    def generate(self, text: Optional[str] = None,
                 duration_s: Optional[float] = None,
                 language: str = "None", lang_code: str = "None",
                 instruct: str = "None", ref_audio=None,
                 ref_text: Optional[str] = None,
                 ref_audio_max_duration_s: float = 10.0,
                 num_steps: int = 32, guidance_scale: float = 2.0,
                 class_temperature: float = 0.0,
                 position_temperature: float = 5.0,
                 layer_penalty_factor: float = 5.0, t_shift: float = 0.1,
                 ref_tokens=None, seed: int = 0, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        results = self.generate_batch(
            [text or ""], language=language, lang_code=lang_code,
            ref_text=ref_text, ref_audio=ref_audio, ref_tokens=ref_tokens,
            duration_s=duration_s, instruct=instruct,
            ref_audio_max_duration_s=ref_audio_max_duration_s,
            num_steps=num_steps, guidance_scale=guidance_scale,
            class_temperature=class_temperature,
            position_temperature=position_temperature,
            layer_penalty_factor=layer_penalty_factor, t_shift=t_shift,
            seed=seed)
        yield from results

    def generate_batch(self, text: Union[str, List[str]],
                       language="None", lang_code="None", ref_text=None,
                       ref_audio=None, ref_tokens=None, duration_s=None,
                       instruct="None",
                       ref_audio_max_duration_s: float = 10.0,
                       num_steps: int = 32, guidance_scale: float = 2.0,
                       class_temperature: float = 0.0,
                       position_temperature: float = 5.0,
                       layer_penalty_factor: float = 5.0,
                       t_shift: float = 0.1, max_batch_size: int = 8,
                       seed: int = 0, **kwargs
                       ) -> List[GenerationResult]:
        cfg = self.config
        if not isinstance(text, list):
            text = [text]
        if not text:
            return []
        if max_batch_size < 1:
            raise ValueError("max_batch_size must be at least 1")
        B = len(text)
        languages = _ensure_list(language, B)
        lang_codes = _ensure_list(lang_code, B)
        ref_texts = _ensure_list(ref_text, B)
        ref_tok_list = _ensure_list(ref_tokens, B)
        durations = _ensure_list(duration_s, B)
        instructs = _ensure_list(instruct, B)
        languages = [lang_codes[i] if languages[i] == "None"
                     and lang_codes[i] != "None" else languages[i]
                     for i in range(B)]
        if ref_audio is not None:
            ref_audios = _ensure_list(ref_audio, B)
            for i in range(B):
                if ref_tok_list[i] is None and ref_audios[i] is not None:
                    ref_tok_list[i] = self._encode_ref(
                        ref_audios[i], ref_audio_max_duration_s)

        rows, target_lens = [], []
        for i in range(B):
            style_ids, text_ids = self._tokenize_style_and_text(
                text[i], language=languages[i], instruct=instructs[i],
                denoise=ref_tok_list[i] is not None,
                ref_text=ref_texts[i])
            tl = self._target_len(text[i], durations[i])
            target_lens.append(tl)
            rows.append(self._prepare_inputs(style_ids, text_ids, tl,
                                             ref_tok_list[i]))

        results: List[GenerationResult] = []
        for cs in range(0, B, max_batch_size):
            ce = min(cs + max_batch_size, B)
            t0 = time.perf_counter()
            token_list = self._run_unmask(
                rows[cs:ce], target_lens[cs:ce], num_steps,
                guidance_scale, class_temperature, position_temperature,
                layer_penalty_factor, t_shift, seed + cs)
            dt = max(time.perf_counter() - t0, 1e-6)
            for j, tokens in enumerate(token_list):
                idx = cs + j
                tl = target_lens[idx]
                if self.audio_tokenizer is not None:
                    audio = np.asarray(self.audio_tokenizer.decode(tokens),
                                       np.float32)
                else:
                    audio = np.zeros((tl * SAMPLES_PER_TOKEN,), np.float32)
                n = tl * SAMPLES_PER_TOKEN
                dur = n / cfg.sample_rate
                results.append(GenerationResult(
                    audio=audio, samples=n, sample_rate=cfg.sample_rate,
                    segment_idx=idx, token_count=tl,
                    audio_duration=format_duration(dur),
                    real_time_factor=round(dur / dt, 3),
                    prompt={"tokens": tl,
                            "tokens-per-sec": round(tl / dt, 2)},
                    audio_samples={"samples": n,
                                   "samples-per-sec": round(n / dt, 2)},
                    processing_time_seconds=dt,
                    peak_memory_usage=peak_memory_gb()))
        return results

    # ---------------------------------------------------------- loading

    def post_load_hook(self, model_path):
        import warnings

        try:
            from transformers import AutoTokenizer

            self.text_tokenizer = AutoTokenizer.from_pretrained(
                str(model_path))
        except Exception as e:  # pragma: no cover - env dependent
            warnings.warn(f"Could not load text tokenizer: {e}")
        try:
            from ....codec.models.higgs_audio import Model as HiggsCodec

            from ....utils import base_load_model

            self.audio_tokenizer = base_load_model(
                model_path, category="codec",
                model_remapping={"higgs_audio": "higgs_audio"},
                model_type="higgs_audio")
        except Exception as e:  # pragma: no cover - env dependent
            import warnings as _w

            _w.warn(f"Could not load audio tokenizer: {e}")
        return self


__all__ = ["Model", "ModelConfig", "BackboneConfig", "backbone_forward",
           "init_backbone", "combine_text", "tokenize_with_nonverbal_tags"]
