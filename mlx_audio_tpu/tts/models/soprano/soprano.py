"""Soprano: ultra-light token TTS (Qwen3 LM hidden states -> Vocos head).

Parity: reference tts/models/soprano/ — Qwen3 LM whose per-token hidden
states (post final norm) are the acoustic features (soprano.py:268-300),
prompt format `[STOP][TEXT]{text}[START]` with sentence splitting and
short-sentence merging (:203-257), stop on pad/[STOP] token (:120-124),
decoder = 4x linear interpolation (align_corners) over hidden states ->
ConvNeXt Vocos backbone (configurable input/dw kernels) -> exp-mag ISTFT
head (decoder.py), and the `language_model.` prefix sanitize (:180-194).

TPU design: generation is a compiled chunked scan emitting (token,
hidden) pairs with in-graph stop masking; the vocoder stage is one jitted
program per hidden-length bucket.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_embedding, apply_layer_norm,
                    apply_linear, apply_rms_norm, init_conv1d,
                    init_embedding, init_layer_norm, init_linear,
                    init_rms_norm)
from ....ops.interpolate import interpolate1d
from ....ops.kvcache import KVCache
from ....ops.rope import rope_freqs
from ....ops.sampling import make_sampler
from ..base import GenerationResult, format_duration
from ..qwen3_tts.talker import init_qwen3_layer, qwen3_layer_forward
from .text import clean_text

Array = jax.Array

CHUNK = 32
PROMPT_BUCKETS = (64, 128, 256, 512)
FRAME_BUCKETS = (64, 128, 256, 512, 1024)


@dataclass
class DecoderConfig(BaseModelArgs):
    decoder_num_layers: int = 8
    decoder_dim: int = 768
    decoder_intermediate_dim: int = 2304
    hop_length: int = 512
    n_fft: int = 2048
    upscale: int = 4
    input_kernel: int = 1
    dw_kernel: int = 3
    token_size: int = 2048
    receptive_field: int = 4


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "soprano"
    hidden_size: int = 512
    num_hidden_layers: int = 12
    intermediate_size: int = 2048
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    head_dim: int = 64
    vocab_size: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = True
    sample_rate: int = 32000
    decoder_config: Optional[DecoderConfig] = None
    model_path: str = ""

    def __post_init__(self):
        if isinstance(self.decoder_config, dict):
            self.decoder_config = DecoderConfig.from_dict(
                self.decoder_config)
        if self.decoder_config is None:
            # checkpoint config lacks decoder dims: infer the variant
            # from the repo name (reference soprano.py model presets)
            self.decoder_config = DecoderConfig()
            if self.model_path and "soprano-1.1" not in \
                    self.model_path.lower():
                self.decoder_config.decoder_dim = 512
                self.decoder_config.decoder_intermediate_dim = 1536
                self.decoder_config.input_kernel = 3


# ------------------------------------------------------------------ init

def init_soprano(key, cfg: ModelConfig) -> dict:
    ks = iter(jax.random.split(
        key, 16 + 8 * cfg.num_hidden_layers
        + 4 * cfg.decoder_config.decoder_num_layers))
    lm = {"embed_tokens": init_embedding(next(ks), cfg.vocab_size,
                                         cfg.hidden_size),
          "layers": {str(i): init_qwen3_layer(
              ks, cfg.hidden_size, cfg.num_attention_heads,
              cfg.num_key_value_heads, cfg.head_dim,
              cfg.intermediate_size, False)
              for i in range(cfg.num_hidden_layers)},
          "norm": init_rms_norm(cfg.hidden_size)}
    if not cfg.tie_word_embeddings:
        lm["lm_head"] = init_linear(next(ks), cfg.hidden_size,
                                    cfg.vocab_size, bias=False)

    d = cfg.decoder_config
    lsv = 1.0 / d.decoder_num_layers
    blocks = {}
    for i in range(d.decoder_num_layers):
        blocks[str(i)] = {
            "dwconv": init_conv1d(next(ks), d.decoder_dim, d.decoder_dim,
                                  d.dw_kernel, groups=d.decoder_dim),
            "norm": init_layer_norm(d.decoder_dim),
            "pwconv1": init_linear(next(ks), d.decoder_dim,
                                   d.decoder_intermediate_dim),
            "pwconv2": init_linear(next(ks), d.decoder_intermediate_dim,
                                   d.decoder_dim),
            "gamma": jnp.full((d.decoder_dim,), lsv),
        }
    dec = {"decoder": {
               "embed": init_conv1d(next(ks), cfg.hidden_size,
                                    d.decoder_dim, d.input_kernel),
               "norm": init_layer_norm(d.decoder_dim),
               "convnext": blocks,
               "final_layer_norm": init_layer_norm(d.decoder_dim)},
           "head": {"out": init_linear(next(ks), d.decoder_dim,
                                       d.n_fft + 2)}}
    return {"language_model": lm, "decoder": dec}


# --------------------------------------------------------------- forward

def lm_forward(p: dict, cfg: ModelConfig, tokens: Array,
               caches: Optional[List[KVCache]], offset, mask=None
               ) -> Tuple[Array, Array, Optional[List[KVCache]]]:
    """-> (logits, hidden (post-norm), caches)."""
    lm = p["language_model"]
    x = apply_embedding(lm["embed_tokens"], tokens)
    inv_freq = rope_freqs(cfg.head_dim, cfg.rope_theta)
    positions = offset + jnp.arange(x.shape[1])[None, :]
    new_caches = [] if caches is not None else None
    for i in range(cfg.num_hidden_layers):
        x, nc = qwen3_layer_forward(
            lm["layers"][str(i)], x, positions, inv_freq,
            cfg.num_attention_heads, cfg.num_key_value_heads,
            cfg.head_dim, cfg.rms_norm_eps,
            caches[i] if caches is not None else None, offset, mask,
            True)
        if new_caches is not None:
            new_caches.append(nc)
    hidden = apply_rms_norm(lm["norm"], x, cfg.rms_norm_eps)
    if "lm_head" in lm:
        logits = apply_linear(lm["lm_head"], hidden)
    else:
        logits = hidden @ lm["embed_tokens"]["weight"].T
    return logits, hidden, new_caches


def decode_hidden(p: dict, cfg: ModelConfig, hidden: Array,
                  n_tokens: Array) -> Array:
    """(1, L, C) hidden states -> (1, samples) audio."""
    d = cfg.decoder_config
    target = d.upscale * (hidden.shape[1] - 1) + 1
    x = interpolate1d(hidden, size=target, mode="linear",
                      align_corners=True)
    dec = p["decoder"]["decoder"]
    pad = (d.input_kernel - 1) // 2
    x = apply_conv1d(dec["embed"], x, padding=pad)
    x = apply_layer_norm(dec["norm"], x, eps=1e-6)
    for i in range(d.decoder_num_layers):
        blk = dec["convnext"][str(i)]
        h = apply_conv1d(blk["dwconv"], x, padding=(d.dw_kernel - 1) // 2,
                         groups=d.decoder_dim)
        h = apply_layer_norm(blk["norm"], h, eps=1e-6)
        h = apply_linear(blk["pwconv2"],
                         jax.nn.gelu(apply_linear(blk["pwconv1"], h),
                                     approximate=False))
        x = x + blk["gamma"] * h
    x = apply_layer_norm(dec["final_layer_norm"], x, eps=1e-6)

    h = apply_linear(p["decoder"]["head"]["out"], x)
    mag, phase = jnp.split(h, 2, axis=-1)
    mag = jnp.clip(jnp.exp(mag), None, 1e2)
    spec = mag * jnp.cos(phase) + 1j * (mag * jnp.sin(phase))
    from ....dsp import istft
    w = np.hanning(d.n_fft + 1)[:-1].astype(np.float32)
    audio = istft(spec[0], hop_length=d.hop_length, win_length=d.n_fft,
                  window=w, center=True)
    return audio[None]


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None
        self._stop_token_id: Optional[int] = None
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_soprano(key, self.config)

    # ------------------------------------------------- text handling

    @staticmethod
    def preprocess_text(text: str, min_length: int = 30) -> List[str]:
        """Sentence split + short-sentence merge -> prompts
        (reference _preprocess_text)."""
        cleaned = clean_text(text.strip())
        sentences = [s for s in re.split(r"(?<=[.!?])\s+", cleaned) if s]
        if min_length > 0 and len(sentences) > 1:
            merged: List[str] = []
            for s in sentences:
                if len(s) < min_length and merged:
                    merged[-1] = (merged[-1] + " " + s).strip()
                else:
                    merged.append(s)
            sentences = merged
        return [f"[STOP][TEXT]{s}[START]" for s in sentences]

    # ------------------------------------------------- compiled decode

    def _fns(self, bucket: int, max_tokens: int, temperature: float,
             top_p: float, stop_id: int):
        key_ = (bucket, max_tokens, temperature, top_p, stop_id)
        fns = self._jit_cache.get(key_)
        if fns is None:
            cfg = self.config
            cap = bucket + max_tokens
            sampler = make_sampler(temperature=temperature, top_p=top_p)

            def prefill(p, prompt, length):
                caches = [KVCache.init(1, cap, cfg.num_key_value_heads,
                                       cfg.head_dim, dtype=jnp.float32)
                          for _ in range(cfg.num_hidden_layers)]
                pad_mask = jnp.where(
                    jnp.arange(cap)[None, :] < length[:, None], 0.0,
                    jnp.finfo(jnp.float32).min)[:, None, None, :]
                logits, hidden, caches = lm_forward(
                    p, cfg, prompt, caches, jnp.int32(0), mask=pad_mask)
                last = jnp.take_along_axis(
                    hidden, (length - 1)[:, None, None]
                    .repeat(hidden.shape[-1], 2), axis=1)
                lg = jnp.take_along_axis(
                    logits, (length - 1)[:, None, None]
                    .repeat(logits.shape[-1], 2), axis=1)
                return lg[:, 0], last, caches

            def chunk(p, lg, caches, t0, rng, done):
                def body(carry, i):
                    lg, caches, key, done = carry
                    key, sub = jax.random.split(key)
                    tok = sampler(sub, lg).astype(jnp.int32)
                    is_stop = tok[0] == stop_id
                    done2 = jnp.logical_or(done, is_stop)
                    lg2, hidden, caches = lm_forward(
                        p, cfg, tok[:, None], caches, t0 + i)
                    out_tok = jnp.where(done2, -1, tok[0])
                    out_hid = jnp.where(done2, 0.0, hidden[:, 0])
                    return (lg2[:, 0], caches, key, done2), \
                        (out_tok, out_hid)

                (lg, caches, rng, done), (toks, hids) = jax.lax.scan(
                    body, (lg, caches, rng, done), jnp.arange(CHUNK))
                return lg, caches, rng, done, toks, hids

            fns = (jax.jit(prefill), jax.jit(chunk))
            self._jit_cache[key_] = fns
        return fns

    def _dec_fn(self, bucket: int):
        fn = self._jit_cache.get(("dec", bucket))
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, h, n: decode_hidden(p, cfg, h, n))
            self._jit_cache[("dec", bucket)] = fn
        return fn

    # --------------------------------------------------------- generate

    def generate(self, text: str, voice: Optional[str] = None,
                 temperature: float = 0.3, top_p: float = 0.95,
                 split_pattern: str = "\n", max_tokens: int = 512,
                 verbose: bool = False, seed: int = 0, **kwargs):
        if self._tokenizer is None:
            raise RuntimeError("soprano needs its HF tokenizer (place "
                               "tokenizer files in the model directory)")
        stop_id = self._stop_token_id
        if stop_id is None:
            ids = self._tokenizer.encode("[STOP]",
                                         add_special_tokens=False)
            stop_id = ids[0]
        # split_pattern segments first, then sentence preprocessing per
        # segment (reference soprano.py:388-392)
        pieces = [p for p in text.replace("\\n", "\n").split(split_pattern)
                  if p.strip()] if split_pattern else [text]
        prompts = [pr for piece in pieces
                   for pr in self.preprocess_text(piece)]
        for idx, prompt in enumerate(prompts):
            t0 = time.perf_counter()
            ids = np.asarray(self._tokenizer.encode(
                prompt, add_special_tokens=False), np.int32)
            n = len(ids)
            pb = next((b for b in PROMPT_BUCKETS if n <= b),
                      ((n + 255) // 256) * 256)
            padded = np.zeros((1, pb), np.int32)
            padded[0, :n] = ids
            prefill, chunk = self._fns(pb, max_tokens, temperature,
                                       top_p, int(stop_id))
            lg, hid0, caches = prefill(self.params, jnp.asarray(padded),
                                       jnp.asarray([n]))
            hiddens = [np.asarray(hid0)[:, 0]]
            rng = jax.random.PRNGKey(seed + idx)
            done = jnp.bool_(False)
            t = jnp.int32(n)
            count = 0
            while count < max_tokens:
                lg, caches, rng, done, toks, hids = chunk(
                    self.params, lg, caches, t, rng, done)
                t = t + CHUNK
                arr_t = np.asarray(toks)
                arr_h = np.asarray(hids)[:, :, 0, :] \
                    if np.asarray(hids).ndim == 4 else np.asarray(hids)
                keep = arr_t >= 0
                hiddens.extend(arr_h[i] for i in range(CHUNK) if keep[i])
                count += int(keep.sum())
                if bool(done):
                    break
            hidden_seq = np.stack(hiddens, axis=1)   # (1, L, C)
            L = hidden_seq.shape[1]
            # ISTFT output length is L-dependent; run the vocoder at the
            # exact L (one compile per distinct sentence length class)
            audio = np.asarray(self._dec_fn(L)(
                self.params, jnp.asarray(hidden_seq),
                jnp.asarray([L])))[0]
            dt = time.perf_counter() - t0
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=jnp.asarray(audio), samples=len(audio),
                sample_rate=self.sample_rate, segment_idx=idx,
                token_count=count, audio_duration=format_duration(dur),
                # reference reports elapsed/audio (soprano.py:454-457)
                real_time_factor=round(dt / dur, 2) if dur else 0.0,
                prompt={"tokens": n,
                        "tokens-per-sec": round(n / dt, 2) if dt else 0},
                audio_samples={"samples": len(audio),
                               "samples-per-sec":
                                   round(len(audio) / dt, 2) if dt else 0},
                processing_time_seconds=dt, peak_memory_usage=0.0)

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k.startswith("model."):
                k = k[len("model."):]
            if not k.startswith(("language_model.", "decoder.")):
                k = "language_model." + k
            if (".dwconv." in k or k.endswith("decoder.embed.weight")) \
                    and v.ndim == 3 and v.shape[0] > v.shape[-1]:
                # torch conv (O, I/g, K) -> WIO (out-channels lead)
                v = jnp.transpose(v, (2, 1, 0))
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        try:
            from transformers import AutoTokenizer
            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path))
            if model._tokenizer.pad_token_id is not None:
                model._stop_token_id = model._tokenizer.pad_token_id
            else:
                ids = model._tokenizer.encode("[STOP]",
                                              add_special_tokens=False)
                model._stop_token_id = ids[0] if ids else None
        except Exception:
            model._tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "DecoderConfig", "decode_hidden",
           "lm_forward", "init_soprano"]
