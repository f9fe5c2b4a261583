"""Bark: three-stage GPT text-to-audio (semantic -> coarse -> fine -> codec).

Parity: reference mlx_audio/tts/models/bark/bark.py — GPT blocks with
fused qkv, bias-free LayerNorm, learned positions (:120-341), FineGPT with
per-codebook embeddings summed up to the predicted book and tied lm heads
(:343-390), `merge_context` text+history prompt packing (:296-307), and
pipeline.py — semantic decode with early-stop on the SEMANTIC_PAD logit
(:122-209), sliding-window coarse decode with alternating codebook logit
ranges (:211-349), iterative non-causal fine infill over 1024-frame windows
(:351-420), encodec decode (isftnet.py:6-12), and the `h.N` -> `layers.N`
sanitize remap (:430-455).

TPU design: one functional GPT shared by the semantic/coarse stages with
fixed-capacity KV caches — each stage's token loop runs inside a single
`lax.while_loop` (semantic: early-stop flag in-graph; coarse: 60-step
windows as one compiled loop each, re-prefilled per window on a bucketed
prompt). The fine stage is already TPU-shaped: a fixed (1, 1024) non-causal
forward per codebook. Positions are clamped to block_size (the reference
indexes past the learned table when a long semantic rollout overruns it —
here it saturates instead of reading out of bounds).
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (apply_embedding, apply_layer_norm, apply_linear,
                    init_embedding, init_layer_norm, init_linear)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update
from ..base import GenerationResult, format_duration

Array = jax.Array

TEXT_ENCODING_OFFSET = 10_048
SEMANTIC_PAD_TOKEN = 10_000
TEXT_PAD_TOKEN = 129_595
SEMANTIC_INFER_TOKEN = 129_599
CONTEXT_WINDOW_SIZE = 1024
SEMANTIC_RATE_HZ = 49.9
SEMANTIC_VOCAB_SIZE = 10_000
CODEBOOK_SIZE = 1024
N_COARSE_CODEBOOKS = 2
N_FINE_CODEBOOKS = 8
COARSE_RATE_HZ = 75
COARSE_SEMANTIC_PAD_TOKEN = 12_048
COARSE_INFER_TOKEN = 12_050
SAMPLE_RATE = 24_000


@dataclass
class GPTConfig(BaseModelArgs):
    block_size: int = 1024
    input_vocab_size: int = 129_600
    output_vocab_size: int = 129_600
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    bias: bool = False
    model_type: str = "semantic"
    n_codes_total: int = 8
    n_codes_given: int = 1


@dataclass
class ModelConfig(BaseModelArgs):
    semantic_config: Optional[GPTConfig] = None
    coarse_acoustics_config: Optional[GPTConfig] = None
    fine_acoustics_config: Optional[GPTConfig] = None
    codec_config: Optional[dict] = None
    model_type: str = "bark"
    model_size: str = "base"
    codec_path: str = ""
    sample_rate: int = 24_000

    def __post_init__(self):
        def mk(v, **defaults):
            if isinstance(v, GPTConfig):
                return v
            d = dict(defaults)
            d.update(v or {})
            return GPTConfig.from_dict(d)

        self.semantic_config = mk(self.semantic_config)
        self.coarse_acoustics_config = mk(
            self.coarse_acoustics_config, input_vocab_size=12_096,
            output_vocab_size=12_096, model_type="coarse_acoustics")
        self.fine_acoustics_config = mk(
            self.fine_acoustics_config, input_vocab_size=1056,
            output_vocab_size=1056, model_type="fine_acoustics")


# ---------------------------------------------------------- shared GPT

def init_gpt(key, cfg: GPTConfig) -> dict:
    ks = iter(jax.random.split(key, 4 + 4 * cfg.n_layer))
    e = cfg.n_embd
    p = {
        "input_embeds_layer": init_embedding(next(ks),
                                             cfg.input_vocab_size, e),
        "position_embeds_layer": init_embedding(next(ks), cfg.block_size,
                                                e),
        "layers": {},
        "layernorm_final": init_layer_norm(e, bias=False),
        "lm_head": init_linear(next(ks), e, cfg.output_vocab_size,
                               bias=False),
    }
    for i in range(cfg.n_layer):
        p["layers"][str(i)] = {
            "layernorm_1": init_layer_norm(e, bias=False),
            "attn": {"att_proj": init_linear(next(ks), e, 3 * e,
                                             bias=cfg.bias),
                     "out_proj": init_linear(next(ks), e, e,
                                             bias=cfg.bias)},
            "layernorm_2": init_layer_norm(e, bias=False),
            "mlp": {"in_proj": init_linear(next(ks), e, 4 * e, bias=False),
                    "out_proj": init_linear(next(ks), 4 * e, e,
                                            bias=False)},
        }
    return p


def _qkv(p: dict, x: Array, n_head: int) -> Tuple[Array, Array, Array]:
    b, t, e = x.shape
    q, k, v = jnp.split(apply_linear(p["att_proj"], x), 3, axis=-1)
    hd = e // n_head
    return (q.reshape(b, t, n_head, hd), k.reshape(b, t, n_head, hd),
            v.reshape(b, t, n_head, hd))


def _embed_prompt(p: dict, cfg: GPTConfig, tokens: Array,
                  merge_context: bool) -> Array:
    if merge_context:
        # text(256) and history(256) share positions; their embeddings sum
        emb = apply_embedding(p["input_embeds_layer"], tokens[:, :256]) + \
            apply_embedding(p["input_embeds_layer"], tokens[:, 256:512])
        rest = apply_embedding(p["input_embeds_layer"], tokens[:, 512:])
        return jnp.concatenate([emb, rest], axis=1)
    return apply_embedding(p["input_embeds_layer"], tokens)


def gpt_prefill(p: dict, cfg: GPTConfig, tokens: Array, length: Array,
                caches: List[KVCache], merge_context: bool = False
                ) -> Tuple[Array, List[KVCache]]:
    """Prompt (B, S) with `length` valid tokens -> (logits at last valid
    position, caches). Padding sits at the tail; positions clamp to the
    learned table."""
    x = _embed_prompt(p, cfg, tokens, merge_context)
    b, t, e = x.shape
    pos = jnp.minimum(jnp.arange(t), cfg.block_size - 1)
    x = x + apply_embedding(p["position_embeds_layer"], pos)[None]

    valid = jnp.arange(t)[None, :] < length
    causal = jnp.tril(jnp.ones((t, t), bool))
    mask = jnp.where(causal[None, None] & valid[:, None, None, :],
                     0.0, jnp.finfo(jnp.float32).min)
    new_caches = []
    for i in range(cfg.n_layer):
        lp = p["layers"][str(i)]
        h = apply_layer_norm(lp["layernorm_1"], x)
        q, k, v = _qkv(lp["attn"], h, cfg.n_head)
        new_caches.append(kv_update(caches[i], k, v, jnp.int32(0)))
        o = attention(q, k, v, mask=mask)
        x = x + apply_linear(lp["attn"]["out_proj"],
                             o.reshape(b, t, e))
        h = apply_layer_norm(lp["layernorm_2"], x)
        h = apply_linear(lp["mlp"]["out_proj"],
                         jax.nn.gelu(apply_linear(lp["mlp"]["in_proj"], h), approximate=False))
        x = x + h
    x = apply_layer_norm(p["layernorm_final"], x)
    last = jnp.take_along_axis(
        x, jnp.reshape(length - 1, (b, 1, 1)).astype(jnp.int32)
        .repeat(e, axis=2), axis=1)
    return apply_linear(p["lm_head"], last)[:, 0], new_caches


def gpt_step(p: dict, cfg: GPTConfig, token: Array, t: Array,
             caches: List[KVCache]) -> Tuple[Array, List[KVCache]]:
    """One cached decode step: token (B, 1) written at cache column t."""
    x = apply_embedding(p["input_embeds_layer"], token)
    pos = jnp.minimum(t, cfg.block_size - 1)
    x = x + apply_embedding(p["position_embeds_layer"],
                            jnp.reshape(pos, (1,)))[None]
    b = x.shape[0]
    new_caches = []
    for i in range(cfg.n_layer):
        lp = p["layers"][str(i)]
        h = apply_layer_norm(lp["layernorm_1"], x)
        q, k, v = _qkv(lp["attn"], h, cfg.n_head)
        cache = kv_update(caches[i], k, v, t)
        new_caches.append(cache)
        o = decode_attention(q, cache.k, cache.v, t + 1)
        x = x + apply_linear(lp["attn"]["out_proj"],
                             o.reshape(b, 1, -1))
        h = apply_layer_norm(lp["layernorm_2"], x)
        h = apply_linear(lp["mlp"]["out_proj"],
                         jax.nn.gelu(apply_linear(lp["mlp"]["in_proj"], h), approximate=False))
        x = x + h
    x = apply_layer_norm(p["layernorm_final"], x)
    return apply_linear(p["lm_head"], x)[:, 0], new_caches


# ------------------------------------------------------------ fine GPT

def init_fine_gpt(key, cfg: GPTConfig) -> dict:
    ks = iter(jax.random.split(key, 4 + cfg.n_codes_total + 4 * cfg.n_layer))
    e = cfg.n_embd
    p = {"input_embeds_layers": {
            str(i): init_embedding(next(ks), cfg.input_vocab_size, e)
            for i in range(cfg.n_codes_total)},
         "position_embeds_layer": init_embedding(next(ks), cfg.block_size,
                                                 e),
         "layers": {}, "layernorm_final": init_layer_norm(e),
         "lm_heads": {}}
    for i in range(cfg.n_codes_total - cfg.n_codes_given):
        # tied to input_embeds_layers[i + 1] (reference bark.py:361-363)
        p["lm_heads"][str(i)] = {
            "weight": p["input_embeds_layers"][str(i + 1)]["weight"]}
    for i in range(cfg.n_layer):
        p["layers"][str(i)] = {
            "layernorm_1": init_layer_norm(e),
            "attn": {"att_proj": init_linear(next(ks), e, 3 * e,
                                             bias=cfg.bias),
                     "out_proj": init_linear(next(ks), e, e,
                                             bias=cfg.bias)},
            "layernorm_2": init_layer_norm(e),
            "mlp": {"in_proj": init_linear(next(ks), e, 4 * e, bias=False),
                    "out_proj": init_linear(next(ks), 4 * e, e,
                                            bias=False)},
        }
    return p


def fine_gpt_forward(p: dict, cfg: GPTConfig, pred_idx: int,
                     codes: Array) -> Array:
    """codes (B, T, n_codes_total) -> logits (B, T, vocab) for codebook
    pred_idx, non-causal; embeddings of books 0..pred_idx summed."""
    b, t, _ = codes.shape
    x = jnp.zeros((b, t, cfg.n_embd))
    for i in range(pred_idx + 1):
        x = x + apply_embedding(p["input_embeds_layers"][str(i)],
                                codes[:, :, i])
    pos = jnp.arange(t)
    x = x + apply_embedding(p["position_embeds_layer"], pos)[None]
    for i in range(cfg.n_layer):
        lp = p["layers"][str(i)]
        h = apply_layer_norm(lp["layernorm_1"], x)
        q, k, v = _qkv(lp["attn"], h, cfg.n_head)
        o = attention(q, k, v)
        x = x + apply_linear(lp["attn"]["out_proj"], o.reshape(b, t, -1))
        h = apply_layer_norm(lp["layernorm_2"], x)
        h = apply_linear(lp["mlp"]["out_proj"],
                         jax.nn.gelu(apply_linear(lp["mlp"]["in_proj"], h), approximate=False))
        x = x + h
    x = apply_layer_norm(p["layernorm_final"], x)
    w = p["lm_heads"][str(pred_idx - cfg.n_codes_given)]["weight"]
    return x @ w.T


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
        self._codec = None
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "semantic": init_gpt(k1, self.config.semantic_config),
            "coarse_acoustics": init_gpt(k2,
                                         self.config.coarse_acoustics_config),
            "fine_acoustics": init_fine_gpt(
                k3, self.config.fine_acoustics_config),
        }

    # ------------------------------------------------- compiled stages

    def _semantic_fn(self, max_steps: int):
        key_ = ("sem", max_steps)
        fn = self._jit_cache.get(key_)
        if fn is None:
            cfg = self.config.semantic_config
            cap = 513 + max_steps

            def run(p, prompt, rng, temperature):
                caches = [KVCache.init(1, cap, cfg.n_head,
                                       cfg.n_embd // cfg.n_head,
                                       dtype=jnp.float32)
                          for _ in range(cfg.n_layer)]
                logits, caches = gpt_prefill(
                    p["semantic"], cfg, prompt, jnp.asarray([513]), caches,
                    merge_context=True)
                tokens0 = jnp.zeros((max_steps,), jnp.int32)

                def sample(lg, key):
                    rel = lg[0, :SEMANTIC_VOCAB_SIZE]
                    stop = lg[0, SEMANTIC_PAD_TOKEN]
                    full = jnp.concatenate([rel, stop[None]]) / temperature
                    return jax.random.categorical(key, full)

                def cond(st):
                    i, _, _, _, _, done = st
                    return jnp.logical_and(i < max_steps,
                                           jnp.logical_not(done))

                def body(st):
                    i, lg, caches, toks, key, done = st
                    key, sub = jax.random.split(key)
                    nxt = sample(lg, sub).astype(jnp.int32)
                    is_stop = nxt == SEMANTIC_VOCAB_SIZE
                    toks = jnp.where(is_stop, toks, toks.at[i].set(nxt))
                    lg2, caches = gpt_step(
                        p["semantic"], cfg, nxt[None, None],
                        jnp.int32(513) + i, caches)
                    return (i + 1, lg2, caches, toks, key,
                            jnp.logical_or(done, is_stop))

                i, _, _, toks, _, done = jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(0), logits, caches, tokens0, rng,
                     jnp.bool_(False)))
                count = jnp.where(done, i - 1, i)
                return toks, count

            fn = jax.jit(run)
            self._jit_cache[key_] = fn
        return fn

    def _coarse_window_fn(self, steps: int):
        key_ = ("coarse", steps)
        fn = self._jit_cache.get(key_)
        if fn is None:
            cfg = self.config.coarse_acoustics_config
            plen = 256 + 1 + 60          # semantic ctx + infer + history cap
            cap = plen + steps

            def run(p, prompt, length, start_major, n_valid_steps, rng,
                    temperature):
                caches = [KVCache.init(1, cap, cfg.n_head,
                                       cfg.n_embd // cfg.n_head,
                                       dtype=jnp.float32)
                          for _ in range(cfg.n_layer)]
                logits, caches = gpt_prefill(p["coarse_acoustics"], cfg,
                                             prompt, length[None], caches)

                def body(carry, i):
                    lg, caches, key = carry
                    key, sub = jax.random.split(key)
                    is_major = (start_major + i) % N_COARSE_CODEBOOKS == 0
                    lo = SEMANTIC_VOCAB_SIZE + jnp.where(is_major, 0,
                                                         CODEBOOK_SIZE)
                    shifted = jax.lax.dynamic_slice(
                        lg[0], (0,), (lg.shape[1],))
                    idx = jnp.arange(lg.shape[1])
                    rel = jnp.where(
                        (idx >= lo) & (idx < lo + CODEBOOK_SIZE),
                        lg[0], -jnp.inf) / temperature
                    nxt = jax.random.categorical(key=sub, logits=rel) \
                        .astype(jnp.int32)
                    lg2, caches = gpt_step(
                        p["coarse_acoustics"], cfg, nxt[None, None],
                        length + i, caches)
                    return (lg2, caches, key), nxt

                (_, _, _), toks = jax.lax.scan(
                    body, (logits, caches, rng), jnp.arange(steps))
                return toks

            fn = jax.jit(run)
            self._jit_cache[key_] = fn
        return fn

    def _fine_fn(self, pred_idx: int):
        key_ = ("fine", pred_idx)
        fn = self._jit_cache.get(key_)
        if fn is None:
            cfg = self.config.fine_acoustics_config
            fn = jax.jit(lambda p, codes: fine_gpt_forward(
                p["fine_acoustics"], cfg, pred_idx, codes))
            self._jit_cache[key_] = fn
        return fn

    # ------------------------------------------------------- pipeline

    def _encode_text(self, text: str) -> np.ndarray:
        if self._tokenizer is None:
            raise RuntimeError(
                "bark requires a BERT tokenizer; place tokenizer files in "
                "the model directory (loaded by post_load_hook) or set "
                "model._tokenizer")
        ids = np.asarray(self._tokenizer.encode(
            text, add_special_tokens=False)) + TEXT_ENCODING_OFFSET
        ids = ids[:256]
        return np.pad(ids, (0, 256 - len(ids)),
                      constant_values=TEXT_PAD_TOKEN)

    def generate_semantic(self, text: str, voice: Optional[dict] = None,
                          temperature: float = 0.7, max_steps: int = 512,
                          seed: int = 0) -> np.ndarray:
        enc = self._encode_text(text)
        if voice is not None and "semantic_prompt" in voice:
            hist = np.asarray(voice["semantic_prompt"])[-256:]
            hist = np.pad(hist, (0, 256 - len(hist)),
                          constant_values=SEMANTIC_PAD_TOKEN)
        else:
            hist = np.full(256, SEMANTIC_PAD_TOKEN)
        prompt = np.concatenate(
            [enc, hist, [SEMANTIC_INFER_TOKEN]])[None].astype(np.int32)
        toks, count = self._semantic_fn(max_steps)(
            self.params, jnp.asarray(prompt), jax.random.PRNGKey(seed),
            jnp.float32(temperature))
        return np.asarray(toks)[: int(count)]

    def generate_coarse(self, semantic: np.ndarray,
                        voice: Optional[dict] = None,
                        temperature: float = 0.7,
                        max_coarse_history: int = 60,
                        sliding_window_len: int = 60,
                        seed: int = 1) -> np.ndarray:
        ratio = COARSE_RATE_HZ / SEMANTIC_RATE_HZ * N_COARSE_CODEBOOKS
        max_sem_hist = int(math.floor(max_coarse_history / ratio))
        if voice is not None and "coarse_prompt" in voice:
            sem_hist = np.asarray(voice["semantic_prompt"])
            coarse_hist = np.asarray(voice["coarse_prompt"]).copy()
            for n in range(1, N_COARSE_CODEBOOKS):
                coarse_hist[n] += CODEBOOK_SIZE * n
            coarse_hist = coarse_hist.T.reshape(-1) + SEMANTIC_VOCAB_SIZE
            n_sem = min(max_sem_hist, len(sem_hist) - len(sem_hist) % 2,
                        int(math.floor(len(coarse_hist) / ratio)))
            n_coarse = int(round(n_sem * ratio))
            sem_hist = sem_hist[-n_sem:].astype(np.int32)
            coarse_hist = coarse_hist[-n_coarse:][:-2].astype(np.int32)
        else:
            sem_hist = np.zeros(0, np.int32)
            coarse_hist = np.zeros(0, np.int32)

        n_steps = int(round(math.floor(
            len(semantic) * ratio / N_COARSE_CODEBOOKS))
            * N_COARSE_CODEBOOKS)
        x_semantic = np.concatenate([sem_hist, semantic]).astype(np.int32)
        x_coarse = coarse_hist.tolist()
        base_idx = len(sem_hist)
        rng = np.random.RandomState(seed)
        n_step = 0
        while n_step < n_steps:
            sem_idx = base_idx + int(round(n_step / ratio))
            seg = x_semantic[max(0, sem_idx - max_sem_hist):][:256]
            seg = np.pad(seg, (0, 256 - len(seg)),
                         constant_values=COARSE_SEMANTIC_PAD_TOKEN)
            hist = np.asarray(x_coarse[-max_coarse_history:], np.int32)
            prompt = np.full(256 + 1 + 60, COARSE_SEMANTIC_PAD_TOKEN,
                             np.int32)
            prompt[:256] = seg
            prompt[256] = COARSE_INFER_TOKEN
            prompt[257: 257 + len(hist)] = hist
            plen = 257 + len(hist)
            steps = min(sliding_window_len, n_steps - n_step)
            toks = self._coarse_window_fn(sliding_window_len)(
                self.params, jnp.asarray(prompt[None]), jnp.int32(plen),
                jnp.int32(n_step % N_COARSE_CODEBOOKS), jnp.int32(steps),
                jax.random.PRNGKey(int(rng.randint(1 << 30))),
                jnp.float32(temperature))
            x_coarse.extend(np.asarray(toks)[:steps].tolist())
            n_step += steps

        gen = np.asarray(x_coarse[len(coarse_hist):], np.int64)
        arr = gen.reshape(-1, N_COARSE_CODEBOOKS).T - SEMANTIC_VOCAB_SIZE
        for n in range(1, N_COARSE_CODEBOOKS):
            arr[n] -= n * CODEBOOK_SIZE
        return arr

    def generate_fine(self, coarse: np.ndarray,
                      temperature: Optional[float] = 0.7,
                      seed: int = 2) -> np.ndarray:
        cfg = self.config.fine_acoustics_config
        n_fine = getattr(cfg, "n_codes_total", None) or N_FINE_CODEBOOKS
        cs = min(CODEBOOK_SIZE, cfg.output_vocab_size)
        ctx = min(1024, cfg.block_size)
        hop = ctx // 2
        n_coarse = coarse.shape[0]
        t_total = coarse.shape[1]
        in_arr = np.vstack([
            coarse,
            np.full((n_fine - n_coarse, t_total), cs),
        ]).astype(np.int32)
        n_remove = 0
        if in_arr.shape[1] < ctx:
            n_remove = ctx - in_arr.shape[1]
            in_arr = np.pad(in_arr, ((0, 0), (0, n_remove)),
                            constant_values=cs)
        in_arr = in_arr.T                           # (T, n_fine)
        n_loops = max(0, int(math.ceil((t_total - ctx) / hop))) + 1
        rng = np.random.RandomState(seed)
        for n in range(n_loops):
            start = min(n * hop, in_arr.shape[0] - ctx)
            start_fill = min(n * hop, in_arr.shape[0] - hop)
            rel = start_fill - start
            buf = in_arr[start: start + ctx][None]
            for nn in range(n_coarse, n_fine):
                logits = np.asarray(self._fine_fn(nn)(
                    self.params, jnp.asarray(buf)))
                rel_logits = logits[0, :, :cs]
                if temperature is None:
                    preds = rel_logits[rel:].argmax(-1)
                else:
                    z = rel_logits[rel:] / temperature
                    z = z - z.max(-1, keepdims=True)
                    pz = np.exp(z)
                    pz /= pz.sum(-1, keepdims=True)
                    preds = np.asarray(
                        [rng.choice(cs, p=row) for row in pz])
                buf[0, rel:, nn] = preds
                in_arr[start_fill: start_fill + ctx - rel, nn] = \
                    buf[0, rel:, nn]
        out = in_arr.T
        if n_remove:
            out = out[:, :-n_remove]
        return out

    def codec_decode(self, fine: np.ndarray) -> np.ndarray:
        if self._codec is None:
            raise RuntimeError(
                "no codec bound; set model._codec to an Encodec instance")
        audio = self._codec.decode(jnp.asarray(fine[None]))
        return np.asarray(audio).reshape(-1)

    def generate(self, text: str, voice=None, temperature: float = 0.7,
                 max_semantic_steps: int = 512, **kwargs):
        t0 = time.time()
        if isinstance(voice, str) and voice.endswith(".npz"):
            voice = dict(np.load(voice))
        semantic = self.generate_semantic(
            text, voice, temperature, max_steps=max_semantic_steps)
        coarse = self.generate_coarse(semantic, voice, temperature)
        fine = self.generate_fine(coarse, temperature)
        audio = self.codec_decode(fine)
        dt = time.time() - t0
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=int(semantic.shape[0]),
            audio_duration=format_duration(dur),
            real_time_factor=round(dt / dur, 2) if dur else 0.0,
            prompt={"tokens": int(semantic.shape[0]),
                    "tokens-per-sec": round(semantic.shape[0] / dt, 2)
                    if dt else 0.0},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)
                           if dt else 0.0},
            processing_time_seconds=dt, peak_memory_usage=0.0)

    # loading -----------------------------------------------------------

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            k = k.replace("_orig_mod.transformer.", "")
            k = k.replace("_orig_mod.", "")
            k = re.sub(r"(^|\.)h\.(\d+)\.", r"\1layers.\2.", k)
            if "codec" in k:
                continue
            if k.endswith(".attn.bias") and getattr(v, "ndim", 0) > 1:
                continue  # HF registers the causal mask as a buffer
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        from pathlib import Path
        model_path = Path(model_path)
        try:
            from transformers import BertTokenizer
            model._tokenizer = BertTokenizer.from_pretrained(
                str(model_path))
        except Exception:
            try:
                from transformers import BertTokenizer
                model._tokenizer = BertTokenizer.from_pretrained(
                    "bert-base-multilingual-cased")
            except Exception:
                model._tokenizer = None
        codec_path = model.config.codec_path
        if codec_path:
            try:
                from ....utils import base_load_model
                model._codec = base_load_model(
                    codec_path, category="codec",
                    model_remapping={"encodec": "encodec"})
            except Exception:
                model._codec = None
        return model


__all__ = ["Model", "ModelConfig", "GPTConfig", "init_gpt", "gpt_prefill",
           "gpt_step", "init_fine_gpt", "fine_gpt_forward"]
