"""Moshi: full-duplex speech-to-speech LM over Mimi codes.

Parity: /root/reference/mlx_audio/sts/models/moshi (lm.py Lm :288 /
DepFormer :236, generate.py LmGen :14 step loop with per-codebook delays,
moshi.py wrapper, mimi_streamer.py). Architecture: one main temporal
transformer over summed [text + 16 audio-stream] embeddings; a small
depth transformer (DepFormer) autoregressively emits Moshi's own 8
codebooks conditioned on the step's hidden state; per-codebook delay
offsets stagger the streams.

TPU redesign: the step (main transformer + unrolled depformer slices +
sampling) is one jitted program with fixed-capacity caches; LmGen holds the
generated-token ring as host state and feeds the other speaker's codes in.
The audio path uses codec/models/mimi streaming encode/decode.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs

Array = jax.Array

MAX_STEPS = 2048


@dataclass
class TransformerDims:
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 8
    dim_feedforward: int = 2048
    context: int = 750
    max_period: float = 10000.0
    gating: bool = True


@dataclass
class DepFormerDims:
    d_model: int = 256
    num_heads: int = 8
    num_layers: int = 4
    dim_feedforward: int = 1024
    num_slices: int = 8


@dataclass
class LmConfig(BaseModelArgs):
    model_type: str = "moshi"
    transformer: TransformerDims = field(default_factory=TransformerDims)
    depformer: DepFormerDims = field(default_factory=DepFormerDims)
    text_in_vocab_size: int = 32001
    text_out_vocab_size: int = 32000
    audio_vocab_size: int = 2049
    audio_codebooks: int = 16
    audio_delays: List[int] = field(default_factory=lambda: [0] + [1] * 7
                                    + [0] + [1] * 7)
    sample_rate: int = 24000
    model_path: str = ""

    def __post_init__(self):
        if isinstance(self.transformer, dict):
            self.transformer = TransformerDims(**{
                k: v for k, v in self.transformer.items()
                if k in TransformerDims.__dataclass_fields__})
        if isinstance(self.depformer, dict):
            self.depformer = DepFormerDims(**{
                k: v for k, v in self.depformer.items()
                if k in DepFormerDims.__dataclass_fields__})

    @property
    def generated_codebooks(self) -> int:
        return self.depformer.num_slices

    @property
    def other_codebooks(self) -> int:
        return self.audio_codebooks - self.generated_codebooks

    @property
    def audio_padding_token(self) -> int:
        return self.audio_vocab_size - 1


def _init_block(ks, d: TransformerDims) -> dict:
    p = {
        "self_attn": {
            "in_proj": init_linear(next(ks), d.d_model, 3 * d.d_model,
                                   bias=False),
            "out_proj": init_linear(next(ks), d.d_model, d.d_model,
                                    bias=False),
        },
        "norm1": init_layer_norm(d.d_model),
        "norm2": init_layer_norm(d.d_model),
    }
    if d.gating:
        p["gating"] = {
            "linear_in": init_linear(next(ks), d.d_model,
                                     2 * d.dim_feedforward, bias=False),
            "linear_out": init_linear(next(ks), d.dim_feedforward,
                                      d.d_model, bias=False),
        }
    else:
        p["linear1"] = init_linear(next(ks), d.d_model, d.dim_feedforward,
                                   bias=False)
        p["linear2"] = init_linear(next(ks), d.dim_feedforward, d.d_model,
                                   bias=False)
    return p


def _block_forward(p, d: TransformerDims, x, positions, inv_freq, cache,
                   offset, window):
    b, t, _ = x.shape
    hd = d.d_model // d.num_heads
    h = apply_layer_norm(p["norm1"], x)
    qkv = apply_linear(p["self_attn"]["in_proj"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = apply_rope(q.reshape(b, t, d.num_heads, hd), positions, inv_freq)
    k = apply_rope(k.reshape(b, t, d.num_heads, hd), positions, inv_freq)
    v = v.reshape(b, t, d.num_heads, hd)
    if cache is not None:
        cache = kv_update(cache, k, v, offset)
        s = cache.k.shape[1]
        pos_s = jnp.arange(s)[None, None, None, :]
        q_pos = (offset + jnp.arange(t))[None, None, :, None]
        ok = (pos_s <= q_pos) & (pos_s > q_pos - window)
        out = attention(q, cache.k, cache.v, mask=jnp.where(ok, 0.0, -jnp.inf))
    else:
        q_pos = jnp.arange(t)[:, None]
        k_pos = jnp.arange(t)[None, :]
        ok = (k_pos <= q_pos) & (k_pos > q_pos - window)
        out = attention(q, k, v, mask=jnp.where(ok, 0.0, -jnp.inf)[None, None])
    x = x + apply_linear(p["self_attn"]["out_proj"],
                         out.reshape(b, t, d.d_model))
    h = apply_layer_norm(p["norm2"], x)
    if "gating" in p:
        gi = apply_linear(p["gating"]["linear_in"], h)
        a, bgate = jnp.split(gi, 2, axis=-1)
        h = apply_linear(p["gating"]["linear_out"], jax.nn.silu(a) * bgate)
    else:
        h = apply_linear(p["linear2"],
                         jax.nn.gelu(apply_linear(p["linear1"], h)))
    return x + h, cache


class Lm(FunctionalModel):
    """The Moshi language model (temporal transformer + depformer)."""

    def __init__(self, config: LmConfig):
        if isinstance(config, dict):
            config = LmConfig.from_dict(config)
        super().__init__(config)

    def init_params(self, key):
        c = self.config
        t, dp = c.transformer, c.depformer
        ks = iter(jax.random.split(key, 16 * (t.num_layers
                                              + dp.num_slices
                                              * (dp.num_layers + 3)) + 32))
        params = {
            "text_emb": init_embedding(next(ks), c.text_in_vocab_size,
                                       t.d_model),
            "audio_embs": {
                str(i): init_embedding(next(ks), c.audio_vocab_size,
                                       t.d_model)
                for i in range(c.audio_codebooks)
            },
            "transformer": {"layers": {
                str(i): _init_block(ks, t) for i in range(t.num_layers)}},
            "out_norm": init_layer_norm(t.d_model),
            "text_linear": init_linear(next(ks), t.d_model,
                                       c.text_out_vocab_size, bias=False),
            "depformer": {"slices": {}},
        }
        dp_dims = TransformerDims(d_model=dp.d_model, num_heads=dp.num_heads,
                                  num_layers=dp.num_layers,
                                  dim_feedforward=dp.dim_feedforward,
                                  context=dp.num_slices + 2, gating=True)
        self._dp_dims = dp_dims
        for s in range(dp.num_slices):
            in_vs = (c.text_in_vocab_size if s == 0 else c.audio_vocab_size)
            params["depformer"]["slices"][str(s)] = {
                "emb": init_embedding(next(ks), in_vs, dp.d_model),
                "linear_in": init_linear(next(ks), t.d_model, dp.d_model,
                                         bias=False),
                "linear_out": init_linear(next(ks), dp.d_model,
                                          c.audio_vocab_size - 1, bias=False),
                "transformer": {"layers": {
                    str(i): _init_block(ks, dp_dims)
                    for i in range(dp.num_layers)}},
            }
        return params

    @property
    def dp_dims(self) -> TransformerDims:
        if not hasattr(self, "_dp_dims"):
            dp = self.config.depformer
            self._dp_dims = TransformerDims(
                d_model=dp.d_model, num_heads=dp.num_heads,
                num_layers=dp.num_layers, dim_feedforward=dp.dim_feedforward,
                context=dp.num_slices + 2, gating=True)
        return self._dp_dims

    def make_caches(self, batch: int, dtype=jnp.float32):
        t = self.config.transformer
        hd = t.d_model // t.num_heads
        return [KVCache.init(batch, MAX_STEPS, t.num_heads, hd, dtype)
                for _ in range(t.num_layers)]

    def _main_step(self, params, embeds, caches, offset):
        t = self.config.transformer
        inv_freq = rope_freqs(t.d_model // t.num_heads, t.max_period)
        positions = offset + jnp.arange(embeds.shape[1])[None, :]
        x = embeds
        new_caches = []
        for i in range(t.num_layers):
            x, nc = _block_forward(params["transformer"]["layers"][str(i)],
                                   t, x, positions, inv_freq, caches[i],
                                   offset, t.context)
            new_caches.append(nc)
        x = apply_layer_norm(params["out_norm"], x)
        return x, new_caches

    def sample_step(self, params, text_token, audio_tokens, caches, offset,
                    key, text_temp: float = 0.7, audio_temp: float = 0.8):
        """One full-duplex step.

        text_token (B, 1); audio_tokens (B, n_codebooks) previous-step codes
        (own delayed + other stream). Returns (text_token, own_audio (B, S),
        new_caches, hidden).
        """
        c = self.config
        xs = apply_embedding(params["text_emb"], text_token)
        for i in range(c.audio_codebooks):
            xs = xs + apply_embedding(params["audio_embs"][str(i)],
                                      audio_tokens[:, i: i + 1])
        hidden, caches = self._main_step(params, xs, caches, offset)
        text_logits = apply_linear(params["text_linear"], hidden[:, -1])
        key, k0 = jax.random.split(key)
        text_next = self._sample(k0, text_logits, text_temp)
        # depformer: autoregress over slices with a fresh small cache
        dp = self.config.depformer
        dpd = self.dp_dims
        hd = dpd.d_model // dpd.num_heads
        b = text_token.shape[0]
        dp_caches = [KVCache.init(b, dp.num_slices + 2, dpd.num_heads, hd,
                                  hidden.dtype)
                     for _ in range(dpd.num_layers)]
        last = text_next
        inv_freq = rope_freqs(hd, dpd.max_period)
        own = []
        for s in range(dp.num_slices):
            sp = params["depformer"]["slices"][str(s)]
            xs = apply_linear(sp["linear_in"], hidden[:, -1:]) + \
                apply_embedding(sp["emb"], last[:, None])
            x = xs
            positions = jnp.full((b, 1), s, jnp.int32)
            new_dp = []
            for i in range(dpd.num_layers):
                x, nc = _block_forward(sp["transformer"]["layers"][str(i)],
                                       dpd, x, positions, inv_freq,
                                       dp_caches[i], jnp.int32(s),
                                       dpd.context)
                new_dp.append(nc)
            dp_caches = new_dp
            logits = apply_linear(sp["linear_out"], x[:, -1])
            key, kk = jax.random.split(key)
            last = self._sample(kk, logits, audio_temp)
            own.append(last)
        return text_next, jnp.stack(own, axis=-1), caches, key

    @staticmethod
    def _sample(key, logits, temperature):
        lg = logits.astype(jnp.float32)
        greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        drawn = jax.random.categorical(
            key, lg / jnp.maximum(temperature, 1e-6), axis=-1).astype(jnp.int32)
        return jnp.where(temperature <= 0.0, greedy, drawn)


class LmGen:
    """Streaming generation driver with per-codebook delays
    (reference generate.py:14-140)."""

    def __init__(self, model: Lm, max_steps: int = MAX_STEPS,
                 text_temp: float = 0.7, audio_temp: float = 0.8,
                 batch_size: int = 1, seed: int = 0):
        self.model = model
        self.cfg = model.config
        self.max_steps = max_steps
        self.text_temp = text_temp
        self.audio_temp = audio_temp
        self.B = batch_size
        ncb = 1 + self.cfg.audio_codebooks
        self.gen = np.full((batch_size, ncb, max_steps), -2, np.int32)
        self.step_idx = 0
        self.caches = model.make_caches(batch_size)
        self.key = jax.random.PRNGKey(seed)
        self.main = self.cfg.generated_codebooks
        self.delays = self.cfg.audio_delays
        self._jit = None

    def step(self, other_audio_tokens: np.ndarray) -> tuple:
        """Feed the other speaker's codes (B, other_codebooks); returns
        (text_token (B,), own_audio (B, S) or None until delays fill)."""
        cfg = self.cfg
        pad = cfg.audio_padding_token
        t = self.step_idx
        if t == 0:
            text_in = np.full((self.B, 1), cfg.text_out_vocab_size, np.int32)
        else:
            text_in = self.gen[:, 0, t - 1: t]
        self.gen[:, 1 + self.main:, t] = other_audio_tokens
        audio_in = np.full((self.B, cfg.audio_codebooks), pad, np.int32)
        for cb in range(cfg.audio_codebooks):
            delay = self.delays[cb]
            src_t = t - delay - (1 if cb < self.main else 0)
            if src_t >= 0:
                tok = self.gen[:, 1 + cb, src_t]
                audio_in[:, cb] = np.where(tok >= 0, tok, pad)
        if self._jit is None:
            self._jit = jax.jit(
                lambda p, tt, at, caches, off, key: self.model.sample_step(
                    p, tt, at, caches, off, key, self.text_temp,
                    self.audio_temp))
        text_next, own, self.caches, self.key = self._jit(
            self.model.params, jnp.asarray(text_in), jnp.asarray(audio_in),
            self.caches, jnp.int32(t), self.key)
        text_next = np.asarray(text_next)
        own = np.asarray(own)
        self.gen[:, 0, t] = text_next
        for cb in range(self.main):
            self.gen[:, 1 + cb, t] = own[:, cb]
        self.step_idx += 1
        max_delay = max(self.delays[: self.main], default=0)
        out_t = t - max_delay
        if out_t < 0:
            return text_next, None
        out = self.gen[:, 1: 1 + self.main, out_t]
        return text_next, out


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "moshi"
    lm_config: Optional[dict] = None
    mimi_num_codebooks: int = 8
    sample_rate: int = 24000
    model_path: str = ""


class Model(FunctionalModel):
    """Speech-to-speech wrapper: mimi encode -> Lm step loop -> mimi decode."""

    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.lm = Lm(LmConfig.from_dict(config.lm_config or {}))
        self.mimi = None  # bound by post_load_hook / caller

    def init_params(self, key):
        return {"lm": self.lm.init_params(key)}

    def bind(self, params, strict=False):
        super().bind(params, strict=strict)
        self.lm.bind(params["lm"])

    @property
    def sample_rate(self):
        return self.config.sample_rate

    def generate(self, audio, max_steps: Optional[int] = None, **kwargs):
        """Offline duplex run: user audio in -> (moshi audio, text tokens)."""
        if self.mimi is None:
            raise ValueError("Bind a Mimi codec to model.mimi first.")
        codes = np.asarray(self.mimi.encode(np.asarray(audio, np.float32)))
        n_steps = codes.shape[-1] if max_steps is None else min(
            codes.shape[-1], max_steps)
        other_cb = self.lm.config.other_codebooks
        gen = LmGen(self.lm, max_steps=max(n_steps + 8, 16), **{
            k: v for k, v in kwargs.items()
            if k in ("text_temp", "audio_temp", "seed")})
        own_frames = []
        texts = []
        for t in range(n_steps):
            other = codes[0, :other_cb, t][None]
            text_tok, own = gen.step(other)
            texts.append(int(text_tok[0]))
            if own is not None:
                own_frames.append(own[0])
        if own_frames:
            own_codes = np.stack(own_frames, axis=-1)[None]  # (1, S, T)
            own_codes = np.clip(own_codes, 0,
                                self.lm.config.audio_vocab_size - 2)
            audio_out = np.asarray(self.mimi.decode(own_codes))[0, 0]
        else:
            audio_out = np.zeros(0, np.float32)

        from ....tts.models.base import GenerationResult, format_duration

        dur = len(audio_out) / self.sample_rate
        return GenerationResult(
            audio=audio_out, samples=len(audio_out),
            sample_rate=self.sample_rate, segment_idx=0,
            token_count=len(texts), audio_duration=format_duration(dur),
            real_time_factor=0.0,
            prompt={"tokens": len(texts), "text_tokens": texts,
                    "tokens-per-sec": 0},
            audio_samples={"samples": len(audio_out), "samples-per-sec": 0},
            processing_time_seconds=0.0, peak_memory_usage=0.0,
            is_final_chunk=True)
