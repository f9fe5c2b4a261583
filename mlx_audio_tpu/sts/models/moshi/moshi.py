"""Moshi: full-duplex speech-to-speech LM over Mimi codes.

Parity: /root/reference/mlx_audio/sts/models/moshi (lm.py Lm:288 /
DepFormer:236 / ScaledEmbedding:149 / LmConfig.from_config_dict:53,
modules/transformer.py TransformerLayer:189 (RMSNorm eps 1e-8, traditional
RoPE base max_period, MlpGating hidden = 11d/4 when ff==4d else 2ff/3),
generate.py LmGen:14 step loop with per-codebook delays and stream
undelaying, moshi.py wrapper). Architecture: one main temporal transformer
over summed [text + audio-stream] embeddings; a small depth transformer
(DepFormer, no positional embedding) autoregressively emits Moshi's own
codebooks conditioned on the step's hidden state; per-codebook delay
offsets stagger the streams.

TPU redesign: the step (main transformer + unrolled depformer slices +
sampling) is one jitted program with fixed-capacity caches; LmGen holds the
generated-token ring as host state and feeds the other speaker's codes in.
The audio path uses codec/models/mimi streaming encode/decode.

Checkpoint layouts accepted by ``sanitize``:
  - kyutai MLX (kyutai/moshiko-mlx-bf16: ``out_norm.weight``,
    ``transformer.layers.N...``, ``depformer.slices.S...``),
  - kyutai PyTorch (kyutai/moshiko-pytorch-bf16: ``.alpha`` norms,
    ``emb.N.weight``, ``depformer_in.N`` / ``linears.N`` and per-slice
    chunked depformer attention, reference lm.py:332 load_pytorch_weights),
  - HF transformers Moshi (kmhf/hf-moshiko: ``decoder.model.layers...``
    with split q/k/v/o and half-split RoPE -> un-permuted to interleaved,
    ``depth_decoder.*`` FlexibleLinear stacks).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_layer_norm,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_layer_norm,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs
from ....ops.sampling import top_k_top_p_filter

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
    norm: str = "rms_norm"  # "rms_norm" (eps 1e-8) | "layer_norm" (eps 1e-5)
    positional_embedding: str = "rope"  # "rope" (traditional) | "none"
    layer_scale: Optional[float] = None
    bias_ff: bool = False
    bias_attn: bool = False
    hidden: Optional[int] = None  # gating MLP hidden; None -> kyutai rule

    @property
    def gating_hidden(self) -> int:
        """Reference modules/transformer.py MlpGating:160-166."""
        if self.hidden is not None:
            return self.hidden
        if self.dim_feedforward == 4 * self.d_model:
            return 11 * self.d_model // 4
        return 2 * self.dim_feedforward // 3


@dataclass
class DepFormerDims:
    d_model: int = 256
    num_heads: int = 8
    num_layers: int = 4
    dim_feedforward: int = 1024
    num_slices: int = 8
    context: Optional[int] = None  # None -> num_slices
    max_period: float = 10000.0
    positional_embedding: str = "none"
    weights_per_step_schedule: Optional[List[int]] = None
    low_rank_embeddings: Optional[int] = None
    hidden: Optional[int] = None


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
    demux_second_stream: bool = False
    extra_heads_num_heads: int = 0
    extra_heads_dim: int = 6
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

    @classmethod
    def from_dict(cls, d: dict) -> "LmConfig":
        if "dim" in d and "transformer" not in d:
            return cls.from_config_dict(d)
        return super().from_dict(d)

    @classmethod
    def from_config_dict(cls, data: dict) -> "LmConfig":
        """Kyutai raw config.json schema (reference lm.py:53-138)."""
        transformer = TransformerDims(
            d_model=data["dim"],
            num_heads=data["num_heads"],
            num_layers=data["num_layers"],
            dim_feedforward=4 * data["dim"],
            context=data["context"],
            max_period=data["max_period"],
            gating=True,
            norm="rms_norm",
            positional_embedding=data.get("positional_embedding", "rope"),
            layer_scale=data.get("layer_scale"),
        )
        depformer = DepFormerDims(
            d_model=data["depformer_dim"],
            num_heads=data["depformer_num_heads"],
            num_layers=data["depformer_num_layers"],
            dim_feedforward=data["depformer_dim_feedforward"],
            num_slices=data["dep_q"],
            context=data.get("depformer_context", data["dep_q"]),
            max_period=data.get("depformer_max_period", 8),
            positional_embedding=data.get("depformer_pos_emb", "none"),
            weights_per_step_schedule=data.get(
                "depformer_weights_per_step_schedule"),
            low_rank_embeddings=data.get("depformer_low_rank_embeddings"),
        )
        return cls(
            transformer=transformer,
            depformer=depformer,
            text_in_vocab_size=data["text_card"] + 1,
            text_out_vocab_size=data["text_card"],
            audio_vocab_size=data["card"] + 1,
            audio_codebooks=data["n_q"],
            # the first delay is for the text token
            audio_delays=data["delays"][1:],
            demux_second_stream=data.get("demux_second_stream", False),
            extra_heads_dim=data.get("extra_heads_dim", 6),
            extra_heads_num_heads=data.get("extra_heads_num_heads", 0),
        )

    @property
    def generated_codebooks(self) -> int:
        return self.depformer.num_slices

    @property
    def other_codebooks(self) -> int:
        return self.audio_codebooks - self.generated_codebooks

    @property
    def audio_padding_token(self) -> int:
        return self.audio_vocab_size - 1

    @property
    def audio_eos_token(self) -> int:
        return self.audio_vocab_size - 2


def config_v0_1() -> dict:
    """Moshiko/Moshika v0.1 7B (reference lm.py:670-729)."""
    return dict(
        transformer=dict(d_model=4096, num_heads=32, num_layers=32,
                         dim_feedforward=4 * 4096, context=3000,
                         max_period=10000.0),
        depformer=dict(d_model=1024, num_heads=16, num_layers=6,
                       dim_feedforward=4 * 1024, num_slices=8, context=8),
        text_in_vocab_size=32001, text_out_vocab_size=32000,
        audio_vocab_size=2049, audio_codebooks=16,
        audio_delays=([0] + [1] * 7) * 2)


def config1b_202412() -> dict:
    """Hibiki-class 1B (reference lm.py:546-605)."""
    return dict(
        transformer=dict(d_model=2048, num_heads=16, num_layers=16,
                         dim_feedforward=4 * 2048, context=3000,
                         max_period=100000.0),
        depformer=dict(d_model=1024, num_heads=16, num_layers=6,
                       dim_feedforward=4 * 1024, num_slices=8, context=8),
        text_in_vocab_size=48001, text_out_vocab_size=48000,
        audio_vocab_size=2049, audio_codebooks=16,
        audio_delays=([0] + [2] * 7) * 2)


LM_PRESETS = {"v0_1": config_v0_1, "1b_202412": config1b_202412}


# ---------------------------------------------------------------------------
# Scaled embedding (reference lm.py:149-207)
# ---------------------------------------------------------------------------

def apply_scaled_embedding(p: dict, ids: Array, num_embeddings: int,
                           demux: bool = False) -> Array:
    """Embedding with zero_idx=-1 -> exact zeros, optional low-rank factor
    and optional second-stream demux (``tok2 * card + tok1``)."""
    is_zero = (ids == -1)[..., None]
    idx = jnp.maximum(ids, 0)
    if demux:
        left = idx % num_embeddings
        right = idx // num_embeddings - 1
        right_zero = (right < 0)[..., None]
        y_l = apply_linear(p["out1"], jnp.take(p["weight"], left, axis=0))
        y_r = apply_linear(
            p["out2"], jnp.take(p["weight"], jnp.maximum(right, 0), axis=0))
        y = y_l + jnp.where(right_zero, 0.0, y_r)
    else:
        y = jnp.take(p["weight"], idx, axis=0)
        if "low_rank" in p:
            y = apply_linear(p["low_rank"], y)
    return jnp.where(is_zero, 0.0, y)


# ---------------------------------------------------------------------------
# Transformer block
# ---------------------------------------------------------------------------

def _init_block(ks, d: TransformerDims) -> dict:
    p = {
        "self_attn": {
            "in_proj": init_linear(next(ks), d.d_model, 3 * d.d_model,
                                   bias=d.bias_attn),
            "out_proj": init_linear(next(ks), d.d_model, d.d_model,
                                    bias=d.bias_attn),
        },
        "norm1": init_rms_norm(d.d_model),
        "norm2": init_rms_norm(d.d_model),
    }
    if d.norm == "layer_norm":
        p["norm1"] = init_layer_norm(d.d_model)
        p["norm2"] = init_layer_norm(d.d_model)
    if d.layer_scale is not None:
        p["layer_scale_1"] = {"scale": jnp.full((d.d_model,), d.layer_scale)}
        p["layer_scale_2"] = {"scale": jnp.full((d.d_model,), d.layer_scale)}
    if d.gating:
        h = d.gating_hidden
        p["gating"] = {
            "linear_in": init_linear(next(ks), d.d_model, 2 * h,
                                     bias=d.bias_ff),
            "linear_out": init_linear(next(ks), h, d.d_model, bias=d.bias_ff),
        }
    else:
        p["linear1"] = init_linear(next(ks), d.d_model, d.dim_feedforward,
                                   bias=d.bias_ff)
        p["linear2"] = init_linear(next(ks), d.dim_feedforward, d.d_model,
                                   bias=d.bias_ff)
    return p


def _norm(p, d: TransformerDims, x):
    if d.norm == "layer_norm":
        return apply_layer_norm(p, x, eps=1e-5)
    return apply_rms_norm(p, x, eps=1e-8)


def _block_forward(p, d: TransformerDims, x, positions, inv_freq, cache,
                   offset, context):
    b, t, _ = x.shape
    hd = d.d_model // d.num_heads
    h = _norm(p["norm1"], d, x)
    qkv = apply_linear(p["self_attn"]["in_proj"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, d.num_heads, hd)
    k = k.reshape(b, t, d.num_heads, hd)
    v = v.reshape(b, t, d.num_heads, hd)
    if d.positional_embedding == "rope":
        # kyutai uses mlx nn.RoPE(traditional=True) = interleaved pairs
        q = apply_rope(q, positions, inv_freq, interleaved=True)
        k = apply_rope(k, positions, inv_freq, interleaved=True)
    if cache is not None:
        cache = kv_update(cache, k, v, offset)
        s = cache.k.shape[1]
        pos_s = jnp.arange(s)[None, None, None, :]
        q_pos = (offset + jnp.arange(t))[None, None, :, None]
        # reference keeps `context` previous keys + the current one
        # (transformer.py:147-152 k_target_len trim)
        ok = (pos_s <= q_pos) & (pos_s >= q_pos - context)
        out = attention(q, cache.k, cache.v, mask=jnp.where(ok, 0.0, -jnp.inf))
    else:
        q_pos = jnp.arange(t)[:, None]
        k_pos = jnp.arange(t)[None, :]
        ok = (k_pos <= q_pos) & (k_pos >= q_pos - context)
        out = attention(q, k, v, mask=jnp.where(ok, 0.0, -jnp.inf)[None, None])
    upd = apply_linear(p["self_attn"]["out_proj"], out.reshape(b, t, d.d_model))
    if "layer_scale_1" in p:
        upd = upd * p["layer_scale_1"]["scale"]
    x = x + upd
    h = _norm(p["norm2"], d, x)
    if "gating" in p:
        gi = apply_linear(p["gating"]["linear_in"], h)
        a, bgate = jnp.split(gi, 2, axis=-1)
        h = apply_linear(p["gating"]["linear_out"], jax.nn.silu(a) * bgate)
    else:
        h = apply_linear(p["linear2"],
                         jax.nn.gelu(apply_linear(p["linear1"], h)))
    if "layer_scale_2" in p:
        h = h * p["layer_scale_2"]["scale"]
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
                                              * (dp.num_layers + 3)) + 48))
        text_emb = init_embedding(next(ks), c.text_in_vocab_size, t.d_model)
        if c.demux_second_stream:
            text_emb["out1"] = init_linear(next(ks), t.d_model, t.d_model,
                                           bias=False)
            text_emb["out2"] = init_linear(next(ks), t.d_model, t.d_model,
                                           bias=False)
        params = {
            "text_emb": text_emb,
            "audio_embs": {
                str(i): init_embedding(next(ks), c.audio_vocab_size,
                                       t.d_model)
                for i in range(c.audio_codebooks)
            },
            "transformer": {"layers": {
                str(i): _init_block(ks, t) for i in range(t.num_layers)}},
            "out_norm": (init_rms_norm(t.d_model) if t.norm == "rms_norm"
                         else init_layer_norm(t.d_model)),
            "text_linear": init_linear(next(ks), t.d_model,
                                       c.text_out_vocab_size, bias=False),
            "depformer": {"slices": {}},
        }
        if c.extra_heads_num_heads:
            params["extra_heads"] = {
                str(i): init_linear(next(ks), t.d_model, c.extra_heads_dim,
                                    bias=False)
                for i in range(c.extra_heads_num_heads)}
        dpd = self.dp_dims
        lr = dp.low_rank_embeddings
        for s in range(dp.num_slices):
            in_vs = (c.text_in_vocab_size if s == 0 else c.audio_vocab_size)
            emb = init_embedding(next(ks), in_vs, lr or dp.d_model)
            if lr is not None:
                emb["low_rank"] = init_linear(next(ks), lr, dp.d_model,
                                              bias=False)
            params["depformer"]["slices"][str(s)] = {
                "emb": emb,
                "linear_in": init_linear(next(ks), t.d_model, dp.d_model,
                                         bias=False),
                "linear_out": init_linear(next(ks), dp.d_model,
                                          c.audio_vocab_size - 1, bias=False),
                "transformer": {"layers": {
                    str(i): _init_block(ks, dpd)
                    for i in range(dp.num_layers)}},
            }
        return params

    @property
    def dp_dims(self) -> TransformerDims:
        dp = self.config.depformer
        return TransformerDims(
            d_model=dp.d_model, num_heads=dp.num_heads,
            num_layers=dp.num_layers, dim_feedforward=dp.dim_feedforward,
            context=(dp.context if dp.context is not None
                     else dp.num_slices),
            max_period=dp.max_period, gating=True, norm="rms_norm",
            positional_embedding=dp.positional_embedding, hidden=dp.hidden)

    def make_caches(self, batch: int, dtype=jnp.float32,
                    max_steps: int = MAX_STEPS):
        t = self.config.transformer
        hd = t.d_model // t.num_heads
        return [KVCache.init(batch, max_steps, t.num_heads, hd, dtype)
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
        x = _norm(params["out_norm"], t, x)
        return x, new_caches

    def forward_text(self, params, token_ids, caches, offset=0):
        """Text-only forward (reference lm.py:429-441): (hidden, logits)."""
        c = self.config
        xs = apply_scaled_embedding(params["text_emb"], token_ids,
                                    c.text_in_vocab_size,
                                    demux=c.demux_second_stream)
        hidden, caches = self._main_step(params, xs, caches, offset)
        return hidden, apply_linear(params["text_linear"], hidden), caches

    def sample_step(self, params, text_token, audio_tokens, caches, offset,
                    key, text_temp: float = 0.8, audio_temp: float = 0.8,
                    top_p: float = 0.95):
        """One full-duplex step.

        text_token (B, 1); audio_tokens (B, n_codebooks) delayed previous
        codes (own + other stream; -1 = zero token). Returns
        (text_token (B,), own_audio (B, S), new_caches, key, hidden).
        """
        c = self.config
        xs = apply_scaled_embedding(params["text_emb"], text_token,
                                    c.text_in_vocab_size,
                                    demux=c.demux_second_stream)
        for i in range(c.audio_codebooks):
            xs = xs + apply_scaled_embedding(
                params["audio_embs"][str(i)], audio_tokens[:, i: i + 1],
                c.audio_vocab_size)
        hidden, caches = self._main_step(params, xs, caches, offset)
        text_logits = apply_linear(params["text_linear"], hidden[:, -1])
        key, k0 = jax.random.split(key)
        text_next = self._sample(k0, text_logits, text_temp, top_p)
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
            in_vs = c.text_in_vocab_size if s == 0 else c.audio_vocab_size
            xs = apply_linear(sp["linear_in"], hidden[:, -1:]) + \
                apply_scaled_embedding(sp["emb"], last[:, None], in_vs)
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
            last = self._sample(kk, logits, audio_temp, top_p)
            own.append(last)
        out = {"hidden": hidden}
        if "extra_heads" in params:
            out["extra_heads"] = [
                jax.nn.softmax(
                    apply_linear(params["extra_heads"][str(i)], hidden),
                    axis=-1)
                for i in range(c.extra_heads_num_heads)]
        return text_next, jnp.stack(own, axis=-1), caches, key, out

    def depformer_logits(self, params, hidden, tokens):
        """Teacher-forced depformer scoring for one main step.

        hidden (B, 1, d_model) main-transformer output at the step;
        tokens (B, S) slice inputs ([text_token, own cb0..cb_{S-2}]).
        Returns per-slice logits (B, S, audio_vocab - 1).
        """
        c = self.config
        dp, dpd = c.depformer, self.dp_dims
        hd = dpd.d_model // dpd.num_heads
        b = hidden.shape[0]
        dp_caches = [KVCache.init(b, dp.num_slices + 2, dpd.num_heads, hd,
                                  hidden.dtype)
                     for _ in range(dpd.num_layers)]
        inv_freq = rope_freqs(hd, dpd.max_period)
        logits = []
        for s in range(dp.num_slices):
            sp = params["depformer"]["slices"][str(s)]
            in_vs = c.text_in_vocab_size if s == 0 else c.audio_vocab_size
            x = apply_linear(sp["linear_in"], hidden) + \
                apply_scaled_embedding(sp["emb"], tokens[:, s: s + 1], in_vs)
            positions = jnp.full((b, 1), s, jnp.int32)
            new_dp = []
            for i in range(dpd.num_layers):
                x, nc = _block_forward(sp["transformer"]["layers"][str(i)],
                                       dpd, x, positions, inv_freq,
                                       dp_caches[i], jnp.int32(s),
                                       dpd.context)
                new_dp.append(nc)
            dp_caches = new_dp
            logits.append(apply_linear(sp["linear_out"], x[:, -1]))
        return jnp.stack(logits, axis=1)

    @staticmethod
    def _sample(key, logits, temperature, top_p: float = 0.95):
        lg = logits.astype(jnp.float32)
        greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        filtered = top_k_top_p_filter(lg / jnp.maximum(temperature, 1e-6),
                                      top_p=top_p)
        drawn = jax.random.categorical(key, filtered, axis=-1).astype(jnp.int32)
        return jnp.where(temperature <= 0.0, greedy, drawn)


class LmGen:
    """Streaming generation driver with per-codebook delays and stream
    undelaying (reference generate.py:14-148)."""

    ZERO_TOKEN = -1
    UNGENERATED = -2

    def __init__(self, model: Lm, max_steps: int = MAX_STEPS,
                 text_temp: float = 0.8, audio_temp: float = 0.8,
                 batch_size: int = 1, seed: int = 0):
        self.model = model
        self.cfg = model.config
        self.max_steps = max_steps
        self.text_temp = text_temp
        self.audio_temp = audio_temp
        self.B = batch_size
        ncb = 1 + self.cfg.audio_codebooks
        self.gen = np.full((batch_size, ncb, max_steps), self.UNGENERATED,
                           np.int32)
        self.step_idx = 0
        self.caches = model.make_caches(
            batch_size, max_steps=max(max_steps,
                                      self.cfg.transformer.context + 1))
        self.key = jax.random.PRNGKey(seed)
        self.main = self.cfg.generated_codebooks
        self.delays = self.cfg.audio_delays
        self.max_delay = max(self.delays, default=0)
        self.last_extra_heads = None
        self._jit = None

    def _raw_step(self, other_audio_tokens: np.ndarray) -> np.ndarray:
        """Advance one step; returns the sampled text tokens (B,)."""
        cfg = self.cfg
        pad = cfg.audio_padding_token
        t = self.step_idx
        if t >= self.max_steps:
            raise ValueError(f"reached max-steps {self.max_steps}")
        if t == 0:
            text_in = np.full((self.B, 1), cfg.text_out_vocab_size, np.int32)
        else:
            text_in = self.gen[:, 0, t - 1: t]
        self.gen[:, 1 + self.main:, t] = other_audio_tokens
        audio_in = np.full((self.B, cfg.audio_codebooks), pad, np.int32)
        for cb in range(cfg.audio_codebooks):
            src_t = t - 1 - self.delays[cb]
            if src_t >= 0:
                tok = self.gen[:, 1 + cb, src_t]
                if (tok == self.UNGENERATED).any():
                    raise ValueError(
                        f"ungenerated value in audio tokens cb {cb} step {t}")
                audio_in[:, cb] = tok
        if self._jit is None:
            self._jit = jax.jit(
                lambda p, tt, at, caches, off, key: self.model.sample_step(
                    p, tt, at, caches, off, key, self.text_temp,
                    self.audio_temp))
        text_next, own, self.caches, self.key, extra = self._jit(
            self.model.params, jnp.asarray(text_in), jnp.asarray(audio_in),
            self.caches, jnp.int32(t), self.key)
        text_next = np.asarray(text_next)
        own = np.asarray(own)
        if "extra_heads" in extra:
            self.last_extra_heads = [np.asarray(e) for e in
                                     extra["extra_heads"]]
        self.gen[:, 0, t] = text_next
        # own codes sampled at step t land at position t - delay
        # (reference generate.py:111-114) so streams come out undelayed
        for cb in range(self.main):
            dst_t = t - self.delays[cb]
            if dst_t >= 0:
                self.gen[:, 1 + cb, dst_t] = own[:, cb]
        self.step_idx += 1
        return text_next

    def last_audio_tokens(self) -> Optional[np.ndarray]:
        """Undelayed frame (B, S) or None while the delay pipeline fills
        (reference generate.py:138-148)."""
        out_t = self.step_idx - 1 - self.max_delay
        if out_t < 0:
            return None
        tokens = self.gen[:, 1: 1 + self.main, out_t]
        if (tokens == self.cfg.audio_padding_token).any():
            return None
        if (tokens == self.UNGENERATED).any():
            raise ValueError(f"ungenerated value at step {self.step_idx}")
        return tokens

    def step(self, other_audio_tokens: np.ndarray) -> tuple:
        """Feed the other speaker's codes (B, other_codebooks; -1 = silence);
        returns (text_token (B,), own_audio (B, S) or None until the delay
        pipeline fills)."""
        text_next = self._raw_step(np.asarray(other_audio_tokens, np.int32))
        return text_next, self.last_audio_tokens()


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "moshi"
    lm_config: Optional[dict] = None
    lm_preset: str = "v0_1"
    mimi_num_codebooks: int = 8
    sample_rate: int = 24000
    model_path: str = ""

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        if "dim" in d and "lm_config" not in d:
            # raw kyutai config.json at top level (lm.py:53 schema)
            return cls(lm_config=dict(d),
                       mimi_num_codebooks=d.get("dep_q", 8),
                       sample_rate=d.get("sample_rate", 24000))
        return super().from_dict(d)


class Model(FunctionalModel):
    """Speech-to-speech wrapper: mimi encode -> Lm step loop -> mimi decode."""

    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        lm_cfg = config.lm_config
        if lm_cfg is None:
            lm_cfg = LM_PRESETS[config.lm_preset]()
        self.lm = Lm(LmConfig.from_dict(lm_cfg)
                     if isinstance(lm_cfg, dict) else lm_cfg)
        self.mimi = None  # bound by post_load_hook / caller

    def init_params(self, key):
        return {"lm": self.lm.init_params(key)}

    def bind(self, params, strict=False):
        super().bind(params, strict=strict)
        self.lm.bind(params["lm"])

    def sanitize(self, weights: Dict[str, Array]) -> Dict[str, Array]:
        return {f"lm.{k}": v
                for k, v in sanitize_lm(dict(weights), self.lm.config).items()}

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


# ---------------------------------------------------------------------------
# Checkpoint sanitize (kyutai MLX / kyutai PyTorch / HF transformers)
# ---------------------------------------------------------------------------

def _unpermute_hf_rope(w: Array, num_heads: int) -> Array:
    """HF stores q/k for half-split rotate_half; kyutai weights are
    interleaved. Invert the HF conversion permute."""
    out, inp = w.shape
    hd = out // num_heads
    return (w.reshape(num_heads, 2, hd // 2, inp)
            .transpose(0, 2, 1, 3).reshape(out, inp))


def sanitize_lm(w: Dict[str, Array], cfg: LmConfig) -> Dict[str, Array]:
    """Flat checkpoint dict -> flat dict in this module's param layout."""
    if any(k.startswith("decoder.model.") for k in w):
        return _sanitize_hf(w, cfg)
    if "out_norm.alpha" in w or "depformer_in.0.weight" in w:
        return _sanitize_kyutai_pt(w, cfg)
    return _sanitize_kyutai_mlx(w, cfg)


def _sanitize_kyutai_mlx(w: Dict[str, Array], cfg: LmConfig) -> Dict[str, Array]:
    """kyutai/moshiko-mlx-* layout == the reference mlx module tree
    (lm.py:288-330); keys map through unchanged."""
    out = {}
    for k, v in w.items():
        if k.startswith(("audio_encoder.", "tokenizer.")):
            continue
        out[k] = v
    return out


def _sanitize_kyutai_pt(w: Dict[str, Array], cfg: LmConfig) -> Dict[str, Array]:
    """kyutai/moshiko-pytorch-* layout (reference lm.py:332-411
    load_pytorch_weights)."""
    dp = cfg.depformer
    chunks = dp.num_slices
    if dp.weights_per_step_schedule is not None:
        chunks = max(dp.weights_per_step_schedule) + 1
    out = {"out_norm.weight": jnp.reshape(w["out_norm.alpha"], (-1,))}
    for name in ("text_emb.weight", "text_emb.out1.weight",
                 "text_emb.out2.weight", "text_linear.weight"):
        if name in w:
            out[name] = w[name]
    for cb in range(cfg.audio_codebooks):
        out[f"audio_embs.{cb}.weight"] = w[f"emb.{cb}.weight"]
    for k, v in w.items():
        if k.startswith("transformer."):
            if k.endswith(".alpha"):
                out[k[: -len(".alpha")] + ".weight"] = jnp.reshape(v, (-1,))
                continue
            k = k.replace(".in_proj_weight", ".in_proj.weight")
            out[k] = v
        elif k.startswith("extra_heads."):
            out[k] = v
    for s in range(dp.num_slices):
        pt_idx = s
        if dp.weights_per_step_schedule is not None:
            pt_idx = dp.weights_per_step_schedule[s]
        pre = f"depformer.slices.{s}"
        out[f"{pre}.linear_in.weight"] = w[f"depformer_in.{pt_idx}.weight"]
        out[f"{pre}.linear_out.weight"] = w[f"linears.{s}.weight"]
        if s == 0:
            out[f"{pre}.emb.weight"] = w["depformer_text_emb.weight"]
            for n in ("low_rank", "out1", "out2"):
                if f"depformer_text_emb.{n}.weight" in w:
                    out[f"{pre}.emb.{n}.weight"] = \
                        w[f"depformer_text_emb.{n}.weight"]
        else:
            out[f"{pre}.emb.weight"] = w[f"depformer_emb.{s - 1}.weight"]
            if f"depformer_emb.{s - 1}.low_rank.weight" in w:
                out[f"{pre}.emb.low_rank.weight"] = \
                    w[f"depformer_emb.{s - 1}.low_rank.weight"]
        for li in range(dp.num_layers):
            p = f"{pre}.transformer.layers.{li}"
            src = f"depformer.layers.{li}"
            out[f"{p}.norm1.weight"] = jnp.reshape(
                w[f"{src}.norm1.alpha"], (-1,))
            out[f"{p}.norm2.weight"] = jnp.reshape(
                w[f"{src}.norm2.alpha"], (-1,))
            out[f"{p}.gating.linear_in.weight"] = \
                w[f"{src}.gating.{pt_idx}.linear_in.weight"]
            out[f"{p}.gating.linear_out.weight"] = \
                w[f"{src}.gating.{pt_idx}.linear_out.weight"]
            out[f"{p}.self_attn.in_proj.weight"] = jnp.split(
                w[f"{src}.self_attn.in_proj_weight"], chunks, axis=0)[pt_idx]
            out[f"{p}.self_attn.out_proj.weight"] = jnp.split(
                w[f"{src}.self_attn.out_proj.weight"], chunks, axis=0)[pt_idx]
    return out


def _sanitize_hf(w: Dict[str, Array], cfg: LmConfig) -> Dict[str, Array]:
    """HF transformers Moshi (kmhf/hf-moshiko) -> our layout. HF q/k carry
    the half-split-rope permutation; undo it (interleaved convention)."""
    t = cfg.transformer
    out = {
        "text_emb.weight": w["decoder.model.embed_tokens.weight"],
        "text_linear.weight": w["decoder.lm_head.weight"],
        "out_norm.weight": w["decoder.model.norm.weight"],
    }
    for cb in range(cfg.audio_codebooks):
        out[f"audio_embs.{cb}.weight"] = w[f"embed_tokens.{cb}.weight"]
    for li in range(t.num_layers):
        src = f"decoder.model.layers.{li}"
        dst = f"transformer.layers.{li}"
        q = _unpermute_hf_rope(w[f"{src}.self_attn.q_proj.linear.weight"],
                               t.num_heads)
        k = _unpermute_hf_rope(w[f"{src}.self_attn.k_proj.linear.weight"],
                               t.num_heads)
        v = w[f"{src}.self_attn.v_proj.linear.weight"]
        out[f"{dst}.self_attn.in_proj.weight"] = jnp.concatenate(
            [q, k, v], axis=0)
        out[f"{dst}.self_attn.out_proj.weight"] = \
            w[f"{src}.self_attn.o_proj.linear.weight"]
        out[f"{dst}.norm1.weight"] = w[f"{src}.input_layernorm.weight"]
        out[f"{dst}.norm2.weight"] = w[f"{src}.post_attention_layernorm.weight"]
        out[f"{dst}.gating.linear_in.weight"] = w[f"{src}.mlp.fc1.weight"]
        out[f"{dst}.gating.linear_out.weight"] = w[f"{src}.mlp.fc2.weight"]
    dp = cfg.depformer
    for s in range(dp.num_slices):
        pre = f"depformer.slices.{s}"
        out[f"{pre}.linear_in.weight"] = \
            w["depth_decoder.input_projections.weight"][s]
        out[f"{pre}.linear_out.weight"] = w["depth_decoder.lm_heads.weight"][s]
        if s == 0:
            out[f"{pre}.emb.weight"] = w["depth_decoder.text_embed_tokens.weight"]
        else:
            out[f"{pre}.emb.weight"] = \
                w[f"depth_decoder.embed_tokens.{s - 1}.weight"]
        for li in range(dp.num_layers):
            src = f"depth_decoder.layers.{li}"
            p = f"{pre}.transformer.layers.{li}"
            # depth decoder has no rope (use_rope=False) -> no unpermute
            out[f"{p}.self_attn.in_proj.weight"] = jnp.concatenate(
                [w[f"{src}.self_attn.q_proj.linear.weight"][s],
                 w[f"{src}.self_attn.k_proj.linear.weight"][s],
                 w[f"{src}.self_attn.v_proj.linear.weight"][s]], axis=0)
            out[f"{p}.self_attn.out_proj.weight"] = \
                w[f"{src}.self_attn.o_proj.linear.weight"][s]
            out[f"{p}.norm1.weight"] = w[f"{src}.input_layernorm.weight"]
            out[f"{p}.norm2.weight"] = w[f"{src}.post_attention_layernorm.weight"]
            out[f"{p}.gating.linear_in.weight"] = w[f"{src}.mlp.fc1.weight"][s]
            out[f"{p}.gating.linear_out.weight"] = w[f"{src}.mlp.fc2.weight"][s]
    return out
