"""ZONOS2 v0.2: MoE llama-style AR TTS over 9 DAC codebooks (44.1 kHz).

Parity: /root/reference/mlx_audio/tts/models/zonos2/model.py —
MultiEmbedding sum over 9 audio + 1 text channel, fused-add RMSNorm
residual stream, attention with per-head learned temperature + sigmoid
head gates + interleaved RoPE, sonic MoE (EDA router state threaded
across layers, balancing biases, per-layer top-k), 9-way softcapped
output head; generation.py — per-codebook repetition penalty,
top-k/top-p/min-p sampling with greedy fallback, EOS shear countdown;
prompt.py — sheared silence prefix + byte prompt.

TPU design: prefill is bucketed into a fixed-capacity KV cache; decode
runs as `lax.scan` chunks with the ENTIRE frame sampler in-graph
(rolling (9, window) repetition history, EOS countdown as carried
state); MoE decode gathers routed experts, prefill masks a scan over
experts.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_embedding, apply_linear, init_embedding, init_linear
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs
from ..base import BatchGenerationResult, GenerationResult, format_duration
from ..base import peak_memory_gb
from .prompt import TTSPromptBuilder, TTSPromptConfig, shear_up
from .textnorm import TTSTextNormalizer

Array = jax.Array

PROMPT_BUCKETS = (128, 256, 512, 1024, 2048)
DEC_CHUNK = 32


def _bucket(n: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return ((n + 511) // 512) * 512


@dataclass
class Zonos2Config(BaseModelArgs):
    model_type: str = "zonos2"
    dtype: str = "bfloat16"
    n_layers: int = 28
    dim: int = 2048
    head_dim: int = 128
    n_heads: Optional[int] = None
    n_kv_heads: Optional[int] = 4
    ffn_dim_multiplier: float = 1.5
    multiple_of: int = 256
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_seqlen: int = 6144
    n_codebooks: int = 9
    codebook_size: int = 1024
    eoa_id: int = 1024
    audio_pad_id: int = 1025
    text_vocab: Optional[int] = 519
    loss_softcap: float = 15.0
    sample_rate: int = 44100
    dac_model_id: str = "mlx-community/descript-audio-codec-44khz"
    speaker_enabled: bool = True
    speaker_embedding_dim: int = 2048
    speaker_lda_dim: Optional[int] = 1024
    speaker_encoder_model_id: str = \
        "marksverdhei/Qwen3-Voice-Embedding-12Hz-1.7B"
    speaker_encoder_path: Optional[str] = "speaker_encoder"
    speaker_encoder_sample_rate: int = 24000
    speaker_background_token_enabled: bool = True
    accurate_mode_token_enabled: bool = True
    speaking_rate_num_buckets: int = 8
    quality_num_buckets: int = 60
    quality_features: tuple = ("lufs", "estimated_snr", "max_pause",
                               "estimated_bandlimit_hz",
                               "leading_silence_s", "trailing_silence_s")
    quality_bucket_counts_override: Optional[tuple] = None
    moe_impl: str = "sonic"
    moe_n_experts: int = 16
    moe_router_topk: int = 1
    special_topk_layers: Dict[int, int] = field(
        default_factory=lambda: {26: 2})
    moe_router_dim: int = 128
    moe_start_from_layer: int = 3
    moe_end_from_layer: int = 1
    norm_topk_prob: bool = False
    moe_balancing_strategy: str = "legacy"
    model_path: Optional[str] = None

    def __post_init__(self):
        self.special_topk_layers = {
            int(k): int(v)
            for k, v in (self.special_topk_layers or {}).items()}

    @classmethod
    def from_dict(cls, params):
        data = dict(params or {})
        if isinstance(data.get("model"), dict):
            data = {**data, **data["model"]}
        data.pop("model", None)
        return super().from_dict(data)

    @property
    def num_heads(self) -> int:
        return self.n_heads if self.n_heads is not None else \
            self.dim // self.head_dim

    @property
    def num_kv_heads(self) -> int:
        return self.n_kv_heads if self.n_kv_heads is not None else \
            self.num_heads

    @property
    def intermediate_size(self) -> int:
        raw = int(self.ffn_dim_multiplier * self.dim)
        return self.multiple_of * (
            (raw + self.multiple_of - 1) // self.multiple_of)

    @property
    def audio_vocab_size(self) -> int:
        return self.codebook_size + 2

    @property
    def frame_width(self) -> int:
        return self.n_codebooks + 1

    @property
    def quality_bucket_counts(self) -> tuple:
        if self.quality_bucket_counts_override:
            return tuple(self.quality_bucket_counts_override)
        return (12, 12, 12, 8, 8, 8)[:len(self.quality_features)]

    @property
    def speaker_background_num_buckets(self) -> int:
        return 2 if self.speaker_background_token_enabled else 0

    @property
    def accurate_mode_num_buckets(self) -> int:
        return 1 if (self.accurate_mode_token_enabled
                     and self.speaker_background_num_buckets > 0) else 0

    def is_moe_layer(self, i: int) -> bool:
        if self.moe_n_experts <= 1 or i < self.moe_start_from_layer:
            return False
        return (self.n_layers - i) > self.moe_end_from_layer

    def num_experts_per_tok(self, i: int) -> int:
        return int(self.special_topk_layers.get(i, self.moe_router_topk))


ModelConfig = Zonos2Config


# --------------------------------------------------------------- backbone

def _rms(x: Array, w: Optional[Array], eps: float) -> Array:
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    if w is not None:
        x32 = x32 * w
    return x32.astype(x.dtype)


def init_zonos2(key, c: Zonos2Config) -> dict:
    ks = iter(jax.random.split(key, 24 * c.n_layers + 32))
    d, hd = c.dim, c.head_dim
    nh, nkv = c.num_heads, c.num_kv_heads
    inter = c.intermediate_size

    emb = {"embedders": {
        str(i): init_embedding(next(ks), c.audio_vocab_size, d)
        for i in range(c.n_codebooks)}}
    emb["embedders"][str(c.n_codebooks)] = init_embedding(
        next(ks), int(c.text_vocab) + 1, d)

    layers = {}
    for i in range(c.n_layers):
        attn = {"wq": init_linear(next(ks), d, nh * hd, bias=False),
                "wkv": init_linear(next(ks), d, 2 * nkv * hd, bias=False),
                "wo": init_linear(next(ks), nh * hd, d, bias=False),
                "temp": jnp.ones((1, nh, 1), jnp.float32),
                "gater": init_linear(next(ks), d, nh, bias=False)}
        if c.is_moe_layer(i):
            router = {"down_proj": init_linear(next(ks), d,
                                               c.moe_router_dim),
                      "router_mlp": {
                          "l0": init_linear(next(ks), c.moe_router_dim,
                                            c.moe_router_dim),
                          "l2": init_linear(next(ks), c.moe_router_dim,
                                            c.moe_router_dim),
                          "l4": init_linear(next(ks), c.moe_router_dim,
                                            c.moe_n_experts, bias=False)},
                      "rmsnorm_eda": {"weight": jnp.ones(c.moe_router_dim)},
                      "balancing_biases": jnp.zeros((c.moe_n_experts,))}
            if i != c.moe_start_from_layer:
                router["router_states_scale"] = jnp.ones((c.moe_router_dim,))
            e = c.moe_n_experts
            ff = {"router": router, "experts": {
                "gate_proj": {"weight": jax.random.normal(
                    next(ks), (e, inter, d)) * 0.02},
                "up_proj": {"weight": jax.random.normal(
                    next(ks), (e, inter, d)) * 0.02},
                "down_proj": {"weight": jax.random.normal(
                    next(ks), (e, d, inter)) * 0.02}}}
        else:
            ff = {"w_in": init_linear(next(ks), d, 2 * inter, bias=False),
                  "w_out": init_linear(next(ks), inter, d, bias=False)}
        layers[str(i)] = {
            "attention": attn,
            "attention_norm": {"weight": jnp.ones(d)},
            "ffn_norm": {"weight": jnp.ones(d)},
            "feed_forward": ff,
        }
    p = {"multi_embedder": emb, "layers": layers,
         "out_norm": {"weight": jnp.ones(d)},
         "multi_output": init_linear(
             next(ks), d, c.n_codebooks * c.audio_vocab_size, bias=False)}
    if c.speaker_enabled:
        if c.speaker_lda_dim:
            p["speaker_lda_projection"] = init_linear(
                next(ks), c.speaker_embedding_dim, int(c.speaker_lda_dim))
            sd = int(c.speaker_lda_dim)
        else:
            sd = c.speaker_embedding_dim
        p["speaker_projection"] = init_linear(next(ks), sd, c.dim)
    return p


def _moe_ff(p: dict, c: Zonos2Config, layer_idx: int, x: Array,
            router_states: Optional[Array]):
    """Sonic MoE (reference model.py:192-260)."""
    r = p["router"]
    hidden = apply_linear(r["down_proj"], x)
    if "router_states_scale" in r and router_states is not None:
        hidden = hidden + router_states * r["router_states_scale"]
    next_states = hidden
    hidden = _rms(hidden, r["rmsnorm_eda"]["weight"], c.norm_eps)
    m = r["router_mlp"]
    logits = apply_linear(m["l4"], jax.nn.gelu(apply_linear(
        m["l2"], jax.nn.gelu(apply_linear(m["l0"], hidden)))))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    bias = r["balancing_biases"].astype(jnp.float32)
    scores = probs + bias if c.moe_balancing_strategy != "quantile" \
        else probs - bias
    top_k = c.num_experts_per_tok(layer_idx)
    if top_k == 1:
        topk_ids = jnp.argmax(scores, axis=-1, keepdims=True)
    else:
        _, topk_ids = jax.lax.top_k(scores, top_k)
    topk_w = jnp.take_along_axis(probs, topk_ids, axis=-1)
    if c.norm_topk_prob:
        topk_w = topk_w / (topk_w.sum(-1, keepdims=True) + 1e-8)

    b, t, d = x.shape
    flat = x.reshape(-1, d)
    ids = topk_ids.reshape(-1, top_k)
    w = topk_w.reshape(-1, top_k)
    gp = p["experts"]["gate_proj"]["weight"]
    up = p["experts"]["up_proj"]["weight"]
    dn = p["experts"]["down_proj"]["weight"]
    n = flat.shape[0]
    if n * top_k <= 64:
        g = gp[ids]                                    # (N, K, inter, d)
        u = up[ids]
        dd = dn[ids]
        h = jax.nn.silu(jnp.einsum("nd,nkid->nki", flat, g)) * \
            jnp.einsum("nd,nkid->nki", flat, u)
        out = jnp.einsum("nki,nkdi->nkd", h, dd)
    else:
        one_hot = jax.nn.one_hot(ids, c.moe_n_experts,
                                 dtype=flat.dtype)     # (N, K, E)

        def body(carry, e):
            h = jax.nn.silu(flat @ gp[e].T) * (flat @ up[e].T)
            o = h @ dn[e].T                            # (N, d)
            return carry + one_hot[:, :, e][..., None] * o[:, None], None

        out, _ = jax.lax.scan(body,
                              jnp.zeros((n, top_k, d), flat.dtype),
                              jnp.arange(c.moe_n_experts))
    out = (out.astype(jnp.float32) * w[..., None]).sum(axis=1)
    return out.reshape(b, t, d).astype(x.dtype), next_states


def zonos2_forward(p: dict, c: Zonos2Config, ids: Array,
                   caches: Optional[List[KVCache]] = None,
                   offset: Array = 0,
                   pad_mask: Optional[Array] = None,
                   speaker_proj: Optional[Array] = None,
                   speaker_pos: Optional[Array] = None):
    """ids (B, T, frame_width) -> hidden (B, T, D), new caches."""
    b, t, _ = ids.shape
    h = None
    for i in range(c.frame_width):
        e = apply_embedding(p["multi_embedder"]["embedders"][str(i)],
                            ids[..., i])
        h = e if h is None else h + e
    if speaker_proj is not None and speaker_pos is not None:
        sel = (jnp.arange(t)[None] == speaker_pos[:, None])  # (B, T)
        h = jnp.where(sel[..., None], speaker_proj[:, None, :], h)
    x = _rms(h, None, c.norm_eps)         # emb_norm (affine-free)
    residual = None
    nh, nkv, hd = c.num_heads, c.num_kv_heads, c.head_dim
    inv_freq = rope_freqs(hd, c.rope_theta)
    positions = offset + jnp.arange(t)[None, :]
    new_caches = [] if caches is not None else None
    router_states = None

    def fused(norm_w, x, residual):
        if residual is None:
            return _rms(x, norm_w, c.norm_eps), x
        residual = residual + x
        return _rms(residual, norm_w, c.norm_eps), residual

    for i in range(c.n_layers):
        lp = p["layers"][str(i)]
        x, residual = fused(lp["attention_norm"]["weight"], x, residual)
        a = lp["attention"]
        gate = jax.nn.sigmoid(apply_linear(a["gater"], x))     # (B,T,nh)
        q = apply_linear(a["wq"], x).reshape(b, t, nh, hd)
        kv = apply_linear(a["wkv"], x)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, t, nkv, hd)
        v = v.reshape(b, t, nkv, hd)
        q = _rms(q, None, 1e-6) * jnp.abs(a["temp"])[None].astype(q.dtype)
        k = _rms(k, None, 1e-6)
        q = apply_rope(q, positions, inv_freq, interleaved=True)
        k = apply_rope(k, positions, inv_freq, interleaved=True)
        if caches is not None:
            nc = kv_update(caches[i], k, v, offset)
            new_caches.append(nc)
            if t == 1:
                o = decode_attention(q, nc.k, nc.v, offset + 1)
            else:
                s = nc.k.shape[1]
                pos_s = jnp.arange(s)[None, None, None, :]
                causal = pos_s <= (offset
                                   + jnp.arange(t))[None, None, :, None]
                valid = pos_s < (offset + t)
                add = jnp.where(causal & valid, 0.0, -jnp.inf)
                if pad_mask is not None:
                    add = add + pad_mask
                o = attention(q, nc.k, nc.v, mask=add)
        else:
            o = attention(q, k, v, causal=True)
        o = o * gate[..., None]
        x = apply_linear(a["wo"], o.reshape(b, t, nh * hd))
        x, residual = fused(lp["ffn_norm"]["weight"], x, residual)
        if c.is_moe_layer(i):
            x, router_states = _moe_ff(lp["feed_forward"], c, i, x,
                                       router_states)
        else:
            ff = lp["feed_forward"]
            hg = apply_linear(ff["w_in"], x)
            hh, g = jnp.split(hg, 2, axis=-1)
            x = apply_linear(ff["w_out"], hh * jax.nn.silu(g))
            router_states = None
    x, _ = fused(p["out_norm"]["weight"], x, residual)
    return x, new_caches


def compute_logits(p: dict, c: Zonos2Config, hidden: Array) -> Array:
    logits = apply_linear(p["multi_output"], hidden)
    logits = logits.reshape(*logits.shape[:-1], c.n_codebooks,
                            c.audio_vocab_size)
    if c.loss_softcap > 0:
        logits = c.loss_softcap * jnp.tanh(logits / c.loss_softcap)
    return logits


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """ZONOS2 TTS."""

    preserve_ref_audio_path = True

    def __init__(self, config: Zonos2Config = None, **kwargs):
        if config is None:
            config = Zonos2Config.from_dict(kwargs) if kwargs else \
                Zonos2Config()
        elif isinstance(config, dict):
            config = Zonos2Config.from_dict(config)
        super().__init__(config)
        self._prompt_builder = TTSPromptBuilder(TTSPromptConfig(
            n_codebooks=config.n_codebooks,
            audio_pad_id=config.audio_pad_id,
            text_vocab=int(config.text_vocab),
            speaking_rate_num_buckets=config.speaking_rate_num_buckets,
            quality_bucket_counts=config.quality_bucket_counts,
            speaker_background_num_buckets=(
                config.speaker_background_num_buckets),
            accurate_mode_num_buckets=config.accurate_mode_num_buckets,
            prepend_silence=True))
        self._text_normalizer = None
        self.dac = None                 # descript codec Model
        self.speaker_encoder = None     # (params, config) tuple

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_zonos2(key, self.config)

    # ------------------------------------------------------- sanitize

    def sanitize(self, weights):
        c = self.config
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            # ChunkedLinear stores (divisor, out/divisor, in)
            if v.ndim == 3 and (k.endswith(".wkv.weight")
                                or k.endswith(".w_in.weight")):
                v = v.reshape(v.shape[0] * v.shape[1], v.shape[2])
            if k.startswith("multi_embedder.embedders."):
                pass
            out[k] = v
        del c
        return out

    # ---------------------------------------------------- speaker path

    def _speaker_proj(self, speaker_embedding: Optional[np.ndarray]):
        if speaker_embedding is None or \
                "speaker_projection" not in self.params:
            return None
        emb = jnp.asarray(speaker_embedding, jnp.float32)
        if emb.ndim == 1:
            emb = emb[None]
        if "speaker_lda_projection" in self.params:
            emb = apply_linear(self.params["speaker_lda_projection"], emb)
        return apply_linear(self.params["speaker_projection"], emb)

    def extract_speaker_embedding(self, ref_audio,
                                  sample_rate: Optional[int] = None
                                  ) -> np.ndarray:
        """Qwen3-Voice speaker embedding (reference speaker_encoder.py)."""
        if self.speaker_encoder is None:
            raise ValueError("speaker encoder not loaded; pass "
                             "speaker_embedding instead")
        from ..qwen3_tts.speaker_encoder import (
            speaker_encoder_forward,
            speaker_mel,
        )
        from ....utils import resample_audio

        if isinstance(ref_audio, (str, Path)):
            from ....utils import load_audio

            wav = np.asarray(load_audio(
                str(ref_audio),
                sample_rate=self.config.speaker_encoder_sample_rate))
        else:
            wav = np.asarray(ref_audio, np.float32).reshape(-1)
            if sample_rate and sample_rate != \
                    self.config.speaker_encoder_sample_rate:
                wav = np.asarray(resample_audio(
                    wav, sample_rate,
                    self.config.speaker_encoder_sample_rate), np.float32)
        params, enc_cfg = self.speaker_encoder
        mel = speaker_mel(
            wav, sample_rate=self.config.speaker_encoder_sample_rate)
        return np.asarray(speaker_encoder_forward(params, enc_cfg,
                                                  jnp.asarray(mel)))[0]

    # ------------------------------------------------------- decoding

    def _decode_fns(self, pb: int, cap: int, temperature: float,
                    top_k: int, top_p: float, min_p: float,
                    repetition_window: int, repetition_penalty: float,
                    repetition_codebooks: int, ignore_eos: bool):
        c = self.config
        nc = c.n_codebooks
        V = c.audio_vocab_size
        text_col = jnp.int32(int(c.text_vocab))

        def prefill(params, ids, plen, spk_proj, spk_pos):
            caches = [KVCache.init(1, cap, c.num_kv_heads, c.head_dim,
                                   jnp.float32)
                      for _ in range(c.n_layers)]
            pad = jnp.where(jnp.arange(cap) < plen, 0.0,
                            -jnp.inf)[None, None, None, :]
            hidden, caches = zonos2_forward(
                params, c, ids, caches=caches, offset=0, pad_mask=pad,
                speaker_proj=spk_proj, speaker_pos=spk_pos)
            idx = jnp.clip(plen - 1, 0, pb - 1)
            h = jax.lax.dynamic_slice_in_dim(hidden, idx, 1, axis=1)
            return caches, compute_logits(params, c, h)[:, 0]  # (1,nc,V)

        def sample(key, logits, history):
            lg = logits[0].astype(jnp.float32)          # (nc, V)
            if repetition_penalty > 1.0 and repetition_window > 0:
                vocab = jnp.arange(V)[None, None, :]
                seen = jnp.any(history[..., None] == vocab, axis=1)
                lim = jnp.arange(nc) < min(nc, repetition_codebooks) \
                    if repetition_codebooks >= 0 else \
                    jnp.ones((nc,), bool)
                seen = seen & lim[:, None]
                pen = jnp.where(lg > 0, lg / repetition_penalty,
                                lg * repetition_penalty)
                lg = jnp.where(seen, pen, lg)
            if temperature <= 1e-8:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            filt = lg / temperature
            if 0 < top_k < V:
                kth = jnp.sort(filt, axis=-1)[:, -top_k][:, None]
                filt = jnp.where(filt < kth, -jnp.inf, filt)
            probs = jax.nn.softmax(filt, axis=-1)
            if 0.0 < top_p < 1.0:
                order = jnp.argsort(-probs, axis=-1)
                sp = jnp.take_along_axis(probs, order, axis=-1)
                cum = jnp.cumsum(sp, axis=-1)
                sp = jnp.where(cum - sp > top_p, 0.0, sp)
                probs = jnp.zeros_like(probs).at[
                    jnp.arange(nc)[:, None], order].set(sp)
                probs = probs / jnp.maximum(
                    probs.sum(-1, keepdims=True), 1e-12)
            if min_p > 0.0:
                thr = probs.max(-1, keepdims=True) * min_p
                probs = jnp.where(probs < thr, 0.0, probs)
                probs = probs / jnp.maximum(
                    probs.sum(-1, keepdims=True), 1e-12)
            valid = jnp.isfinite(probs).all(-1) & (probs.sum(-1) > 0)
            safe = jnp.where(jnp.isfinite(probs), probs, 0.0)
            slog = jnp.where(valid[:, None],
                             jnp.log(jnp.maximum(safe, 1e-20)),
                             jnp.zeros_like(filt))
            sampled = jax.random.categorical(key, slog,
                                             axis=-1).astype(jnp.int32)
            greedy = jnp.argmax(filt, axis=-1).astype(jnp.int32)
            return jnp.where(valid, sampled, greedy)

        def chunk(params, caches, offset, logits, history, eos_frame,
                  countdown, step, key):
            def body(carry, _):
                (caches, offset, logits, history, eos_frame, countdown,
                 step, key) = carry
                key, sub = jax.random.split(key)
                frame = sample(sub, logits, history)          # (nc,)
                finished = (eos_frame >= 0) & (countdown <= 0)
                frame = jnp.where(finished, jnp.int32(c.eoa_id), frame)
                history = jnp.concatenate(
                    [history[:, 1:], frame[:, None]], axis=1)
                # EOS bookkeeping (reference generation.py:40-55)
                if not ignore_eos:
                    eos_cols = frame == c.eoa_id
                    any_eos = jnp.any(eos_cols)
                    max_cb = jnp.max(jnp.where(
                        eos_cols, jnp.arange(nc), -1))
                    new_eos = jnp.maximum(0, step - max_cb)
                    set_now = any_eos & (eos_frame < 0) & ~finished
                    eos_frame = jnp.where(set_now, new_eos, eos_frame)
                    countdown = jnp.where(set_now, nc + 1, countdown)
                    countdown = jnp.where(
                        (eos_frame >= 0) & (countdown > 0),
                        countdown - 1, countdown)
                emit = (frame, finished)
                row = jnp.concatenate([frame, text_col[None]])[None, None]
                hidden, caches = zonos2_forward(params, c, row,
                                                caches=caches,
                                                offset=offset)
                logits = compute_logits(params, c, hidden)[:, -1]
                return (caches, offset + 1, logits, history, eos_frame,
                        countdown, step + 1, key), emit

            carry, (frames, finished) = jax.lax.scan(
                body, (caches, offset, logits, history, eos_frame,
                       countdown, step, key), None, length=DEC_CHUNK)
            return carry, frames, finished

        return jax.jit(prefill), jax.jit(chunk, donate_argnums=(1,))

    def _decode_audio(self, generated: np.ndarray,
                      eos_frame: Optional[int],
                      frame_limit: Optional[int] = None) -> np.ndarray:
        c = self.config
        if len(generated) == 0:
            return np.zeros((0,), np.float32)
        codes = shear_up(np.asarray(generated, np.int32), c.audio_pad_id)
        if eos_frame is not None:
            codes = codes[:max(0, int(eos_frame))]
        elif frame_limit is not None:
            codes = codes[:max(0, min(int(frame_limit), len(codes)))]
        if codes.size == 0:
            return np.zeros((0,), np.float32)
        codes = np.clip(codes, 0, c.codebook_size - 1)
        if self.dac is None:
            return np.zeros((codes.shape[0] * 512,), np.float32)
        z = self.dac.from_codes(jnp.asarray(codes.T[None]))
        audio = np.asarray(self.dac.decode(z)).reshape(-1)
        return audio[:codes.shape[0] * 512].astype(np.float32)

    # ------------------------------------------------------- generate

    def _normalize(self, text, language, text_normalization):
        if not text_normalization:
            return text
        if self._text_normalizer is None:
            self._text_normalizer = TTSTextNormalizer()
        return self._text_normalizer.normalize(text, language)

    def generate(self, text: str, lang_code: str = "en_us",
                 ref_audio=None, max_tokens: Optional[int] = None,
                 max_new_tokens: Optional[int] = None,
                 temperature: float = 1.15, top_p: float = 0.0,
                 top_k: int = 106, min_p: float = 0.18,
                 repetition_window: int = 50,
                 repetition_penalty: float = 1.2,
                 repetition_codebooks: int = 8,
                 seed: Optional[int] = None, ignore_eos: bool = False,
                 speaking_rate_bucket: Optional[int] = None,
                 quality_buckets=None, speaker_embedding=None,
                 clean_speaker_background: bool = False,
                 accurate_mode: bool = True,
                 text_normalization: bool = True, stream: bool = False,
                 streaming_interval: float = 2.0, **kwargs
                 ) -> Iterator[GenerationResult]:
        c = self.config
        limit = max_new_tokens if max_new_tokens is not None else \
            (max_tokens if max_tokens is not None else 1024)
        t0 = time.perf_counter()
        text = self._normalize(text, lang_code, text_normalization)
        if speaker_embedding is None and ref_audio is not None:
            speaker_embedding = self.extract_speaker_embedding(ref_audio)
        spk_proj = self._speaker_proj(speaker_embedding)

        if quality_buckets is None:
            quality_buckets = {"trailing_silence_s": 3}
        if isinstance(quality_buckets, dict):
            quality_buckets = [quality_buckets.get(f)
                               for f in c.quality_features]
        rows = self._prompt_builder.build_list(
            text, speaking_rate_bucket=speaking_rate_bucket,
            quality_buckets=quality_buckets)
        spk_pos = None
        if spk_proj is not None:
            rows = self._prompt_builder.speaker_marker_prefix(
                clean_speaker_background=clean_speaker_background,
                accurate_mode=accurate_mode) + rows
            spk_pos = jnp.asarray([0], jnp.int32)

        prompt = np.asarray(rows, np.int32)
        plen = prompt.shape[0]
        pb = _bucket(plen)
        padded = np.zeros((1, pb, c.frame_width), np.int32)
        padded[0, :plen] = prompt
        cap = pb + ((limit + DEC_CHUNK) // DEC_CHUNK) * DEC_CHUNK

        fn_key = ("dec", pb, cap, temperature, top_k, top_p, min_p,
                  repetition_window, repetition_penalty,
                  repetition_codebooks, ignore_eos,
                  spk_proj is not None)
        fns = self._jit_cache.get(fn_key)
        if fns is None:
            fns = self._decode_fns(pb, cap, temperature, top_k, top_p,
                                   min_p, repetition_window,
                                   repetition_penalty,
                                   repetition_codebooks, ignore_eos)
            self._jit_cache[fn_key] = fns
        prefill, chunk = fns

        caches, logits = prefill(self.params, jnp.asarray(padded),
                                 jnp.int32(plen), spk_proj, spk_pos)
        key = jax.random.PRNGKey(seed if seed is not None else 0)
        offset = jnp.int32(plen)
        history = jnp.full((c.n_codebooks, max(repetition_window, 1)),
                           -1, jnp.int32)
        eos_frame = jnp.int32(-1)
        countdown = jnp.int32(-1)
        step = jnp.int32(0)
        generated: List[np.ndarray] = []
        steps = 0
        while steps < limit:
            carry, frames, finished = chunk(
                self.params, caches, offset, logits, history, eos_frame,
                countdown, step, key)
            (caches, offset, logits, history, eos_frame, countdown, step,
             key) = carry
            frames = np.asarray(frames)
            fin = np.asarray(finished)
            for i in range(DEC_CHUNK):
                if fin[i] or steps + i >= limit:
                    break
                generated.append(frames[i])
            steps += DEC_CHUNK
            if bool(fin[-1]):
                break

        ef = int(np.asarray(eos_frame))
        audio = self._decode_audio(
            np.asarray(generated) if generated else np.zeros((0, 9)),
            ef if ef >= 0 else None)
        dt = max(time.perf_counter() - t0, 1e-9)
        dur = len(audio) / c.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=c.sample_rate,
            segment_idx=0, token_count=len(generated),
            audio_duration=format_duration(dur),
            real_time_factor=round(dt / dur, 3) if dur else 0.0,
            prompt={"tokens": plen,
                    "completion_tokens": len(generated),
                    "tokens-per-sec": round(
                        (plen + len(generated)) / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt,
            peak_memory_usage=peak_memory_gb())

    def batch_generate(self, texts: List[str], stream: bool = False,
                       **kwargs) -> Iterator[BatchGenerationResult]:
        if isinstance(texts, str):
            raise TypeError("texts must be a list of strings")
        if stream:
            raise NotImplementedError(
                "ZONOS2 batch streaming is not implemented")
        t0 = time.perf_counter()
        for idx, text in enumerate(texts):
            res = next(iter(self.generate(text, **kwargs)))
            dur = res.samples / self.config.sample_rate
            yield BatchGenerationResult(
                audio=res.audio, sequence_idx=idx, samples=res.samples,
                sample_rate=self.config.sample_rate,
                token_count=res.token_count,
                audio_duration=format_duration(dur),
                processing_time_seconds=max(
                    time.perf_counter() - t0, 1e-9),
                peak_memory_usage=peak_memory_gb())

    # -------------------------------------------------------- loading

    def post_load_hook(self, model_path):
        self.config.model_path = str(model_path)
        import json
        import warnings

        enc_dir = Path(model_path) / (self.config.speaker_encoder_path
                                      or "speaker_encoder")
        if enc_dir.exists():
            try:
                from safetensors import safe_open

                from ....utils import unflatten
                from ..qwen3_tts.config import Qwen3TTSSpeakerEncoderConfig

                cfg_file = enc_dir / "config.json"
                data = json.loads(cfg_file.read_text()) \
                    if cfg_file.exists() else {}
                allowed = Qwen3TTSSpeakerEncoderConfig.__dataclass_fields__
                enc_cfg = Qwen3TTSSpeakerEncoderConfig(
                    **{k: v for k, v in data.items() if k in allowed})
                flat = {}
                with safe_open(str(enc_dir / "model.safetensors"),
                               framework="np") as f:
                    for k in f.keys():
                        v = jnp.asarray(f.get_tensor(k))
                        k = k.replace("speaker_encoder.", "")
                        if k.endswith(".weight") and v.ndim == 3:
                            v = jnp.transpose(v, (0, 2, 1)) \
                                if v.shape[1] > v.shape[2] else v
                        flat[k] = v
                self.speaker_encoder = (unflatten(flat), enc_cfg)
            except Exception as e:  # pragma: no cover
                warnings.warn(f"Could not load speaker encoder: {e}")
        return self


__all__ = ["Model", "ModelConfig", "Zonos2Config", "zonos2_forward",
           "compute_logits", "init_zonos2"]
