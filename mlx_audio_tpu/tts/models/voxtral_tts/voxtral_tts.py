"""Voxtral-4B-TTS: Mistral LM -> per-frame flow-matching acoustic head ->
ALiBi conv/transformer codec decoder.

Parity: /root/reference/mlx_audio/tts/models/voxtral_tts/
(voxtral_tts.py — Mistral backbone w/ interleaved RoPE, voice-embedding
splice at AUDIO token positions, AR frame loop; acoustic_head.py — semantic
argmax + 8-step Euler CFG (alpha=1.2) over 36 FSQ codes; audio_tokenizer.py
— weight-normed causal convs alternating with ALiBi sliding-window
transformer blocks, 8x upsample, 240-sample patches -> 1920 samples/frame).

TPU design: one jitted frame step fuses the semantic argmax, the whole
7-step Euler CFG integration (batch-2 cond/uncond), the FSQ quantize, the
codebook-embedding sum, and the next LM cache step; frames run in
`lax.scan` chunks with in-graph EOS masking. The codec decode is bucketed
(causal convs + causal windowed attention make end-padding inert).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Generator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_linear,
    init_embedding,
    init_linear,
)
from ....ops.attention import attention
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..llama.llama import (
    ModelConfig as LlamaConfig,
    init_caches as llama_make_caches,
    init_llama,
    llama_forward,
)
from .text_preprocess import sanitize_tts_input_text_for_demo

Array = jax.Array

PROMPT_BUCKETS = (128, 256, 512, 1024, 2048)
DEC_CHUNK = 25          # 2s of audio per chunk (80ms frames)
N_SPECIAL = 2           # empty_audio, end_audio

VOICE_MAP = {
    "casual_female": 0, "casual_male": 1, "cheerful_female": 2,
    "neutral_female": 3, "neutral_male": 4, "pt_male": 5, "pt_female": 6,
    "nl_male": 7, "nl_female": 8, "it_male": 9, "it_female": 10,
    "fr_male": 11, "fr_female": 12, "es_male": 13, "es_female": 14,
    "de_male": 15, "de_female": 16, "ar_male": 17, "hi_male": 18,
    "hi_female": 19,
}


def pad_to_multiple(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def _bucket(n: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return pad_to_multiple(n, 512)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "voxtral_tts"
    dim: int = 3072
    n_layers: int = 26
    head_dim: int = 128
    hidden_dim: int = 9216
    n_heads: int = 32
    n_kv_heads: int = 8
    vocab_size: int = 131072
    rope_theta: float = 1000000.0
    norm_eps: float = 1e-5
    tied_embeddings: bool = True
    use_biases: bool = False
    max_position_embeddings: int = 128000
    sample_rate: int = 24000

    semantic_codebook_size: int = 8192
    acoustic_codebook_size: int = 21
    n_acoustic_codebook: int = 36
    frame_rate: float = 12.5
    num_codebooks: int = 37

    acoustic_dim: int = 3072
    acoustic_n_layers: int = 3
    acoustic_head_dim: int = 128
    acoustic_hidden_dim: int = 9216
    acoustic_n_heads: int = 32
    acoustic_n_kv_heads: int = 8
    acoustic_rope_theta: float = 10000.0
    acoustic_sigma: float = 1e-5
    acoustic_sigma_max: float = 1.0
    n_denoising_steps: int = 8
    cfg_alpha: float = 1.2

    tokenizer_dim: int = 1024
    tokenizer_hidden_dim: int = 4096
    tokenizer_n_heads: int = 8
    tokenizer_n_kv_heads: int = 8
    tokenizer_head_dim: int = 128
    tokenizer_patch_size: int = 240
    tokenizer_patch_proj_kernel_size: int = 7
    tokenizer_semantic_dim: int = 256
    tokenizer_acoustic_dim: int = 36
    tokenizer_norm_eps: float = 0.01
    tokenizer_layer_scale_init: float = 0.01
    tokenizer_decoder_transformer_lengths_str: str = "2,2,2,2"
    tokenizer_decoder_convs_kernels_str: str = "3,4,4,4"
    tokenizer_decoder_convs_strides_str: str = "1,2,2,2"

    bos_token_id: int = 1
    audio_token_id: int = 24
    begin_audio_token_id: int = 25
    model_path: Optional[str] = None

    @classmethod
    def from_dict(cls, params: dict) -> "ModelConfig":
        # Mistral params.json layout -> flat config (reference :117-183)
        if "multimodal" not in params:
            return super().from_dict(params)
        mm = params.get("multimodal", {})
        aa = mm.get("audio_model_args", {})
        enc = aa.get("audio_encoding_args", {})
        ac = aa.get("acoustic_transformer_args", {})
        tk = mm.get("audio_tokenizer_args", {})
        flat = {k: v for k, v in params.items()
                if k in cls.__dataclass_fields__}
        flat.update(dict(
            model_type="voxtral_tts",
            sample_rate=enc.get("sampling_rate", 24000),
            semantic_codebook_size=aa.get("semantic_codebook_size", 8192),
            acoustic_codebook_size=aa.get("acoustic_codebook_size", 21),
            n_acoustic_codebook=aa.get("n_acoustic_codebook", 36),
            frame_rate=enc.get("frame_rate", 12.5),
            num_codebooks=enc.get("num_codebooks", 37),
            acoustic_dim=ac.get("dim", 3072),
            acoustic_n_layers=ac.get("n_layers", 3),
            acoustic_head_dim=ac.get("head_dim", 128),
            acoustic_hidden_dim=ac.get("hidden_dim", 9216),
            acoustic_n_heads=ac.get("n_heads", 32),
            acoustic_n_kv_heads=ac.get("n_kv_heads", 8),
            acoustic_rope_theta=ac.get("rope_theta", 10000.0),
            acoustic_sigma=ac.get("sigma", 1e-5),
            acoustic_sigma_max=ac.get("sigma_max", 1.0),
            tokenizer_dim=tk.get("dim", 1024),
            tokenizer_hidden_dim=tk.get("hidden_dim", 4096),
            tokenizer_n_heads=tk.get("n_heads", 8),
            tokenizer_n_kv_heads=tk.get("n_kv_heads", 8),
            tokenizer_head_dim=tk.get("head_dim", 128),
            tokenizer_patch_size=tk.get("pretransform_patch_size", 240),
            tokenizer_patch_proj_kernel_size=tk.get(
                "patch_proj_kernel_size", 7),
            tokenizer_semantic_dim=tk.get("semantic_dim", 256),
            tokenizer_acoustic_dim=tk.get("acoustic_dim", 36),
            tokenizer_norm_eps=tk.get("norm_eps", 0.01),
            bos_token_id=mm.get("bos_token_id", 1),
            audio_token_id=aa.get("audio_token_id", 24),
            begin_audio_token_id=aa.get("begin_audio_token_id", 25),
        ))
        return super().from_dict(flat)

    @property
    def semantic_padded(self) -> int:
        return (self.semantic_codebook_size // 128 + 1) * 128

    @property
    def audio_embedding_size(self) -> int:
        return self.semantic_padded + pad_to_multiple(
            self.acoustic_codebook_size * self.n_acoustic_codebook, 128)

    @property
    def llama_config(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.dim, num_hidden_layers=self.n_layers,
            intermediate_size=self.hidden_dim,
            num_attention_heads=self.n_heads,
            num_key_value_heads=self.n_kv_heads,
            vocab_size=self.vocab_size, rms_norm_eps=self.norm_eps,
            rope_theta=self.rope_theta, head_dim=self.head_dim,
            tie_word_embeddings=self.tied_embeddings,
            attention_bias=self.use_biases, rope_interleaved=True)

    @property
    def decoder_strides(self) -> List[int]:
        return [int(x) for x in
                self.tokenizer_decoder_convs_strides_str.split(",")]

    @property
    def decoder_kernels(self) -> List[int]:
        return [int(x) for x in
                self.tokenizer_decoder_convs_kernels_str.split(",")]

    @property
    def decoder_tf_lengths(self) -> List[int]:
        return [int(x) for x in
                self.tokenizer_decoder_transformer_lengths_str.split(",")]

    @property
    def samples_per_frame(self) -> int:
        up = 1
        for s in self.decoder_strides:
            up *= s
        return up * self.tokenizer_patch_size


# --------------------------------------------------------- acoustic head

def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (x32 * w).astype(x.dtype)


def _swiglu_init(ks, dim, hidden, bias=False):
    return {"w1": init_linear(next(ks), dim, hidden, bias=bias),
            "w2": init_linear(next(ks), hidden, dim, bias=bias),
            "w3": init_linear(next(ks), dim, hidden, bias=bias)}


def _swiglu(p, x):
    return apply_linear(p["w2"], jax.nn.silu(apply_linear(p["w1"], x))
                        * apply_linear(p["w3"], x))


def init_acoustic_head(key, c: ModelConfig) -> dict:
    ks = iter(jax.random.split(key, 12 * c.acoustic_n_layers + 12))
    d = c.acoustic_dim
    layers = {}
    for i in range(c.acoustic_n_layers):
        layers[str(i)] = {
            "attention_norm": {"weight": jnp.ones(d)},
            "ffn_norm": {"weight": jnp.ones(d)},
            "attention": {
                "wq": init_linear(next(ks), d,
                                  c.acoustic_n_heads * c.acoustic_head_dim,
                                  bias=c.use_biases),
                "wk": init_linear(next(ks), d,
                                  c.acoustic_n_kv_heads
                                  * c.acoustic_head_dim,
                                  bias=c.use_biases),
                "wv": init_linear(next(ks), d,
                                  c.acoustic_n_kv_heads
                                  * c.acoustic_head_dim,
                                  bias=c.use_biases),
                "wo": init_linear(next(ks),
                                  c.acoustic_n_heads * c.acoustic_head_dim,
                                  d, bias=c.use_biases),
            },
            "feed_forward": _swiglu_init(ks, d, c.acoustic_hidden_dim,
                                         c.use_biases),
        }
    return {
        "input_projection": init_linear(next(ks), c.n_acoustic_codebook, d,
                                        bias=False),
        "llm_projection": init_linear(next(ks), c.dim, d, bias=False),
        "time_projection": init_linear(next(ks), d, d, bias=False),
        "layers": layers,
        "semantic_codebook_output": init_linear(next(ks), d,
                                                c.semantic_padded,
                                                bias=False),
        "acoustic_codebook_output": init_linear(next(ks), d,
                                                c.n_acoustic_codebook,
                                                bias=False),
        "norm": {"weight": jnp.ones(d)},
    }


def _time_embedding(t: Array, dim: int, theta: float = 10000.0) -> Array:
    half = dim // 2
    inv = jnp.exp(-math.log(theta)
                  * jnp.arange(half, dtype=jnp.float32) / half)
    emb = t.astype(jnp.float32)[:, None] * inv[None]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def acoustic_velocity(p: dict, c: ModelConfig, x_t: Array, t: Array,
                      llm_out: Array) -> Array:
    """(B, 36) noisy codes + (B,) t + (B, dim) llm hidden -> (B, 36)."""
    b = x_t.shape[0]
    time_emb = apply_linear(p["time_projection"],
                            _time_embedding(t, c.acoustic_dim))
    llm_emb = apply_linear(p["llm_projection"], llm_out)
    ac_emb = apply_linear(p["input_projection"], x_t)
    x = jnp.stack([ac_emb, time_emb, llm_emb], axis=1)   # (B, 3, d)
    hd, nh, nkv = (c.acoustic_head_dim, c.acoustic_n_heads,
                   c.acoustic_n_kv_heads)
    for i in range(c.acoustic_n_layers):
        blk = p["layers"][str(i)]
        h = _rms(x, blk["attention_norm"]["weight"], c.norm_eps)
        a = blk["attention"]
        q = apply_linear(a["wq"], h).reshape(b, 3, nh, hd)
        k = apply_linear(a["wk"], h).reshape(b, 3, nkv, hd)
        v = apply_linear(a["wv"], h).reshape(b, 3, nkv, hd)
        o = attention(q, k, v).reshape(b, 3, -1)
        x = x + apply_linear(a["wo"], o)
        h = _rms(x, blk["ffn_norm"]["weight"], c.norm_eps)
        x = x + _swiglu(blk["feed_forward"], h)
    x = _rms(x, p["norm"]["weight"], c.norm_eps)
    return apply_linear(p["acoustic_codebook_output"], x[:, 0])


def acoustic_decode_frame(p: dict, c: ModelConfig, h: Array,
                          key: Array) -> Array:
    """LLM hidden (B, dim) -> one frame of codes (B, 37) with the +2
    special-token offset applied (reference acoustic_head.py:206)."""
    b = h.shape[0]
    sem_logits = apply_linear(p["semantic_codebook_output"],
                              h).astype(jnp.float32)
    pad_mask = jnp.arange(c.semantic_padded) >= \
        c.semantic_codebook_size + N_SPECIAL
    sem_logits = jnp.where(pad_mask, sem_logits - 1e9, sem_logits)
    sem_logits = sem_logits.at[:, 0].add(-1e9)
    sem = jnp.argmax(sem_logits, axis=-1).astype(jnp.int32)  # (B,)

    n = c.n_denoising_steps
    ts = [i / (n - 1) for i in range(n)]
    key, sub = jax.random.split(key)
    x = jax.random.normal(sub, (b, c.n_acoustic_codebook)) * \
        c.acoustic_sigma_max
    llm_pair = jnp.concatenate([h, jnp.zeros_like(h)], axis=0)
    for step in range(n - 1):
        t = jnp.full((2 * b,), ts[step], jnp.float32)
        v_both = acoustic_velocity(p, c, jnp.tile(x, (2, 1)), t, llm_pair)
        v = c.cfg_alpha * v_both[:b] + (1.0 - c.cfg_alpha) * v_both[b:]
        x = x + v * (ts[step + 1] - ts[step])
    x = jnp.clip(x, -1.0, 1.0)
    ac = jnp.clip(jnp.round((x + 1.0) * (c.acoustic_codebook_size - 1)
                            / 2.0),
                  0, c.acoustic_codebook_size - 1).astype(jnp.int32) + \
        N_SPECIAL
    return jnp.concatenate([sem[:, None], ac], axis=-1)


# --------------------------------------------------------- codec decoder

def _alibi_slopes(n_heads: int) -> np.ndarray:
    def pow2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        s = pow2(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        s = pow2(closest) + pow2(2 * closest)[0::2][:n_heads - closest]
    return np.asarray(s, np.float32)


def init_audio_decoder(key, c: ModelConfig) -> dict:
    ks = iter(jax.random.split(
        key, 16 * sum(c.decoder_tf_lengths) + 4 * len(c.decoder_strides)
        + 16))
    d = c.tokenizer_dim
    cb_dim = c.tokenizer_semantic_dim + c.tokenizer_acoustic_dim

    def conv(out_ch, in_ch, kernel):
        # stored torch-layout (out, in, K) like the checkpoint; folded to
        # a plain weight at sanitize time
        scale = 1.0 / math.sqrt(in_ch * kernel)
        return {"conv": {"weight": jax.random.uniform(
            next(ks), (out_ch, in_ch, kernel), jnp.float32, -scale,
            scale)}}

    def tf_layer():
        return {
            "attention_norm": {"weight": jnp.ones(d)},
            "ffn_norm": {"weight": jnp.ones(d)},
            "attention": {
                "wq": init_linear(next(ks), d,
                                  c.tokenizer_n_heads
                                  * c.tokenizer_head_dim, bias=False),
                "wk": init_linear(next(ks), d,
                                  c.tokenizer_n_kv_heads
                                  * c.tokenizer_head_dim, bias=False),
                "wv": init_linear(next(ks), d,
                                  c.tokenizer_n_kv_heads
                                  * c.tokenizer_head_dim, bias=False),
                "wo": init_linear(next(ks),
                                  c.tokenizer_n_heads
                                  * c.tokenizer_head_dim, d, bias=False),
                "q_norm": {"weight": jnp.ones(
                    c.tokenizer_n_heads * c.tokenizer_head_dim)},
                "k_norm": {"weight": jnp.ones(
                    c.tokenizer_n_kv_heads * c.tokenizer_head_dim)},
            },
            "feed_forward": _swiglu_init(ks, d, c.tokenizer_hidden_dim),
            "attention_scale": jnp.full((d,), c.tokenizer_layer_scale_init),
            "ffn_scale": jnp.full((d,), c.tokenizer_layer_scale_init),
        }

    blocks = {}
    for i, (kernel, n_layers) in enumerate(zip(c.decoder_kernels,
                                               c.decoder_tf_lengths)):
        in_ch = cb_dim if i == 0 else d
        blocks[str(2 * i)] = conv(d, in_ch, kernel)
        blocks[str(2 * i + 1)] = {"layers": {
            str(j): tf_layer() for j in range(n_layers)}}
    return {
        "quantizer": {"semantic_codebook": {
            "cluster_usage": jnp.ones((c.semantic_codebook_size,)),
            "embedding_sum": jax.random.normal(
                next(ks), (c.semantic_codebook_size,
                           c.tokenizer_semantic_dim)) * 0.02,
        }},
        "decoder_blocks": blocks,
        "output_proj": conv(c.tokenizer_patch_size, d,
                            c.tokenizer_patch_proj_kernel_size),
    }


def _wn_conv1d(p: dict, x: Array, stride: int, pad_mode: str) -> Array:
    """Causal conv on (B, T, C) with torch-layout (out, in, K) weight."""
    w = p["conv"]["weight"]
    kernel = w.shape[2]
    pad_total = kernel - stride
    n_frames = (x.shape[1] - kernel + pad_total) / stride + 1
    target = (math.ceil(n_frames) - 1) * stride + (kernel - pad_total)
    extra = max(0, target - x.shape[1])
    mode = {"constant": "constant", "replicate": "edge",
            "reflect": "reflect"}[pad_mode]
    x = jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)), mode=mode)
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)), (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))


def _wn_conv_transpose1d(p: dict, x: Array, stride: int) -> Array:
    w = p["conv"]["weight"]                       # (out=in_dim, in, K)
    t = x.shape[1]
    y = jax.lax.conv_transpose(
        x, jnp.transpose(w, (2, 0, 1)), (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True)
    return y[:, :t * stride]


def _alibi_attention(p: dict, c: ModelConfig, x: Array, slopes: Array,
                     window: int) -> Array:
    b, t, _ = x.shape
    nh, nkv, hd = (c.tokenizer_n_heads, c.tokenizer_n_kv_heads,
                   c.tokenizer_head_dim)
    q = apply_linear(p["wq"], x)
    k = apply_linear(p["wk"], x)
    v = apply_linear(p["wv"], x)
    q = _rms(q, p["q_norm"]["weight"], 1e-6)
    k = _rms(k, p["k_norm"]["weight"], 1e-6)
    q = q.reshape(b, t, nh, hd)
    k = k.reshape(b, t, nkv, hd)
    v = v.reshape(b, t, nkv, hd)
    pos = jnp.arange(t)
    dist = pos[None, :] - pos[:, None]        # j - i
    bias = slopes[:, None, None] * dist[None].astype(jnp.float32)
    mask = jnp.where(dist > 0, -1e9, 0.0)     # causal
    if window > 0:
        mask = mask + jnp.where(dist < -window, -1e9, 0.0)
    o = attention(q, k, v, mask=(bias + mask)[None])
    return apply_linear(p["wo"], o.reshape(b, t, -1))


def audio_decode(p: dict, c: ModelConfig, codes: Array) -> Array:
    """codes (B, T, 37) -> waveform (B, T * samples_per_frame)."""
    sem = codes[:, :, 0] - N_SPECIAL
    ac = codes[:, :, 1:] - N_SPECIAL
    cb = p["quantizer"]["semantic_codebook"]
    codebook = cb["embedding_sum"].astype(jnp.float32) / jnp.maximum(
        cb["cluster_usage"].astype(jnp.float32)[:, None], 1e-8)
    sem_emb = codebook[jnp.clip(sem, 0, c.semantic_codebook_size - 1)]
    ac_emb = 2.0 * ac.astype(jnp.float32) / \
        (c.acoustic_codebook_size - 1) - 1.0
    x = jnp.concatenate([sem_emb, ac_emb], axis=-1)

    slopes = jnp.asarray(_alibi_slopes(c.tokenizer_n_heads))
    windows = [2, 4, 8, 16]
    for i, (stride, n_layers) in enumerate(zip(c.decoder_strides,
                                               c.decoder_tf_lengths)):
        conv = p["decoder_blocks"][str(2 * i)]
        if stride > 1:
            x = _wn_conv_transpose1d(conv, x, stride)
        else:
            x = _wn_conv1d(conv, x, stride, "replicate")
        blk = p["decoder_blocks"][str(2 * i + 1)]
        w = windows[i] if i < len(windows) else 16
        for j in range(n_layers):
            lp = blk["layers"][str(j)]
            h = _alibi_attention(
                lp["attention"], c,
                _rms(x, lp["attention_norm"]["weight"],
                     c.tokenizer_norm_eps), slopes, w)
            x = x + h * lp["attention_scale"]
            h = _swiglu(lp["feed_forward"],
                        _rms(x, lp["ffn_norm"]["weight"],
                             c.tokenizer_norm_eps))
            x = x + h * lp["ffn_scale"]
    x = _wn_conv1d(p["output_proj"], x, 1, "reflect")   # (B, T', patch)
    return x.reshape(x.shape[0], -1)


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """Voxtral-4B-TTS."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None
        self._voice_embeddings = {}
        self._voice_embedding_files = {}
        self._text_to_audio_token_id = None
        self._audio_to_text_token_id = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        cfg = self.config
        keys = jax.random.split(key, 4)
        return {
            "language_model": init_llama(keys[0], cfg.llama_config,
                                         lm_head=False),
            "audio_codebook_embeddings": {"embeddings": init_embedding(
                keys[1], cfg.audio_embedding_size, cfg.dim)},
            "acoustic_transformer": init_acoustic_head(keys[2], cfg),
            "audio_tokenizer": init_audio_decoder(keys[3], cfg),
        }

    # -------------------------------------------------------- sanitize

    def sanitize(self, weights):
        import re as _re

        cfg = self.config
        out = {}
        wn_g = {k: v for k, v in weights.items()
                if k.endswith("parametrizations.weight.original0")}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k.endswith("parametrizations.weight.original0"):
                continue
            if k.endswith("parametrizations.weight.original1"):
                base = k[:-len(".parametrizations.weight.original1")]
                g = wn_g.get(base + ".parametrizations.weight.original0")
                vv = np.asarray(v, np.float64)
                norm = np.sqrt((vv * vv).sum(axis=(1, 2), keepdims=True)
                               + 1e-12)
                folded = vv / norm
                if g is not None:
                    folded = folded * np.asarray(g, np.float64)
                out[base + ".weight"] = jnp.asarray(folded, jnp.float32)
                continue
            if k == "tok_embeddings.weight" or \
                    k == "mm_audio_embeddings.tok_embeddings.weight":
                out["language_model.model.embed_tokens.weight"] = v
                continue
            if k == "norm.weight":
                out["language_model.model.norm.weight"] = v
                continue
            if k == "output.weight":
                if not cfg.tied_embeddings:
                    out["language_model.lm_head.weight"] = v
                continue
            if k.startswith("mm_audio_embeddings."
                            "audio_codebook_embeddings."):
                out["audio_codebook_embeddings." + k.split(".", 2)[2]] = v
                continue
            m = _re.match(r"layers\.(\d+)\.(.*)", k)
            if m:
                idx, suffix = m.groups()
                remap = {
                    "attention.wq.weight": "self_attn.q_proj.weight",
                    "attention.wk.weight": "self_attn.k_proj.weight",
                    "attention.wv.weight": "self_attn.v_proj.weight",
                    "attention.wo.weight": "self_attn.o_proj.weight",
                    "feed_forward.w1.weight": "mlp.gate_proj.weight",
                    "feed_forward.w2.weight": "mlp.down_proj.weight",
                    "feed_forward.w3.weight": "mlp.up_proj.weight",
                    "attention_norm.weight": "input_layernorm.weight",
                    "ffn_norm.weight": "post_attention_layernorm.weight",
                }.get(suffix, suffix)
                out[f"language_model.model.layers.{idx}.{remap}"] = v
                continue
            out[k] = v
        return out

    # ---------------------------------------------------------- prompt

    def _get_voice_embedding(self, voice: str) -> Optional[np.ndarray]:
        emb = self._voice_embeddings.get(voice)
        if emb is not None:
            return emb
        f = self._voice_embedding_files.get(voice)
        if f is None:
            return None
        from safetensors import safe_open

        with safe_open(str(f), framework="np") as sf:
            names = list(sf.keys())
            emb = sf.get_tensor("embedding" if "embedding" in names
                                else names[0])
        emb = np.asarray(emb, np.float32)
        self._voice_embeddings[voice] = emb
        return emb

    def _encode_text(self, text: str, voice: str) -> List[int]:
        text = sanitize_tts_input_text_for_demo(text)
        if self.tokenizer is None:
            raise RuntimeError("Tokenizer not loaded")
        if hasattr(self.tokenizer, "encode_speech_request"):
            from mistral_common.protocol.speech.request import \
                SpeechRequest  # pragma: no cover - env dependent

            req = SpeechRequest(input=text, voice=voice)
            return list(self.tokenizer.encode_speech_request(req).tokens)
        if hasattr(self.tokenizer, "encode_speech"):
            # test/duck-typed hook: encode_speech(text, voice) -> ids
            return list(self.tokenizer.encode_speech(text, voice))
        raise RuntimeError(
            "Voxtral TTS requires a Mistral speech tokenizer "
            "(mistral-common[audio]) to build the prompt")

    def _build_input_embeddings(self, ids: np.ndarray,
                                voice: str) -> Array:
        cfg = self.config
        p = self.params
        emb = np.array(apply_embedding(
            p["language_model"]["model"]["embed_tokens"],
            jnp.asarray(ids[None])))
        voice_emb = self._get_voice_embedding(voice)
        if voice_emb is None:
            return jnp.asarray(emb)
        audio_pos = np.where(ids == cfg.audio_token_id)[0]
        take = min(len(audio_pos), voice_emb.shape[0])
        emb[0, audio_pos[:take]] = voice_emb[:take]
        return jnp.asarray(emb)

    # ------------------------------------------------------------ decode

    def _global_offsets(self) -> np.ndarray:
        cfg = self.config
        sem_size = cfg.semantic_codebook_size + N_SPECIAL
        ac_size = cfg.acoustic_codebook_size + N_SPECIAL
        return np.asarray(
            [0] + [sem_size + i * ac_size
                   for i in range(cfg.n_acoustic_codebook)], np.int32)

    def _decode_fns(self, pb: int, cap: int):
        cfg = self.config
        lcfg = cfg.llama_config
        offsets = jnp.asarray(self._global_offsets())

        def prefill(params, embeds, plen):
            caches = llama_make_caches(lcfg, 1, cap, dtype=embeds.dtype)
            mask = jnp.where(jnp.arange(cap) < plen, 0.0, -jnp.inf)[None]
            hidden, caches = llama_forward(
                params["language_model"], lcfg, embeds, caches=caches,
                offset=0, mask=mask)
            # first decode step feeds the AUDIO token embedding
            # (reference voxtral_tts.py:617-625)
            tok_emb = apply_embedding(
                params["language_model"]["model"]["embed_tokens"],
                jnp.asarray([[cfg.audio_token_id]]))
            hidden, caches = llama_forward(
                params["language_model"], lcfg, tok_emb, caches=caches,
                offset=plen)
            return caches, hidden[:, -1]

        def chunk(params, caches, offset, h, key, done):
            def step(carry, _):
                caches, offset, h, key, done = carry
                key, sub = jax.random.split(key)
                codes = acoustic_decode_frame(
                    params["acoustic_transformer"], cfg, h, sub)  # (1,37)
                done_new = done | (codes[0, 0] <= 1)
                emit = (codes[0], ~done_new)
                gidx = codes + offsets[None]
                emb = apply_embedding(
                    params["audio_codebook_embeddings"]["embeddings"],
                    gidx).sum(axis=1, keepdims=True)  # (1, 1, dim)
                hidden, caches = llama_forward(
                    params["language_model"], lcfg, emb, caches=caches,
                    offset=offset)
                return (caches, offset + 1, hidden[:, -1], key, done_new),\
                    emit
            carry, (codes, valid) = jax.lax.scan(
                step, (caches, offset, h, key, done), None,
                length=DEC_CHUNK)
            return carry, codes, valid

        return jax.jit(prefill), jax.jit(chunk, donate_argnums=(1,))

    def decode_audio_codes(self, codes: np.ndarray) -> np.ndarray:
        """codes (T, 37) -> waveform (T * samples_per_frame,)."""
        cfg = self.config
        n = codes.shape[0]
        nb = pad_to_multiple(max(n, 1), 64)
        padded = np.full((1, nb, codes.shape[1]), N_SPECIAL, np.int32)
        padded[0, :n] = codes
        fn = self._jit_cache.get(("codec", nb))
        if fn is None:
            fn = jax.jit(lambda p, cds: audio_decode(
                p["audio_tokenizer"], cfg, cds))
            self._jit_cache[("codec", nb)] = fn
        wav = np.asarray(fn(self.params, jnp.asarray(padded)))
        return wav[0, :n * cfg.samples_per_frame]

    # ---------------------------------------------------------- generate

    def generate(self, text: str, voice: str = "casual_male",
                 max_tokens: int = 4096, stream: bool = False,
                 streaming_interval: float = 2.0, seed: int = 0, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        cfg = self.config
        t0 = time.perf_counter()
        ids = np.asarray(self._encode_text(text, voice), np.int32)
        embeds = self._build_input_embeddings(ids, voice)
        plen = embeds.shape[1]
        pb = _bucket(plen)
        embeds = jnp.pad(embeds, ((0, 0), (0, pb - plen), (0, 0)))
        cap = pb + 1 + pad_to_multiple(max_tokens + 1, DEC_CHUNK)

        fns = self._jit_cache.get(("dec", pb, cap))
        if fns is None:
            fns = self._decode_fns(pb, cap)
            self._jit_cache[("dec", pb, cap)] = fns
        prefill, chunk = fns

        caches, h = prefill(self.params, embeds, jnp.int32(plen))
        key = jax.random.PRNGKey(seed)
        offset = jnp.int32(plen + 1)
        done = jnp.asarray(False)
        frames: List[np.ndarray] = []
        yielded = 0
        chunk_idx = 0
        frames_per_chunk = max(1, int(streaming_interval / 0.08))
        context_frames = 16
        spf = cfg.samples_per_frame
        steps = 0
        while steps < max_tokens:
            (caches, offset, h, key, done), codes, valid = chunk(
                self.params, caches, offset, h, key, done)
            codes = np.asarray(codes)
            valid = np.asarray(valid)
            for i in range(DEC_CHUNK):
                if valid[i]:
                    frames.append(codes[i])
            steps += DEC_CHUNK
            if stream and len(frames) - yielded >= frames_per_chunk:
                ctx = max(0, yielded - context_frames)
                wav = self.decode_audio_codes(np.stack(frames[ctx:]))
                wav = wav[(yielded - ctx) * spf:]
                dt = max(time.perf_counter() - t0, 1e-6)
                dur = len(wav) / cfg.sample_rate
                yield GenerationResult(
                    audio=wav, samples=len(wav),
                    sample_rate=cfg.sample_rate, segment_idx=chunk_idx,
                    token_count=len(frames) - yielded,
                    audio_duration=format_duration(dur),
                    real_time_factor=round(dur / dt, 3),
                    prompt={"tokens": len(frames) - yielded,
                            "tokens-per-sec": round(
                                (len(frames) - yielded) / dt, 2)},
                    audio_samples={"samples": len(wav),
                                   "samples-per-sec": cfg.sample_rate},
                    processing_time_seconds=dt,
                    peak_memory_usage=peak_memory_gb(),
                    is_streaming_chunk=True, is_final_chunk=False)
                yielded = len(frames)
                chunk_idx += 1
                t0 = time.perf_counter()
            if bool(np.asarray(done)):
                break

        if not frames:
            raise RuntimeError("No audio frames generated")
        frames = frames[:max_tokens]
        remaining = len(frames) - yielded
        if stream and yielded > 0 and remaining > 0:
            ctx = max(0, yielded - context_frames)
            wav = self.decode_audio_codes(np.stack(frames[ctx:]))
            wav = wav[(yielded - ctx) * spf:]
        elif stream and yielded > 0:
            wav = np.zeros((0,), np.float32)
        else:
            wav = self.decode_audio_codes(np.stack(frames))
        dt = max(time.perf_counter() - t0, 1e-6)
        dur = len(wav) / cfg.sample_rate
        count = remaining if stream and yielded > 0 else len(frames)
        yield GenerationResult(
            audio=wav, samples=len(wav), sample_rate=cfg.sample_rate,
            segment_idx=chunk_idx if stream else 0, token_count=count,
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3),
            prompt={"tokens": count,
                    "tokens-per-sec": round(count / dt, 2)},
            audio_samples={"samples": len(wav),
                           "samples-per-sec": cfg.sample_rate},
            processing_time_seconds=dt,
            peak_memory_usage=peak_memory_gb(),
            is_streaming_chunk=stream, is_final_chunk=stream)

    # ---------------------------------------------------------- loading

    def post_load_hook(self, model_path):
        import json
        import warnings

        model_path = Path(model_path)
        tekken = model_path / "tekken.json"
        if tekken.is_file():
            try:
                data = json.loads(tekken.read_text())
                specials = {i["token_str"]: i["rank"]
                            for i in data.get("special_tokens", [])
                            if "token_str" in i and "rank" in i}
                self._text_to_audio_token_id = specials.get(
                    "[NEXT_AUDIO_TEXT]")
                self._audio_to_text_token_id = specials.get(
                    "[REPEAT_AUDIO_TEXT]")
            except Exception as e:
                warnings.warn(f"Could not parse tekken metadata: {e}")
            try:
                from mistral_common.tokens.tokenizers.mistral import \
                    MistralTokenizer  # pragma: no cover - env dependent

                self.tokenizer = MistralTokenizer.from_file(str(tekken))
            except ImportError:
                warnings.warn("mistral-common not installed; pass a "
                              "tokenizer with encode_speech(text, voice)")
        else:
            try:
                from transformers import AutoTokenizer

                self.tokenizer = AutoTokenizer.from_pretrained(
                    str(model_path))
            except Exception as e:
                warnings.warn(f"Could not load tokenizer: {e}")
        voice_dir = model_path / "voice_embedding"
        if voice_dir.exists():
            for f in voice_dir.glob("*.safetensors"):
                self._voice_embedding_files[f.stem] = f
        return self


__all__ = ["Model", "ModelConfig", "VOICE_MAP", "acoustic_decode_frame",
           "audio_decode", "sanitize_tts_input_text_for_demo"]
