"""LASR-CTC: rope-conformer encoder + CTC head.

Parity: /root/reference/mlx_audio/stt/models/lasr_ctc/lasr.py (neox-half
rotary :12-66, dense+2xconv-stride-2 subsampler :68-93, weighted-residual
conformer blocks with GLU conv module :270-330, LasrForCTC :357) and
config.py (rope_parameters nesting, residual weights).

TPU design: one bucketed jitted forward (non-AR CTC); greedy CTC collapse
on the host. Whisper-style 128-mel features.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_layer_norm,
    init_linear,
)
from ...models.base import STTOutput
from ..whisper.audio import SAMPLE_RATE, log_mel_spectrogram

Array = jax.Array

MEL_BUCKETS = (256, 512, 1024, 2048, 3000)


def _bucket(n, buckets=MEL_BUCKETS):
    for b in buckets:
        if n <= b:
            return b
    return ((n + 2999) // 3000) * 3000


@dataclass
class LasrEncoderConfig(BaseModelArgs):
    hidden_size: int = 512
    num_hidden_layers: int = 17
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    intermediate_size: int = 2048
    conv_kernel_size: int = 32
    convolution_bias: bool = False
    num_mel_bins: int = 128
    subsampling_conv_channels: int = 256
    subsampling_conv_kernel_size: int = 5
    subsampling_conv_stride: int = 2
    layer_norm_eps: float = 1e-6
    attention_bias: bool = False
    rope_theta: float = 10000.0
    conv_residual_weights: Optional[List[float]] = None
    feed_forward_residual_weights: Optional[List[float]] = None
    rope_parameters: Optional[dict] = None

    def __post_init__(self):
        if self.conv_residual_weights is None:
            self.conv_residual_weights = [2.0, 1.0]
        if self.feed_forward_residual_weights is None:
            self.feed_forward_residual_weights = [1.5, 0.5]
        if self.rope_parameters and "rope_theta" in self.rope_parameters:
            self.rope_theta = self.rope_parameters["rope_theta"]

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "lasr"
    vocab_size: int = 512
    encoder_config: Optional[dict] = None
    pad_token_id: int = 0
    model_path: str = ""

    def __post_init__(self):
        self.encoder = LasrEncoderConfig.from_dict(self.encoder_config or {})


# ------------------------------------------------------------------- init

def init_lasr(key, cfg: ModelConfig) -> dict:
    e = cfg.encoder
    ks = iter(jax.random.split(key, 16 + 12 * e.num_hidden_layers))
    d = e.hidden_size
    layers = {}
    for i in range(e.num_hidden_layers):
        layers[str(i)] = {
            "feed_forward1": _init_ff(ks, e),
            "self_attn": {
                "q_proj": init_linear(next(ks), d, d,
                                      bias=e.attention_bias),
                "k_proj": init_linear(next(ks), d, d,
                                      bias=e.attention_bias),
                "v_proj": init_linear(next(ks), d, d,
                                      bias=e.attention_bias),
                "o_proj": init_linear(next(ks), d, d,
                                      bias=e.attention_bias)},
            "conv": {
                "pointwise_conv1": init_conv1d(next(ks), d, 2 * d, 1,
                                               bias=e.convolution_bias),
                "depthwise_conv": init_conv1d(next(ks), d, d,
                                              e.conv_kernel_size,
                                              groups=d,
                                              bias=e.convolution_bias),
                "norm": {"weight": jnp.ones(d), "bias": jnp.zeros(d),
                         "running_mean": jnp.zeros(d),
                         "running_var": jnp.ones(d)},
                "pointwise_conv2": init_conv1d(next(ks), d, d, 1,
                                               bias=e.convolution_bias)},
            "feed_forward2": _init_ff(ks, e),
            "norm_feed_forward1": init_layer_norm(d),
            "norm_self_att": init_layer_norm(d),
            "norm_conv": init_layer_norm(d),
            "norm_feed_forward2": init_layer_norm(d),
            "norm_out": init_layer_norm(d),
        }
    return {
        "encoder": {
            "subsampler": {
                "dense_0": init_linear(next(ks), e.num_mel_bins, d),
                "conv_0": init_conv1d(next(ks), d, d,
                                      e.subsampling_conv_kernel_size),
                "conv_1": init_conv1d(next(ks), d,
                                      e.subsampling_conv_channels,
                                      e.subsampling_conv_kernel_size),
                "dense_1": init_linear(next(ks),
                                       e.subsampling_conv_channels, d)},
            "layers": layers,
            "out_norm": init_layer_norm(d),
        },
        "ctc_head": init_linear(next(ks), d, cfg.vocab_size),
    }


def _init_ff(ks, e):
    return {"linear1": init_linear(next(ks), e.hidden_size,
                                   e.intermediate_size,
                                   bias=e.attention_bias),
            "linear2": init_linear(next(ks), e.intermediate_size,
                                   e.hidden_size, bias=e.attention_bias)}


# ---------------------------------------------------------------- forward

def _rope_half(x: Array, cos: Array, sin: Array) -> Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


def _ff(p, x):
    return apply_linear(p["linear2"],
                        jax.nn.silu(apply_linear(p["linear1"], x)))


def _conv_module(p, x, kernel: int):
    h = apply_conv1d(p["pointwise_conv1"], x)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)
    pad_l = (kernel - 1) // 2
    h = jnp.pad(h, ((0, 0), (pad_l, kernel - 1 - pad_l), (0, 0)))
    h = apply_conv1d(p["depthwise_conv"], h, groups=x.shape[-1])
    n = p["norm"]
    h = (h - n["running_mean"]) * jax.lax.rsqrt(n["running_var"] + 1e-5) \
        * n["weight"] + n["bias"]
    h = jax.nn.silu(h)
    return apply_conv1d(p["pointwise_conv2"], h)


def lasr_forward(params: dict, cfg: ModelConfig, mel: Array) -> Array:
    """(B, T, n_mels) -> CTC logits (B, T', vocab)."""
    e = cfg.encoder
    p = params["encoder"]
    s = p["subsampler"]
    x = jax.nn.relu(apply_linear(s["dense_0"], mel))
    x = jax.nn.relu(apply_conv1d(s["conv_0"], x,
                                 stride=e.subsampling_conv_stride))
    x = jax.nn.relu(apply_conv1d(s["conv_1"], x,
                                 stride=e.subsampling_conv_stride))
    x = apply_linear(s["dense_1"], x)

    b, t, d = x.shape
    h = e.num_attention_heads
    hd = e.head_dim
    inv = 1.0 / (e.rope_theta ** (jnp.arange(0, hd, 2,
                                             dtype=jnp.float32) / hd))
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None]
    ang = jnp.concatenate([ang, ang], axis=-1)
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    wf = e.feed_forward_residual_weights
    wc = e.conv_residual_weights
    for i in range(e.num_hidden_layers):
        lp = p["layers"][str(i)]
        x = wf[0] * x + wf[1] * _ff(
            lp["feed_forward1"],
            apply_layer_norm(lp["norm_feed_forward1"], x,
                             eps=e.layer_norm_eps))
        hn = apply_layer_norm(lp["norm_self_att"], x, eps=e.layer_norm_eps)
        sa = lp["self_attn"]
        q = apply_linear(sa["q_proj"], hn).reshape(b, t, h, hd)
        k = apply_linear(sa["k_proj"], hn).reshape(b, t, h, hd)
        v = apply_linear(sa["v_proj"], hn).reshape(b, t, h, hd)
        q = _rope_half(q, cos, sin)
        k = _rope_half(k, cos, sin)
        from ....ops.attention import attention

        o = attention(q, k, v).reshape(b, t, d)
        x = x + apply_linear(sa["o_proj"], o)
        x = wc[0] * x + wc[1] * _conv_module(
            lp["conv"], apply_layer_norm(lp["norm_conv"], x,
                                         eps=e.layer_norm_eps),
            e.conv_kernel_size)
        x = wf[0] * x + wf[1] * _ff(
            lp["feed_forward2"],
            apply_layer_norm(lp["norm_feed_forward2"], x,
                             eps=e.layer_norm_eps))
        x = apply_layer_norm(lp["norm_out"], x, eps=e.layer_norm_eps)
    x = apply_layer_norm(p["out_norm"], x, eps=e.layer_norm_eps)
    return apply_linear(params["ctc_head"], x)


# -------------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATE

    def init_params(self, key):
        return init_lasr(key, self.config)

    def generate(self, audio, *, verbose: bool = False, **kwargs
                 ) -> STTOutput:
        t0 = time.time()
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio

            audio = np.asarray(load_audio(str(audio), SAMPLE_RATE))
        wav = np.asarray(audio, np.float32).reshape(-1)
        mel = np.asarray(log_mel_spectrogram(
            wav, n_mels=self.config.encoder.num_mel_bins))
        t = mel.shape[0]
        tb = _bucket(t)
        pad = np.zeros((1, tb, mel.shape[1]), np.float32)
        pad[0, :t] = mel
        fn = self._jit_cache.get(("fwd", tb))
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, m: lasr_forward(p, cfg, m))
            self._jit_cache[("fwd", tb)] = fn
        logits = np.asarray(fn(self.params, jnp.asarray(pad)))[0]
        sub = self.config.encoder.subsampling_conv_stride ** 2
        n_valid = max(self._sub_len(t), 1)
        tokens = logits[:n_valid].argmax(axis=-1)
        # CTC collapse: drop repeats then blanks (pad_token_id)
        keep = np.concatenate([[True], tokens[1:] != tokens[:-1]])
        toks = tokens[keep]
        toks = toks[toks != self.config.pad_token_id]
        text = (self._tokenizer.decode(toks.tolist(),
                                       skip_special_tokens=True)
                if self._tokenizer is not None
                else " ".join(map(str, toks.tolist())))
        dt = time.time() - t0
        if verbose:
            print(text)
        return STTOutput(
            text=text.strip(), language="en",
            segments=[{"text": text.strip(), "start": 0.0,
                       "end": len(wav) / SAMPLE_RATE}],
            prompt_tokens=0, generation_tokens=int(len(toks)),
            total_tokens=int(len(toks)), total_time=dt,
            prompt_tps=0.0,
            generation_tps=len(toks) / dt if dt else 0.0)

    __call__ = generate

    def _sub_len(self, t: int) -> int:
        e = self.config.encoder
        k, s = e.subsampling_conv_kernel_size, e.subsampling_conv_stride
        for _ in range(2):
            t = (t - k) // s + 1
        return max(t, 0)

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if "rotary_emb.inv_freq" in k:
                continue
            if "num_batches_tracked" in k:
                continue
            if "ctc_head.weight" in k and v.ndim == 3:
                v = v[..., 0]                       # HF conv1x1 -> linear
            elif "conv" in k and k.endswith("weight") and v.ndim == 3 \
                    and v.shape[0] >= v.shape[-1]:
                v = jnp.transpose(v, (2, 1, 0))     # torch OIK -> KIO
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        try:
            from transformers import AutoTokenizer

            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path))
        except Exception:
            model._tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "LasrEncoderConfig", "lasr_forward",
           "init_lasr"]
