"""Fish-Speech S1 DAC: causal DAC with window transformers + semantic RVQ.

Parity: reference codec/models/fish_s1_dac/fish_s1_dac.py — causal
weight-normed convs (left pad (k-1)d+1-s, :265-296) and transposed convs
(right trim k-s, :299-330), snake residual units (:933-958), encoder/
decoder stacks with optional WindowLimitedTransformer stages (GPT-J pair
RoPE, fused wqkv, TFRMSNorm, LayerScale 1e-2, causal window mask,
:637-790), and the DownsampleResidualVectorQuantize: conv+ConvNeXt
down/upsampling around a window-128 pre/post transformer, a 1-book
semantic VQ (4096) plus a 9-book residual VQ (1024) with L2-normalized
nearest-neighbour matching (:379-505, :793-925); codes decode via
from_codes -> post_module -> upsample -> decoder -> tanh (:1173-1196).

TPU design: channel-last throughout, weight-norm folded to dense WIO
kernels at sanitize, audio padded to frame_length buckets (causal convs
make the valid prefix exact), and each of encode/decode is one jitted
program per bucket.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_conv_transpose1d, apply_layer_norm,
                    apply_linear, apply_rms_norm, init_conv1d,
                    init_conv_transpose1d, init_layer_norm, init_linear,
                    init_rms_norm)
from ....nn.layers import convert_torch_conv_transpose_weight
from ....ops.attention import attention
from ....ops.rope import apply_rope_interleaved, rope_freqs
from ..blocks import apply_snake, init_snake

Array = jax.Array

TIME_BUCKETS = (4096, 8192, 16384, 32768, 65536, 131072)


@dataclass
class TransformerArgs(BaseModelArgs):
    n_layer: int = 8
    n_head: int = 8
    dim: int = 512
    intermediate_size: int = 1536
    n_local_heads: int = -1
    head_dim: int = 64
    rope_base: float = 10000.0
    norm_eps: float = 1e-5

    def __post_init__(self):
        if self.n_local_heads == -1:
            self.n_local_heads = self.n_head


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "fish_s1_dac"
    encoder_dim: int = 64
    encoder_rates: List[int] = field(default_factory=lambda: [2, 4, 8, 8])
    latent_dim: int = 1024
    decoder_dim: int = 1536
    decoder_rates: List[int] = field(default_factory=lambda: [8, 8, 4, 2])
    sample_rate: int = 44100
    causal: bool = True
    encoder_transformer_layers: List[int] = field(
        default_factory=lambda: [0, 0, 0, 4])
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    semantic_codebook_size: int = 4096
    downsample_factor: List[int] = field(default_factory=lambda: [2, 2])
    vq_dim: int = 1024
    vq_transformer: Optional[Dict] = None
    enc_transformer: Optional[Dict] = None
    vq_window: int = 128
    enc_window: int = 512
    model_path: str = ""

    def __post_init__(self):
        if not isinstance(self.vq_transformer, TransformerArgs):
            self.vq_transformer = TransformerArgs.from_dict(
                self.vq_transformer
                or dict(n_layer=8, n_head=16, dim=1024,
                        intermediate_size=3072, head_dim=64))

    @property
    def hop_length(self) -> int:
        hop = 1
        for r in self.encoder_rates:
            hop *= r
        return hop

    @property
    def frame_length(self) -> int:
        f = self.hop_length
        for d in self.downsample_factor:
            f *= d
        return f

    def enc_tf_args(self, dim: int, n_layer: int) -> TransformerArgs:
        base = dict(self.enc_transformer or {})
        base["n_layer"] = n_layer
        base.setdefault("n_head", max(1, dim // 64))
        base.setdefault("head_dim", dim // base["n_head"])
        base.setdefault("dim", dim)
        base.setdefault("intermediate_size", dim * 3)
        return TransformerArgs.from_dict(base)


# ---------------------------------------------------------- causal convs

def causal_conv(p: dict, x: Array, kernel: int, stride: int = 1,
                dilation: int = 1, groups: int = 1) -> Array:
    """Left pad ke - s (reference CausalConvNet); assumes T % stride == 0
    so no extra right pad is needed (audio is frame-length padded)."""
    ke = (kernel - 1) * dilation + 1
    x = jnp.pad(x, ((0, 0), (ke - stride, 0), (0, 0)))
    return apply_conv1d(p, x, stride=stride, dilation=dilation,
                        groups=groups)


def centered_conv(p: dict, x: Array, kernel: int, stride: int = 1,
                  dilation: int = 1, padding: int = 0,
                  groups: int = 1) -> Array:
    return apply_conv1d(p, x, stride=stride, dilation=dilation,
                        padding=padding, groups=groups)


def causal_conv_transpose(p: dict, x: Array, kernel: int,
                          stride: int) -> Array:
    y = apply_conv_transpose1d(p, x, stride=stride)
    trim = kernel - stride
    return y[:, : y.shape[1] - trim] if trim > 0 else y


# ------------------------------------------------------------------ init

def _init_resunit(ks, dim: int) -> dict:
    return {"block": {"0": init_snake(dim),
                      "1": init_conv1d(next(ks), dim, dim, 7),
                      "2": init_snake(dim),
                      "3": init_conv1d(next(ks), dim, dim, 1)}}


def _apply_resunit(p: dict, x: Array, dilation: int, causal: bool
                   ) -> Array:
    b = p["block"]
    y = apply_snake(b["0"], x)
    if causal:
        y = causal_conv(b["1"], y, 7, dilation=dilation)
    else:
        y = centered_conv(b["1"], y, 7, dilation=dilation,
                          padding=((7 - 1) * dilation) // 2)
    y = apply_snake(b["2"], y)
    y = apply_conv1d(b["3"], y)
    return x + y


def _init_transformer(key, a: TransformerArgs, input_dim: int) -> dict:
    ks = iter(jax.random.split(key, 8 * a.n_layer + 4))
    layers = {}
    for i in range(a.n_layer):
        total = (a.n_head + 2 * a.n_local_heads) * a.head_dim
        layers[str(i)] = {
            "attention": {
                "wqkv": init_linear(next(ks), a.dim, total, bias=False),
                "wo": init_linear(next(ks), a.n_head * a.head_dim, a.dim,
                                  bias=False)},
            "attention_norm": init_rms_norm(a.dim),
            "ffn_norm": init_rms_norm(a.dim),
            "feed_forward": {
                "w1": init_linear(next(ks), a.dim, a.intermediate_size,
                                  bias=False),
                "w3": init_linear(next(ks), a.dim, a.intermediate_size,
                                  bias=False),
                "w2": init_linear(next(ks), a.intermediate_size, a.dim,
                                  bias=False)},
            "attention_layer_scale": {"gamma": jnp.full((a.dim,), 1e-2)},
            "ffn_layer_scale": {"gamma": jnp.full((a.dim,), 1e-2)}}
    p = {"layers": layers, "norm": init_rms_norm(a.dim)}
    if input_dim != a.dim:
        p["input_proj"] = init_linear(next(ks), input_dim, a.dim)
        p["output_proj"] = init_linear(next(ks), a.dim, input_dim)
    return p


def _init_convnext(ks, dim: int) -> dict:
    return {"dwconv": {"conv": init_conv1d(next(ks), dim, dim, 7,
                                           groups=dim)},
            "norm": init_layer_norm(dim),
            "pwconv1": init_linear(next(ks), dim, 4 * dim),
            "pwconv2": init_linear(next(ks), 4 * dim, dim),
            "gamma": jnp.full((dim,), 1e-6)}


def _init_vq(ks, input_dim: int, codebook_size: int,
             codebook_dim: int) -> dict:
    return {"in_proj": init_linear(next(ks), input_dim, codebook_dim),
            "out_proj": init_linear(next(ks), codebook_dim, input_dim),
            "codebook": {"weight": jax.random.normal(
                next(ks), (codebook_size, codebook_dim)) * 0.1}}


def init_fish_dac(key, cfg: ModelConfig) -> dict:
    ks = iter(jax.random.split(key, 512))
    d = cfg.encoder_dim
    enc = {"0": init_conv1d(next(ks), 1, d, 7)}
    for bi, (stride, ntl) in enumerate(zip(cfg.encoder_rates,
                                           cfg.encoder_transformer_layers)):
        d *= 2
        blk = {"0": _init_resunit(ks, d // 2),
               "1": _init_resunit(ks, d // 2),
               "2": _init_resunit(ks, d // 2),
               "3": init_snake(d // 2),
               "4": init_conv1d(next(ks), d // 2, d, 2 * stride)}
        if ntl:
            blk["5"] = _init_transformer(next(ks),
                                         cfg.enc_tf_args(d, ntl), d)
        enc[str(bi + 1)] = {"block": blk}
    n_enc = len(cfg.encoder_rates)
    enc[str(n_enc + 1)] = init_snake(d)
    enc[str(n_enc + 2)] = init_conv1d(next(ks), d, cfg.latent_dim, 3)

    ch = cfg.decoder_dim
    dec = {"0": init_conv1d(next(ks), cfg.latent_dim, ch, 7)}
    for i, stride in enumerate(cfg.decoder_rates):
        in_d, out_d = ch // 2 ** i, ch // 2 ** (i + 1)
        dec[str(i + 1)] = {"block": {
            "0": init_snake(in_d),
            "1": init_conv_transpose1d(next(ks), in_d, out_d, 2 * stride),
            "2": _init_resunit(ks, out_d),
            "3": _init_resunit(ks, out_d),
            "4": _init_resunit(ks, out_d)}}
    n_dec = len(cfg.decoder_rates)
    dec[str(n_dec + 1)] = init_snake(out_d)
    dec[str(n_dec + 2)] = init_conv1d(next(ks), out_d, 1, 7)

    v = cfg.vq_dim
    down, up = {}, {}
    dims = [v] + [v] * len(cfg.downsample_factor)
    for i, f in enumerate(cfg.downsample_factor):
        down[str(i)] = {"0": {"conv": init_conv1d(next(ks), dims[i],
                                                  dims[i + 1], f)},
                        "1": _init_convnext(ks, dims[i + 1])}
    for j, (i, f) in enumerate(reversed(list(
            enumerate(cfg.downsample_factor)))):
        up[str(j)] = {"0": {"conv": init_conv_transpose1d(
            next(ks), dims[i + 1], dims[i], f)},
            "1": _init_convnext(ks, dims[i])}

    quantizer = {
        "semantic_quantizer": {"quantizers": {"0": _init_vq(
            ks, v, cfg.semantic_codebook_size, cfg.codebook_dim)}},
        "quantizer": {"quantizers": {str(i): _init_vq(
            ks, v, cfg.codebook_size, cfg.codebook_dim)
            for i in range(cfg.n_codebooks)}},
        "downsample": down, "upsample": up,
        "pre_module": _init_transformer(next(ks), cfg.vq_transformer, v),
        "post_module": _init_transformer(next(ks), cfg.vq_transformer, v),
    }
    return {"encoder": {"block": enc}, "decoder": {"model": dec},
            "quantizer": quantizer}


# ------------------------------------------------------------ transformer

def window_transformer(p: dict, a: TransformerArgs, x: Array,
                       window: Optional[int], n_valid: Array) -> Array:
    """(B, T, D) causal window-limited transformer (reference :637-790)."""
    if "input_proj" in p:
        x = apply_linear(p["input_proj"], x)
    t = x.shape[1]
    inv_freq = rope_freqs(a.head_dim, a.rope_base)
    positions = jnp.arange(t)[None]
    qi = jnp.arange(t)[:, None]
    kj = jnp.arange(t)[None, :]
    allow = (kj <= qi) & (kj < n_valid)
    if window is not None:
        allow = allow & (kj >= jnp.maximum(qi - window + 1, 0))
    mask = jnp.where(allow, 0.0, -1e9)[None, None]
    kv = a.n_local_heads * a.head_dim
    for i in range(a.n_layer):
        blk = p["layers"][str(i)]
        h = apply_rms_norm(blk["attention_norm"], x, a.norm_eps)
        qkv = apply_linear(blk["attention"]["wqkv"], h)
        q = qkv[..., :kv].reshape(x.shape[0], t, a.n_head, a.head_dim)
        k = qkv[..., kv:2 * kv].reshape(x.shape[0], t, a.n_local_heads,
                                        a.head_dim)
        vv = qkv[..., 2 * kv:3 * kv].reshape(x.shape[0], t,
                                             a.n_local_heads, a.head_dim)
        q = apply_rope_interleaved(q, positions, inv_freq)
        k = apply_rope_interleaved(k, positions, inv_freq)
        o = attention(q, k, vv, mask=mask).reshape(x.shape[0], t, -1)
        o = apply_linear(blk["attention"]["wo"], o)
        x = x + o * blk["attention_layer_scale"]["gamma"]
        h = apply_rms_norm(blk["ffn_norm"], x, a.norm_eps)
        f = blk["feed_forward"]
        h = apply_linear(f["w2"], jax.nn.silu(apply_linear(f["w1"], h))
                         * apply_linear(f["w3"], h))
        x = x + h * blk["ffn_layer_scale"]["gamma"]
    x = apply_rms_norm(p["norm"], x, a.norm_eps)
    if "output_proj" in p:
        x = apply_linear(p["output_proj"], x)
    return x


def _convnext(p: dict, x: Array, causal: bool) -> Array:
    h = causal_conv(p["dwconv"]["conv"], x, 7, groups=x.shape[-1]) \
        if causal else centered_conv(p["dwconv"]["conv"], x, 7, padding=3,
                                     groups=x.shape[-1])
    h = apply_layer_norm(p["norm"], h, eps=1e-6)
    h = apply_linear(p["pwconv2"],
                     jax.nn.gelu(apply_linear(p["pwconv1"], h),
                                 approximate=False))
    return x + p["gamma"] * h


# ------------------------------------------------------------------- VQ

def _vq_indices(p: dict, z: Array) -> Array:
    lat = apply_linear(p["in_proj"], z)
    enc = lat / jnp.maximum(jnp.sqrt(jnp.sum(lat * lat, -1,
                                             keepdims=True)), 1e-12)
    cb = p["codebook"]["weight"]
    cbn = cb / jnp.maximum(jnp.sqrt(jnp.sum(cb * cb, -1,
                                            keepdims=True)), 1e-12)
    dist = (jnp.sum(enc * enc, -1, keepdims=True)
            - 2 * (enc @ cbn.T) + jnp.sum(cbn * cbn, -1)[None, None])
    return jnp.argmax(-dist, axis=-1)


def _vq_zq(p: dict, idx: Array) -> Array:
    return apply_linear(p["out_proj"], p["codebook"]["weight"][idx])


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def frame_length(self) -> int:
        return self.config.frame_length

    def init_params(self, key):
        return init_fish_dac(key, self.config)

    # ------------------------------------------------------------ graphs

    def _encoder_graph(self, p, x: Array) -> Array:
        cfg = self.config
        c = cfg.causal
        enc = p["encoder"]["block"]
        h = causal_conv(enc["0"], x, 7) if c \
            else centered_conv(enc["0"], x, 7, padding=3)
        d = cfg.encoder_dim
        for bi, (stride, ntl) in enumerate(zip(
                cfg.encoder_rates, cfg.encoder_transformer_layers)):
            d *= 2
            blk = enc[str(bi + 1)]["block"]
            for j, dil in enumerate((1, 3, 9)):
                h = _apply_resunit(blk[str(j)], h, dil, c)
            h = apply_snake(blk["3"], h)
            if c:
                h = causal_conv(blk["4"], h, 2 * stride, stride=stride)
            else:
                h = centered_conv(blk["4"], h, 2 * stride, stride=stride,
                                  padding=math.ceil(stride / 2))
            if "5" in blk:
                h = window_transformer(blk["5"], cfg.enc_tf_args(d, ntl),
                                       h, cfg.enc_window,
                                       jnp.int32(h.shape[1]))
        n = len(cfg.encoder_rates)
        h = apply_snake(enc[str(n + 1)], h)
        h = causal_conv(enc[str(n + 2)], h, 3) if c \
            else centered_conv(enc[str(n + 2)], h, 3, padding=1)
        return h

    def _quantize_graph(self, p, z: Array) -> Array:
        """latents (B, T, vq_dim) -> codes (B, T', 1+n_codebooks)."""
        cfg = self.config
        q = p["quantizer"]
        h = z
        for i, f in enumerate(cfg.downsample_factor):
            h = causal_conv(q["downsample"][str(i)]["0"]["conv"], h, f,
                            stride=f)
            h = _convnext(q["downsample"][str(i)]["1"], h, cfg.causal)
        h = window_transformer(q["pre_module"], cfg.vq_transformer, h,
                               cfg.vq_window, jnp.int32(h.shape[1]))
        sem = q["semantic_quantizer"]["quantizers"]["0"]
        s_idx = _vq_indices(sem, h)
        residual = h - _vq_zq(sem, s_idx)
        codes = [s_idx]
        for i in range(cfg.n_codebooks):
            qp = q["quantizer"]["quantizers"][str(i)]
            idx = _vq_indices(qp, residual)
            residual = residual - _vq_zq(qp, idx)
            codes.append(idx)
        return jnp.stack(codes, axis=-1)

    def _zq_from_codes(self, p, codes: Array) -> Array:
        """codes (B, T', books) -> pre-post_module z_q (B, T', vq_dim).

        Mirrors reference fish_s1_dac.py:1184-1208 encode_zq (semantic +
        residual codebook lookups summed, no post module)."""
        cfg = self.config
        q = p["quantizer"]
        sem = q["semantic_quantizer"]["quantizers"]["0"]
        zq = _vq_zq(sem, jnp.clip(codes[..., 0], 0,
                                  cfg.semantic_codebook_size - 1))
        for i in range(min(cfg.n_codebooks, codes.shape[-1] - 1)):
            qp = q["quantizer"]["quantizers"][str(i)]
            zq = zq + _vq_zq(qp, jnp.clip(codes[..., i + 1], 0,
                                          cfg.codebook_size - 1))
        return zq

    def _decode_graph(self, p, codes: Array) -> Array:
        """codes (B, T', books) -> audio (B, samples, 1)."""
        return self._decode_zq_graph(p, self._zq_from_codes(p, codes))

    def _decode_zq_graph(self, p, zq: Array) -> Array:
        """z_q (B, T', vq_dim) -> audio (B, samples, 1)
        (reference fish_s1_dac.py:1209-1214 decode_zq)."""
        cfg = self.config
        q = p["quantizer"]
        zq = window_transformer(q["post_module"], cfg.vq_transformer, zq,
                                cfg.vq_window, jnp.int32(zq.shape[1]))
        for j in range(len(cfg.downsample_factor)):
            f = cfg.downsample_factor[len(cfg.downsample_factor) - 1 - j]
            zq = causal_conv_transpose(q["upsample"][str(j)]["0"]["conv"],
                                       zq, f, f)
            zq = _convnext(q["upsample"][str(j)]["1"], zq, cfg.causal)
        dec = p["decoder"]["model"]
        c = cfg.causal
        h = causal_conv(dec["0"], zq, 7) if c \
            else centered_conv(dec["0"], zq, 7, padding=3)
        ch = cfg.decoder_dim
        for i, stride in enumerate(cfg.decoder_rates):
            blk = dec[str(i + 1)]["block"]
            h = apply_snake(blk["0"], h)
            h = causal_conv_transpose(blk["1"], h, 2 * stride, stride)
            for j, dil in enumerate((1, 3, 9)):
                h = _apply_resunit(blk[str(j + 2)], h, dil, c)
        n = len(cfg.decoder_rates)
        h = apply_snake(dec[str(n + 1)], h)
        h = causal_conv(dec[str(n + 2)], h, 7) if c \
            else centered_conv(dec[str(n + 2)], h, 7, padding=3)
        return jnp.tanh(h)

    # ------------------------------------------------------------- API

    def encode(self, audio: np.ndarray, n_quantizers: int = None
               ) -> np.ndarray:
        """(T,) audio -> (frames, 1 + n_codebooks) codes."""
        cfg = self.config
        a = np.asarray(audio, np.float32).reshape(-1)
        fl = cfg.frame_length
        t_pad = ((len(a) + fl - 1) // fl) * fl
        n_frames = t_pad // fl
        b = next((x for x in TIME_BUCKETS if t_pad <= x),
                 ((t_pad + 65535) // 65536) * 65536)
        padded = np.zeros((1, b, 1), np.float32)
        padded[0, :len(a), 0] = a
        fn = self._jit_cache.get(("enc", b))
        if fn is None:
            fn = jax.jit(lambda p, x: self._quantize_graph(
                p, self._encoder_graph(p, x)))
            self._jit_cache[("enc", b)] = fn
        codes = np.asarray(fn(self.params, jnp.asarray(padded)))
        return codes[0, :n_frames].astype(np.int32)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(frames, books) codes -> (samples,) audio."""
        cfg = self.config
        codes = np.asarray(codes, np.int32)
        n = codes.shape[0]
        fb = next((x // cfg.frame_length for x in TIME_BUCKETS
                   if n * cfg.frame_length <= x), n)
        padded = np.zeros((1, fb, codes.shape[1]), np.int32)
        padded[0, :n] = codes
        fn = self._jit_cache.get(("dec", fb, codes.shape[1]))
        if fn is None:
            fn = jax.jit(lambda p, c: self._decode_graph(p, c))
            self._jit_cache[("dec", fb, codes.shape[1])] = fn
        out = np.asarray(fn(self.params, jnp.asarray(padded)))
        return out[0, :n * cfg.frame_length, 0]

    def encode_zq(self, audio: np.ndarray) -> np.ndarray:
        """(T,) or (B, T) audio -> continuous quantized latent
        (B, frames, vq_dim), the pre-post_module z_q used by Echo-TTS
        (reference fish_s1_dac.py:1184)."""
        a = np.asarray(audio, np.float32).reshape(-1)
        codes = self.encode(a)
        fn = self._jit_cache.get("zq_lookup")
        if fn is None:
            fn = jax.jit(self._zq_from_codes)
            self._jit_cache["zq_lookup"] = fn
        return np.asarray(fn(self.params, jnp.asarray(codes[None])))

    def decode_zq(self, z_q: np.ndarray) -> np.ndarray:
        """z_q (B, frames, vq_dim) -> audio (B, samples)
        (reference fish_s1_dac.py:1209)."""
        cfg = self.config
        z_q = np.asarray(z_q, np.float32)
        n = z_q.shape[1]
        fb = next((x // cfg.frame_length for x in TIME_BUCKETS
                   if n * cfg.frame_length <= x), n)
        padded = np.zeros((z_q.shape[0], fb, z_q.shape[2]), np.float32)
        padded[:, :n] = z_q
        fn = self._jit_cache.get(("dec_zq", fb))
        if fn is None:
            fn = jax.jit(self._decode_zq_graph)
            self._jit_cache[("dec_zq", fb)] = fn
        out = np.asarray(fn(self.params, jnp.asarray(padded)))
        return out[:, :n * cfg.frame_length, 0]

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """Fold weight norm, map torch conv layouts to WIO, and keep the
        reference's weight_g/weight_v key scheme (reference :1198-1224)."""
        staged: Dict[str, Array] = {}
        for k, v in weights.items():
            k = k.replace(".conv.parametrizations.weight.original0",
                          ".weight_g")
            k = k.replace(".conv.parametrizations.weight.original1",
                          ".weight_v")
            k = k.replace(".parametrizations.weight.original0",
                          ".weight_g")
            k = k.replace(".parametrizations.weight.original1",
                          ".weight_v")
            if k.endswith(".conv.bias") and \
                    k[:-len(".conv.bias")] + ".weight_g" in staged:
                k = k[:-len(".conv.bias")] + ".bias"
            staged[k] = jnp.asarray(v)
        out: Dict[str, Array] = {}
        for k, v in staged.items():
            if k.endswith(".weight_g"):
                continue
            if k.endswith(".weight_v"):
                base = k[:-len(".weight_v")]
                g = staged[base + ".weight_g"]
                norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2),
                                        keepdims=True))
                w = g * v / norm
                if self._is_transposed(base):     # torch (I, O, K)
                    w = convert_torch_conv_transpose_weight(w)
                else:                             # torch (O, I, K) -> WIO
                    w = jnp.transpose(w, (2, 1, 0))
                out[base + ".weight"] = w
                continue
            if k.endswith(".conv.weight") and v.ndim == 3 \
                    and v.shape[-1] < v.shape[0]:
                # plain Conv1dTorch / ConvTranspose1d (quantizer stacks);
                # torch layouts keep the (small) kernel last
                if "upsample" in k:
                    v = convert_torch_conv_transpose_weight(v)
                else:
                    v = jnp.transpose(v, (2, 1, 0))
            out[k] = v
        return out

    @staticmethod
    def _is_transposed(base: str) -> bool:
        # decoder blocks index 1 is the transposed conv
        import re
        return bool(re.search(r"decoder\.model\.\d+\.block\.1$", base))


DAC = Model


__all__ = ["Model", "ModelConfig", "DAC", "TransformerArgs",
           "window_transformer", "init_fish_dac"]
