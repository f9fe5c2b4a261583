"""Mimi: Moshi's 12.5 Hz streaming codec (SEANet + transformer + split-RVQ).

Parity: /root/reference/mlx_audio/codec/models/mimi (mimi.py:146-175 encode/
decode + encode_step/decode_step, modules/seanet.py, modules/conv.py
streamable convs, modules/transformer.py, modules/quantization.py).

TPU redesign: streaming state is an explicit pytree (same pattern as the
qwen3_tts speech tokenizer) — causal-conv ring buffers, transpose-conv
overlap tails, transformer KV caches, offset — threaded through pure
step functions that jit once per chunk size. Offline encode/decode match the
reference's padded batch semantics (incl. the extra right padding for full
frame coverage).
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
from ....nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_conv_transpose1d,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs
from ..blocks import vq_encode

Array = jax.Array

elu = lambda x: jax.nn.elu(x, alpha=1.0)


@dataclass
class SeanetConfig:
    dimension: int = 512
    channels: int = 1
    causal: bool = True
    nfilters: int = 64
    nresidual_layers: int = 1
    ratios: List[int] = field(default_factory=lambda: [8, 6, 5, 4])
    ksize: int = 7
    residual_ksize: int = 3
    last_ksize: int = 3
    dilation_base: int = 2
    pad_mode: str = "constant"
    true_skip: bool = True
    compress: int = 2


@dataclass
class TransformerConfig:
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 8
    layer_scale: float = 0.01
    context: int = 250
    max_period: float = 10000.0
    dim_feedforward: int = 2048


@dataclass
class MimiConfig(BaseModelArgs):
    channels: int = 1
    sample_rate: float = 24000
    frame_rate: float = 12.5
    renormalize: bool = True
    seanet: SeanetConfig = field(default_factory=SeanetConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    quantizer_nq: int = 16
    quantizer_bins: int = 2048
    quantizer_dim: int = 256
    model_path: str = ""

    def __post_init__(self):
        if isinstance(self.seanet, dict):
            self.seanet = SeanetConfig(**self.seanet)
        if isinstance(self.transformer, dict):
            self.transformer = TransformerConfig(**{
                k: v for k, v in self.transformer.items()
                if k in TransformerConfig.__dataclass_fields__})

    @classmethod
    def from_dict(cls, config: dict):
        """Accept both the kyutai-style nested config and the HF-transformers
        `MimiConfig` flat schema (the canonical `kyutai/mimi` hub repo)."""
        if isinstance(config, dict) and (
                "upsampling_ratios" in config or "num_filters" in config):
            hidden = config.get("hidden_size", 512)
            sr = config.get("sampling_rate", 24000)
            ratios = list(config.get("upsampling_ratios", [8, 6, 5, 4]))
            # HF MimiModel's frame-rate downsampler is a fixed stride-2 conv;
            # config.frame_rate is a computed property absent from to_dict()
            frame_rate = config.get(
                "frame_rate", sr / float(math.prod(ratios)) / 2.0)
            return cls(
                channels=config.get("audio_channels", 1),
                sample_rate=sr,
                frame_rate=frame_rate,
                seanet=dict(
                    dimension=hidden,
                    channels=config.get("audio_channels", 1),
                    causal=config.get("use_causal_conv", True),
                    nfilters=config.get("num_filters", 64),
                    nresidual_layers=config.get("num_residual_layers", 1),
                    ratios=list(config.get("upsampling_ratios",
                                           [8, 6, 5, 4])),
                    ksize=config.get("kernel_size", 7),
                    residual_ksize=config.get("residual_kernel_size", 3),
                    last_ksize=config.get("last_kernel_size", 3),
                    dilation_base=config.get("dilation_growth_rate", 2),
                    pad_mode=config.get("pad_mode", "constant"),
                    compress=config.get("compress", 2)),
                transformer=dict(
                    d_model=hidden,
                    num_heads=config.get("num_attention_heads", 8),
                    num_layers=config.get("num_hidden_layers", 8),
                    layer_scale=config.get("layer_scale_initial_scale", 0.01),
                    context=config.get("sliding_window", 250),
                    max_period=config.get("rope_theta", 10000.0),
                    dim_feedforward=config.get("intermediate_size", 2048)),
                quantizer_nq=config.get("num_quantizers", 16),
                quantizer_bins=config.get("codebook_size", 2048),
                quantizer_dim=config.get(
                    "vector_quantization_hidden_dimension", 256),
                model_path=config.get("model_path", ""))
        return super().from_dict(config)


def mimi_202407(num_codebooks: int = 16) -> MimiConfig:
    return MimiConfig(quantizer_nq=num_codebooks)


ModelConfig = MimiConfig


# ---------------------------------------------------------------------------
# causal conv helpers (shared semantics with qwen3 speech tokenizer)
# ---------------------------------------------------------------------------


def _causal_conv(p, x, kernel, stride=1, dilation=1, groups=1,
                 pad_mode="constant", extra_cover=True):
    eff = (kernel - 1) * dilation + 1
    pad_left = eff - stride
    t = x.shape[-2]
    extra = 0
    if extra_cover and stride > 1:
        nframes = math.ceil((t + pad_left - eff) / stride) + 1
        ideal = (nframes - 1) * stride + eff - pad_left
        extra = max(0, ideal - t)
    if pad_mode == "reflect":
        # torch 'reflect' (no edge duplication); extra right pad stays zero
        prefix = jnp.flip(x[:, 1: pad_left + 1, :], axis=1) if pad_left else \
            x[:, :0, :]
        x = jnp.concatenate([prefix, x], axis=1)
        if extra:
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    else:
        mode = "edge" if pad_mode == "edge" else "constant"
        x = jnp.pad(x, ((0, 0), (pad_left, extra), (0, 0)), mode=mode)
    return apply_conv1d(p, x, stride=stride, dilation=dilation, groups=groups)


def _causal_tconv(p, x, kernel, stride, groups=1):
    y = apply_conv_transpose1d(p, x, stride=stride, padding=0, groups=groups)
    trim = max(kernel - stride, 0)
    return y[:, : y.shape[1] - trim, :] if trim > 0 else y


def _conv_step(p, x, buf, dilation=1, groups=1, stride=1):
    """Streaming causal conv on whole-frame chunks (buf = eff-stride past)."""
    ctx = jnp.concatenate([buf, x], axis=1)
    y = apply_conv1d(p, ctx, stride=stride, dilation=dilation, groups=groups)
    keep = buf.shape[1]
    return y, ctx[:, ctx.shape[1] - keep:, :] if keep > 0 else buf


def _tconv_step(p, x, overflow, kernel, stride, groups=1):
    y = apply_conv_transpose1d(p, x, stride=stride, padding=0, groups=groups)
    trim = max(kernel - stride, 0)
    if trim == 0:
        return y, overflow
    ov = overflow.shape[1]
    bias = p.get("bias")
    add = overflow if bias is None else overflow - bias
    y = y.at[:, :ov, :].add(add)
    return y[:, : y.shape[1] - trim, :], y[:, y.shape[1] - trim:, :]


# ---------------------------------------------------------------------------
# Mimi model
# ---------------------------------------------------------------------------


class Mimi(FunctionalModel):
    def __init__(self, config: MimiConfig = None, **kwargs):
        if config is None:
            config = MimiConfig.from_dict(kwargs) if kwargs else MimiConfig()
        elif isinstance(config, dict):
            config = MimiConfig.from_dict(config)
        super().__init__(config)
        s = config.seanet
        enc_frame_rate = config.sample_rate / math.prod(s.ratios)
        self.downsample_stride = int(enc_frame_rate / config.frame_rate)
        self.samples_per_frame = int(
            math.prod(s.ratios) * self.downsample_stride)

    @property
    def frame_rate(self):
        return self.config.frame_rate

    @property
    def sample_rate(self):
        return self.config.sample_rate

    # -- init ----------------------------------------------------------------

    def _init_resblock(self, ks, dim, dilation):
        s = self.config.seanet
        hidden = dim // s.compress
        return {"block": {
            "0": init_conv1d(next(ks), dim, hidden, s.residual_ksize),
            "1": init_conv1d(next(ks), hidden, dim, 1),
        }}

    def _init_transformer(self, ks):
        t = self.config.transformer
        layers = {}
        for i in range(t.num_layers):
            layers[str(i)] = {
                "self_attn": {
                    "in_proj": init_linear(next(ks), t.d_model, 3 * t.d_model,
                                           bias=False),
                    "out_proj": init_linear(next(ks), t.d_model, t.d_model,
                                            bias=False),
                },
                "norm1": init_layer_norm(t.d_model),
                "norm2": init_layer_norm(t.d_model),
                "linear1": init_linear(next(ks), t.d_model, t.dim_feedforward,
                                       bias=False),
                "linear2": init_linear(next(ks), t.dim_feedforward, t.d_model,
                                       bias=False),
                "layer_scale_1": {"scale": jnp.full((t.d_model,),
                                                    t.layer_scale)},
                "layer_scale_2": {"scale": jnp.full((t.d_model,),
                                                    t.layer_scale)},
            }
        return {"layers": layers}

    def init_params(self, key):
        c = self.config
        s = c.seanet
        ks = iter(jax.random.split(key, 256))
        # encoder
        mult = 1
        enc = {"init_conv1d": {"conv": init_conv1d(next(ks), s.channels,
                                                   s.nfilters, s.ksize)},
               "layers": {}}
        for li, ratio in enumerate(reversed(s.ratios)):
            dim = mult * s.nfilters
            layer = {"residuals": {}, "downsample": {"conv": init_conv1d(
                next(ks), dim, dim * 2, ratio * 2)}}
            for ri in range(s.nresidual_layers):
                layer["residuals"][str(ri)] = self._init_resblock(
                    ks, dim, s.dilation_base ** ri)
            enc["layers"][str(li)] = layer
            mult *= 2
        enc["final_conv1d"] = {"conv": init_conv1d(
            next(ks), mult * s.nfilters, s.dimension, s.last_ksize)}

        # decoder
        dec = {"init_conv1d": {"conv": init_conv1d(
            next(ks), s.dimension, mult * s.nfilters, s.ksize)},
            "layers": {}}
        for li, ratio in enumerate(s.ratios):
            dim = mult * s.nfilters
            layer = {"upsample": {"conv": init_conv_transpose1d(
                next(ks), dim, dim // 2, ratio * 2)}, "residuals": {}}
            for ri in range(s.nresidual_layers):
                layer["residuals"][str(ri)] = self._init_resblock(
                    ks, dim // 2, s.dilation_base ** ri)
            dec["layers"][str(li)] = layer
            mult //= 2
        dec["final_conv1d"] = {"conv": init_conv1d(
            next(ks), s.nfilters, s.channels, s.last_ksize)}

        # quantizer (split RVQ, euclidean codebooks)
        def rvq(n):
            return {
                "input_proj": {"weight": jax.random.normal(
                    next(ks), (1, s.dimension, c.quantizer_dim)) * 0.02},
                "output_proj": {"weight": jax.random.normal(
                    next(ks), (1, c.quantizer_dim, s.dimension)) * 0.02},
                "vq": {"layers": {
                    str(i): {"codebook": {"embed": init_embedding(
                        next(ks), c.quantizer_bins, c.quantizer_dim)}}
                    for i in range(n)}},
            }

        return {
            "encoder": enc,
            "decoder": dec,
            "encoder_transformer": {
                "transformer": self._init_transformer(ks),
            },
            "decoder_transformer": {
                "transformer": self._init_transformer(ks),
            },
            "quantizer": {"rvq_first": rvq(1),
                          "rvq_rest": rvq(c.quantizer_nq - 1)},
            "downsample": {"conv": {"conv": init_conv1d(
                next(ks), s.dimension, s.dimension,
                2 * self.downsample_stride, bias=False)}},
            "upsample": {"convtr": {"convtr": init_conv_transpose1d(
                next(ks), s.dimension, s.dimension,
                2 * self.downsample_stride, bias=False,
                groups=s.dimension)}},
        }

    # -- transformer ---------------------------------------------------------

    def _transformer(self, p, x, caches=None, offset=0):
        t = self.config.transformer
        hd = t.d_model // t.num_heads
        inv_freq = rope_freqs(hd, t.max_period)
        b, tl, _ = x.shape
        positions = offset + jnp.arange(tl)[None, :]
        new_caches = [] if caches is not None else None
        for i in range(t.num_layers):
            lp = p["layers"][str(i)]
            h = apply_layer_norm(lp["norm1"], x)
            qkv = apply_linear(lp["self_attn"]["in_proj"], h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, tl, t.num_heads, hd)
            k = k.reshape(b, tl, t.num_heads, hd)
            v = v.reshape(b, tl, t.num_heads, hd)
            q = apply_rope(q, positions, inv_freq)
            k = apply_rope(k, positions, inv_freq)
            if caches is not None:
                nc = kv_update(caches[i], k, v, offset)
                new_caches.append(nc)
                s_len = nc.k.shape[1]
                pos_s = jnp.arange(s_len)[None, None, None, :]
                q_pos = (offset + jnp.arange(tl))[None, None, :, None]
                ok = (pos_s <= q_pos) & (pos_s > q_pos - t.context)
                out = attention(q, nc.k, nc.v,
                                mask=jnp.where(ok, 0.0, -jnp.inf))
            else:
                q_pos = jnp.arange(tl)[:, None]
                k_pos = jnp.arange(tl)[None, :]
                ok = (k_pos <= q_pos) & (k_pos > q_pos - t.context)
                out = attention(q, k, v,
                                mask=jnp.where(ok, 0.0, -jnp.inf)[None, None])
            out = out.reshape(b, tl, t.d_model)
            x = x + apply_linear(lp["self_attn"]["out_proj"],
                                 out) * lp["layer_scale_1"]["scale"]
            h = apply_layer_norm(lp["norm2"], x)
            h = apply_linear(lp["linear2"],
                             jax.nn.gelu(apply_linear(lp["linear1"], h)))
            x = x + h * lp["layer_scale_2"]["scale"]
        return x, new_caches

    # -- seanet --------------------------------------------------------------

    def _resblock(self, p, x, dilation, bufs=None):
        s = self.config.seanet
        res = x
        h = elu(x)
        if bufs is None:
            h = _causal_conv(p["block"]["0"], h, s.residual_ksize,
                             dilation=dilation, pad_mode=s.pad_mode)
            h = elu(h)
            h = _causal_conv(p["block"]["1"], h, 1, pad_mode=s.pad_mode)
            return res + h, None
        h, b0 = _conv_step(p["block"]["0"], h, bufs["0"], dilation=dilation)
        h = elu(h)
        h = apply_conv1d(p["block"]["1"], h)
        return res + h, {"0": b0}

    def _encode_latent(self, audio):
        """audio (B, T, 1) -> (B, frames25, D)."""
        s = self.config.seanet
        p = self.params["encoder"]
        x = _causal_conv(p["init_conv1d"]["conv"], audio, s.ksize,
                         pad_mode=s.pad_mode)
        for li, ratio in enumerate(reversed(s.ratios)):
            layer = p["layers"][str(li)]
            for ri in range(s.nresidual_layers):
                x, _ = self._resblock(layer["residuals"][str(ri)], x,
                                      s.dilation_base ** ri)
            x = _causal_conv(layer["downsample"]["conv"], elu(x), ratio * 2,
                             stride=ratio, pad_mode=s.pad_mode)
        x = _causal_conv(p["final_conv1d"]["conv"], elu(x), s.last_ksize,
                         pad_mode=s.pad_mode)
        return x

    def _decode_latent(self, x):
        """(B, frames25, D) -> audio (B, T, 1)."""
        s = self.config.seanet
        p = self.params["decoder"]
        x = _causal_conv(p["init_conv1d"]["conv"], x, s.ksize,
                         pad_mode=s.pad_mode)
        for li, ratio in enumerate(s.ratios):
            layer = p["layers"][str(li)]
            x = _causal_tconv(layer["upsample"]["conv"], elu(x), ratio * 2,
                              ratio)
            for ri in range(s.nresidual_layers):
                x, _ = self._resblock(layer["residuals"][str(ri)], x,
                                      s.dilation_base ** ri)
        return _causal_conv(p["final_conv1d"]["conv"], elu(x), s.last_ksize,
                            pad_mode=s.pad_mode)

    # -- quantizer -----------------------------------------------------------

    def _rvq_encode(self, rp, x, n_q):
        codes = []
        z = jnp.einsum("btd,xdo->bto", x, rp["input_proj"]["weight"])
        residual = z
        for i in range(n_q):
            cb = rp["vq"]["layers"][str(i)]["codebook"]["embed"]["weight"]
            idx = vq_encode(residual, cb, normalized=False)
            codes.append(idx)
            residual = residual - cb[idx]
        return codes

    def _rvq_decode(self, rp, codes):
        acc = None
        for i in range(codes.shape[1]):
            cb = rp["vq"]["layers"][str(i)]["codebook"]["embed"]["weight"]
            q = cb[codes[:, i]]
            acc = q if acc is None else acc + q
        return jnp.einsum("btd,xdo->bto", acc, rp["output_proj"]["weight"])

    def quantizer_encode(self, x):
        q = self.params["quantizer"]
        sem = self._rvq_encode(q["rvq_first"], x, 1)
        aco = self._rvq_encode(q["rvq_rest"], x,
                               self.config.quantizer_nq - 1)
        return jnp.stack(sem + aco, axis=1)  # (B, nq, T)

    def quantizer_decode(self, codes):
        q = self.params["quantizer"]
        out = self._rvq_decode(q["rvq_first"], codes[:, :1])
        if codes.shape[1] > 1:
            out = out + self._rvq_decode(q["rvq_rest"], codes[:, 1:])
        return out

    # -- public --------------------------------------------------------------

    def encode(self, audio) -> Array:
        """audio (B, 1, T)/(B, T)/(T,) -> codes (B, nq, frames12.5)."""
        audio = jnp.asarray(audio, jnp.float32)
        if audio.ndim == 3:
            audio = audio[:, 0]
        elif audio.ndim == 1:
            audio = audio[None]
        x = self._encode_latent(audio[..., None])
        x, _ = self._transformer(
            self.params["encoder_transformer"]["transformer"], x)
        x = _causal_conv(self.params["downsample"]["conv"]["conv"], x,
                         2 * self.downsample_stride,
                         stride=self.downsample_stride, pad_mode="edge")
        return self.quantizer_encode(x)

    def decode(self, codes) -> Array:
        """codes (B, nq, T) -> audio (B, 1, samples)."""
        codes = jnp.asarray(codes)
        x = self.quantizer_decode(codes)
        x = _causal_tconv(self.params["upsample"]["convtr"]["convtr"], x,
                          2 * self.downsample_stride, self.downsample_stride,
                          groups=self.config.seanet.dimension)
        x, _ = self._transformer(
            self.params["decoder_transformer"]["transformer"], x)
        audio = self._decode_latent(x)
        return jnp.swapaxes(audio, 1, 2)

    # -- streaming decode ----------------------------------------------------

    def init_decode_stream_state(self, batch: int = 1,
                                 max_frames: int = 2048) -> dict:
        s = self.config.seanet
        t = self.config.transformer
        z = lambda T, C: jnp.zeros((batch, T, C), jnp.float32)
        state = {
            "offset": jnp.int32(0),
            "up_overflow": z(self.downsample_stride, s.dimension),
            "tf_caches": [KVCache.init(batch, max_frames, t.num_heads,
                                       t.d_model // t.num_heads, jnp.float32)
                          for _ in range(t.num_layers)],
            "dec": {"init_buf": z(s.ksize - 1, s.dimension), "layers": {}},
        }
        mult = 1 << len(s.ratios)
        for li, ratio in enumerate(s.ratios):
            dim = mult * s.nfilters
            layer = {"up_overflow": z(ratio, dim // 2), "res": {}}
            for ri in range(s.nresidual_layers):
                dil = s.dilation_base ** ri
                layer["res"][str(ri)] = {
                    "0": z((s.residual_ksize - 1) * dil, dim // 2)}
            state["dec"]["layers"][str(li)] = layer
            mult //= 2
        state["dec"]["final_buf"] = z(s.last_ksize - 1, s.nfilters)
        return state

    def encode_to_latent(self, audio) -> Array:
        """audio (B, 1, T)/(B, T)/(T,) -> pre-quantizer latents (B, F, D).

        The pocket_tts voice-prompt path consumes these latents directly
        (reference pocket_tts/mimi.py MimiAdapter.encode_to_latent)."""
        audio = jnp.asarray(audio, jnp.float32)
        if audio.ndim == 3:
            audio = audio[:, 0]
        elif audio.ndim == 1:
            audio = audio[None]
        x = self._encode_latent(audio[..., None])
        x, _ = self._transformer(
            self.params["encoder_transformer"]["transformer"], x)
        x = _causal_conv(self.params["downsample"]["conv"]["conv"], x,
                         2 * self.downsample_stride,
                         stride=self.downsample_stride, pad_mode="edge")
        return x

    def decode_step(self, state: dict, codes) -> Tuple[dict, Array]:
        """Streaming decode of (B, nq, T_new) codes -> (state, (B, 1, samp))."""
        return self.decode_latent_step(state, self.quantizer_decode(
            jnp.asarray(codes)))

    def decode_latent_step(self, state: dict, x) -> Tuple[dict, Array]:
        """Streaming decode of latent frames (B, T_new, D) — the post-
        quantizer decode path (upsample -> transformer -> seanet)."""
        s = self.config.seanet
        ns: dict = {"dec": {"layers": {}}}
        x, ns["up_overflow"] = _tconv_step(
            self.params["upsample"]["convtr"]["convtr"], x,
            state["up_overflow"], 2 * self.downsample_stride,
            self.downsample_stride, groups=s.dimension)
        x, ns["tf_caches"] = self._transformer(
            self.params["decoder_transformer"]["transformer"], x,
            caches=state["tf_caches"], offset=state["offset"])
        ns["offset"] = state["offset"] + x.shape[1]
        p = self.params["decoder"]
        x, ns["dec"]["init_buf"] = _conv_step(
            p["init_conv1d"]["conv"], x, state["dec"]["init_buf"])
        mult = 1 << len(s.ratios)
        for li, ratio in enumerate(s.ratios):
            layer = p["layers"][str(li)]
            st = state["dec"]["layers"][str(li)]
            nl = {"res": {}}
            x, nl["up_overflow"] = _tconv_step(
                layer["upsample"]["conv"], elu(x), st["up_overflow"],
                ratio * 2, ratio)
            for ri in range(s.nresidual_layers):
                x, nl["res"][str(ri)] = self._resblock(
                    layer["residuals"][str(ri)], x,
                    s.dilation_base ** ri, st["res"][str(ri)])
            ns["dec"]["layers"][str(li)] = nl
            mult //= 2
        x, ns["dec"]["final_buf"] = _conv_step(
            p["final_conv1d"]["conv"], elu(x), state["dec"]["final_buf"])
        return ns, jnp.swapaxes(x, 1, 2)

    # -- weights -------------------------------------------------------------

    def _remap_hf(self, weights):
        """HF-transformers `MimiModel` keys (the canonical `kyutai/mimi` hub
        repo) -> this tree's kyutai-style names. HF flattens the SEANet
        blocks and ELUs into one indexed layer list; rebuild the index maps
        from the config, fuse q/k/v into in_proj, and rename the split-RVQ
        prefixes. Layout conversion happens in the main sanitize loop."""
        import re

        s = self.config.seanet
        R, nres = len(s.ratios), s.nresidual_layers
        enc, dec = {0: "encoder.init_conv1d.conv"}, \
                   {0: "decoder.init_conv1d.conv"}
        res_enc, res_dec = {}, {}
        idx = 1
        for g in range(R):
            for j in range(nres):
                res_enc[idx] = f"encoder.layers.{g}.residuals.{j}"
                idx += 1
            idx += 1  # ELU
            enc[idx] = f"encoder.layers.{g}.downsample.conv"
            idx += 1
        enc[idx + 1] = "encoder.final_conv1d.conv"
        idx = 1
        for g in range(R):
            idx += 1  # ELU
            dec[idx] = f"decoder.layers.{g}.upsample.conv"
            idx += 1
            for j in range(nres):
                res_dec[idx] = f"decoder.layers.{g}.residuals.{j}"
                idx += 1
        dec[idx + 1] = "decoder.final_conv1d.conv"

        out = {}
        qkv = {}
        for k, w in weights.items():
            m = re.match(r"^(encoder|decoder)\.layers\.(\d+)\."
                         r"(?:block\.(\d+)\.)?conv\.(weight|bias)$", k)
            if m:
                side, i, b, leaf = m.group(1), int(m.group(2)), m.group(3), \
                    m.group(4)
                if b is not None:  # resnet block: HF 1/3 -> ours 0/1
                    base = (res_enc if side == "encoder" else res_dec)[i]
                    out[f"{base}.block.{0 if int(b) == 1 else 1}.{leaf}"] = w
                else:
                    base = (enc if side == "encoder" else dec)[i]
                    out[f"{base}.{leaf}"] = w
                continue
            m = re.match(r"^(encoder|decoder)_transformer\.layers\.(\d+)\.(.+)$",
                         k)
            if m:
                tfm, i, rest = m.group(1) + "_transformer", m.group(2), \
                    m.group(3)
                pre = f"{tfm}.transformer.layers.{i}"
                ren = {
                    "input_layernorm.weight": "norm1.weight",
                    "input_layernorm.bias": "norm1.bias",
                    "post_attention_layernorm.weight": "norm2.weight",
                    "post_attention_layernorm.bias": "norm2.bias",
                    "mlp.fc1.weight": "linear1.weight",
                    "mlp.fc2.weight": "linear2.weight",
                    "self_attn_layer_scale.scale": "layer_scale_1.scale",
                    "mlp_layer_scale.scale": "layer_scale_2.scale",
                    "self_attn.o_proj.weight": "self_attn.out_proj.weight",
                }
                if rest in ren:
                    out[f"{pre}.{ren[rest]}"] = w
                    continue
                m2 = re.match(r"^self_attn\.([qkv])_proj\.weight$", rest)
                if m2:
                    qkv.setdefault(pre, {})[m2.group(1)] = np.asarray(w)
                    continue
            if k.startswith("quantizer.semantic_residual_vector_quantizer."):
                out["quantizer.rvq_first." + k.split(".", 2)[2].replace(
                    "layers.", "vq.layers.", 1)] = w
                continue
            if k.startswith("quantizer.acoustic_residual_vector_quantizer."):
                out["quantizer.rvq_rest." + k.split(".", 2)[2].replace(
                    "layers.", "vq.layers.", 1)] = w
                continue
            if k == "downsample.conv.weight":
                out["downsample.conv.conv.weight"] = w
                continue
            if k == "upsample.conv.weight":
                out["upsample.convtr.convtr.weight"] = w
                continue
            out[k] = w
        for pre, d in qkv.items():
            if not (d["q"].shape == d["k"].shape == d["v"].shape):
                raise ValueError(
                    "mimi: GQA checkpoints (num_key_value_heads != "
                    "num_attention_heads) are not supported; got q/k/v "
                    f"shapes {d['q'].shape}/{d['k'].shape}/{d['v'].shape}")
            out[f"{pre}.self_attn.in_proj.weight"] = np.concatenate(
                [d["q"], d["k"], d["v"]], axis=0)
        return out

    def sanitize(self, weights):
        """Map kyutai/HF mimi checkpoints: strip leading underscores, conv
        layouts to WIO / pre-flipped transposed kernels, codebook
        reconstruction from cluster_usage/embedding_sum."""
        from ....nn.layers import convert_torch_conv_transpose_weight

        if any(".self_attn.q_proj." in k or k.startswith(
                "quantizer.semantic_residual_vector_quantizer.")
                for k in weights):
            weights = self._remap_hf(weights)
        out = {}
        codebooks: Dict[str, dict] = {}
        for k, w in weights.items():
            k = ".".join(seg.lstrip("_") for seg in k.split("."))
            if "codebook.cluster_usage" in k or "codebook.embed_sum" in k \
                    or "codebook.embedding_sum" in k:
                base = k.split(".codebook.")[0]
                codebooks.setdefault(base, {})[
                    "usage" if "cluster_usage" in k else "sum"] = np.asarray(w)
                continue
            if "codebook.initialized" in k:
                continue
            if k.endswith(".weight") and w.ndim == 3:
                if "convtr" in k or "upsample" in k:
                    groups = (self.config.seanet.dimension
                              if "upsample.convtr" in k else 1)
                    out[k] = convert_torch_conv_transpose_weight(
                        w, groups=groups)
                else:
                    out[k] = jnp.transpose(w, (2, 1, 0))
                continue
            if (k.endswith("input_proj.weight")
                    or k.endswith("output_proj.weight")) and w.ndim == 3:
                out[k] = jnp.transpose(w, (2, 1, 0))
                continue
            out[k] = w
        for base, d in codebooks.items():
            if "usage" in d and "sum" in d:
                emb = d["sum"] / np.clip(d["usage"][:, None], 1e-5, None)
                out[f"{base}.codebook.embed.weight"] = jnp.asarray(emb)
        return out


Model = Mimi
