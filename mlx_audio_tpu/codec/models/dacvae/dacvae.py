"""DACVAE: continuous-latent VAE audio codec (VibeVoice / SAM-Audio).

Parity: reference codec/models/dacvae/codec.py — weight-normalized conv
stacks with DAC padding ((k-s)*d//2; transposed (s+1)//2), float32 snake
(:50-61), encoder (conv_in 7 -> EncoderBlocks [res d=1/3/9 + snake +
stride conv k=2s] -> snake + conv_out 3, :330-385), VAE quantizer
projections (1x1 weight-normed convs, mean/logvar split taking the mean,
:913-1030), decoder main path per block (snake -> convT k=2s -> res d=1 ->
res d=3 -> res d=9, :593-600) then snake_out -> conv_out(7) -> tanh, and
chunked decoding with frame overlap (:1060-1140). The watermark branch
(ELU path blocks 2/3/6/7/10/11, Watermarker LSTMs) is roadmap; its
weights are dropped at load.

TPU design: weight norm folds into plain kernels at sanitize; encode and
decode are single jitted programs per shape bucket (1x1 VAE projections
included), and chunked decode reuses one fixed-chunk program.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_conv1d, apply_conv_transpose1d, init_conv1d, \
    init_conv_transpose1d

Array = jax.Array


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "dacvae"
    encoder_dim: int = 64
    encoder_rates: List[int] = field(default_factory=lambda: [2, 8, 10,
                                                              12])
    latent_dim: int = 1024
    decoder_dim: int = 1536
    decoder_rates: List[int] = field(default_factory=lambda: [12, 10, 8,
                                                              2])
    codebook_dim: int = 128
    sample_rate: int = 48000
    mean: float = 0.0
    std: float = 1.0

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))


def snake(x: Array, alpha: Array) -> Array:
    x32 = x.astype(jnp.float32)
    a32 = alpha.astype(jnp.float32)
    return (x32 + (1.0 / (a32 + 1e-9))
            * jnp.sin(a32 * x32) ** 2).astype(x.dtype)


def _res_unit(p: dict, x: Array, dilation: int, kernel: int = 7) -> Array:
    y = snake(x, p["act1_alpha"].reshape(-1))
    y = apply_conv1d(p["conv1"], y,
                     padding=(kernel - 1) * dilation // 2,
                     dilation=dilation)
    y = snake(y, p["act2_alpha"].reshape(-1))
    y = apply_conv1d(p["conv2"], y)
    return x + y


def _init_res_unit(key, dim: int, kernel: int = 7) -> dict:
    k1, k2 = jax.random.split(key)
    return {"act1_alpha": jnp.ones((dim,)),
            "conv1": init_conv1d(k1, dim, dim, kernel),
            "act2_alpha": jnp.ones((dim,)),
            "conv2": init_conv1d(k2, dim, dim, 1)}


# ------------------------------------------------------------------ init

def init_dacvae(key, cfg: ModelConfig) -> dict:
    ks = iter(jax.random.split(
        key, 16 + 8 * len(cfg.encoder_rates) + 8 * len(cfg.decoder_rates)))
    # encoder
    enc = {"conv_in": init_conv1d(next(ks), 1, cfg.encoder_dim, 7),
           "blocks": {}}
    dim = cfg.encoder_dim
    for i, stride in enumerate(cfg.encoder_rates):
        dim *= 2
        enc["blocks"][str(i)] = {
            "res1": _init_res_unit(next(ks), dim // 2),
            "res2": _init_res_unit(next(ks), dim // 2),
            "res3": _init_res_unit(next(ks), dim // 2),
            "snake_alpha": jnp.ones((dim // 2,)),
            "conv": init_conv1d(next(ks), dim // 2, dim, 2 * stride),
        }
    enc["snake_out_alpha"] = jnp.ones((dim,))
    enc["conv_out"] = init_conv1d(next(ks), dim, cfg.latent_dim, 3)

    # VAE projections (1x1 convs == linear)
    qin = init_conv1d(next(ks), cfg.latent_dim, 2 * cfg.codebook_dim, 1)
    qout = init_conv1d(next(ks), cfg.codebook_dim, cfg.latent_dim, 1)

    # decoder (main path only)
    dec = {"conv_in": init_conv1d(next(ks), cfg.latent_dim,
                                  cfg.decoder_dim, 7),
           "blocks": {}}
    ch = cfg.decoder_dim
    for i, stride in enumerate(cfg.decoder_rates):
        in_dim = ch // 2 ** i
        out_dim = ch // 2 ** (i + 1)
        dec["blocks"][str(i)] = {
            "block_0_alpha": jnp.ones((in_dim,)),
            "block_1": init_conv_transpose1d(next(ks), in_dim, out_dim,
                                             2 * stride),
            "block_4": _init_res_unit(next(ks), out_dim),
            "block_5": _init_res_unit(next(ks), out_dim),
            "block_8": _init_res_unit(next(ks), out_dim),
        }
    final = ch // 2 ** len(cfg.decoder_rates)
    dec["snake_out_alpha"] = jnp.ones((final,))
    dec["conv_out"] = init_conv1d(next(ks), final, 1, 7)
    return {"encoder": enc, "quantizer_in_proj": qin,
            "quantizer_out_proj": qout, "decoder": dec}


# --------------------------------------------------------------- forward

def dacvae_encode(params: dict, cfg: ModelConfig, wav: Array) -> Array:
    """(B, T, 1) -> (B, codebook_dim, frames) VAE means."""
    enc = params["encoder"]
    x = apply_conv1d(enc["conv_in"], wav, padding=3)
    for i, stride in enumerate(cfg.encoder_rates):
        b = enc["blocks"][str(i)]
        x = _res_unit(b["res1"], x, 1)
        x = _res_unit(b["res2"], x, 3)
        x = _res_unit(b["res3"], x, 9)
        x = snake(x, b["snake_alpha"])
        x = apply_conv1d(b["conv"], x, stride=stride,
                         padding=math.ceil(stride / 2))
    x = snake(x, enc["snake_out_alpha"])
    z = apply_conv1d(enc["conv_out"], x, padding=1)
    proj = apply_conv1d(params["quantizer_in_proj"], z)
    mean = proj[..., : cfg.codebook_dim]
    return jnp.transpose(mean, (0, 2, 1))


def dacvae_decode(params: dict, cfg: ModelConfig, frames: Array) -> Array:
    """(B, frames, codebook_dim) -> (B, samples, 1)."""
    emb = apply_conv1d(params["quantizer_out_proj"], frames)
    dec = params["decoder"]
    x = apply_conv1d(dec["conv_in"], emb, padding=3)
    for i, stride in enumerate(cfg.decoder_rates):
        b = dec["blocks"][str(i)]
        x = snake(x, b["block_0_alpha"])
        x = apply_conv_transpose1d(b["block_1"], x, stride=stride,
                                   padding=(stride + 1) // 2)
        x = _res_unit(b["block_4"], x, 1)
        x = _res_unit(b["block_5"], x, 3)
        x = _res_unit(b["block_8"], x, 9)
    x = snake(x, dec["snake_out_alpha"])
    return jnp.tanh(apply_conv1d(dec["conv_out"], x, padding=3))


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
    def hop_length(self) -> int:
        return self.config.hop_length

    def init_params(self, key):
        return init_dacvae(key, self.config)

    def _enc_fn(self, t: int):
        fn = self._jit_cache.get(("e", t))
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, w: dacvae_encode(p, cfg, w))
            self._jit_cache[("e", t)] = fn
        return fn

    def _dec_fn(self, t: int):
        fn = self._jit_cache.get(("d", t))
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, f: dacvae_decode(p, cfg, f))
            self._jit_cache[("d", t)] = fn
        return fn

    def encode(self, waveform) -> Array:
        """(B, T, 1) or (T,) -> (B, codebook_dim, frames)."""
        wav = jnp.asarray(waveform, jnp.float32)
        if wav.ndim == 1:
            wav = wav[None, :, None]
        hop = self.hop_length
        t = wav.shape[1]
        if t % hop:
            wav = jnp.pad(wav, ((0, 0), (0, hop - t % hop), (0, 0)))
        return self._enc_fn(wav.shape[1])(self.params, wav)

    def decode(self, encoded_frames,
               chunk_size: Optional[int] = None) -> Array:
        """(B, codebook_dim, frames) -> (B, samples, 1)."""
        f = jnp.transpose(jnp.asarray(encoded_frames, jnp.float32),
                          (0, 2, 1))
        if chunk_size is None:
            return self._dec_fn(f.shape[1])(self.params, f)
        # chunked with overlap blending (reference _decode_chunked)
        overlap = 4
        hop = self.hop_length
        total = f.shape[1]
        outs = []
        start = 0
        while start < total:
            end = min(start + chunk_size, total)
            out = np.asarray(self._dec_fn(end - start)(
                self.params, f[:, start:end]))
            if start > 0:
                out = out[:, overlap * hop:]
            outs.append(out)
            if end >= total:
                break
            start = end - overlap
        return jnp.asarray(np.concatenate(outs, axis=1))

    # loading -----------------------------------------------------------

    _RES_MAP = {"act1_alpha": "act1.alpha", "conv1": "conv1",
                "act2_alpha": "act2.alpha", "conv2": "conv2"}

    def sanitize(self, weights: Dict) -> Dict:
        """Fold weight-norm pairs, drop the watermark branch, convert conv
        layouts. Checkpoint tensors are MLX layout (O, K, I) for convs —
        to WIO (K, I, O); transposed convs (O, K, I) -> pre-flipped."""
        if any(k.startswith("encoder.blocks.") and k.endswith("snake_alpha")
               for k in weights):
            return dict(weights)        # already converted
        staged_g, staged_v, out = {}, {}, {}
        drop_prefixes = ("decoder.wm_model.",)
        drop_inner = (".block_2.", ".block_3.", ".block_6.", ".block_7.",
                      ".block_10.", ".block_11.")
        for k, v in weights.items():
            if k.startswith(drop_prefixes) or \
                    any(d in k for d in drop_inner):
                continue
            k = k.replace(".alpha", "_alpha")
            k = k.replace(".snake.", ".snake_")
            k = k.replace(".snake_out.", ".snake_out_")
            k = k.replace(".block_0.", ".block_0_")
            k = k.replace(".act1.", ".act1_")
            k = k.replace(".act2.", ".act2_")
            if k.endswith(".weight_g"):
                staged_g[k[:-len(".weight_g")]] = np.asarray(v)
                continue
            if k.endswith(".weight_v"):
                staged_v[k[:-len(".weight_v")]] = np.asarray(v)
                continue
            out[k] = jnp.asarray(v)
        for base, v in staged_v.items():
            g = staged_g.get(base)
            if g is not None:
                # WNConv: norm over all axes but 0; WNConvT: but 2
                except_dim = 2 if ("block_1" in base) else 0
                axes = tuple(i for i in range(3) if i != except_dim)
                norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
                v = np.asarray(g) * v / np.maximum(norm, 1e-12)
            w = jnp.asarray(v)
            # checkpoint layout (O, K, I) [mlx] -> WIO (K, I, O)
            w = jnp.transpose(w, (1, 2, 0))
            if "block_1" in base:
                w = jnp.flip(w, axis=0)   # pre-flip transposed kernels
            out[base + ".weight"] = w
        return out


DACVAE = Model

__all__ = ["Model", "DACVAE", "ModelConfig", "dacvae_encode",
           "dacvae_decode", "init_dacvae"]
