"""Causal Snake-activation audio VAE for VoxCPM / VoxCPM2.

Parity: /root/reference/mlx_audio/tts/models/voxcpm/audio_vae.py (+ voxcpm2:
depthwise flag, SampleRateConditionLayer scale/bias, asymmetric in/out
sample rates). Weight-norm fusion happens in sanitize (host-side).

Layout: channel-last (B, T, C) throughout; causal convs left-pad by
2*pad, transpose convs right-trim by (2*pad - output_padding).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    apply_embedding,
    init_conv1d,
    init_conv_transpose1d,
    init_embedding,
)

Array = jax.Array


@dataclass
class AudioVAEConfig(BaseModelArgs):
    encoder_dim: int = 64
    encoder_rates: List[int] = field(default_factory=lambda: [2, 3, 6, 7, 7])
    latent_dim: int = 64
    decoder_dim: int = 2048
    decoder_rates: List[int] = field(default_factory=lambda: [7, 7, 6, 3, 2])
    depthwise: bool = True
    sample_rate: int = 44100
    out_sample_rate: Optional[int] = None
    use_noise_block: bool = False
    sr_bin_boundaries: Optional[List[int]] = None
    cond_type: str = "scale_bias"

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @property
    def decode_hop(self) -> int:
        return int(np.prod(self.decoder_rates))


def _causal_conv(p, x, *, pad: int, stride: int = 1, dilation: int = 1,
                 groups: int = 1) -> Array:
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (2 * pad, 0), (0, 0)))
    return apply_conv1d(p, x, stride=stride, dilation=dilation,
                        groups=groups)


def _causal_convtr(p, x, *, stride: int, pad: int,
                   output_padding: int) -> Array:
    y = apply_conv_transpose1d(p, x, stride=stride)
    trim = 2 * pad - output_padding
    return y[:, :-trim] if trim > 0 else y


def _snake(alpha: Array, x: Array) -> Array:
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


def _init_res_unit(ks, dim: int, dilation: int, kernel: int = 7,
                   groups: int = 1) -> dict:
    return {"snake1": {"alpha": jnp.ones((1, 1, dim))},
            "conv1": init_conv1d(next(ks), dim, dim, kernel, groups=groups),
            "snake2": {"alpha": jnp.ones((1, 1, dim))},
            "conv2": init_conv1d(next(ks), dim, dim, 1)}


def _res_unit(p, x, *, dilation: int, kernel: int = 7,
              groups: int = 1) -> Array:
    pad = ((kernel - 1) * dilation) // 2
    h = _snake(p["snake1"]["alpha"], x)
    h = _causal_conv(p["conv1"], h, pad=pad, dilation=dilation,
                     groups=groups)
    h = _snake(p["snake2"]["alpha"], h)
    return x + _causal_conv(p["conv2"], h, pad=0)


def init_vae_encoder(key, cfg: AudioVAEConfig) -> dict:
    ks = iter(jax.random.split(key, 16 + 16 * len(cfg.encoder_rates)))
    d = cfg.encoder_dim
    p = {"conv_in": init_conv1d(next(ks), 1, d, 7)}
    cur = d
    blocks = {}
    for i, r in enumerate(cfg.encoder_rates):
        nxt = cur * 2
        g = nxt // 2 if cfg.depthwise else 1
        blocks[str(i)] = {
            "res1": _init_res_unit(ks, cur, 1, groups=g),
            "res2": _init_res_unit(ks, cur, 3, groups=g),
            "res3": _init_res_unit(ks, cur, 9, groups=g),
            "snake": {"alpha": jnp.ones((1, 1, cur))},
            "conv": init_conv1d(next(ks), cur, nxt, 2 * r)}
        cur = nxt
    p["blocks"] = blocks
    p["fc_mu"] = init_conv1d(next(ks), cur, cfg.latent_dim, 3)
    return p


def vae_encode(p: dict, cfg: AudioVAEConfig, x: Array) -> Array:
    """(B, T, 1) audio -> (B, T/hop, latent) mean latents."""
    x = _causal_conv(p["conv_in"], x, pad=3)
    for i, r in enumerate(cfg.encoder_rates):
        blk = p["blocks"][str(i)]
        dim = x.shape[-1]
        g = dim if cfg.depthwise else 1
        x = _res_unit(blk["res1"], x, dilation=1, groups=g)
        x = _res_unit(blk["res2"], x, dilation=3, groups=g)
        x = _res_unit(blk["res3"], x, dilation=9, groups=g)
        x = _snake(blk["snake"]["alpha"], x)
        x = _causal_conv(blk["conv"], x, pad=math.ceil(r / 2), stride=r)
    return _causal_conv(p["fc_mu"], x, pad=1)


def init_vae_decoder(key, cfg: AudioVAEConfig) -> dict:
    ks = iter(jax.random.split(key, 32 + 16 * len(cfg.decoder_rates)))
    ch = cfg.decoder_dim
    p = {}
    if cfg.depthwise:
        p["conv_in"] = {
            "dw": init_conv1d(next(ks), cfg.latent_dim, cfg.latent_dim, 7,
                              groups=cfg.latent_dim),
            "pw": init_conv1d(next(ks), cfg.latent_dim, ch, 1)}
    else:
        p["conv_in"] = {"conv": init_conv1d(next(ks), cfg.latent_dim, ch, 7)}
    blocks = {}
    for i, r in enumerate(cfg.decoder_rates):
        in_dim = ch // (2 ** i)
        out_dim = ch // (2 ** (i + 1))
        g = out_dim if cfg.depthwise else 1
        blk = {
            "snake": {"alpha": jnp.ones((1, 1, in_dim))},
            "conv_t": init_conv_transpose1d(next(ks), in_dim, out_dim,
                                            2 * r),
            "res1": _init_res_unit(ks, out_dim, 1, groups=g),
            "res2": _init_res_unit(ks, out_dim, 3, groups=g),
            "res3": _init_res_unit(ks, out_dim, 9, groups=g)}
        if cfg.use_noise_block:
            blk["noise"] = {"linear": init_conv1d(next(ks), out_dim,
                                                  out_dim, 1, bias=False)}
        blocks[str(i)] = blk
    p["blocks"] = blocks
    final = ch // (2 ** len(cfg.decoder_rates))
    p["snake_out"] = {"alpha": jnp.ones((1, 1, final))}
    p["conv_out"] = init_conv1d(next(ks), final, 1, 7)
    if cfg.sr_bin_boundaries:
        buckets = len(cfg.sr_bin_boundaries) + 1
        cond = {}
        for i in range(len(cfg.decoder_rates)):
            in_dim = ch // (2 ** i)
            cond[str(i)] = {
                "scale_embed": init_embedding(next(ks), buckets, in_dim),
                "bias_embed": init_embedding(next(ks), buckets, in_dim)}
        p["sr_cond_layers"] = cond
    return p


def vae_decode(p: dict, cfg: AudioVAEConfig, z: Array,
               sr: Optional[int] = None, key=None) -> Array:
    """(B, L, latent) -> (B, L*decode_hop) audio."""
    if cfg.depthwise:
        x = _causal_conv(p["conv_in"]["dw"], z, pad=3,
                         groups=z.shape[-1])
        x = _causal_conv(p["conv_in"]["pw"], x, pad=0)
    else:
        x = _causal_conv(p["conv_in"]["conv"], z, pad=3)
    sr_idx = None
    if cfg.sr_bin_boundaries and sr is not None:
        sr_idx = int(np.sum(np.asarray(sr)
                            >= np.asarray(cfg.sr_bin_boundaries)))
    for i, r in enumerate(cfg.decoder_rates):
        blk = p["blocks"][str(i)]
        if sr_idx is not None and "sr_cond_layers" in p:
            c = p["sr_cond_layers"][str(i)]
            idx = jnp.asarray([sr_idx], jnp.int32)
            scale = apply_embedding(c["scale_embed"], idx)[:, None]
            bias = apply_embedding(c["bias_embed"], idx)[:, None]
            x = x * scale + bias
        x = _snake(blk["snake"]["alpha"], x)
        x = _causal_convtr(blk["conv_t"], x, stride=r,
                           pad=math.ceil(r / 2), output_padding=r % 2)
        if "noise" in blk and key is not None:
            noise = jax.random.normal(key, (x.shape[0], x.shape[1], 1),
                                      x.dtype)
            x = x + noise * _causal_conv(blk["noise"]["linear"], x, pad=0)
        g = x.shape[-1] if cfg.depthwise else 1
        x = _res_unit(blk["res1"], x, dilation=1, groups=g)
        x = _res_unit(blk["res2"], x, dilation=3, groups=g)
        x = _res_unit(blk["res3"], x, dilation=9, groups=g)
    x = _snake(p["snake_out"]["alpha"], x)
    x = _causal_conv(p["conv_out"], x, pad=3)
    return jnp.tanh(x)[..., 0]


__all__ = ["AudioVAEConfig", "init_vae_encoder", "vae_encode",
           "init_vae_decoder", "vae_decode"]
