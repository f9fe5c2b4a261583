"""Vocos: ConvNeXt backbone + ISTFT-head mel vocoder.

Parity: /root/reference/mlx_audio/codec/models/vocos/vocos.py
(MelSpectrogramFeatures :25, ISTFTHead :119, ConvNeXtBlock :143,
VocosBackbone :217, Vocos :278) + mel.py. Functional channel-last rebuild;
the ISTFT head uses the shared dsp overlap-add (conv-transpose on MXU).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....dsp import _window_envelope_np, _window_np, log_mel_spectrogram, overlap_add
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_layer_norm,
    init_linear,
)

Array = jax.Array


@dataclass
class ModelConfig(BaseModelArgs):
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 100
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    layer_scale_init_value: Optional[float] = None
    model_path: str = ""


class Vocos(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 4 * c.num_layers + 8))
        lsv = c.layer_scale_init_value or 1.0 / c.num_layers
        blocks = {}
        for i in range(c.num_layers):
            blocks[str(i)] = {
                "dwconv": init_conv1d(next(ks), c.dim, c.dim, 7, groups=c.dim),
                "norm": init_layer_norm(c.dim),
                "pwconv1": init_linear(next(ks), c.dim, c.intermediate_dim),
                "pwconv2": init_linear(next(ks), c.intermediate_dim, c.dim),
                "gamma": jnp.full((c.dim,), lsv),
            }
        return {
            "backbone": {
                "embed": init_conv1d(next(ks), c.input_channels, c.dim, 7),
                "norm": init_layer_norm(c.dim),
                "convnext": blocks,
                "final_layer_norm": init_layer_norm(c.dim),
            },
            "head": {"out": init_linear(next(ks), c.dim, c.n_fft + 2)},
        }

    # -- pipeline -----------------------------------------------------------

    def features(self, audio) -> Array:
        """Mel features (B?, frames, n_mels), matching the reference mel.py
        (natural-log, clip floor)."""
        c = self.config
        return log_mel_spectrogram(
            jnp.asarray(audio, jnp.float32), n_fft=c.n_fft,
            hop_length=c.hop_length, n_mels=c.n_mels,
            sample_rate=c.sample_rate, log_base="ln", log_floor_mode="clip")

    def backbone(self, x: Array) -> Array:
        c = self.config
        p = self.params["backbone"]
        x = apply_conv1d(p["embed"], x, padding=3)
        x = apply_layer_norm(p["norm"], x, eps=1e-6)
        for i in range(c.num_layers):
            blk = p["convnext"][str(i)]
            res = x
            h = apply_conv1d(blk["dwconv"], x, padding=3, groups=c.dim)
            h = apply_layer_norm(blk["norm"], h, eps=1e-6)
            h = apply_linear(blk["pwconv1"], h)
            h = jax.nn.gelu(h, approximate=False)
            h = apply_linear(blk["pwconv2"], h)
            x = res + blk["gamma"] * h
        return apply_layer_norm(p["final_layer_norm"], x, eps=1e-6)

    def head(self, x: Array) -> Array:
        """(B, T, dim) -> audio (B, samples): exp-mag + phase -> ISTFT."""
        c = self.config
        h = apply_linear(self.params["head"]["out"], x)
        mag, phase = jnp.split(h, 2, axis=-1)
        mag = jnp.clip(jnp.exp(mag), None, 1e2)
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        from ....dsp import irfft_pair

        frames_time = irfft_pair(real, imag, n=c.n_fft)
        w_np = _window_np("hann", c.n_fft, False)
        w = jnp.asarray(w_np)
        rec = overlap_add(frames_time * w, c.hop_length, c.n_fft)
        env = jnp.asarray(_window_envelope_np(
            tuple(w_np.tolist()), x.shape[-2], c.hop_length, c.n_fft, False))
        rec = jnp.where(env > 1e-10, rec / env, rec)
        return rec[..., c.n_fft // 2: -(c.n_fft // 2)]

    def decode(self, features: Array) -> Array:
        return self.head(self.backbone(features))

    def __call__(self, audio) -> Array:
        return self.decode(self.features(audio))

    def sanitize(self, weights):
        out = {}
        for k, w in weights.items():
            if (k.endswith("dwconv.weight") or k.endswith("embed.weight")) \
                    and w.ndim == 3:
                out[k] = jnp.transpose(w, (2, 1, 0))  # torch (O,I/g,W) -> WIO
            else:
                out[k] = w
        return out


Model = Vocos
