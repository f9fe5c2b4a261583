"""BigVGAN: mel -> waveform GAN vocoder with anti-aliased snake activations.

Parity: /root/reference/mlx_audio/codec/models/bigvgan (bigvgan.py :29,
amp.py AMPBlock1/2 :10/:61, activation.py snake/snakebeta with optional
log-scale alphas, resample.py kaiser-windowed sinc up/down-sampling around
each activation). Functional channel-last; weight-norm folded at load; the
anti-alias filters are precomputed host-side constants (depthwise convs on
the MXU path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_conv1d, apply_conv_transpose1d, init_conv1d, \
    init_conv_transpose1d

Array = jax.Array


@lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """(kernel_size,) kaiser-windowed sinc low-pass (reference resample.py:17)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        t = np.arange(-half_size, half_size) + 0.5
    else:
        t = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * t)
    return (f / f.sum()).astype(np.float32)


def _upsample1d(x: Array, ratio: int) -> Array:
    """Anti-aliased 1-D upsample (reference UpSample1d :101)."""
    c = x.shape[-1]
    ksize = int(6 * ratio // 2) * 2
    pad = ksize // ratio - 1
    pad_left = pad * ratio + (ksize - ratio) // 2
    pad_right = pad * ratio + (ksize - ratio + 1) // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ksize))
    kernel = jnp.broadcast_to(filt[:, None, None], (ksize, 1, c))
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = ratio * apply_conv_transpose1d(
        {"weight": jnp.flip(kernel, 0)}, xp, stride=ratio, padding=0,
        groups=c)
    return y[:, pad_left: y.shape[1] - pad_right, :]


def _downsample1d(x: Array, ratio: int) -> Array:
    c = x.shape[-1]
    ksize = int(6 * ratio // 2) * 2
    even = ksize % 2 == 0
    pad_left = ksize // 2 - int(even)
    pad_right = ksize // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ksize))
    kernel = jnp.broadcast_to(filt[:, None, None], (ksize, 1, c))
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return apply_conv1d({"weight": kernel}, xp, stride=ratio, groups=c)


def snake(x: Array, alpha: Array, beta: Optional[Array],
          logscale: bool) -> Array:
    a = jnp.exp(alpha) if logscale else alpha
    b = a if beta is None else (jnp.exp(beta) if logscale else beta)
    return x + (1.0 / (b + 1e-9)) * jnp.sin(a * x) ** 2


def activation1d(p: dict, x: Array, logscale: bool) -> Array:
    """2x-upsampled snake then 2x downsample (alias-free activation)."""
    x = _upsample1d(x, 2)
    beta = p["beta"].reshape(-1) if "beta" in p else None
    x = snake(x, p["alpha"].reshape(-1), beta, logscale)
    return _downsample1d(x, 2)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "bigvgan"
    num_mels: int = 100
    upsample_rates: List[int] = field(default_factory=lambda: [4, 4, 2, 2, 2, 2])
    upsample_kernel_sizes: List[int] = field(
        default_factory=lambda: [8, 8, 4, 4, 4, 4])
    upsample_initial_channel: int = 1536
    resblock: str = "1"
    resblock_kernel_sizes: List[int] = field(default_factory=lambda: [3, 7, 11])
    resblock_dilation_sizes: List[List[int]] = field(
        default_factory=lambda: [[1, 3, 5]] * 3)
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_bias_at_final: bool = True
    use_tanh_at_final: bool = True
    sample_rate: int = 24000
    model_path: str = ""


class BigVGAN(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)

    def _init_act(self, ch: int) -> dict:
        p = {"alpha": jnp.zeros((ch,))}
        if self.config.activation == "snakebeta":
            p["beta"] = jnp.zeros((ch,))
        return p

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 256))
        p = {"conv_pre": init_conv1d(next(ks), c.num_mels,
                                     c.upsample_initial_channel, 7),
             "ups": {}, "resblocks": {}}
        num_kernels = len(c.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            cin = c.upsample_initial_channel // (2 ** i)
            cout = c.upsample_initial_channel // (2 ** (i + 1))
            p["ups"][str(i)] = {"0": init_conv_transpose1d(next(ks), cin,
                                                           cout, k)}
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                blk = {"convs1": {}, "convs2": {}, "activations": {}}
                for di, d in enumerate(rd):
                    blk["convs1"][str(di)] = init_conv1d(next(ks), cout,
                                                         cout, rk)
                    blk["convs2"][str(di)] = init_conv1d(next(ks), cout,
                                                         cout, rk)
                for ai in range(2 * len(rd)):
                    blk["activations"][str(ai)] = {
                        "act": self._init_act(cout)}
                p["resblocks"][str(i * num_kernels + j)] = blk
        ch_final = c.upsample_initial_channel // (2 ** len(c.upsample_rates))
        p["activation_post"] = {"act": self._init_act(ch_final)}
        p["conv_post"] = init_conv1d(next(ks), ch_final, 1, 7,
                                     bias=c.use_bias_at_final)
        return p

    def _amp_block(self, p: dict, x: Array, kernel: int,
                   dilations: List[int]) -> Array:
        c = self.config
        for di, d in enumerate(dilations):
            h = activation1d(p["activations"][str(2 * di)]["act"], x,
                             c.snake_logscale)
            h = apply_conv1d(p["convs1"][str(di)], h,
                             padding=((kernel - 1) * d) // 2, dilation=d)
            h = activation1d(p["activations"][str(2 * di + 1)]["act"], h,
                             c.snake_logscale)
            h = apply_conv1d(p["convs2"][str(di)], h,
                             padding=(kernel - 1) // 2)
            x = x + h
        return x

    def decode(self, mel: Array) -> Array:
        """mel (B, T, num_mels) -> audio (B, samples, 1)."""
        c = self.config
        p = self.params
        num_kernels = len(c.resblock_kernel_sizes)
        x = apply_conv1d(p["conv_pre"], mel, padding=3)
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            x = apply_conv_transpose1d(p["ups"][str(i)]["0"], x, stride=u,
                                       padding=(k - u) // 2)
            xs = None
            for j in range(num_kernels):
                blk = p["resblocks"][str(i * num_kernels + j)]
                out = self._amp_block(blk, x, c.resblock_kernel_sizes[j],
                                      c.resblock_dilation_sizes[j])
                xs = out if xs is None else xs + out
            x = xs / num_kernels
        x = activation1d(p["activation_post"]["act"], x, c.snake_logscale)
        x = apply_conv1d(p["conv_post"], x, padding=3)
        return jnp.tanh(x) if c.use_tanh_at_final else jnp.clip(x, -1, 1)

    def __call__(self, mel: Array) -> Array:
        return self.decode(jnp.asarray(mel))

    def sanitize(self, weights):
        """Fold weight norm; layout-convert (ups.* are transposed convs)."""
        import numpy as np

        from ....nn.layers import convert_torch_conv_transpose_weight
        from ....tts.models.kokoro.istftnet import fold_weight_norm

        out = {}
        gs = {k: v for k, v in weights.items() if k.endswith("weight_g")}
        for k, w in weights.items():
            if k.endswith("weight_g"):
                continue
            if (k.endswith("alpha") or k.endswith("beta")) and w.ndim == 3:
                out[k] = w.reshape(-1)
                continue
            if k.endswith("weight_v"):
                base = k[: -len(".weight_v")]
                g = gs.get(base + ".weight_g")
                folded = fold_weight_norm(g, w) if g is not None else \
                    np.asarray(w)
                if base.startswith("ups.") or ".ups." in base:
                    out[base + ".weight"] = \
                        convert_torch_conv_transpose_weight(
                            jnp.asarray(folded))
                else:
                    out[base + ".weight"] = jnp.transpose(
                        jnp.asarray(folded), (2, 1, 0))
                continue
            if k.endswith(".weight") and w.ndim == 3:
                if k.startswith("ups.") or ".ups." in k:
                    out[k] = convert_torch_conv_transpose_weight(w)
                else:
                    out[k] = jnp.transpose(w, (2, 1, 0))
                continue
            out[k] = w
        return out


Model = BigVGAN
