"""HiFT-Net generator (HiFi-GAN + neural source filter + ISTFT head).

Parity: reference tts/models/chatterbox/s3gen/hifigan.py — snake ResBlocks
(:61-113), SineGen with the interpolation phase path (down/up-sampled
cumulative phase, :133-218), harmonic-merge source module (:221-263),
mel upsampling ConvTranspose stack with reflect-pad-left-one before the
last stage, source STFT fusion at every scale (:593-658), exp-magnitude /
sin-phase ISTFT head, and the ConvRNNF0Predictor (f0_predictor.py).

TPU design: one jitted decode per mel-length bucket, channel-last; the
tiny n_fft=16 source STFT/ISTFT ride the shared matmul-DFT dsp kernels.
Randomness (harmonic phases, NSF noise) is an explicit PRNG key argument.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .....dsp import istft as dsp_istft
from .....dsp import stft as dsp_stft
from .....nn import (apply_conv1d, apply_conv_transpose1d, apply_linear,
                    init_conv1d, init_conv_transpose1d, init_linear)

Array = jax.Array


def _snake(x: Array, alpha: Array) -> Array:
    """x + (1/alpha) sin^2(alpha x) with the reference clamping."""
    a = alpha.reshape(1, 1, -1)
    a_c = jnp.sign(a) * jnp.maximum(jnp.abs(a), 1e-4)
    a_c = jnp.where(jnp.abs(a) < 1e-9, 1e-4, a_c)
    return x + (1.0 / a_c) * jnp.sin(x * a) ** 2


def _get_padding(kernel: int, dilation: int = 1) -> int:
    return (kernel * dilation - dilation) // 2


# ------------------------------------------------------------------ init

def init_resblock(key, channels: int, kernel: int,
                  dilations: List[int]) -> dict:
    ks = iter(jax.random.split(key, 2 * len(dilations)))
    return {
        "convs1": {str(i): init_conv1d(next(ks), channels, channels,
                                       kernel)
                   for i in range(len(dilations))},
        "convs2": {str(i): init_conv1d(next(ks), channels, channels,
                                       kernel)
                   for i in range(len(dilations))},
        "activations1": {str(i): {"alpha": jnp.ones((channels,))}
                         for i in range(len(dilations))},
        "activations2": {str(i): {"alpha": jnp.ones((channels,))}
                         for i in range(len(dilations))}}


def apply_resblock(p: dict, x: Array, kernel: int,
                   dilations: List[int]) -> Array:
    for i, d in enumerate(dilations):
        xt = _snake(x, p["activations1"][str(i)]["alpha"])
        xt = apply_conv1d(p["convs1"][str(i)], xt,
                          padding=_get_padding(kernel, d), dilation=d)
        xt = _snake(xt, p["activations2"][str(i)]["alpha"])
        xt = apply_conv1d(p["convs2"][str(i)], xt,
                          padding=_get_padding(kernel, 1))
        x = x + xt
    return x


def init_f0_predictor(key, in_channels: int = 80,
                      cond_channels: int = 512) -> dict:
    ks = iter(jax.random.split(key, 8))
    return {"condnet": {str(i): init_conv1d(
                next(ks), in_channels if i == 0 else cond_channels,
                cond_channels, 3) for i in range(5)},
            "classifier": init_linear(next(ks), cond_channels, 1)}


def apply_f0_predictor(p: dict, mel: Array) -> Array:
    """(B, T, M) mel -> (B, T) f0."""
    x = mel
    for i in range(5):
        x = jax.nn.elu(apply_conv1d(p["condnet"][str(i)], x, padding=1))
    return jnp.abs(apply_linear(p["classifier"], x)[..., 0])


class HiFTConfig:
    def __init__(self, in_channels=80, base_channels=512, nb_harmonics=8,
                 sampling_rate=22050, nsf_alpha=0.1, nsf_sigma=0.003,
                 nsf_voiced_threshold=10.0, upsample_rates=(8, 8),
                 upsample_kernel_sizes=(16, 16),
                 istft_params=None, resblock_kernel_sizes=(3, 7, 11),
                 resblock_dilation_sizes=((1, 3, 5),) * 3,
                 source_resblock_kernel_sizes=(7, 11),
                 source_resblock_dilation_sizes=((1, 3, 5),) * 2,
                 lrelu_slope=0.1, audio_limit=0.99,
                 use_interpolation=False):
        self.in_channels = in_channels
        self.base_channels = base_channels
        self.nb_harmonics = nb_harmonics
        self.sampling_rate = sampling_rate
        self.nsf_alpha = nsf_alpha
        self.nsf_sigma = nsf_sigma
        self.nsf_voiced_threshold = nsf_voiced_threshold
        self.upsample_rates = list(upsample_rates)
        self.upsample_kernel_sizes = list(upsample_kernel_sizes)
        self.istft_params = istft_params or {"n_fft": 16, "hop_len": 4}
        self.resblock_kernel_sizes = list(resblock_kernel_sizes)
        self.resblock_dilation_sizes = [list(d) for d in
                                        resblock_dilation_sizes]
        self.source_resblock_kernel_sizes = list(
            source_resblock_kernel_sizes)
        self.source_resblock_dilation_sizes = [
            list(d) for d in source_resblock_dilation_sizes]
        self.lrelu_slope = lrelu_slope
        self.audio_limit = audio_limit
        self.use_interpolation = use_interpolation
        self.upsample_scale = math.prod(self.upsample_rates) \
            * self.istft_params["hop_len"]

    def source_down_rates(self) -> List[int]:
        rates = [1] + self.upsample_rates[::-1][:-1]
        cum, out = 1, []
        for r in rates:
            cum *= r
            out.append(cum)
        return out[::-1]


def init_hift(key, cfg: HiFTConfig) -> dict:
    ks = iter(jax.random.split(key, 64))
    bc = cfg.base_channels
    nfft = cfg.istft_params["n_fft"]
    ups = {str(i): init_conv_transpose1d(
        next(ks), bc // (2 ** i), bc // (2 ** (i + 1)), k)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes))}
    sd, sr = {}, {}
    for i, (u, k, d) in enumerate(zip(cfg.source_down_rates(),
                                      cfg.source_resblock_kernel_sizes,
                                      cfg.source_resblock_dilation_sizes)):
        ch = bc // (2 ** (i + 1))
        sd[str(i)] = init_conv1d(next(ks), nfft + 2, ch,
                                 1 if u == 1 else u * 2)
        sr[str(i)] = init_resblock(next(ks), ch, k, d)
    res = {}
    idx = 0
    for i in range(len(cfg.upsample_rates)):
        ch = bc // (2 ** (i + 1))
        for k, d in zip(cfg.resblock_kernel_sizes,
                        cfg.resblock_dilation_sizes):
            res[str(idx)] = init_resblock(next(ks), ch, k, d)
            idx += 1
    ch = bc // (2 ** len(cfg.upsample_rates))
    return {"conv_pre": init_conv1d(next(ks), cfg.in_channels, bc, 7),
            "ups": ups, "source_downs": sd, "source_resblocks": sr,
            "resblocks": res,
            "conv_post": init_conv1d(next(ks), ch, nfft + 2, 7),
            "m_source": {"l_linear": init_linear(
                next(ks), cfg.nb_harmonics + 1, 1)},
            "f0_predictor": init_f0_predictor(next(ks), cfg.in_channels)}


# --------------------------------------------------------------- source

def _interp_to(x: Array, new_size: int) -> Array:
    """Linear resize along the last axis (torch align_corners=True-ish,
    reference _linear_interpolate_1d_to_size)."""
    t = x.shape[-1]
    pos = jnp.linspace(0.0, t - 1, new_size)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = pos - lo
    return jnp.take(x, lo, axis=-1) * (1 - w) + jnp.take(x, hi,
                                                         axis=-1) * w


def sine_source(key, cfg: HiFTConfig, f0_up: Array) -> Array:
    """(B, T) upsampled f0 -> (B, T, 1) merged sine source.

    Implements the interpolation phase path (reference :157-185) and the
    plain cumsum path, with explicit PRNG."""
    b, t = f0_up.shape
    h = cfg.nb_harmonics + 1
    k1, k2, k3 = jax.random.split(key, 3)
    mult = jnp.arange(1, h + 1, dtype=jnp.float32)
    fn = f0_up[..., None] * mult                      # (B, T, H)
    if cfg.use_interpolation:
        rad = (fn / cfg.sampling_rate) % 1.0
        rand_ini = jax.random.uniform(k1, (b, h))
        rand_ini = jnp.concatenate([jnp.zeros((b, 1)), rand_ini[:, 1:]],
                                   axis=1)
        rad = rad.at[:, 0, :].add(rand_ini)
        t_down = max(1, t // cfg.upsample_scale)
        rad_d = _interp_to(jnp.swapaxes(rad, 1, 2), t_down)
        phase = jnp.cumsum(jnp.swapaxes(rad_d, 1, 2), axis=1) \
            * 2 * jnp.pi
        phase_up = _interp_to(jnp.swapaxes(phase, 1, 2)
                              * cfg.upsample_scale, t)
        sines = jnp.sin(jnp.swapaxes(phase_up, 1, 2)) * cfg.nsf_alpha
    else:
        theta = 2 * jnp.pi * (jnp.cumsum(fn / cfg.sampling_rate,
                                         axis=1) % 1.0)
        phase_vec = jax.random.uniform(k1, (b, 1, h), minval=-jnp.pi,
                                       maxval=jnp.pi)
        phase_vec = phase_vec * (mult > 1)
        sines = cfg.nsf_alpha * jnp.sin(theta + phase_vec)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[..., None]
    noise_amp = uv * cfg.nsf_sigma + (1 - uv) * cfg.nsf_alpha / 3
    noise = noise_amp * jax.random.normal(k2, sines.shape)
    return sines * uv + noise                         # (B, T, H)


# --------------------------------------------------------------- decode

def hift_decode(p: dict, cfg: HiFTConfig, mel: Array,
                source: Array) -> Array:
    """mel (B, T, M) + source (B, T*scale) -> waveform (B, samples)."""
    nfft = cfg.istft_params["n_fft"]
    hop = cfg.istft_params["hop_len"]
    win = jnp.asarray([0.5 * (1 - math.cos(2 * math.pi * n / nfft))
                       for n in range(nfft)], jnp.float32)
    s_spec = dsp_stft(source, n_fft=nfft, hop_length=hop, win_length=nfft,
                      window=win, center=True, pad_mode="reflect")
    s_stft = jnp.concatenate([jnp.real(s_spec), jnp.imag(s_spec)],
                             axis=-1)                # (B, T', nfft+2)

    x = apply_conv1d(p["conv_pre"], mel, padding=3)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
        x = apply_conv_transpose1d(p["ups"][str(i)], x, stride=u,
                                   padding=(k - u) // 2)
        if i == len(cfg.upsample_rates) - 1:
            x = jnp.concatenate([x[:, 1:2], x], axis=1)  # reflect-pad 1
        u_down = cfg.source_down_rates()[i]
        si = apply_conv1d(p["source_downs"][str(i)], s_stft,
                          stride=u_down,
                          padding=0 if u_down == 1 else u_down // 2)
        si = apply_resblock(p["source_resblocks"][str(i)], si,
                            cfg.source_resblock_kernel_sizes[i],
                            cfg.source_resblock_dilation_sizes[i])
        x = x + si
        outs = []
        for j, (kk, dd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            outs.append(apply_resblock(
                p["resblocks"][str(i * len(cfg.resblock_kernel_sizes)
                                   + j)], x, kk, dd))
        x = sum(outs) / len(outs)
    x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
    x = apply_conv1d(p["conv_post"], x, padding=3)   # (B, T', nfft+2)
    half = nfft // 2 + 1
    mag = jnp.clip(jnp.exp(x[..., :half]), None, 1e2)
    phase = jnp.sin(x[..., half:])
    spec = mag * jnp.cos(phase) + 1j * (mag * jnp.sin(phase))
    outs = []
    for bi in range(spec.shape[0]):
        outs.append(dsp_istft(spec[bi], hop_length=hop, win_length=nfft,
                              window=win, center=True))
    audio = jnp.stack(outs, axis=0)
    return jnp.clip(audio, -cfg.audio_limit, cfg.audio_limit)


def hift_generate(p: dict, cfg: HiFTConfig, mel: Array,
                  key=None) -> Tuple[Array, Array]:
    """mel (B, T, M) -> (waveform (B, samples), source (B, T*scale))."""
    if key is None:
        key = jax.random.PRNGKey(0)
    f0 = apply_f0_predictor(p["f0_predictor"], mel)   # (B, T)
    f0_up = jnp.repeat(f0, cfg.upsample_scale, axis=1)
    sines = sine_source(key, cfg, f0_up)              # (B, T*s, H)
    merged = jnp.tanh(apply_linear(p["m_source"]["l_linear"], sines))
    source = merged[..., 0]
    return hift_decode(p, cfg, mel, source), source


class HiFTGenerator:
    """Thin stateful wrapper (params + config) used by stepaudio2."""

    def __init__(self, cfg: Optional[HiFTConfig] = None,
                 params: Optional[dict] = None):
        self.cfg = cfg or HiFTConfig()
        self.params = params

    def init(self, key) -> "HiFTGenerator":
        self.params = init_hift(key, self.cfg)
        return self

    def generate(self, mel: Array, key=None) -> Tuple[Array, Array]:
        return hift_generate(self.params, self.cfg, mel, key)


def sanitize_hift(weights: Dict, cfg: HiFTConfig) -> Dict:
    """torch checkpoint -> functional tree: conv layouts + key renames."""
    from .....nn.layers import convert_torch_conv_transpose_weight
    out = {}
    for k, v in weights.items():
        v = jnp.asarray(v)
        if k.endswith(".weight") and v.ndim == 3:
            if k.startswith("ups."):                 # torch (I, O, K)
                v = convert_torch_conv_transpose_weight(v)
            elif v.shape[-1] < v.shape[0]:           # torch (O, I, K)
                v = jnp.transpose(v, (2, 1, 0))
        out[k] = v
    return out


__all__ = ["HiFTConfig", "HiFTGenerator", "init_hift", "hift_decode",
           "hift_generate", "sine_source", "init_f0_predictor",
           "apply_f0_predictor", "init_resblock", "apply_resblock",
           "sanitize_hift"]
