"""Qwen3-TTS ECAPA-TDNN speaker encoder (x-vector) — functional.

Parity: /root/reference/mlx_audio/tts/models/qwen3_tts/speaker_encoder.py
(TimeDelayNetBlock w/ reflect padding :29, Res2NetBlock :60, SE block :104,
SERes2Net :136, AttentiveStatisticsPooling :172, Qwen3TTSSpeakerEncoder :222)
and the mel frontend qwen3_tts.py:64-121 (slaney mel, reflect-padded
center=False STFT, log clip 1e-5).

TPU design: one jitted batched forward; channel-last layout throughout so
convs map straight to lax.conv NWC.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import apply_conv1d, init_conv1d
from .config import Qwen3TTSSpeakerEncoderConfig

Array = jax.Array


def _reflect_pad_t(x: Array, pad: int) -> Array:
    """Reflect-pad the time axis of (B, T, C)."""
    if pad <= 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


def _tdnn(p: dict, x: Array, kernel: int, dilation: int) -> Array:
    pad = (kernel - 1) * dilation // 2
    x = _reflect_pad_t(x, pad)
    return jax.nn.relu(apply_conv1d(p["conv"], x, dilation=dilation))


def init_tdnn(key, in_ch: int, out_ch: int, kernel: int) -> dict:
    return {"conv": init_conv1d(key, in_ch, out_ch, kernel)}


def init_speaker_encoder(key, cfg: Qwen3TTSSpeakerEncoderConfig) -> dict:
    ks = iter(jax.random.split(key, 256))
    ch = cfg.enc_channels
    blocks = {"0": init_tdnn(next(ks), cfg.mel_dim, ch[0],
                             cfg.enc_kernel_sizes[0])}
    for i in range(1, len(ch) - 1):
        scale = cfg.enc_res2net_scale
        blocks[str(i)] = {
            "tdnn1": init_tdnn(next(ks), ch[i - 1], ch[i], 1),
            "res2net_block": {"blocks": {
                str(j): init_tdnn(next(ks), ch[i] // scale, ch[i] // scale,
                                  cfg.enc_kernel_sizes[i])
                for j in range(scale - 1)}},
            "tdnn2": init_tdnn(next(ks), ch[i], ch[i], 1),
            "se_block": {
                "conv1": init_conv1d(next(ks), ch[i], cfg.enc_se_channels, 1),
                "conv2": init_conv1d(next(ks), cfg.enc_se_channels, ch[i], 1),
            },
        }
    mfa_in = sum(ch[1:-1])  # mfa consumes concatenated SE-Res2Net outputs
    return {
        "blocks": blocks,
        "mfa": init_tdnn(next(ks), mfa_in, ch[-1], cfg.enc_kernel_sizes[-1]),
        "asp": {
            "tdnn": init_tdnn(next(ks), ch[-1] * 3,
                              cfg.enc_attention_channels, 1),
            "conv": init_conv1d(next(ks), cfg.enc_attention_channels,
                                ch[-1], 1),
        },
        "fc": init_conv1d(next(ks), ch[-1] * 2, cfg.enc_dim, 1),
    }


def _res2net(p: dict, x: Array, scale: int, kernel: int,
             dilation: int) -> Array:
    chunks = jnp.split(x, scale, axis=-1)
    outs = []
    part = None
    for i, chunk in enumerate(chunks):
        if i == 0:
            part = chunk
        elif i == 1:
            part = _tdnn(p["blocks"]["0"], chunk, kernel, dilation)
        else:
            part = _tdnn(p["blocks"][str(i - 1)], chunk + part, kernel,
                         dilation)
        outs.append(part)
    return jnp.concatenate(outs, axis=-1)


def _se(p: dict, x: Array) -> Array:
    m = jnp.mean(x, axis=1, keepdims=True)                 # (B, 1, C)
    se = jax.nn.relu(apply_conv1d(p["conv1"], m))
    se = jax.nn.sigmoid(apply_conv1d(p["conv2"], se))
    return x * se


def _se_res2net(p: dict, x: Array, cfg, kernel: int, dilation: int) -> Array:
    res = x
    x = _tdnn(p["tdnn1"], x, 1, 1)
    x = _res2net(p["res2net_block"], x, cfg.enc_res2net_scale, kernel,
                 dilation)
    x = _tdnn(p["tdnn2"], x, 1, 1)
    return _se(p["se_block"], x) + res


def _asp(p: dict, x: Array, eps: float = 1e-12) -> Array:
    """Attentive statistics pooling: (B, T, C) -> (B, 2C)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    std = jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + eps)
    t = x.shape[1]
    attn = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
        axis=-1)
    attn = _tdnn(p["tdnn"], attn, 1, 1)
    attn = apply_conv1d(p["conv"], jnp.tanh(attn))
    attn = jax.nn.softmax(attn, axis=1)
    mean = jnp.sum(attn * x, axis=1)
    var = jnp.sum(attn * (x - mean[:, None]) ** 2, axis=1)
    std = jnp.sqrt(jnp.clip(var, eps, None))
    return jnp.concatenate([mean, std], axis=-1)


def speaker_encoder_forward(p: dict, cfg: Qwen3TTSSpeakerEncoderConfig,
                            mels: Array) -> Array:
    """mels (B, T, mel_dim) -> embedding (B, enc_dim)."""
    x = _tdnn(p["blocks"]["0"], mels, cfg.enc_kernel_sizes[0],
              cfg.enc_dilations[0])
    hidden = []
    for i in range(1, len(cfg.enc_channels) - 1):
        x = _se_res2net(p["blocks"][str(i)], x, cfg,
                        cfg.enc_kernel_sizes[i], cfg.enc_dilations[i])
        hidden.append(x)
    x = jnp.concatenate(hidden, axis=-1)
    x = _tdnn(p["mfa"], x, cfg.enc_kernel_sizes[-1], cfg.enc_dilations[-1])
    x = _asp(p["asp"], x)
    return apply_conv1d(p["fc"], x[:, None])[:, 0]


def speaker_mel(audio: np.ndarray, *, n_fft: int = 1024, num_mels: int = 128,
                sample_rate: int = 24000, hop_size: int = 256,
                win_size: int = 1024, fmin: float = 0.0,
                fmax: float = 12000.0) -> np.ndarray:
    """Slaney log-mel for the speaker encoder (reference qwen3_tts.py:64)."""
    from ....dsp import mel_filters, stft

    x = np.asarray(audio, np.float32).reshape(-1)
    pad = (n_fft - hop_size) // 2
    x = np.concatenate([x[1:pad + 1][::-1], x, x[-(pad + 1):-1][::-1]])
    spec = stft(jnp.asarray(x), n_fft=n_fft, hop_length=hop_size,
                win_length=win_size, window="hann", center=False)
    mag = np.sqrt(np.abs(np.asarray(spec)) ** 2 + 1e-9)
    fb = np.asarray(mel_filters(sample_rate, n_fft, num_mels, f_min=fmin,
                                f_max=fmax, norm="slaney",
                                mel_scale="slaney"), np.float32)
    mel = mag @ fb.T
    return np.log(np.clip(mel, 1e-5, None))[None]  # (1, T, n_mels)


def sanitize_speaker_encoder(weights: dict) -> dict:
    """speaker_encoder.* torch keys -> our tree (conv OIK -> KIO)."""
    out = {}
    for k, v in weights.items():
        if not k.startswith("speaker_encoder."):
            continue
        nk = k[len("speaker_encoder."):]
        nk = nk.replace("blocks.", "blocks.", 1)
        v = jnp.asarray(v)
        if nk.endswith(".weight") and v.ndim == 3:
            v = jnp.transpose(v, (2, 1, 0))
        out["speaker_encoder." + nk] = v
    return out


__all__ = ["init_speaker_encoder", "speaker_encoder_forward", "speaker_mel",
           "sanitize_speaker_encoder"]
