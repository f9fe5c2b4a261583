"""CosyVoice/chatterbox 24 kHz mel front-end.

Parity: reference tts/models/chatterbox/s3gen/mel.py — reflect pad
(n_fft - hop)/2, center=False hann stft, slaney mel 0-8 kHz, log with a
1e-5 floor. Returns CHANNEL-LAST (B, frames, n_mels) (the reference
returns (B, n_mels, frames))."""

from __future__ import annotations

import jax.numpy as jnp

from .....dsp import mel_filters, spec_abs, stft


def mel_spectrogram(y, n_fft: int = 1920, num_mels: int = 80,
                    sampling_rate: int = 24000, hop_size: int = 480,
                    win_size: int = 1920, fmin: int = 0, fmax: int = 8000):
    y = jnp.asarray(y, jnp.float32)
    if y.ndim == 1:
        y = y[None]
    pad = (n_fft - hop_size) // 2
    y = jnp.concatenate([y[:, 1:pad + 1][:, ::-1], y,
                         y[:, -(pad + 1):-1][:, ::-1]], axis=1)
    spec = stft(y, n_fft=n_fft, hop_length=hop_size, win_length=win_size,
                window="hann", center=False)
    mag = spec_abs(spec)                             # (B, T', F)
    fb = mel_filters(sampling_rate, n_fft, num_mels, f_min=fmin,
                     f_max=fmax, norm="slaney", mel_scale="slaney")
    mel = mag @ fb.T
    return jnp.log(jnp.maximum(mel, 1e-5))          # (B, T', M)
