"""Whisper audio constants + mel front-end.

Parity: /root/reference/mlx_audio/stt/models/whisper/audio.py (constants,
log_mel_spectrogram :41, pad_or_trim). The mel itself is the shared fused
matmul-DFT path from mlx_audio_tpu.dsp.
"""

from __future__ import annotations

import jax.numpy as jnp

from ....dsp import log_mel_spectrogram as _log_mel

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100
TOKENS_PER_SECOND = SAMPLE_RATE // (HOP_LENGTH * 2)  # 50


def log_mel_spectrogram(audio, n_mels: int = 80, padding: int = 0):
    """audio (T,) -> (frames, n_mels), whisper-normalized log10 mel."""
    mel = _log_mel(
        jnp.asarray(audio, dtype=jnp.float32),
        n_fft=N_FFT,
        hop_length=HOP_LENGTH,
        n_mels=n_mels,
        sample_rate=SAMPLE_RATE,
        padding=padding,
        log_base="log10_whisper",
    )
    # whisper drops the last (partial) frame like torch.stft(..., center=True)[:-1]
    return mel[..., :-1, :]


def pad_or_trim(array, length: int = N_FRAMES, axis: int = -2):
    """Pad with zeros or trim the time axis to `length`."""
    array = jnp.asarray(array)
    cur = array.shape[axis]
    if cur > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        return array[tuple(sl)]
    if cur < length:
        widths = [(0, 0)] * array.ndim
        widths[axis] = (0, length - cur)
        return jnp.pad(array, widths)
    return array
