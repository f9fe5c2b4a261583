"""Resemblyzer-style LSTM voice encoder.

Parity: reference tts/models/chatterbox/voice_encoder/ — 40-mel amp
spectrogram (slaney filters, power 2; melspec.py), 3-layer LSTM ->
linear -> ReLU -> L2 norm (voice_encoder.py:139-240), partial-utterance
windowing (160 frames, overlap 0.5, min coverage 0.8; :14-41, :243-300),
and the torch LSTM weight renames with summed biases (:153-201).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import mel_filters, spec_abs, stft
from ....nn import apply_linear, init_linear
from ....nn.recurrent import init_lstm

Array = jax.Array

VE_PARTIAL_FRAMES = 160
VE_MELS = 40
VE_HIDDEN = 256
VE_EMBED = 256


def ve_melspectrogram(wav: np.ndarray) -> np.ndarray:
    """(T,) 16 kHz -> (frames, 40) amplitude^2 mel (melspec.py)."""
    spec = stft(jnp.asarray(wav, jnp.float32), n_fft=400, hop_length=160,
                win_length=400, window="hann")
    mag = spec_abs(spec) ** 2.0
    fb = mel_filters(16000, 400, VE_MELS, f_min=0, f_max=8000,
                     norm="slaney", mel_scale="slaney")
    return np.asarray(mag @ fb.T)


def init_voice_encoder(key) -> dict:
    ks = iter(jax.random.split(key, 8))
    lstm = {}
    for i in range(3):
        lstm[str(i)] = init_lstm(next(ks),
                                 VE_MELS if i == 0 else VE_HIDDEN,
                                 VE_HIDDEN)
    return {"lstm": {"layers": lstm},
            "proj": init_linear(next(ks), VE_HIDDEN, VE_EMBED),
            "similarity_weight": jnp.asarray([10.0]),
            "similarity_bias": jnp.asarray([-5.0])}


def _lstm_seq(lp: dict, x: Array) -> Array:
    """(B, T, I) -> final hidden (B, H) for one layer; returns outputs."""
    b, t, _ = x.shape
    h0 = jnp.zeros((b, lp["weight_hh"].shape[1]))
    c0 = jnp.zeros_like(h0)

    def step(carry, xt):
        h, c = carry
        bsum = lp.get("bias_ih", 0)
        if "bias_hh" in lp:
            bsum = bsum + lp["bias_hh"]
        gates = xt @ lp["weight_ih"].T + h @ lp["weight_hh"].T + bsum
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(fg) * c + jax.nn.sigmoid(ig) * jnp.tanh(gg)
        h = jax.nn.sigmoid(og) * jnp.tanh(c)
        return (h, c), h

    (_, _), hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def voice_encoder_forward(p: dict, mels: Array) -> Array:
    """(B, 160, 40) partials -> (B, 256) L2-normed embeddings."""
    x = mels
    for i in range(3):
        x = _lstm_seq(p["lstm"]["layers"][str(i)], x)
    h = x[:, -1]
    e = jax.nn.relu(apply_linear(p["proj"], h))
    return e / jnp.linalg.norm(e, axis=1, keepdims=True)


class VoiceEncoder:
    def __init__(self, params: Optional[dict] = None):
        self.params = params
        self._jit: Dict = {}

    def init(self, key) -> "VoiceEncoder":
        self.params = init_voice_encoder(key)
        return self

    def embeds_from_wavs(self, wavs: List[np.ndarray],
                         sample_rate: int = 16000,
                         overlap: float = 0.5,
                         min_coverage: float = 0.8) -> Array:
        """Utterance embeddings via overlapped partial windows."""
        step = int(round(VE_PARTIAL_FRAMES * (1 - overlap)))
        partials = []
        for wav in wavs:
            mel = ve_melspectrogram(np.asarray(wav, np.float32)
                                    .reshape(-1))
            n = mel.shape[0]
            win = VE_PARTIAL_FRAMES
            n_wins, rem = divmod(max(n - win + step, 0), step)
            if n_wins == 0 or (rem + (win - step)) / win >= min_coverage:
                n_wins += 1
            target = win + step * (n_wins - 1)
            if mel.shape[0] < target:
                mel = np.pad(mel, ((0, target - mel.shape[0]), (0, 0)))
            for w in range(n_wins):
                partials.append(mel[w * step: w * step + win])
        batch = np.stack(partials)
        fn = self._jit.get(batch.shape[0])
        if fn is None:
            fn = jax.jit(voice_encoder_forward)
            self._jit[batch.shape[0]] = fn
        embeds = fn(self.params, jnp.asarray(batch))
        # mean over partials, re-normalized (reference embeds_from_mels)
        raw = jnp.mean(embeds, axis=0, keepdims=True)
        return raw / jnp.linalg.norm(raw, axis=1, keepdims=True)


def sanitize_voice_encoder(weights: Dict) -> Dict:
    """torch LSTM key renames; biases kept separate (summed at use)."""
    import re
    out = {}
    for k, v in weights.items():
        v = jnp.asarray(v)
        m = re.search(r"lstm\.(weight_ih|weight_hh|bias_ih|bias_hh)_l(\d+)",
                      k)
        if m:
            kind, layer = m.group(1), m.group(2)
            out[f"lstm.layers.{layer}.{kind}"] = v
            continue
        out[k] = v
    return out


__all__ = ["VoiceEncoder", "init_voice_encoder", "voice_encoder_forward",
           "ve_melspectrogram", "sanitize_voice_encoder"]
