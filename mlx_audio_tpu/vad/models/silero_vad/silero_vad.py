"""Silero VAD: dual-rate (16 k / 8 k) voice-activity detector.

Parity: /root/reference/mlx_audio/vad/models/silero_vad/silero_vad.py
(branch net :42-103, streaming feed :162-197, offline
get_speech_timestamps :209-241, generate -> VADOutput :243-266, hysteresis
timestamp logic :361-428) and config.py:9-55.

TPU redesign: the offline path runs the *entire* chunk sequence through one
`lax.scan` (stateful LSTM carried across chunks) inside a single jit — the
reference loops chunk-by-chunk in Python with an mx.eval per chunk. The
streaming `feed` path reuses the same compiled single-chunk step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_conv1d, init_conv1d, init_lstm

Array = jax.Array


@dataclass
class BranchConfig(BaseModelArgs):
    sample_rate: int = 16000
    filter_length: int = 256
    hop_length: int = 128
    pad: int = 64
    cutoff: int = 129
    context_size: int = 64
    chunk_size: int = 512


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "silero_vad"
    architecture: str = "silero_vad"
    dtype: str = "float32"
    threshold: float = 0.5
    min_speech_duration_ms: int = 250
    min_silence_duration_ms: int = 100
    speech_pad_ms: int = 30
    branch_16k: Optional[BranchConfig] = None
    branch_8k: Optional[BranchConfig] = None
    model_path: str = ""

    def __post_init__(self):
        if isinstance(self.branch_16k, dict):
            self.branch_16k = BranchConfig.from_dict(self.branch_16k)
        if self.branch_16k is None:
            self.branch_16k = BranchConfig()
        if isinstance(self.branch_8k, dict):
            self.branch_8k = BranchConfig.from_dict(self.branch_8k)
        if self.branch_8k is None:
            self.branch_8k = BranchConfig(
                sample_rate=8000, filter_length=128, hop_length=64, pad=32,
                cutoff=65, context_size=32, chunk_size=256)


@dataclass
class SileroVADState:
    state: Optional[Tuple[Array, Array]]  # (hidden, cell) each (B, 128)
    context: Array  # (B, context_size)
    sample_rate: int


@dataclass
class VADOutput:
    timestamps: List[dict]
    probabilities: np.ndarray
    sample_rate: int


def init_branch(key, cfg: BranchConfig) -> dict:
    ks = iter(jax.random.split(key, 8))
    return {
        "stft_conv": init_conv1d(next(ks), 1, cfg.cutoff * 2,
                                 cfg.filter_length, bias=False),
        "conv1": init_conv1d(next(ks), cfg.cutoff, 128, 3),
        "conv2": init_conv1d(next(ks), 128, 64, 3),
        "conv3": init_conv1d(next(ks), 64, 64, 3),
        "conv4": init_conv1d(next(ks), 64, 128, 3),
        "lstm": init_lstm(next(ks), 128, 128),
        "final_conv": init_conv1d(next(ks), 128, 1, 1),
    }


def _branch_step(p: dict, cfg: BranchConfig, window: Array,
                 h: Array, c: Array) -> Tuple[Array, Array, Array]:
    """One VAD step on (B, context+chunk) samples -> (prob (B,), h, c)."""
    # reflect-pad right (reference _reflect_pad_right :28)
    pad = cfg.pad
    tail = jnp.flip(window[:, -pad - 1: -1], axis=-1)
    x = jnp.concatenate([window, tail], axis=-1)
    x = apply_conv1d(p["stft_conv"], x[..., None], stride=cfg.hop_length)
    real = x[..., : cfg.cutoff]
    imag = x[..., cfg.cutoff:]
    x = jnp.sqrt(real * real + imag * imag)
    x = jax.nn.relu(apply_conv1d(p["conv1"], x, padding=1))
    x = jax.nn.relu(apply_conv1d(p["conv2"], x, stride=2, padding=1))
    x = jax.nn.relu(apply_conv1d(p["conv3"], x, stride=2, padding=1))
    x = jax.nn.relu(apply_conv1d(p["conv4"], x, padding=1))
    # LSTM over the (short) frame axis, carrying state across chunks
    wih, whh = p["lstm"]["weight_ih"], p["lstm"]["weight_hh"]
    b = p["lstm"].get("bias_ih", 0) + p["lstm"].get("bias_hh", 0)

    def cell_step(carry, xt):
        hh, cc = carry
        gates = xt @ wih.T + hh @ whh.T + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
        hh = jax.nn.sigmoid(o) * jnp.tanh(cc)
        return (hh, cc), hh

    (h, c), hs = jax.lax.scan(cell_step, (h, c), jnp.swapaxes(x, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T', 128)
    y = jax.nn.sigmoid(apply_conv1d(p["final_conv"], jax.nn.relu(hs)))
    prob = jnp.mean(y[..., 0], axis=-1)
    return prob, h, c


class Model(FunctionalModel):
    """Silero VAD (the engine behind server turn detection + voice_pipeline)."""

    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)

    # -- params ------------------------------------------------------------

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "branch_16k": init_branch(k1, self.config.branch_16k),
            "branch_8k": init_branch(k2, self.config.branch_8k),
        }

    def sanitize(self, weights):
        """Map checkpoint conv/LSTM layouts to WIO / forward-subdict."""
        out = {}
        for k, w in weights.items():
            if k.endswith(".weight") and w.ndim == 3:
                # torch (O, I, W) -> WIO; mlx (O, W, I) -> WIO
                if w.shape[1] <= w.shape[2]:  # (O, I, W) kernel last is larger
                    out[k] = jnp.transpose(w, (2, 1, 0))
                else:
                    out[k] = jnp.transpose(w, (1, 2, 0))
            elif "lstm" in k and (".weight_ih" in k or ".weight_hh" in k
                                  or ".bias_ih" in k or ".bias_hh" in k):
                out[k.replace("_l0", "")] = w
            elif k.endswith(("Wx", "Wh")):
                out[k.replace(".Wx", ".weight_ih").replace(".Wh", ".weight_hh")] = w
            else:
                out[k] = w
        return out

    # -- config helpers ----------------------------------------------------

    def _branch(self, sample_rate: int) -> Tuple[dict, BranchConfig]:
        if sample_rate == 16000:
            return self.params["branch_16k"], self.config.branch_16k
        if sample_rate == 8000:
            return self.params["branch_8k"], self.config.branch_8k
        raise ValueError(f"Unsupported sample rate: {sample_rate}")

    # -- streaming ---------------------------------------------------------

    def initial_state(self, batch_size: int = 1,
                      sample_rate: int = 16000) -> SileroVADState:
        _, cfg = self._branch(sample_rate)
        return SileroVADState(
            state=None,
            context=jnp.zeros((batch_size, cfg.context_size), jnp.float32),
            sample_rate=sample_rate,
        )

    reset_state = initial_state

    def feed(self, chunk, state: Optional[SileroVADState] = None,
             sample_rate: int = 16000) -> Tuple[Array, SileroVADState]:
        """One streaming chunk (B?, chunk_size) -> (prob (B,1), new state)."""
        p, cfg = self._branch(sample_rate)
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.ndim == 1:
            chunk = chunk[None, :]
        if chunk.shape[-1] != cfg.chunk_size:
            raise ValueError(
                f"Expected {cfg.chunk_size} samples at {sample_rate} Hz, got "
                f"{chunk.shape[-1]}")
        if state is None:
            state = self.initial_state(chunk.shape[0], sample_rate)
        if state.sample_rate != sample_rate:
            raise ValueError(
                f"Streaming state is for {state.sample_rate} Hz, got "
                f"{sample_rate} Hz")
        h, c = state.state if state.state is not None else (
            jnp.zeros((chunk.shape[0], 128)), jnp.zeros((chunk.shape[0], 128)))

        fn = self._jit_cache.get(("feed", sample_rate))
        if fn is None:
            fn = jax.jit(lambda pp, w, hh, cc: _branch_step(pp, cfg, w, hh, cc))
            self._jit_cache[("feed", sample_rate)] = fn
        window = jnp.concatenate([state.context, chunk], axis=-1)
        prob, h, c = fn(p, window, h, c)
        new_state = SileroVADState(
            state=(h, c), context=chunk[:, -cfg.context_size:],
            sample_rate=sample_rate)
        return prob[:, None], new_state

    # -- offline -----------------------------------------------------------

    def predict_proba(self, audio, sample_rate: Optional[int] = None) -> np.ndarray:
        """Per-chunk speech probabilities via ONE scanning jit."""
        audio, sr = self._prepare(audio, sample_rate)
        p, cfg = self._branch(sr)
        n = len(audio)
        n_chunks = max(1, -(-n // cfg.chunk_size))
        padded = np.zeros(n_chunks * cfg.chunk_size, np.float32)
        padded[:n] = np.asarray(audio, np.float32)
        chunks = jnp.asarray(padded.reshape(n_chunks, cfg.chunk_size))

        fn = self._jit_cache.get(("scan", sr))
        if fn is None:
            def scan_all(pp, ch):
                def step(carry, chunk):
                    h, c, ctx = carry
                    window = jnp.concatenate([ctx, chunk[None]], axis=-1)
                    prob, h, c = _branch_step(pp, cfg, window, h, c)
                    return (h, c, chunk[None, -cfg.context_size:]), prob[0]

                init = (jnp.zeros((1, 128)), jnp.zeros((1, 128)),
                        jnp.zeros((1, cfg.context_size)))
                _, probs = jax.lax.scan(step, init, ch)
                return probs

            fn = jax.jit(scan_all)
            self._jit_cache[("scan", sr)] = fn
        return np.asarray(fn(p, chunks))

    predict = predict_proba

    def get_speech_timestamps(
        self,
        audio,
        sample_rate: Optional[int] = None,
        threshold: Optional[float] = None,
        min_speech_duration_ms: Optional[int] = None,
        min_silence_duration_ms: Optional[int] = None,
        speech_pad_ms: Optional[int] = None,
        return_seconds: bool = False,
    ) -> List[dict]:
        audio_arr, sr = self._prepare(audio, sample_rate)
        probs = self.predict_proba(audio_arr, sr)
        return _probs_to_timestamps(
            probs, len(audio_arr), sr,
            threshold if threshold is not None else self.config.threshold,
            min_speech_duration_ms or self.config.min_speech_duration_ms,
            min_silence_duration_ms or self.config.min_silence_duration_ms,
            speech_pad_ms or self.config.speech_pad_ms,
            return_seconds,
        )

    def generate(self, audio, sample_rate: Optional[int] = None,
                 **kwargs) -> VADOutput:
        audio_arr, sr = self._prepare(audio, sample_rate)
        probs = self.predict_proba(audio_arr, sr)
        stamps = _probs_to_timestamps(
            probs, len(audio_arr), sr,
            kwargs.get("threshold", self.config.threshold),
            kwargs.get("min_speech_duration_ms",
                       self.config.min_speech_duration_ms),
            kwargs.get("min_silence_duration_ms",
                       self.config.min_silence_duration_ms),
            kwargs.get("speech_pad_ms", self.config.speech_pad_ms),
            kwargs.get("return_seconds", True),
        )
        return VADOutput(timestamps=stamps, probabilities=probs,
                         sample_rate=sr)

    def _prepare(self, audio, sample_rate):
        if isinstance(audio, (str,)) or hasattr(audio, "__fspath__"):
            from ...utils import load_audio

            sr = sample_rate or 16000
            return np.asarray(load_audio(audio, sample_rate=sr)), sr
        return np.asarray(audio, np.float32), sample_rate or 16000


def _probs_to_timestamps(probs, audio_len, sample_rate, threshold,
                         min_speech_ms, min_silence_ms, speech_pad_ms,
                         return_seconds) -> List[dict]:
    """Hysteresis speech-segment extraction (reference :361-428)."""
    probs = np.asarray(probs).reshape(-1)
    chunk_size = 512 if sample_rate == 16000 else 256
    min_speech = sample_rate * min_speech_ms / 1000
    min_silence = sample_rate * min_silence_ms / 1000
    pad = int(sample_rate * speech_pad_ms / 1000)
    neg_threshold = max(threshold - 0.15, 0.01)

    speeches = []
    triggered = False
    cur_start = 0
    temp_end = 0
    for idx, prob in enumerate(probs.tolist()):
        at = idx * chunk_size
        if prob >= threshold and not triggered:
            triggered, cur_start, temp_end = True, at, 0
            continue
        if triggered and prob >= threshold:
            temp_end = 0
            continue
        if triggered and prob < neg_threshold:
            if temp_end == 0:
                temp_end = at
            if at - temp_end >= min_silence:
                if temp_end - cur_start >= min_speech:
                    speeches.append({"start": cur_start, "end": temp_end})
                triggered, temp_end = False, 0
    if triggered:
        end = min(audio_len, len(probs) * chunk_size)
        if end - cur_start >= min_speech:
            speeches.append({"start": cur_start, "end": end})

    padded = []
    for sp in speeches:
        start = max(0, sp["start"] - pad)
        end = min(audio_len, sp["end"] + pad)
        if padded and start <= padded[-1]["end"]:
            padded[-1]["end"] = max(padded[-1]["end"], end)
        else:
            padded.append({"start": start, "end": end})
    if return_seconds:
        return [{"start": round(s["start"] / sample_rate, 3),
                 "end": round(s["end"] / sample_rate, 3)} for s in padded]
    return padded
