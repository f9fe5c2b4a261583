"""Smart Turn: semantic end-of-turn detector (Whisper encoder + attention
pooling + MLP head).

Parity: reference mlx_audio/vad/models/smart_turn/smart_turn.py — HF-style
Whisper encoder (:22-105: biased q/v projections, optional k bias, learned
positions, two GELU conv stem with stride-2 second conv), tanh attention
pooling (:131-134), 4-layer classifier (:136-143), `predict_endpoint`
(:231-246) with last-8s left-pad/trim + mean/std normalization (:186-200)
and the `inner.`/indexed-Sequential key remaps in sanitize (:248-305).

TPU design: the whole mel -> probability pipeline is one jitted function on
a fixed (max_audio_seconds * 100)-frame input — static shapes, no bucketing
needed, and the encoder's matmuls batch straight onto the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_embedding, apply_layer_norm,
                    apply_linear, init_conv1d, init_embedding,
                    init_layer_norm, init_linear)
from .config import EncoderConfig, ModelConfig

Array = jax.Array


@dataclass
class EndpointOutput:
    prediction: int
    probability: float


# ------------------------------------------------------------- encoder

def init_encoder(key, cfg: EncoderConfig) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.encoder_layers))
    d = cfg.d_model
    p = {
        "conv1": init_conv1d(next(ks), cfg.num_mel_bins, d, 3),
        "conv2": init_conv1d(next(ks), d, d, 3),
        "embed_positions": init_embedding(next(ks),
                                          cfg.max_source_positions, d),
        "layer_norm": init_layer_norm(d),
        "layers": {},
    }
    for i in range(cfg.encoder_layers):
        p["layers"][str(i)] = {
            "self_attn_layer_norm": init_layer_norm(d),
            "self_attn": {
                "q_proj": init_linear(next(ks), d, d),
                "k_proj": init_linear(next(ks), d, d,
                                      bias=cfg.k_proj_bias),
                "v_proj": init_linear(next(ks), d, d),
                "out_proj": init_linear(next(ks), d, d),
            },
            "final_layer_norm": init_layer_norm(d),
            "fc1": init_linear(next(ks), d, cfg.encoder_ffn_dim),
            "fc2": init_linear(next(ks), cfg.encoder_ffn_dim, d),
        }
    return p


def _attention(p: dict, x: Array, num_heads: int) -> Array:
    b, t, d = x.shape
    hd = d // num_heads
    q = apply_linear(p["q_proj"], x).reshape(b, t, num_heads, hd)
    k = apply_linear(p["k_proj"], x).reshape(b, t, num_heads, hd)
    v = apply_linear(p["v_proj"], x).reshape(b, t, num_heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(hd, x.dtype))
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
    return apply_linear(p["out_proj"], out)


def encoder_forward(p: dict, cfg: EncoderConfig, mel: Array) -> Array:
    """mel (B, frames, n_mels) -> (B, frames//2, d_model)."""
    x = jax.nn.gelu(apply_conv1d(p["conv1"], mel, padding=1))
    x = jax.nn.gelu(apply_conv1d(p["conv2"], x, stride=2, padding=1))
    pos = jnp.arange(x.shape[1])
    x = x + apply_embedding(p["embed_positions"], pos)[None]
    for i in range(cfg.encoder_layers):
        lp = p["layers"][str(i)]
        h = apply_layer_norm(lp["self_attn_layer_norm"], x)
        x = x + _attention(lp["self_attn"], h, cfg.encoder_attention_heads)
        h = apply_layer_norm(lp["final_layer_norm"], x)
        h = apply_linear(lp["fc2"],
                         jax.nn.gelu(apply_linear(lp["fc1"], h)))
        x = x + h
    return apply_layer_norm(p["layer_norm"], x)


def head_forward(p: dict, hidden: Array) -> Array:
    """attention-pool + classifier -> (B, 1) logits."""
    attn = apply_linear(p["pool_attention_2"],
                        jnp.tanh(apply_linear(p["pool_attention_0"],
                                              hidden)))
    attn = jax.nn.softmax(attn, axis=1)
    pooled = jnp.sum(hidden * attn, axis=1)
    x = apply_linear(p["classifier_0"], pooled)
    x = apply_layer_norm(p["classifier_1"], x)
    x = apply_linear(p["classifier_4"], jax.nn.gelu(x))
    return apply_linear(p["classifier_6"], jax.nn.gelu(x))


def smart_turn_forward(params: dict, enc_cfg: EncoderConfig,
                       mel: Array) -> Array:
    """mel (B, frames, n_mels) -> (B, 1) end-of-turn probability."""
    hidden = encoder_forward(params["encoder"], enc_cfg, mel)
    return jax.nn.sigmoid(head_forward(params, hidden))


# --------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)

    def init_params(self, key):
        d = self.config.encoder_config.d_model
        ks = iter(jax.random.split(key, 8))
        return {
            "encoder": init_encoder(next(ks), self.config.encoder_config),
            "pool_attention_0": init_linear(next(ks), d, 256),
            "pool_attention_2": init_linear(next(ks), 256, 1),
            "classifier_0": init_linear(next(ks), d, 256),
            "classifier_1": init_layer_norm(256),
            "classifier_4": init_linear(next(ks), 256, 64),
            "classifier_6": init_linear(next(ks), 64, 1),
        }

    # host-side feature prep ------------------------------------------

    def _prepare_audio(self, audio, sample_rate: Optional[int]) -> np.ndarray:
        pc = self.config.processor_config
        sr = pc.sampling_rate if sample_rate is None else sample_rate
        if isinstance(audio, str):
            from ....audio_io import read as audio_read
            wav, sr = audio_read(audio)
            if wav.ndim > 1:
                wav = wav.mean(axis=1)
            audio = wav
        x = np.asarray(audio, np.float32)
        if x.ndim != 1:
            raise ValueError(f"expected mono 1-D audio, got {x.shape}")
        if sr != pc.sampling_rate and x.size:
            new_len = max(1, int(round(x.shape[0] * pc.sampling_rate / sr)))
            x = np.interp(np.linspace(0, 1, new_len, endpoint=False),
                          np.linspace(0, 1, x.shape[0], endpoint=False),
                          x).astype(np.float32)
        max_samples = pc.max_audio_seconds * pc.sampling_rate
        if x.shape[0] > max_samples:
            x = x[-max_samples:]          # keep the most recent window
        elif x.shape[0] < max_samples:
            x = np.pad(x, (max_samples - x.shape[0], 0))
        if pc.normalize_audio and x.size:
            x = (x - x.mean()) / max(float(x.std()), 1e-7)
        return x

    def prepare_input_features(self, audio, sample_rate=None) -> Array:
        """audio -> (frames, n_mels) whisper-log-mel, fixed frame count."""
        from ....dsp import log_mel_spectrogram as _log_mel
        pc = self.config.processor_config
        x = self._prepare_audio(audio, sample_rate)
        mel = _log_mel(x, n_fft=pc.n_fft, hop_length=pc.hop_length,
                       n_mels=pc.n_mels, sample_rate=pc.sampling_rate,
                       log_base="log10_whisper")[:-1]
        target = pc.max_audio_seconds * pc.sampling_rate // pc.hop_length
        frames = mel.shape[0]
        if frames > target:
            mel = mel[-target:]
        elif frames < target:
            mel = jnp.pad(mel, ((target - frames, 0), (0, 0)))
        return mel

    def __call__(self, mel: Array) -> Array:
        if mel.ndim == 2:
            mel = mel[None]
        # accept HF (B, n_mels, frames) layout too
        if mel.shape[-1] != self.config.processor_config.n_mels:
            mel = jnp.swapaxes(mel, -1, -2)
        fwd = getattr(self, "_fwd", None)
        if fwd is None:
            cfg = self.config.encoder_config
            fwd = jax.jit(lambda p, m: smart_turn_forward(p, cfg, m))
            self._fwd = fwd
        return fwd(self.params, mel)

    def predict_endpoint(self, audio, sample_rate: Optional[int] = None,
                         threshold: Optional[float] = None
                         ) -> EndpointOutput:
        mel = self.prepare_input_features(audio, sample_rate)
        prob = float(self(mel)[0, 0])
        thr = self.config.processor_config.threshold if threshold is None \
            else float(threshold)
        return EndpointOutput(prediction=int(prob > thr), probability=prob)

    # weight loading --------------------------------------------------

    @staticmethod
    def _remap_key(key: str) -> str:
        if key.startswith("inner."):
            key = key[len("inner."):]
        for i in ("0", "2"):
            key = key.replace(f"pool_attention.{i}.", f"pool_attention_{i}.")
        for i in ("0", "1", "4", "6"):
            key = key.replace(f"classifier.{i}.", f"classifier_{i}.")
        return key

    def sanitize(self, weights: Dict[str, jnp.ndarray]
                 ) -> Dict[str, jnp.ndarray]:
        out = {}
        for key, v in weights.items():
            if key.startswith("val_"):   # ONNX helper constants
                continue
            key = self._remap_key(key)
            if key in ("encoder.conv1.weight", "encoder.conv2.weight") \
                    and v.ndim == 3 and v.shape[0] != 3:
                # torch (O, I, K=3) -> WIO (3, I, O); shape[0]==3 means the
                # checkpoint is already converted (kernel leads) — keep it.
                v = jnp.transpose(jnp.asarray(v), (2, 1, 0))
            if v.ndim == 2:
                # ONNX MatMul exports may be (in, out); our linear is
                # (out, in) like torch — fix by expected output dim.
                if key.endswith("fc1.weight") and v.shape[0] < v.shape[1]:
                    v = jnp.transpose(v)
                if key.endswith("fc2.weight") and v.shape[0] > v.shape[1]:
                    v = jnp.transpose(v)
                if key == "pool_attention_0.weight" and v.shape[0] != 256:
                    v = jnp.transpose(v)
                if key == "pool_attention_2.weight" and v.shape[0] != 1:
                    v = jnp.transpose(v)
            out[key] = v
        return out


__all__ = ["EncoderConfig", "ModelConfig", "EndpointOutput", "Model",
           "smart_turn_forward", "encoder_forward"]
