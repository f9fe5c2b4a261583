"""Kokoro text encoder + prosody predictor (functional, channel-last).

Architecture parity: /root/reference/mlx_audio/tts/models/kokoro/modules.py
(TextEncoder :21, AdaLayerNorm :71, ProsodyPredictor :288, DurationEncoder
:380). Redesigned: all tensors are (B, T, C) channel-last end to end (no
swapaxes churn), LSTMs carry validity masks so bucket-padded batches produce
identical numerics to tight shapes (pads precede data in the backward scan).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ....nn import (
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    apply_lstm,
    init_embedding,
    init_layer_norm,
    init_linear,
    init_lstm,
    leaky_relu,
)
from .istftnet import (
    adain_res_blk_1d,
    apply_conv_weighted,
    init_adain_res_blk_1d,
    init_conv_folded,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# AdaLayerNorm: channel layer-norm with style-conditioned affine
# ---------------------------------------------------------------------------


def init_ada_layer_norm(key, style_dim: int, channels: int) -> dict:
    return {"fc": init_linear(key, style_dim, channels * 2)}


def ada_layer_norm(p: dict, x: Array, s: Array, eps: float = 1e-5) -> Array:
    """x (B, T, C), s (B, style)."""
    h = apply_linear(p["fc"], s)  # (B, 2C)
    gamma, beta = jnp.split(h, 2, axis=-1)
    xn = apply_layer_norm(None, x, eps=eps)
    return (1 + gamma[:, None, :]) * xn + beta[:, None, :]


# ---------------------------------------------------------------------------
# TextEncoder
# ---------------------------------------------------------------------------


def init_text_encoder(key, channels: int, kernel_size: int, depth: int,
                      n_symbols: int) -> dict:
    ks = iter(jax.random.split(key, depth + 3))
    p = {"embedding": init_embedding(next(ks), n_symbols, channels), "cnn": {}}
    for i in range(depth):
        p["cnn"][str(i)] = {
            "0": init_conv_folded(next(ks), channels, channels, kernel_size),
            "1": init_layer_norm(channels),
        }
    p["lstm"] = {
        "forward": init_lstm(next(ks), channels, channels // 2),
        "backward": init_lstm(next(ks), channels, channels // 2),
    }
    return p


def text_encoder(p: dict, ids: Array, valid: Array, kernel_size: int) -> Array:
    """ids (B, L) int32; valid (B, L) bool (True = real token). -> (B, L, C)."""
    pad = (kernel_size - 1) // 2
    x = apply_embedding(p["embedding"], ids)
    m = valid[..., None]
    x = jnp.where(m, x, 0.0)
    for i in sorted(p["cnn"], key=int):
        blk = p["cnn"][i]
        x = apply_conv_weighted(blk["0"], x, padding=pad)
        x = jnp.where(m, x, 0.0)
        x = apply_layer_norm(blk["1"], x)
        x = jnp.where(m, x, 0.0)
        x = leaky_relu(x, 0.2)
        x = jnp.where(m, x, 0.0)
    x = apply_lstm(p["lstm"], x, bidirectional=True, mask=valid)
    return jnp.where(m, x, 0.0)


# ---------------------------------------------------------------------------
# DurationEncoder + ProsodyPredictor
# ---------------------------------------------------------------------------


def init_duration_encoder(key, sty_dim: int, d_model: int, nlayers: int) -> dict:
    ks = iter(jax.random.split(key, 3 * nlayers + 1))
    p = {"lstms": {}}
    for i in range(nlayers):
        p["lstms"][str(2 * i)] = {
            "forward": init_lstm(next(ks), d_model + sty_dim, d_model // 2),
            "backward": init_lstm(next(ks), d_model + sty_dim, d_model // 2),
        }
        p["lstms"][str(2 * i + 1)] = init_ada_layer_norm(next(ks), sty_dim, d_model)
    return p


def duration_encoder(p: dict, x: Array, style: Array, valid: Array,
                     nlayers: int) -> Array:
    """x (B, L, d_model); style (B, sty). -> (B, L, d_model + sty)."""
    m = valid[..., None]
    s_b = jnp.broadcast_to(style[:, None, :], x.shape[:2] + (style.shape[-1],))
    x = jnp.concatenate([x, s_b], axis=-1)
    x = jnp.where(m, x, 0.0)
    for i in range(nlayers):
        x = apply_lstm(p["lstms"][str(2 * i)], x, bidirectional=True, mask=valid)
        x = ada_layer_norm(p["lstms"][str(2 * i + 1)], x, style)
        x = jnp.concatenate([x, s_b], axis=-1)
        x = jnp.where(m, x, 0.0)
    return x


def init_prosody_predictor(key, style_dim: int, d_hid: int, nlayers: int,
                           max_dur: int = 50) -> dict:
    ks = iter(jax.random.split(key, 32))
    p = {
        "text_encoder": init_duration_encoder(next(ks), style_dim, d_hid, nlayers),
        "lstm": {
            "forward": init_lstm(next(ks), d_hid + style_dim, d_hid // 2),
            "backward": init_lstm(next(ks), d_hid + style_dim, d_hid // 2),
        },
        "duration_proj": {"linear_layer": init_linear(next(ks), d_hid, max_dur)},
        "shared": {
            "forward": init_lstm(next(ks), d_hid + style_dim, d_hid // 2),
            "backward": init_lstm(next(ks), d_hid + style_dim, d_hid // 2),
        },
        "F0": {
            "0": init_adain_res_blk_1d(next(ks), d_hid, d_hid, style_dim),
            "1": init_adain_res_blk_1d(next(ks), d_hid, d_hid // 2, style_dim,
                                       upsample=True),
            "2": init_adain_res_blk_1d(next(ks), d_hid // 2, d_hid // 2, style_dim),
        },
        "N": {
            "0": init_adain_res_blk_1d(next(ks), d_hid, d_hid, style_dim),
            "1": init_adain_res_blk_1d(next(ks), d_hid, d_hid // 2, style_dim,
                                       upsample=True),
            "2": init_adain_res_blk_1d(next(ks), d_hid // 2, d_hid // 2, style_dim),
        },
        "F0_proj": init_conv_folded(next(ks), d_hid // 2, 1, 1),
        "N_proj": init_conv_folded(next(ks), d_hid // 2, 1, 1),
    }
    return p


def predict_durations(p: dict, d: Array, valid: Array, speed: Array,
                      max_frames_per_phoneme: int = 100):
    """d (B, L, d_hid+sty) from duration_encoder -> pred_dur (B, L) int32.

    sigmoid-sum duration head (reference kokoro.py:139-147).
    """
    x = apply_lstm(p["lstm"], d, bidirectional=True, mask=valid)
    dur_logits = apply_linear(p["duration_proj"]["linear_layer"], x)  # (B,L,max_dur)
    duration = jax.nn.sigmoid(dur_logits).sum(axis=-1) / speed
    duration = jnp.nan_to_num(duration, nan=1.0,
                              posinf=max_frames_per_phoneme, neginf=1.0)
    pred = jnp.clip(jnp.round(duration), 1, max_frames_per_phoneme).astype(jnp.int32)
    return jnp.where(valid, pred, 0)


def f0n_train(p: dict, en: Array, s: Array, frame_valid: Optional[Array] = None):
    """en (B, F, d_hid+sty) aligned features -> (F0 (B, 2F), N (B, 2F)).

    Parity: ProsodyPredictor.F0Ntrain (modules.py:355-378).
    """
    x = apply_lstm(p["shared"], en, bidirectional=True, mask=frame_valid)
    up_valid = None
    if frame_valid is not None:
        up_valid = jnp.repeat(frame_valid, 2, axis=-1)
    # block "1" upsamples internally, so it (like "0") takes the F-rate mask;
    # only block "2" runs at the doubled rate.
    f0 = x
    for i in ("0", "1", "2"):
        v = up_valid if i == "2" else frame_valid
        f0 = adain_res_blk_1d(p["F0"][i], f0, s, valid=v)
    f0 = apply_conv_weighted(p["F0_proj"], f0, padding=0)[..., 0]
    n = x
    for i in ("0", "1", "2"):
        v = up_valid if i == "2" else frame_valid
        n = adain_res_blk_1d(p["N"][i], n, s, valid=v)
    n = apply_conv_weighted(p["N_proj"], n, padding=0)[..., 0]
    return f0, n


def build_alignment(pred_dur: Array, num_frames: int) -> Array:
    """Durations (B, L) -> alignment matrix (B, L, F) entirely on device.

    TPU-native replacement for the reference's per-phoneme Python repeat loop
    (kokoro.py:148-160): frame t belongs to phoneme i iff
    cumsum[i-1] <= t < cumsum[i]. One broadcasted comparison, static shapes.
    """
    csum = jnp.cumsum(pred_dur, axis=-1)  # (B, L)
    start = csum - pred_dur
    t = jnp.arange(num_frames)[None, None, :]
    return ((t >= start[..., None]) & (t < csum[..., None])).astype(jnp.float32)
