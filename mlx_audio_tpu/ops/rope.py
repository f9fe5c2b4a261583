"""Rotary position embeddings (RoPE) and multimodal MRoPE.

Used by the LLM-backbone TTS/STT families (qwen3_tts talker MRoPE, reference
/root/reference/mlx_audio/tts/models/qwen3_tts/talker.py:115-200; llama/qwen3
backbones tts/models/llama, tts/models/qwen3).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def rope_freqs(
    head_dim: int,
    theta: float = 10000.0,
    scaling_factor: float = 1.0,
) -> Array:
    """Inverse frequencies (head_dim // 2,)."""
    inv = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    return inv / scaling_factor


def apply_rope(
    x: Array,
    positions: Array,
    inv_freq: Array,
    interleaved: bool = False,
) -> Array:
    """Rotate q/k. x: (..., T, n_heads, head_dim), positions: (..., T).

    Non-interleaved ("split-half", HF/llama convention) by default.
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., T, hd/2)
    cos = jnp.cos(angles)[..., None, :]
    sin = jnp.sin(angles)[..., None, :]
    if interleaved:
        x1 = x[..., 0::2]
        x2 = x[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    else:
        half = x.shape[-1] // 2
        x1 = x[..., :half]
        x2 = x[..., half:]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        out = jnp.concatenate([r1, r2], axis=-1)
    return out.astype(x.dtype)


def apply_mrope(
    x: Array,
    positions: Array,
    inv_freq: Array,
    mrope_section: tuple,
) -> Array:
    """Multimodal RoPE: positions (3, B, T) with per-section channel split.

    Each of the 3 position streams (temporal/height/width in Qwen-style
    multimodal models) rotates its own slice of the head dim.
    """
    half = x.shape[-1] // 2
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (3, B, T, hd/2)
    sec = jnp.cumsum(jnp.asarray((0,) + tuple(mrope_section)))
    idx = jnp.searchsorted(sec[1:], jnp.arange(half), side="right")
    gather = jnp.clip(idx, 0, 2)
    # pick per-channel which stream's angle to use
    ang = jnp.take_along_axis(
        jnp.moveaxis(angles, 0, -1), gather[None, None, :, None], axis=-1
    )[..., 0]
    cos = jnp.cos(ang)[..., None, :]
    sin = jnp.sin(ang)[..., None, :]
    x1 = x[..., :half]
    x2 = x[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def apply_rope_interleaved(x: Array, positions: Array, inv_freq: Array) -> Array:
    """GPT-NeoX-interleaved partial RoPE (HF Moonshine semantics,
    reference stt/models/moonshine/moonshine.py:34-58): pair (2j, 2j+1)
    shares angle pos * inv_freq[j]; dims beyond 2*len(inv_freq) pass through.

    x: (B, T, H, D); positions: (T,) or (B, T); inv_freq: (rot/2,).
    """
    rot = 2 * inv_freq.shape[0]
    ang = jnp.asarray(positions)[..., None].astype(jnp.float32) * inv_freq
    if ang.ndim == 2:                      # (T, rot/2) -> (1, T, rot/2)
        ang = ang[None]
    cos = jnp.cos(ang)[:, :, None, :]      # (B, T, 1, rot/2)
    sin = jnp.sin(ang)[:, :, None, :]
    xr = x[..., :rot]
    x1 = xr[..., 0::2]
    x2 = xr[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    rotated = jnp.stack([r1, r2], axis=-1).reshape(xr.shape)
    return jnp.concatenate([rotated.astype(x.dtype), x[..., rot:]], axis=-1)


def rope_freqs_llama3(dim: int, theta: float, factor: float = 8.0,
                      low_freq_factor: float = 1.0,
                      high_freq_factor: float = 4.0,
                      original_max_position: int = 8192):
    """Llama-3 frequency scaling (HF rope_type="llama3"): long wavelengths
    divided by `factor`, short kept, smooth interpolation between."""
    import numpy as np
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    wavelen = 2 * np.pi / inv
    low_wl = original_max_position / low_freq_factor
    high_wl = original_max_position / high_freq_factor
    smooth = (original_max_position / wavelen - low_freq_factor) \
        / (high_freq_factor - low_freq_factor)
    smoothed = (1 - smooth) * inv / factor + smooth * inv
    out = np.where(wavelen < high_wl, inv,
                   np.where(wavelen > low_wl, inv / factor, smoothed))
    return jnp.asarray(out.astype(np.float32))
