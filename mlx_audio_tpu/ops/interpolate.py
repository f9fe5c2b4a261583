"""torch-style 1-D interpolate (nearest / linear) on channel-last tensors.

Parity: /root/reference/mlx_audio/tts/models/interpolate.py:7 (shared helper
used by vocoder source modules and upsamplers).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def interpolate1d(
    x: jnp.ndarray,
    scale_factor: Optional[float] = None,
    size: Optional[int] = None,
    mode: str = "nearest",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize the time axis of (..., T, C) to round(T*scale) or `size`.

    Matches torch.nn.functional.interpolate semantics for 1-D inputs
    (torch operates on (N, C, L); here the layout is channel-last).
    """
    t = x.shape[-2]
    if size is None:
        size = int(t * scale_factor)
    if size == t:
        return x
    if mode == "nearest":
        idx = jnp.floor(jnp.arange(size) * (t / size)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, t - 1)
        return jnp.take(x, idx, axis=-2)
    if mode == "linear":
        if align_corners and size > 1:
            pos = jnp.arange(size) * ((t - 1) / (size - 1))
        else:
            pos = (jnp.arange(size) + 0.5) * (t / size) - 0.5
        pos = jnp.clip(pos, 0.0, t - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, t - 1)
        w = (pos - lo)[..., None]
        return (1 - w) * jnp.take(x, lo, axis=-2) + w * jnp.take(x, hi, axis=-2)
    raise ValueError(f"Unsupported mode: {mode}")
