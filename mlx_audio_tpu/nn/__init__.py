"""Functional neural-net layer library for mlx_audio_tpu.

Design: **params are pytrees** (nested dicts of jnp arrays) and layers are
pure functions `apply(params, x, ...)`. This replaces the reference's
`mlx.nn.Module` object graph (SURVEY.md §1 L0) with the idiomatic JAX shape:
params flow explicitly, so `jax.jit`/`pjit` sharding annotations, donation,
and `lax.scan`-based streaming state all compose without framework magic.

Weight layout policy (applied once at load time by each model's `sanitize`):
  * linear:            (out_features, in_features)     [torch layout, kept]
  * conv1d:            (width, in_ch/groups, out_ch)   [WIO — TPU-preferred]
  * conv_transpose1d:  (width, out_ch, in_ch)          [WOI for lax.conv_transpose(transpose_kernel=True)]
  * embedding:         (vocab, dim)
"""

from .layers import (
    apply_conv1d,
    apply_conv_transpose1d,
    apply_embedding,
    apply_group_norm,
    apply_layer_norm,
    apply_linear,
    apply_rms_norm,
    causal_conv1d,
    causal_conv1d_step,
    gelu,
    init_conv1d,
    init_conv2d,
    apply_conv2d,
    init_conv_transpose1d,
    init_embedding,
    init_group_norm,
    init_layer_norm,
    init_linear,
    init_rms_norm,
    leaky_relu,
    mish,
    silu,
    snake,
)
from .recurrent import apply_gru, apply_lstm, init_gru, init_lstm

__all__ = [
    "apply_linear", "init_linear",
    "apply_embedding", "init_embedding",
    "apply_layer_norm", "init_layer_norm",
    "apply_rms_norm", "init_rms_norm",
    "apply_group_norm", "init_group_norm",
    "apply_conv1d", "init_conv1d",
    "apply_conv_transpose1d", "init_conv_transpose1d",
    "causal_conv1d", "causal_conv1d_step",
    "apply_lstm", "init_lstm", "apply_gru", "init_gru",
    "gelu", "silu", "mish", "snake", "leaky_relu",
]
