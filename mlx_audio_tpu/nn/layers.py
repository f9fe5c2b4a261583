"""Core functional layers.

Every layer has `init_*` (random params for tiny-config tests / fresh models)
and `apply_*` (pure forward). Streaming convolutions carry explicit ring-
buffer state so autoregressive codec decoders run inside `lax.scan` /
`lax.while_loop` without host round-trips (the TPU-native replacement for the
reference's Python-side streaming conv caches, e.g.
/root/reference/mlx_audio/tts/models/qwen3_tts/speech_tokenizer.py:786-956).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

gelu = jax.nn.gelu
silu = jax.nn.silu


def mish(x: Array) -> Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def leaky_relu(x: Array, negative_slope: float = 0.01) -> Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def snake(x: Array, alpha: Array) -> Array:
    """Snake activation x + sin^2(alpha x)/alpha (BigVGAN/DAC vocoders)."""
    return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


# ---------------------------------------------------------------------------
# Linear / Embedding
# ---------------------------------------------------------------------------


def init_linear(key, in_features: int, out_features: int, bias: bool = True,
                dtype=jnp.float32) -> dict:
    k1, _ = jax.random.split(key)
    scale = 1.0 / (in_features ** 0.5)
    p = {"weight": jax.random.uniform(
        k1, (out_features, in_features), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_features,), dtype)
    return p


def apply_linear(params: dict, x: Array) -> Array:
    """x: (..., in) @ weight(out, in)^T [+ bias] -> (..., out).

    Supports quantized params ({'w_q','scales',...}) transparently.
    """
    if "w_i8" in params:
        from ..ops.quant import qmatmul_i8

        return qmatmul_i8(params, x)
    if "w_q" in params:
        from ..ops.quant import qmatmul

        return qmatmul(params, x)
    if "w_fp4" in params or "w_fp8" in params:
        from ..ops.quant import fp_matmul

        return fp_matmul(params, x)
    y = jnp.einsum("...i,oi->...o", x, params["weight"])
    if "bias" in params:
        y = y + params["bias"]
    return y


def init_embedding(key, vocab: int, dim: int, dtype=jnp.float32) -> dict:
    return {"weight": jax.random.normal(key, (vocab, dim), dtype) * 0.02}


def apply_embedding(params: dict, ids: Array) -> Array:
    return jnp.take(params["weight"], ids, axis=0)


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def init_layer_norm(dim: int, bias: bool = True, dtype=jnp.float32) -> dict:
    p = {"weight": jnp.ones((dim,), dtype)}
    if bias:
        p["bias"] = jnp.zeros((dim,), dtype)
    return p


def apply_layer_norm(params: Optional[dict], x: Array, eps: float = 1e-5) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if params is not None:
        if "weight" in params:
            y = y * params["weight"]
        if "bias" in params:
            y = y + params["bias"]
    return y


def init_rms_norm(dim: int, dtype=jnp.float32) -> dict:
    return {"weight": jnp.ones((dim,), dtype)}


def apply_rms_norm(params: Optional[dict], x: Array, eps: float = 1e-6) -> Array:
    # compute in f32 for stability under bf16 activations
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    y = y.astype(x.dtype)
    if params is not None and "weight" in params:
        y = y * params["weight"]
    return y


def init_group_norm(num_groups: int, channels: int, dtype=jnp.float32) -> dict:
    return {"weight": jnp.ones((channels,), dtype),
            "bias": jnp.zeros((channels,), dtype),
            "_num_groups": num_groups}


def apply_group_norm(params: dict, x: Array, num_groups: Optional[int] = None,
                     eps: float = 1e-5) -> Array:
    """GroupNorm over channel-last input (..., T, C)."""
    if num_groups is None:
        num_groups = int(params["_num_groups"])
    c = x.shape[-1]
    g = num_groups
    lead = x.shape[:-2]
    t = x.shape[-2]
    xg = x.reshape(lead + (t, g, c // g))
    # normalize over (time, channels-in-group) like torch GroupNorm on (N,C,T)
    axes = (-3, -1)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return y * params["weight"] + params["bias"]


# ---------------------------------------------------------------------------
# Convolutions (channel-last activations: (..., T, C); kernels WIO)
# ---------------------------------------------------------------------------


def init_conv1d(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True,
                groups: int = 1, dtype=jnp.float32) -> dict:
    scale = 1.0 / ((in_ch // groups * kernel) ** 0.5)
    p = {"weight": jax.random.uniform(
        key, (kernel, in_ch // groups, out_ch), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def apply_conv1d(
    params: dict,
    x: Array,
    stride: int = 1,
    padding=0,
    dilation: int = 1,
    groups: int = 1,
) -> Array:
    """1-D conv on (N, T, C_in) [or (T, C_in)] with WIO kernel -> (N, T', C_out)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    if isinstance(padding, int):
        padding = [(padding, padding)]
    elif isinstance(padding, tuple):
        padding = [padding]
    y = jax.lax.conv_general_dilated(
        x,
        params["weight"].astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y[0] if squeeze else y


def init_conv_transpose1d(key, in_ch: int, out_ch: int, kernel: int,
                          bias: bool = True, groups: int = 1,
                          dtype=jnp.float32) -> dict:
    scale = 1.0 / ((in_ch // groups * kernel) ** 0.5)
    p = {"weight": jax.random.uniform(
        key, (kernel, in_ch // groups, out_ch), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def fold_torch_weight_norm(weights: dict) -> dict:
    """Fold torch weight-norm serializations into plain `.weight` keys.

    Handles both the legacy `X.weight_g`/`X.weight_v` pair and the torch>=2.1
    parametrization form `X.parametrizations.weight.original0/original1`
    (w = g * v / ||v||, norm over all dims except 0). Keys without a matching
    pair pass through untouched, so this is a safe pre-pass for any sanitize.
    """
    import numpy as np

    out = {}
    consumed = set()
    for k in weights:
        base = None
        if k.endswith(".parametrizations.weight.original1"):
            base = k[: -len(".parametrizations.weight.original1")]
            gk = base + ".parametrizations.weight.original0"
        elif k.endswith(".weight_v"):
            base = k[: -len(".weight_v")]
            gk = base + ".weight_g"
        if base is None:
            continue
        if gk in weights:
            g = np.asarray(weights[gk], dtype=np.float32)
            v = np.asarray(weights[k], dtype=np.float32)
            norm = np.sqrt(np.sum(
                v * v, axis=tuple(range(1, v.ndim)), keepdims=True))
            out[base + ".weight"] = (g * v / np.maximum(norm, 1e-12)).astype(
                np.float32)
            consumed.update((k, gk))
    for k, w in weights.items():
        if k not in consumed:
            out.setdefault(k, w)
    return out


def convert_torch_conv_transpose_weight(w, groups: int = 1) -> Array:
    """torch ConvTranspose1d weight (I, O/g, W) -> pre-flipped WIO kernel
    (W, I/g, O). We store the *equivalent forward-conv* kernel so transposed
    conv lowers to one `conv_general_dilated` with lhs_dilation (MXU path).

    For groups=1: transpose (I, O, W) -> (W, I, O) and flip the W axis; for
    grouped/depthwise convs the group blocks are re-laid out so
    feature_group_count=groups reproduces torch's grouped semantics.
    """
    w = jnp.asarray(w)
    i_ch, o_g, width = w.shape
    w = w.reshape(groups, i_ch // groups, o_g, width)
    w = jnp.transpose(w, (3, 1, 0, 2))  # (W, I/g, g, O/g)
    w = w.reshape(width, i_ch // groups, groups * o_g)
    return jnp.flip(w, axis=0)


def apply_conv_transpose1d(
    params: dict,
    x: Array,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
) -> Array:
    """Transposed 1-D conv matching torch semantics (incl. grouped/depthwise).

    Kernel layout: pre-flipped equivalent forward-conv (W, I/groups, O) — see
    `convert_torch_conv_transpose_weight`. Lowered to `conv_general_dilated`
    with lhs_dilation=stride, which XLA maps onto the MXU.
    Output length: (T-1)*stride - 2*padding + kernel + output_padding.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    kernel = params["weight"].shape[0]
    y = jax.lax.conv_general_dilated(
        x,
        params["weight"].astype(x.dtype),
        window_strides=(1,),
        padding=[(kernel - 1 - padding, kernel - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y[0] if squeeze else y


def init_conv2d(key, in_ch: int, out_ch: int, kernel, bias: bool = True,
                groups: int = 1, dtype=jnp.float32) -> dict:
    kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
    scale = 1.0 / ((in_ch // groups * kh * kw) ** 0.5)
    p = {"weight": jax.random.uniform(
        key, (kh, kw, in_ch // groups, out_ch), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def apply_conv2d(params: dict, x: Array, stride=1, padding=0,
                 groups: int = 1) -> Array:
    """2-D conv on (N, H, W, C_in) with HWIO kernel -> (N, H', W', C_out)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, params["weight"].astype(x.dtype), window_strides=stride,
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def causal_conv1d(params: dict, x: Array, stride: int = 1, dilation: int = 1,
                  groups: int = 1) -> Array:
    """Causal conv: left-pad (kernel-1)*dilation so output depends on past only."""
    kernel = params["weight"].shape[0]
    pad = (kernel - 1) * dilation
    return apply_conv1d(params, x, stride=stride, padding=(pad, 0),
                        dilation=dilation, groups=groups)


def causal_conv1d_step(
    params: dict, x_step: Array, state: Array, dilation: int = 1,
    groups: int = 1,
) -> Tuple[Array, Array]:
    """One streaming step of a causal conv.

    Args:
        x_step: (N, S, C_in) new samples (S = stride, usually hop per step).
        state: (N, (kernel-1)*dilation, C_in) ring buffer of past inputs.
    Returns:
        (y, new_state). Jit/scan-safe: shapes static, no host sync.
    """
    ctx = jnp.concatenate([state, x_step], axis=-2)
    y = apply_conv1d(params, ctx, stride=1, padding=0, dilation=dilation,
                     groups=groups)
    new_state = ctx[:, x_step.shape[-2]:, :] if ctx.ndim == 3 else ctx[x_step.shape[-2]:, :]
    return y, new_state
