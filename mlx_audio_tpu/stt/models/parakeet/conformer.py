"""FastConformer encoder (functional): rel-pos attention + conv modules.

Parity: /root/reference/mlx_audio/stt/models/parakeet/conformer.py
(ConformerArgs :15, macaron FeedForward :35, Convolution (GLU + depthwise +
BN) :46, ConformerBlock :93, DwStridingSubsampling :146, Conformer :274) and
attention.py (Transformer-XL relative-position attention with pos_bias_u/v).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....codec.models.ecapa_tdnn.ecapa_tdnn import (
    apply_batch_norm,
    init_batch_norm,
)
from ....nn import (
    apply_conv1d,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_layer_norm,
    init_linear,
)
from ....nn.layers import apply_conv2d, init_conv2d

Array = jax.Array


@dataclass
class ConformerArgs:
    feat_in: int = 80
    n_layers: int = 16
    d_model: int = 512
    n_heads: int = 8
    ff_expansion_factor: int = 4
    subsampling_factor: int = 8
    self_attention_model: str = "rel_pos"
    subsampling: str = "dw_striding"
    conv_kernel_size: int = 9
    subsampling_conv_channels: int = 256
    pos_emb_max_len: int = 5000
    causal_downsampling: bool = False
    use_bias: bool = True
    xscaling: bool = False
    subsampling_conv_chunking_factor: int = 1


def rel_pos_encoding(length: int, d_model: int) -> np.ndarray:
    """Transformer-XL relative positions [+L-1 ... 0 ... -L+1] -> sinusoids."""
    positions = np.arange(length - 1, -length, -1, dtype=np.float64)
    inv = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    pe = np.zeros((len(positions), d_model), np.float32)
    pe[:, 0::2] = np.sin(positions[:, None] * inv)
    pe[:, 1::2] = np.cos(positions[:, None] * inv)
    return pe


def _rel_shift(x: Array) -> Array:
    """(B, H, T, 2T-1) -> (B, H, T, T) Transformer-XL shift."""
    b, h, t, n = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, n + 1, t)
    x = x[:, :, 1:].reshape(b, h, t, n)
    return x[..., : (n + 1) // 2]


def init_conformer_block(key, a: ConformerArgs) -> dict:
    ks = iter(jax.random.split(key, 24))
    ffd = a.d_model * a.ff_expansion_factor
    hd = a.d_model // a.n_heads
    p = {
        "norm_feed_forward1": init_layer_norm(a.d_model),
        "feed_forward1": {
            "linear1": init_linear(next(ks), a.d_model, ffd, bias=a.use_bias),
            "linear2": init_linear(next(ks), ffd, a.d_model, bias=a.use_bias)},
        "norm_self_att": init_layer_norm(a.d_model),
        "self_attn": {
            "linear_q": init_linear(next(ks), a.d_model, a.d_model,
                                    bias=a.use_bias),
            "linear_k": init_linear(next(ks), a.d_model, a.d_model,
                                    bias=a.use_bias),
            "linear_v": init_linear(next(ks), a.d_model, a.d_model,
                                    bias=a.use_bias),
            "linear_out": init_linear(next(ks), a.d_model, a.d_model,
                                      bias=a.use_bias),
            "linear_pos": init_linear(next(ks), a.d_model, a.d_model,
                                      bias=False),
            "pos_bias_u": jnp.zeros((a.n_heads, hd)),
            "pos_bias_v": jnp.zeros((a.n_heads, hd)),
        },
        "norm_conv": init_layer_norm(a.d_model),
        "conv": {
            "pointwise_conv1": init_conv1d(next(ks), a.d_model,
                                           a.d_model * 2, 1,
                                           bias=a.use_bias),
            "depthwise_conv": init_conv1d(next(ks), a.d_model, a.d_model,
                                          a.conv_kernel_size,
                                          groups=a.d_model, bias=a.use_bias),
            "batch_norm": init_batch_norm(a.d_model),
            "pointwise_conv2": init_conv1d(next(ks), a.d_model, a.d_model, 1,
                                           bias=a.use_bias)},
        "norm_feed_forward2": init_layer_norm(a.d_model),
        "feed_forward2": {
            "linear1": init_linear(next(ks), a.d_model, ffd, bias=a.use_bias),
            "linear2": init_linear(next(ks), ffd, a.d_model, bias=a.use_bias)},
        "norm_out": init_layer_norm(a.d_model),
    }
    return p


def _ff(p, x):
    return apply_linear(p["linear2"], jax.nn.silu(apply_linear(p["linear1"],
                                                               x)))


def _rel_pos_attention(p, a: ConformerArgs, x: Array, pos_emb: Array,
                       mask: Optional[Array]) -> Array:
    b, t, d = x.shape
    h, hd = a.n_heads, d // a.n_heads
    q = apply_linear(p["linear_q"], x).reshape(b, t, h, hd)
    k = apply_linear(p["linear_k"], x).reshape(b, t, h, hd)
    v = apply_linear(p["linear_v"], x).reshape(b, t, h, hd)
    pos = apply_linear(p["linear_pos"], pos_emb).reshape(
        1, -1, h, hd)  # (1, 2T-1, H, hd)
    q_u = q + p["pos_bias_u"][None, None]
    q_v = q + p["pos_bias_v"][None, None]
    ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
    bd = jnp.einsum("bthd,bshd->bhts", q_v,
                    jnp.broadcast_to(pos, (b,) + pos.shape[1:]))
    bd = _rel_shift(bd)
    scores = (ac + bd) / jnp.sqrt(jnp.float32(hd))
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", w, v).reshape(b, t, d)
    return apply_linear(p["linear_out"], out)


def conformer_block(p, a: ConformerArgs, x: Array, pos_emb: Array,
                    mask: Optional[Array] = None) -> Array:
    x = x + 0.5 * _ff(p["feed_forward1"],
                      apply_layer_norm(p["norm_feed_forward1"], x))
    xn = apply_layer_norm(p["norm_self_att"], x)
    x = x + _rel_pos_attention(p["self_attn"], a, xn, pos_emb, mask)
    # conv module: pointwise -> GLU -> depthwise -> BN -> SiLU -> pointwise
    c = p["conv"]
    h = apply_layer_norm(p["norm_conv"], x)
    h = apply_conv1d(c["pointwise_conv1"], h)
    ha, hb = jnp.split(h, 2, axis=-1)
    h = ha * jax.nn.sigmoid(hb)
    h = apply_conv1d(c["depthwise_conv"], h,
                     padding=(a.conv_kernel_size - 1) // 2,
                     groups=a.d_model)
    h = apply_batch_norm(c["batch_norm"], h)
    h = jax.nn.silu(h)
    x = x + apply_conv1d(c["pointwise_conv2"], h)
    x = x + 0.5 * _ff(p["feed_forward2"],
                      apply_layer_norm(p["norm_feed_forward2"], x))
    return apply_layer_norm(p["norm_out"], x)


def init_subsampling(key, a: ConformerArgs) -> dict:
    import math

    ks = iter(jax.random.split(key, 16))
    n_stages = int(math.log2(a.subsampling_factor))
    ch = a.subsampling_conv_channels
    layers = {}
    idx = 0
    in_ch = 1
    for stage in range(n_stages):
        if stage == 0:
            layers[f"{idx:02d}_conv"] = init_conv2d(next(ks), in_ch, ch, 3)
        else:
            # depthwise + pointwise pair
            layers[f"{idx:02d}_dw"] = init_conv2d(next(ks), ch, ch, 3,
                                                  groups=ch)
            idx += 1
            layers[f"{idx:02d}_pw"] = init_conv2d(next(ks), ch, ch, 1)
        idx += 1
        in_ch = ch
    f_out = a.feat_in
    for _ in range(n_stages):
        f_out = (f_out - 3 + 2 * 1) // 2 + 1
    p = {"layers": layers,
         "out": init_linear(next(ks), ch * f_out, a.d_model)}
    return p


def apply_subsampling(p, a: ConformerArgs, mel: Array) -> Array:
    """mel (B, T, F) -> (B, T/sub, d_model) via strided dw conv2d stack."""
    x = mel[..., None]  # (B, T, F, 1)
    for key in sorted(p["layers"]):
        cp = p["layers"][key]
        if key.endswith("_conv"):
            x = jax.nn.relu(apply_conv2d(cp, x, stride=2, padding=1))
        elif key.endswith("_dw"):
            x = apply_conv2d(cp, x, stride=2, padding=1,
                             groups=x.shape[-1])
        else:
            x = jax.nn.relu(apply_conv2d(cp, x, stride=1, padding=0))
    b, t, f, c = x.shape
    return apply_linear(p["out"], x.reshape(b, t, f * c))


def init_conformer(key, a: ConformerArgs) -> dict:
    ks = iter(jax.random.split(key, a.n_layers + 4))
    return {
        "pre_encode": init_subsampling(next(ks), a),
        "layers": {str(i): init_conformer_block(next(ks), a)
                   for i in range(a.n_layers)},
    }


def subsampled_length(a: ConformerArgs, n):
    """Mel frames -> encoder frames for the dw_striding stack."""
    import jax.numpy as _jnp
    out = _jnp.asarray(n)
    stages = {8: 3, 4: 2, 2: 1}.get(a.subsampling_factor, 3)
    for _ in range(stages):
        out = (out - 1) // 2 + 1
    return out


def conformer_forward(p, a: ConformerArgs, mel: Array,
                      lengths: Optional[Array] = None) -> Array:
    """mel (B, T, F) -> (B, T/sub, d). With `lengths` (mel frames), padded
    positions are masked out of attention and re-zeroed after each block,
    so bucketed inputs match tight shapes."""
    x = apply_subsampling(p["pre_encode"], a, mel)
    if a.xscaling:
        x = x * (a.d_model ** 0.5)
    t = x.shape[1]
    pos_emb = jnp.asarray(rel_pos_encoding(t, a.d_model))
    mask = None
    vmask = None
    if lengths is not None:
        n = subsampled_length(a, lengths)
        valid = jnp.arange(t)[None, :] < n[:, None]
        mask = valid[:, None, None, :]
        vmask = valid.astype(x.dtype)[..., None]
        x = x * vmask
    for i in range(a.n_layers):
        x = conformer_block(p["layers"][str(i)], a, x, pos_emb, mask=mask)
        if vmask is not None:
            x = x * vmask
    return x
