"""Wav2Vec2 backbone: raw-waveform conv feature encoder + transformer.

Parity: reference mlx_audio/stt/models/wav2vec/wav2vec.py — HF
Wav2Vec2Model semantics: 7-layer strided conv feature encoder with
group/layer norm variants (:79-157), weight-normed grouped positional conv
with same-pad trim (:218-248), post-norm and stable-layer-norm encoder
stacks (:437-508, :578-645), optional per-layer attention adapters for MMS
(:425-434), and the HF-checkpoint sanitize remaps (:723-749).

TPU design: channel-last throughout (the raw wave enters as (B, T, 1) so
the conv stack needs zero transposes); the whole waveform -> hidden-states
pipeline is one jitted program over BUCKETED lengths with an explicit
`num_samples` validity scalar — the first conv layer's per-channel norm
(torch GroupNorm with groups == channels normalizes each channel over
TIME) is computed over valid frames only and padding re-zeroed after every
stage, so a padded bucket is numerically identical to the tight length.
Weight norm is folded into plain conv kernels at sanitize time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import (apply_conv1d, apply_layer_norm, apply_linear,
                    init_conv1d, init_layer_norm, init_linear)

Array = jax.Array


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "wav2vec2"
    vocab_size: int = 32
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "group"
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_feat_extract_layers: int = 7
    do_stable_layer_norm: bool = False
    pad_token_id: int = 0
    adapter_attn_dim: Optional[int] = None


def feature_lengths(cfg: ModelConfig, num_samples) -> Array:
    """Samples -> conv-stack output frames: L' = (L - k) // s + 1 per layer."""
    n = jnp.asarray(num_samples)
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        n = (n - k) // s + 1
    return jnp.maximum(n, 0)


# ----------------------------------------------------------------- init

def init_wav2vec2(key, cfg: ModelConfig) -> dict:
    nks = 4 + 2 * cfg.num_feat_extract_layers + 8 * cfg.num_hidden_layers
    ks = iter(jax.random.split(key, nks))
    h = cfg.hidden_size

    fe = {}
    for i in range(cfg.num_feat_extract_layers):
        cin = 1 if i == 0 else cfg.conv_dim[i - 1]
        layer = {"conv": init_conv1d(next(ks), cin, cfg.conv_dim[i],
                                     cfg.conv_kernel[i], bias=cfg.conv_bias)}
        if cfg.feat_extract_norm == "layer" or \
                (cfg.feat_extract_norm == "group" and i == 0):
            layer["layer_norm"] = init_layer_norm(cfg.conv_dim[i])
        fe[str(i)] = layer

    p = {
        "feature_extractor": {"conv_layers": fe},
        "feature_projection": {
            "layer_norm": init_layer_norm(cfg.conv_dim[-1]),
            "projection": init_linear(next(ks), cfg.conv_dim[-1], h),
        },
        "encoder": {
            "pos_conv_embed": {"conv": init_conv1d(
                next(ks), h, h, cfg.num_conv_pos_embeddings,
                groups=cfg.num_conv_pos_embedding_groups)},
            "layer_norm": init_layer_norm(h),
            "layers": {},
        },
    }
    for i in range(cfg.num_hidden_layers):
        layer = {
            "attention": {
                "q_proj": init_linear(next(ks), h, h),
                "k_proj": init_linear(next(ks), h, h),
                "v_proj": init_linear(next(ks), h, h),
                "out_proj": init_linear(next(ks), h, h),
            },
            "layer_norm": init_layer_norm(h),
            "feed_forward": {
                "intermediate_dense": init_linear(next(ks), h,
                                                  cfg.intermediate_size),
                "output_dense": init_linear(next(ks),
                                            cfg.intermediate_size, h),
            },
            "final_layer_norm": init_layer_norm(h),
        }
        if cfg.adapter_attn_dim is not None:
            layer["adapter_layer"] = {
                "norm": init_layer_norm(h),
                "linear_1": init_linear(next(ks), h, cfg.adapter_attn_dim),
                "linear_2": init_linear(next(ks), cfg.adapter_attn_dim, h),
            }
        p["encoder"]["layers"][str(i)] = layer
    return p


# -------------------------------------------------------------- forward

def _masked_channel_norm(p: dict, x: Array, mask: Array,
                         eps: float = 1e-5) -> Array:
    """torch GroupNorm(groups == channels) on (B, C, T): per-channel
    normalization over TIME, restricted to valid frames."""
    m = mask[..., None]                               # (B, T, 1)
    n = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    mean = (x * m).sum(axis=1, keepdims=True) / n
    var = (jnp.square(x - mean) * m).sum(axis=1, keepdims=True) / n
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["weight"] + p["bias"]


def _feature_encoder(p: dict, cfg: ModelConfig, wave: Array,
                     num_samples: Array) -> Tuple[Array, Array]:
    """(B, T) waveform -> ((B, F, conv_dim[-1]) features, (B,) lengths)."""
    x = wave[..., None]
    n = jnp.asarray(num_samples)
    for i in range(cfg.num_feat_extract_layers):
        lp = p["feature_extractor"]["conv_layers"][str(i)]
        x = apply_conv1d(lp["conv"], x, stride=cfg.conv_stride[i])
        n = (n - cfg.conv_kernel[i]) // cfg.conv_stride[i] + 1
        n = jnp.maximum(n, 0)
        mask = (jnp.arange(x.shape[1])[None, :] < n[:, None]) \
            .astype(x.dtype)
        if cfg.feat_extract_norm == "group" and i == 0:
            x = _masked_channel_norm(lp["layer_norm"], x, mask)
        elif cfg.feat_extract_norm == "layer":
            x = apply_layer_norm(lp["layer_norm"], x, eps=cfg.layer_norm_eps)
        x = jax.nn.gelu(x, approximate=False) * mask[..., None]
    return x, n


def _pos_conv(p: dict, cfg: ModelConfig, x: Array) -> Array:
    k = cfg.num_conv_pos_embeddings
    y = apply_conv1d(p["conv"], x, padding=k // 2,
                     groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        y = y[:, :-1, :]
    return jax.nn.gelu(y, approximate=False)


def _attention(p: dict, x: Array, num_heads: int, bias_mask: Array) -> Array:
    b, t, d = x.shape
    hd = d // num_heads
    q = apply_linear(p["q_proj"], x).reshape(b, t, num_heads, hd)
    k = apply_linear(p["k_proj"], x).reshape(b, t, num_heads, hd)
    v = apply_linear(p["v_proj"], x).reshape(b, t, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(hd, x.dtype))
    logits = logits + bias_mask[:, None, None, :]
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
    return apply_linear(p["out_proj"], out)


def _ffn(p: dict, x: Array) -> Array:
    h = jax.nn.gelu(apply_linear(p["intermediate_dense"], x), approximate=False)
    return apply_linear(p["output_dense"], h)


def wav2vec2_forward(params: dict, cfg: ModelConfig, wave: Array,
                     num_samples: Array,
                     collect_hidden: bool = False) -> Tuple[Array, ...]:
    """(B, T) raw 16 kHz waveform (zero-mean/unit-var normalized by the
    caller) -> ((B, F, hidden) hidden states, (B,) valid frame counts).

    With collect_hidden=True also returns the list of per-layer hidden
    states, HF-indexed (hidden_states[0] = pre-layer embeddings,
    [i+1] = output of layer i) — the Spark-TTS BiCodec feature mixer
    averages layers 11/14/16 of wav2vec2-large-xlsr-53."""
    feats, n = _feature_encoder(params, cfg, wave, num_samples)
    valid = jnp.arange(feats.shape[1])[None, :] < n[:, None]
    mask = valid.astype(feats.dtype)[..., None]

    fp = params["feature_projection"]
    x = apply_layer_norm(fp["layer_norm"], feats, eps=cfg.layer_norm_eps)
    x = apply_linear(fp["projection"], x) * mask

    enc = params["encoder"]
    x = (x + _pos_conv(enc["pos_conv_embed"], cfg, x)) * mask
    if not cfg.do_stable_layer_norm:
        x = apply_layer_norm(enc["layer_norm"], x, eps=cfg.layer_norm_eps)

    bias_mask = jnp.where(valid, 0.0, jnp.finfo(x.dtype).min) \
        .astype(x.dtype)
    hidden = [x] if collect_hidden else None
    for i in range(cfg.num_hidden_layers):
        lp = enc["layers"][str(i)]
        if cfg.do_stable_layer_norm:
            h = apply_layer_norm(lp["layer_norm"], x,
                                 eps=cfg.layer_norm_eps)
            x = x + _attention(lp["attention"], h,
                               cfg.num_attention_heads, bias_mask)
            x = x + _ffn(lp["feed_forward"],
                         apply_layer_norm(lp["final_layer_norm"], x,
                                          eps=cfg.layer_norm_eps))
            if "adapter_layer" in lp:
                a = lp["adapter_layer"]
                h = apply_layer_norm(a["norm"], x, eps=cfg.layer_norm_eps)
                h = apply_linear(a["linear_2"],
                                 jax.nn.relu(apply_linear(a["linear_1"],
                                                          h)))
                x = x + h
        else:
            x = x + _attention(lp["attention"], x,
                               cfg.num_attention_heads, bias_mask)
            x = apply_layer_norm(lp["layer_norm"], x,
                                 eps=cfg.layer_norm_eps)
            x = x + _ffn(lp["feed_forward"], x)
            x = apply_layer_norm(lp["final_layer_norm"], x,
                                 eps=cfg.layer_norm_eps)
        x = x * mask
        if collect_hidden:
            hidden.append(x)
    if cfg.do_stable_layer_norm:
        x = apply_layer_norm(enc["layer_norm"], x,
                             eps=cfg.layer_norm_eps) * mask
    if collect_hidden:
        return x, n, hidden
    return x, n


# ------------------------------------------------------------- sanitize

def _fold_weight_norm_conv(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """HF pos-conv weight norm (torch weight_norm dim=2 on (O, I/g, K)):
    per-kernel-position g (1, 1, K), norm over (O, I/g)."""
    v = np.asarray(v, np.float32)
    g = np.asarray(g, np.float32).reshape(1, 1, -1)
    norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def sanitize_wav2vec2(weights: Dict, strip_prefix: bool = True) -> Dict:
    """HF checkpoint -> our layout. Weight-norm pairs (weight_g/weight_v or
    parametrizations.original0/1) are folded into plain conv weights; conv
    kernels go torch (O, I, K) -> WIO (K, I, O); training-only tensors are
    dropped (reference wav2vec.py:723-749)."""
    out = {}
    staged_g, staged_v = {}, {}
    for k, v in weights.items():
        if strip_prefix and k.startswith("wav2vec2."):
            k = k[len("wav2vec2."):]
        if k.endswith(".parametrizations.weight.original0"):
            k = k.replace(".parametrizations.weight.original0", ".weight_g")
        elif k.endswith(".parametrizations.weight.original1"):
            k = k.replace(".parametrizations.weight.original1", ".weight_v")
        if k.startswith("quantizer.") or k.startswith("project_") \
                or k == "masked_spec_embed":
            continue
        if k.endswith(".weight_g"):
            staged_g[k[: -len(".weight_g")]] = np.asarray(v)
            continue
        if k.endswith(".weight_v"):
            staged_v[k[: -len(".weight_v")]] = np.asarray(v)
            continue
        if k.endswith(".conv.weight") and np.ndim(v) == 3:
            v = jnp.transpose(jnp.asarray(v), (2, 1, 0))
        out[k] = v
    for base, v in staged_v.items():
        g = staged_g.get(base)
        folded = _fold_weight_norm_conv(g, v) if g is not None else v
        out[base + ".weight"] = jnp.transpose(jnp.asarray(folded),
                                              (2, 1, 0))
    return out


__all__ = ["ModelConfig", "init_wav2vec2", "wav2vec2_forward",
           "feature_lengths", "sanitize_wav2vec2"]
