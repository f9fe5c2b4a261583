"""MeloTTS (VITS2) building blocks, channel-last functional form.

Parity: reference tts/models/melotts/modules.py + attentions.py — WN gated
dilated convs (:19-94), transformer coupling flows with zero-initialized
post projections (:152-214), DDSConv (:300-355), ConvFlow spline coupling
(:358-414), stochastic + deterministic duration predictors (:417-585),
TextEncoder summing phone/tone/language/BERT embeddings (:588-646);
relative-position windowed attention with shared rel embeddings and the
pad-reshape relative<->absolute shifts (attentions.py:28-171), FFN
(:174-213), pre-conditioned encoder stack with speaker injection at layer
2 (:216-287).

All activations are (B, T, C); every op masks with a validity column so
padded phone/frame buckets are numerically identical to tight shapes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ....nn import (apply_conv1d, apply_embedding, apply_layer_norm,
                    apply_linear, init_conv1d, init_embedding,
                    init_layer_norm, init_linear)
from .transforms import piecewise_rational_quadratic_transform

Array = jax.Array


def conv1x1(key, cin, cout):
    return init_conv1d(key, cin, cout, 1)


# --------------------------------------------------------- attention

def init_rel_attention(key, channels: int, n_heads: int,
                       window_size: int = 4) -> dict:
    ks = iter(jax.random.split(key, 6))
    dk = channels // n_heads
    std = dk ** -0.5
    return {
        "conv_q": conv1x1(next(ks), channels, channels),
        "conv_k": conv1x1(next(ks), channels, channels),
        "conv_v": conv1x1(next(ks), channels, channels),
        "conv_o": conv1x1(next(ks), channels, channels),
        "emb_rel_k": jax.random.normal(
            next(ks), (1, 2 * window_size + 1, dk)) * std,
        "emb_rel_v": jax.random.normal(
            next(ks), (1, 2 * window_size + 1, dk)) * std,
    }


def _rel_to_abs(x: Array) -> Array:
    """(B, H, T, 2T-1) relative logits -> (B, H, T, T) absolute."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t + 1, 2 * t - 1)
    return x[:, :, :t, t - 1:]


def _abs_to_rel(x: Array) -> Array:
    """(B, H, T, T) -> (B, H, T, 2T-1)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t * t + t * (t - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))
    x = x.reshape(b, h, t, 2 * t)
    return x[:, :, :, 1:]


def _rel_embeddings(emb: Array, length: int, window: int) -> Array:
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad > 0:
        emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return emb[:, start: start + 2 * length - 1]


def apply_rel_attention(p: dict, x: Array, mask: Array, n_heads: int,
                        window_size: int = 4) -> Array:
    """x (B, T, C); mask (B, T) 1/0 valid."""
    b, t, c = x.shape
    dk = c // n_heads
    q = apply_conv1d(p["conv_q"], x).reshape(b, t, n_heads, dk)
    k = apply_conv1d(p["conv_k"], x).reshape(b, t, n_heads, dk)
    v = apply_conv1d(p["conv_v"], x).reshape(b, t, n_heads, dk)
    q = q.transpose(0, 2, 1, 3) / math.sqrt(dk)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2)

    rel_k = _rel_embeddings(p["emb_rel_k"], t, window_size)[0]
    scores = scores + _rel_to_abs(q @ rel_k.T)

    attn_mask = (mask[:, None, None, :] * mask[:, None, :, None]) > 0
    scores = jnp.where(attn_mask, scores, -1e4)
    probs = jax.nn.softmax(scores, axis=-1)
    out = probs @ v
    rel_v = _rel_embeddings(p["emb_rel_v"], t, window_size)[0]
    out = out + _abs_to_rel(probs) @ rel_v
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return apply_conv1d(p["conv_o"], out)


# ------------------------------------------------------------ encoder

def init_ffn(key, cin, cout, filter_channels, kernel):
    k1, k2 = jax.random.split(key)
    return {"conv_1": init_conv1d(k1, cin, filter_channels, kernel),
            "conv_2": init_conv1d(k2, filter_channels, cout, kernel)}


def apply_ffn(p: dict, x: Array, mask: Array, kernel: int) -> Array:
    m = mask[..., None]
    pad = (kernel - 1) // 2
    x = apply_conv1d(p["conv_1"], x * m, padding=pad)
    x = jax.nn.relu(x)
    x = apply_conv1d(p["conv_2"], x * m, padding=pad)
    return x * m


def init_encoder(key, hidden, filter_channels, n_heads, n_layers, kernel,
                 gin_channels=0, window_size=4):
    ks = iter(jax.random.split(key, 2 + 5 * n_layers))
    p = {"attn_layers": {}, "norm_layers_1": {}, "ffn_layers": {},
         "norm_layers_2": {}}
    for i in range(n_layers):
        p["attn_layers"][str(i)] = init_rel_attention(next(ks), hidden,
                                                      n_heads, window_size)
        p["norm_layers_1"][str(i)] = init_layer_norm(hidden)
        p["ffn_layers"][str(i)] = init_ffn(next(ks), hidden, hidden,
                                           filter_channels, kernel)
        p["norm_layers_2"][str(i)] = init_layer_norm(hidden)
    if gin_channels > 0:
        p["spk_emb_linear"] = init_linear(next(ks), gin_channels, hidden)
    return p


def apply_encoder(p: dict, x: Array, mask: Array, n_heads: int,
                  kernel: int, g: Optional[Array] = None,
                  cond_layer_idx: int = 2) -> Array:
    """x (B, T, C); g (B, gin). Speaker injected before layer 2
    (attentions.py:271-275)."""
    m = mask[..., None]
    x = x * m
    n_layers = len(p["attn_layers"])
    for i in range(n_layers):
        if g is not None and "spk_emb_linear" in p and i == cond_layer_idx:
            x = (x + apply_linear(p["spk_emb_linear"], g)[:, None, :]) * m
        y = apply_rel_attention(p["attn_layers"][str(i)], x, mask, n_heads)
        x = apply_layer_norm(p["norm_layers_1"][str(i)], x + y)
        y = apply_ffn(p["ffn_layers"][str(i)], x, mask, kernel)
        x = apply_layer_norm(p["norm_layers_2"][str(i)], x + y)
    return x * m


# ----------------------------------------------------------------- WN

def init_wn(key, hidden, kernel, dilation_rate, n_layers, gin_channels=0):
    ks = iter(jax.random.split(key, 1 + 2 * n_layers))
    p = {"in_layers": {}, "res_skip_layers": {}}
    if gin_channels > 0:
        p["cond_layer"] = conv1x1(next(ks), gin_channels,
                                  2 * hidden * n_layers)
    for i in range(n_layers):
        p["in_layers"][str(i)] = init_conv1d(
            next(ks), hidden, 2 * hidden, kernel)
        out_ch = 2 * hidden if i < n_layers - 1 else hidden
        p["res_skip_layers"][str(i)] = conv1x1(next(ks), hidden, out_ch)
    return p


def apply_wn(p: dict, x: Array, mask: Array, hidden: int, kernel: int,
             dilation_rate: int, g: Optional[Array] = None) -> Array:
    m = mask[..., None]
    n_layers = len(p["in_layers"])
    output = jnp.zeros_like(x)
    if g is not None and "cond_layer" in p:
        g_all = apply_conv1d(p["cond_layer"], g)
    for i in range(n_layers):
        dilation = dilation_rate ** i
        pad = (kernel * dilation - dilation) // 2
        x_in = apply_conv1d(p["in_layers"][str(i)], x, padding=pad,
                            dilation=dilation)
        if g is not None and "cond_layer" in p:
            x_in = x_in + g_all[:, :, 2 * hidden * i: 2 * hidden * (i + 1)]
        acts = jnp.tanh(x_in[..., :hidden]) * \
            jax.nn.sigmoid(x_in[..., hidden:])
        rs = apply_conv1d(p["res_skip_layers"][str(i)], acts)
        if i < n_layers - 1:
            x = (x + rs[..., :hidden]) * m
            output = output + rs[..., hidden:]
        else:
            output = output + rs
    return output * m


# ------------------------------------------------------------- flows

def init_transformer_coupling(key, channels, hidden, kernel, n_layers,
                              n_heads, filter_channels, gin_channels=0):
    k1, k2, k3 = jax.random.split(key, 3)
    half = channels // 2
    return {
        "pre": conv1x1(k1, half, hidden),
        "enc": init_encoder(k2, hidden, filter_channels, n_heads,
                            n_layers, kernel, gin_channels=gin_channels),
        "post": {"weight": jnp.zeros((1, hidden, half)),
                 "bias": jnp.zeros((half,))},
    }


def apply_transformer_coupling_reverse(p: dict, x: Array, mask: Array,
                                       n_heads: int, kernel: int,
                                       g: Optional[Array] = None) -> Array:
    """Inverse pass (mean_only): x (B, T, C) -> (B, T, C)."""
    half = x.shape[-1] // 2
    m = mask[..., None]
    x0, x1 = x[..., :half], x[..., half:]
    h = apply_conv1d(p["pre"], x0) * m
    h = apply_encoder(p["enc"], h, mask, n_heads, kernel, g=g)
    mean = apply_conv1d(p["post"], h) * m
    x1 = (x1 - mean) * m
    return jnp.concatenate([x0, x1], axis=-1)


def flip_channels(x: Array) -> Array:
    return x[..., ::-1]


# ----------------------------------------------------------- DDSConv

def init_ddsconv(key, channels, kernel, n_layers):
    ks = iter(jax.random.split(key, 2 * n_layers))
    p = {"convs_sep": {}, "convs_1x1": {}, "norms_1": {}, "norms_2": {}}
    for i in range(n_layers):
        p["convs_sep"][str(i)] = init_conv1d(next(ks), channels, channels,
                                             kernel, groups=channels)
        p["convs_1x1"][str(i)] = conv1x1(next(ks), channels, channels)
        p["norms_1"][str(i)] = init_layer_norm(channels)
        p["norms_2"][str(i)] = init_layer_norm(channels)
    return p


def apply_ddsconv(p: dict, x: Array, mask: Array, kernel: int,
                  g: Optional[Array] = None) -> Array:
    m = mask[..., None]
    if g is not None:
        x = x + g
    n_layers = len(p["convs_sep"])
    c = x.shape[-1]
    for i in range(n_layers):
        dilation = kernel ** i
        pad = (kernel * dilation - dilation) // 2
        y = apply_conv1d(p["convs_sep"][str(i)], x * m, padding=pad,
                         dilation=dilation, groups=c)
        y = jax.nn.gelu(apply_layer_norm(p["norms_1"][str(i)], y))
        y = apply_conv1d(p["convs_1x1"][str(i)], y)
        y = jax.nn.gelu(apply_layer_norm(p["norms_2"][str(i)], y))
        x = x + y
    return x * m


# ----------------------------------------------------------- ConvFlow

def init_convflow(key, in_channels, filter_channels, kernel, n_layers,
                  num_bins=10):
    k1, k2 = jax.random.split(key)
    half = in_channels // 2
    return {
        "pre": conv1x1(k1, half, filter_channels),
        "convs": init_ddsconv(k2, filter_channels, kernel, n_layers),
        "proj": {"weight": jnp.zeros((1, filter_channels,
                                      half * (num_bins * 3 - 1))),
                 "bias": jnp.zeros((half * (num_bins * 3 - 1),))},
    }


def apply_convflow(p: dict, x: Array, mask: Array, kernel: int,
                   filter_channels: int, num_bins: int = 10,
                   tail_bound: float = 5.0, reverse: bool = False,
                   g: Optional[Array] = None) -> Array:
    half = x.shape[-1] // 2
    m = mask[..., None]
    x0, x1 = x[..., :half], x[..., half:]
    h = apply_conv1d(p["pre"], x0)
    h = apply_ddsconv(p["convs"], h, mask, kernel, g=g)
    h = apply_conv1d(p["proj"], h) * m          # (B, T, half*(3bins-1))

    b, t, _ = x0.shape
    h = h.reshape(b, t, half, 3 * num_bins - 1)
    scale = math.sqrt(filter_channels)
    uw = h[..., :num_bins] / scale
    uh = h[..., num_bins: 2 * num_bins] / scale
    ud = h[..., 2 * num_bins:]

    y1, logdet = piecewise_rational_quadratic_transform(
        x1, uw, uh, ud, inverse=reverse, tails="linear",
        tail_bound=tail_bound)
    out = jnp.concatenate([x0, y1], axis=-1) * m
    return out if reverse else (out, jnp.sum(logdet * m))


# ------------------------------------------ stochastic duration (SDP)

def init_sdp(key, in_channels, filter_channels, kernel, n_flows=4,
             gin_channels=0):
    ks = iter(jax.random.split(key, 8 + 2 * n_flows))
    p = {
        "flows": {"0": {"m": jnp.zeros((2,)), "logs": jnp.zeros((2,))}},
        "pre": conv1x1(next(ks), in_channels, filter_channels),
        "proj": conv1x1(next(ks), filter_channels, filter_channels),
        "convs": init_ddsconv(next(ks), filter_channels, kernel, 3),
    }
    for i in range(n_flows):
        p["flows"][str(1 + 2 * i)] = init_convflow(
            next(ks), 2, filter_channels, kernel, 3)
        # odd entries are Flip (parameter-free)
    if gin_channels > 0:
        p["cond"] = conv1x1(next(ks), gin_channels, filter_channels)
    return p


def apply_sdp_reverse(p: dict, x: Array, mask: Array, kernel: int,
                      filter_channels: int, rng: Array,
                      g: Optional[Array] = None,
                      noise_scale: float = 0.8, n_flows: int = 4) -> Array:
    """Inverse SDP: log-durations (B, T, 1) (reference :516-535)."""
    m = mask[..., None]
    x = apply_conv1d(p["pre"], x)
    if g is not None and "cond" in p:
        x = x + apply_conv1d(p["cond"], g)
    x = apply_ddsconv(p["convs"], x, mask, kernel)
    x = apply_conv1d(p["proj"], x) * m

    b, t, _ = x.shape
    z = jax.random.normal(rng, (b, t, 2)) * noise_scale
    # reversed(flows): flips interleave ConvFlows; the last ConvFlow's
    # flip is skipped going backward exactly as reversed() yields
    for i in range(n_flows - 1, -1, -1):
        z = flip_channels(z)
        z = apply_convflow(p["flows"][str(1 + 2 * i)], z, mask, kernel,
                           filter_channels, reverse=True, g=x)
    ea = p["flows"]["0"]
    z = (z - ea["m"]) * jnp.exp(-ea["logs"]) * m
    z0 = z[..., :1]
    w = jnp.exp(z0) * m                        # inverse of Log flow
    return jnp.log(jnp.clip(w, 1e-5)) * m


# ------------------------------------------------ duration predictor

def init_dp(key, in_channels, filter_channels, kernel, gin_channels=0):
    ks = iter(jax.random.split(key, 4))
    p = {"conv_1": init_conv1d(next(ks), in_channels, filter_channels,
                               kernel),
         "norm_1": init_layer_norm(filter_channels),
         "conv_2": init_conv1d(next(ks), filter_channels, filter_channels,
                               kernel),
         "norm_2": init_layer_norm(filter_channels),
         "proj": conv1x1(next(ks), filter_channels, 1)}
    if gin_channels > 0:
        p["cond"] = conv1x1(next(ks), gin_channels, in_channels)
    return p


def apply_dp(p: dict, x: Array, mask: Array, kernel: int,
             g: Optional[Array] = None) -> Array:
    m = mask[..., None]
    pad = (kernel - 1) // 2
    if g is not None and "cond" in p:
        x = x + apply_conv1d(p["cond"], g)
    x = jax.nn.relu(apply_conv1d(p["conv_1"], x * m, padding=pad))
    x = apply_layer_norm(p["norm_1"], x)
    x = jax.nn.relu(apply_conv1d(p["conv_2"], x * m, padding=pad))
    x = apply_layer_norm(p["norm_2"], x)
    return apply_conv1d(p["proj"], x * m) * m


# -------------------------------------------------------- text encoder

def init_text_encoder(key, n_vocab, out_channels, hidden, filter_channels,
                      n_heads, n_layers, kernel, gin_channels=0,
                      num_tones=16, num_languages=10):
    ks = iter(jax.random.split(key, 8))
    return {
        "emb": init_embedding(next(ks), n_vocab, hidden),
        "tone_emb": init_embedding(next(ks), num_tones, hidden),
        "language_emb": init_embedding(next(ks), num_languages, hidden),
        "bert_proj": conv1x1(next(ks), 1024, hidden),
        "ja_bert_proj": conv1x1(next(ks), 768, hidden),
        "encoder": init_encoder(next(ks), hidden, filter_channels,
                                n_heads, n_layers, kernel,
                                gin_channels=gin_channels),
        "proj": conv1x1(next(ks), hidden, out_channels * 2),
    }


def apply_text_encoder(p: dict, phones: Array, mask: Array, tones: Array,
                       langs: Array, bert: Array, ja_bert: Array,
                       n_heads: int, kernel: int, out_channels: int,
                       g: Optional[Array] = None):
    """Returns (x, m_p, logs_p) all (B, T, C)."""
    x = apply_embedding(p["emb"], phones) \
        + apply_embedding(p["tone_emb"], tones) \
        + apply_embedding(p["language_emb"], langs) \
        + apply_conv1d(p["bert_proj"], bert) \
        + apply_conv1d(p["ja_bert_proj"], ja_bert)
    x = apply_encoder(p["encoder"], x * mask[..., None], mask, n_heads,
                      kernel, g=g)
    stats = apply_conv1d(p["proj"], x) * mask[..., None]
    m_p = stats[..., :out_channels]
    logs_p = stats[..., out_channels:]
    return x, m_p, logs_p


# --------------------------------------------------- posterior encoder

def init_posterior_encoder(key, in_channels, out_channels, hidden, kernel,
                           dilation_rate, n_layers, gin_channels=0):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"pre": conv1x1(k1, in_channels, hidden),
            "enc": init_wn(k2, hidden, kernel, dilation_rate, n_layers,
                           gin_channels),
            "proj": conv1x1(k3, hidden, out_channels * 2)}
