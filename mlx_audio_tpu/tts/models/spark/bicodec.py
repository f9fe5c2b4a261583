"""Spark-TTS BiCodec: semantic FVQ codec + global speaker-token codec.

Parity: /root/reference/mlx_audio/tts/models/spark/bicodec.py (BiCodec :53,
mel_spectrogram :20-50, tokenize :183, detokenize :202) and its submodules —
feat_encoder.py (Encoder), feat_decoder.py (Decoder = prenet/postnet),
wave_generator.py (WaveGenerator), residual.py (FactorizedVectorQuantize),
blocks/sampler.py (SamplingBlock), speaker/speaker_encoder.py
(SpeakerEncoder = ECAPA_TDNN_GLOB_c512 + PerceiverResampler + ResidualFSQ),
speaker/ecapa_tdnn.py, speaker/perceiver_encoder.py,
speaker/pooling_layers.py (ASTP), residual_fsq.py,
finite_scalar_quantization.py.

TPU design: everything is functional and channel-last (B, T, C); weight-
normalized convs are folded to dense kernels at sanitize; transposed convs
are pre-flipped WIO kernels lowered to one `conv_general_dilated`
(lhs_dilation) on the MXU; FSQ en/decode is pure integer arithmetic
(basis cumprod), no codebook gathers in the hot loop. `detokenize` compiles
one exact-shape XLA program per semantic-token length (the wave stack is
non-causal, so zero-bucket padding would bleed into the kept samples — same
policy as the higgs codec decoder); the speaker path is fully static
because the reference clip is tiled/cropped to `ref_segment_duration`.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import hanning, mel_filters, spec_abs, stft
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    apply_linear,
    init_conv1d,
    init_conv_transpose1d,
    init_embedding,
    init_layer_norm,
    init_linear,
    leaky_relu,
)
from ....codec.models.blocks import (
    apply_residual_unit,
    apply_snake,
    avg_pool_time,
    init_residual_unit,
    init_snake,
    vq_encode,
)
from .config import BiCodecConfig

Array = jax.Array


# --------------------------------------------------------------------- mel


def mel_spectrogram(audio: Array, mel: "MelParams") -> Array:
    """Linear-magnitude slaney mel, (B?, T) -> (B, frames, num_mels).

    Ref: bicodec.py:20-50 (periodic hann, center-reflect, |STFT| @ slaney
    filters, no log).
    """
    x = jnp.asarray(audio, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    window = hanning(mel.win_length + 1)[:-1]
    spec = stft(x, n_fft=mel.n_fft, hop_length=mel.hop_length,
                win_length=mel.win_length, window=window)
    mag = spec_abs(spec)
    fb = mel_filters(sample_rate=mel.sample_rate, n_fft=mel.n_fft,
                     n_mels=mel.num_mels, f_min=mel.mel_fmin,
                     f_max=mel.mel_fmax, norm="slaney", mel_scale="slaney")
    return mag @ fb.T


# ------------------------------------------------- vocos backbone (shared)


def init_vocos_backbone(key, in_ch: int, dim: int, inter: int,
                        n_layers: int, adanorm_dim: Optional[int] = None,
                        ) -> dict:
    """ConvNeXt backbone (ref codec/models/vocos/vocos.py:217-276 layout,
    with Spark's linear AdaLayerNorm :198-215 when `adanorm_dim`)."""
    ks = iter(jax.random.split(key, 6 * n_layers + 8))

    def _adanorm():
        return {"scale": init_linear(next(ks), adanorm_dim, dim),
                "shift": init_linear(next(ks), adanorm_dim, dim)}

    blocks = {}
    lsv = 1.0 / n_layers
    for i in range(n_layers):
        blocks[str(i)] = {
            "dwconv": init_conv1d(next(ks), dim, dim, 7, groups=dim),
            "norm": _adanorm() if adanorm_dim else init_layer_norm(dim),
            "pwconv1": init_linear(next(ks), dim, inter),
            "pwconv2": init_linear(next(ks), inter, dim),
            "gamma": jnp.full((dim,), lsv),
        }
    return {
        "embed": init_conv1d(next(ks), in_ch, dim, 7),
        "norm": _adanorm() if adanorm_dim else init_layer_norm(dim),
        "convnext": blocks,
        "final_layer_norm": init_layer_norm(dim),
    }


def _ln(x: Array, eps: float = 1e-6) -> Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _norm(p: dict, x: Array, cond: Optional[Array]) -> Array:
    if "scale" in p:  # AdaLayerNorm: cond (B, D) -> per-sample scale/shift
        scale = apply_linear(p["scale"], cond)
        shift = apply_linear(p["shift"], cond)
        return _ln(x) * scale[:, None, :] + shift[:, None, :]
    return _ln(x) * p["weight"] + p["bias"]


def vocos_backbone(p: dict, x: Array, cond: Optional[Array] = None,
                   dim: Optional[int] = None) -> Array:
    """(B, T, in_ch) -> (B, T, dim)."""
    dim = dim or p["embed"]["weight"].shape[-1]
    x = apply_conv1d(p["embed"], x, padding=3)
    x = _norm(p["norm"], x, cond)
    for i in range(len(p["convnext"])):
        blk = p["convnext"][str(i)]
        h = apply_conv1d(blk["dwconv"], x, padding=3, groups=dim)
        h = _norm(blk["norm"], h, cond)
        h = apply_linear(blk["pwconv1"], h)
        h = jax.nn.gelu(h, approximate=False)
        h = apply_linear(blk["pwconv2"], h)
        x = x + blk["gamma"] * h
    return _ln(x) * p["final_layer_norm"]["weight"] \
        + p["final_layer_norm"]["bias"]


# -------------------------------------------------------- sampling block


def init_sampling_block(key, dim: int, up: int = 1, down: int = 1) -> dict:
    """Ref blocks/sampler.py:9-55 (depthwise up/down merge block)."""
    p = {}
    if up > 1:
        p["de_conv_upsampler"] = {"1": init_conv_transpose1d(
            key, dim, dim, 2 * up, groups=dim)}
    if down > 1:
        p["conv_downsampler"] = {"1": init_conv1d(
            key, dim, dim, 2 * down, groups=dim)}
    return p


def sampling_block(p: dict, x: Array, dim: int, up: int = 1,
                   down: int = 1) -> Array:
    """(B, T, C) -> (B, T*up/down, C). Ref sampler.py:73-94: the output is
    always conv_res + skip1 + skip2 (repeat/merge skip paths)."""
    if up > 1:
        rep = jnp.repeat(x, up, axis=1)
        dec = apply_conv_transpose1d(
            p["de_conv_upsampler"]["1"], leaky_relu(x, 0.2), stride=up,
            padding=up // 2 + up % 2, groups=dim)
        merged = rep + dec
    else:
        rep = merged = x
    if down > 1:
        conv = apply_conv1d(
            p["conv_downsampler"]["1"], leaky_relu(merged, 0.2),
            stride=down, padding=down // 2 + down % 2, groups=dim)
        return conv + avg_pool_time(merged, down) + avg_pool_time(rep, down)
    return merged + merged + rep


# ------------------------------------------------------------ feat encoder


def init_feat_encoder(key, cfg) -> dict:
    ks = iter(jax.random.split(key, 2 * len(cfg.sample_ratios) + 3))
    down = {}
    for i, r in enumerate(cfg.sample_ratios):
        down[str(i)] = {
            "0": init_sampling_block(next(ks), cfg.vocos_dim, down=r),
            "1": init_vocos_backbone(next(ks), cfg.vocos_dim, cfg.vocos_dim,
                                     cfg.vocos_intermediate_dim, 2),
        }
    return {
        "encoder": init_vocos_backbone(
            next(ks), cfg.input_channels, cfg.vocos_dim,
            cfg.vocos_intermediate_dim, cfg.vocos_num_layers),
        "downsample": down,
        "project": init_linear(next(ks), cfg.vocos_dim, cfg.out_channels),
    }


def feat_encode(p: dict, cfg, feat: Array) -> Array:
    """(B, T, input_channels) -> (B, T', out_channels).

    Ref feat_encoder.py:78-95.
    """
    x = vocos_backbone(p["encoder"], feat, dim=cfg.vocos_dim)
    for i, r in enumerate(cfg.sample_ratios):
        blk = p["downsample"][str(i)]
        x = sampling_block(blk["0"], x, cfg.vocos_dim, down=r)
        x = vocos_backbone(blk["1"], x, dim=cfg.vocos_dim)
    return apply_linear(p["project"], x)


# ------------------------------------------------------------ feat decoder


def init_feat_decoder(key, cfg) -> dict:
    ks = iter(jax.random.split(key, 2 * len(cfg.sample_ratios) + 4))
    down = {}
    for i, r in enumerate(cfg.sample_ratios):
        down[str(i)] = {
            "0": init_sampling_block(next(ks), cfg.vocos_dim, up=r),
            "1": init_vocos_backbone(next(ks), cfg.vocos_dim, cfg.vocos_dim,
                                     cfg.vocos_intermediate_dim, 2),
        }
    return {
        "linear_pre": init_linear(next(ks), cfg.input_channels,
                                  cfg.vocos_dim),
        "downsample": down,
        "vocos_backbone": init_vocos_backbone(
            next(ks), cfg.vocos_dim, cfg.vocos_dim,
            cfg.vocos_intermediate_dim, cfg.vocos_num_layers,
            adanorm_dim=cfg.condition_dim),
        "linear": init_linear(next(ks), cfg.vocos_dim, cfg.out_channels),
    }


def feat_decode(p: dict, cfg, x: Array,
                cond: Optional[Array] = None) -> Array:
    """(B, T, input_channels) -> (B, T*prod(ratios), out_channels).

    Ref feat_decoder.py:78-97 (prenet gets the d-vector as AdaLN cond).
    """
    x = apply_linear(p["linear_pre"], x)
    for i, r in enumerate(cfg.sample_ratios):
        blk = p["downsample"][str(i)]
        x = sampling_block(blk["0"], x, cfg.vocos_dim, up=r)
        x = vocos_backbone(blk["1"], x, dim=cfg.vocos_dim)
    x = vocos_backbone(p["vocos_backbone"], x, cond=cond, dim=cfg.vocos_dim)
    x = apply_linear(p["linear"], x)
    return jnp.tanh(x) if cfg.use_tanh_at_final else x


# ------------------------------------------------------- factorized VQ


def init_fvq(key, cfg) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"codebook": init_embedding(k3, cfg.codebook_size,
                                    cfg.codebook_dim)}
    if cfg.input_dim != cfg.codebook_dim:
        p["in_project"] = init_linear(k1, cfg.input_dim, cfg.codebook_dim)
        p["out_project"] = init_linear(k2, cfg.codebook_dim, cfg.input_dim)
    return p


def fvq_tokenize(p: dict, z: Array) -> Array:
    """(B, T, D) -> (B, T) int32 via L2-normalized (cosine) NN.

    Ref residual.py:122-126/154-175.
    """
    if "in_project" in p:
        z = apply_linear(p["in_project"], z)
    return vq_encode(z, p["codebook"]["weight"], normalized=True)


def fvq_detokenize(p: dict, indices: Array) -> Array:
    """(B, T) -> (B, T, input_dim). Ref residual.py:128-137."""
    z = jnp.take(p["codebook"]["weight"], indices, axis=0)
    if "out_project" in p:
        z = apply_linear(p["out_project"], z)
    return z


# ----------------------------------------------------------------- ECAPA


def _init_bn(dim: int) -> dict:
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,)),
            "running_mean": jnp.zeros((dim,)),
            "running_var": jnp.ones((dim,))}


def _bn(p: dict, x: Array, eps: float = 1e-5) -> Array:
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def _init_conv_bn(key, i: int, o: int, k: int) -> dict:
    return {"conv": init_conv1d(key, i, o, k), "bn": _init_bn(o)}


def _conv_relu_bn(p: dict, x: Array, padding: int = 0,
                  dilation: int = 1) -> Array:
    """Ref ecapa_tdnn.py:90-112 — conv -> relu -> bn."""
    x = apply_conv1d(p["conv"], x, padding=padding, dilation=dilation)
    return _bn(p["bn"], jax.nn.relu(x))


def init_ecapa(key, feat_dim: int, channels: int, embed_dim: int) -> dict:
    """ECAPA_TDNN_GLOB_c512: ref ecapa_tdnn.py:158-259."""
    ks = iter(jax.random.split(key, 64))
    scale = 8
    width = channels // scale

    def se_res2(dil):
        convs = {str(i): init_conv1d(next(ks), width, width, 3)
                 for i in range(scale - 1)}
        bns = {str(i): _init_bn(width) for i in range(scale - 1)}
        return {
            "0": _init_conv_bn(next(ks), channels, channels, 1),
            "1": {"convs": convs, "bns": bns},
            "2": _init_conv_bn(next(ks), channels, channels, 1),
            "3": {"linear1": init_linear(next(ks), channels, 128),
                  "linear2": init_linear(next(ks), 128, channels)},
        }

    cat = channels * 3
    out_ch = 512 * 3
    return {
        "layer1": _init_conv_bn(next(ks), feat_dim, channels, 5),
        "layer2": {"se_res2block": se_res2(2)},
        "layer3": {"se_res2block": se_res2(3)},
        "layer4": {"se_res2block": se_res2(4)},
        "conv": init_conv1d(next(ks), cat, out_ch, 1),
        "pool": {"linear1": init_linear(next(ks), out_ch * 3, 128),
                 "linear2": init_linear(next(ks), 128, out_ch)},
        "bn": _init_bn(out_ch * 2),
        "linear": init_linear(next(ks), out_ch * 2, embed_dim),
    }


def _se_res2_block(p: dict, x: Array, dilation: int, scale: int = 8,
                   ) -> Array:
    """Ref ecapa_tdnn.py:138-155 + Res2Conv1dReluBn :27-83 +
    SE_Connect :119-131. x (B, T, C)."""
    res = x
    b = p["se_res2block"]
    x = _conv_relu_bn(b["0"], x)
    # Res2: split channels into `scale` groups; chained k3 dilated convs
    spx = jnp.split(x, scale, axis=-1)
    sp = spx[0]
    outs = []
    pad = dilation  # (k=3 - 1) * d // 2
    for i in range(scale - 1):
        if i >= 1:
            sp = sp + spx[i]
        sp = apply_conv1d(b["1"]["convs"][str(i)], sp, padding=pad,
                          dilation=dilation)
        sp = _bn(b["1"]["bns"][str(i)], jax.nn.relu(sp))
        outs.append(sp)
    outs.append(spx[scale - 1])
    x = jnp.concatenate(outs, axis=-1)
    x = _conv_relu_bn(b["2"], x)
    # SE over time-mean
    se = jnp.mean(x, axis=1)
    se = jax.nn.relu(apply_linear(b["3"]["linear1"], se))
    se = jax.nn.sigmoid(apply_linear(b["3"]["linear2"], se))
    x = x * se[:, None, :]
    return x + res


def _astp(p: dict, x: Array) -> Array:
    """Attentive statistics pooling with global context.

    Ref pooling_layers.py:90-147. x (B, T, C) -> (B, 2C).
    """
    t = x.shape[1]
    mean_g = jnp.broadcast_to(jnp.mean(x, axis=1, keepdims=True), x.shape)
    std_g = jnp.broadcast_to(
        jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + 1e-7), x.shape)
    x_in = jnp.concatenate([x, mean_g, std_g], axis=-1)
    alpha = jnp.tanh(apply_linear(p["linear1"], x_in))
    alpha = jax.nn.softmax(apply_linear(p["linear2"], alpha), axis=1)
    mean = jnp.sum(alpha * x, axis=1)
    var = jnp.sum(alpha * x ** 2, axis=1) - mean ** 2
    std = jnp.sqrt(jnp.clip(var, 1e-7, None))
    return jnp.concatenate([mean, std], axis=-1)


def ecapa_forward(p: dict, x: Array) -> Tuple[Array, Array]:
    """(B, T, feat_dim) -> (x_vector (B, embed), latent (B, T, 1536)).

    Ref ecapa_tdnn.py:197-217.
    """
    out1 = _conv_relu_bn(p["layer1"], x, padding=2)
    out2 = _se_res2_block(p["layer2"], out1, 2)
    out3 = _se_res2_block(p["layer3"], out2, 3)
    out4 = _se_res2_block(p["layer4"], out3, 4)
    out = jnp.concatenate([out2, out3, out4], axis=-1)
    latent = jax.nn.relu(apply_conv1d(p["conv"], out))
    pooled = _astp(p["pool"], latent)
    pooled = _bn(p["bn"], pooled)
    return apply_linear(p["linear"], pooled), latent


# ------------------------------------------------------------- perceiver


def init_perceiver(key, dim: int, dim_context: int, num_latents: int,
                   depth: int = 2, dim_head: int = 64, heads: int = 8,
                   ff_mult: int = 4) -> dict:
    """Ref perceiver_encoder.py:255-307."""
    ks = iter(jax.random.split(key, 6 * depth + 4))
    inner = dim_head * heads
    dim_ff = int(dim * ff_mult * 2 / 3)
    layers = {}
    for i in range(depth):
        layers[str(i)] = {
            "0": {"to_q": init_linear(next(ks), dim, inner, bias=False),
                  "to_kv": init_linear(next(ks), dim, inner * 2,
                                       bias=False),
                  "to_out": init_linear(next(ks), inner, dim, bias=False)},
            "1": {"0": init_linear(next(ks), dim, dim_ff * 2),
                  "2": init_linear(next(ks), dim_ff, dim)},
        }
    p = {
        "latents": jax.random.normal(next(ks), (num_latents, dim)) * 0.02,
        "layers": layers,
        "norm": {"gamma": jnp.ones((dim,))},
    }
    if dim_context != dim:
        p["proj_context"] = init_linear(next(ks), dim_context, dim)
    return p


def perceiver_resample(p: dict, x: Array, heads: int = 8) -> Array:
    """(B, T, ctx) -> (B, num_latents, dim).

    Ref perceiver_encoder.py:292-307; attention includes the queries in
    the cross-attention context (:230-231).
    """
    if "proj_context" in p:
        x = apply_linear(p["proj_context"], x)
    b = x.shape[0]
    lat = jnp.broadcast_to(p["latents"], (b,) + p["latents"].shape)
    dim = lat.shape[-1]
    for i in range(len(p["layers"])):
        blk = p["layers"][str(i)]
        a = blk["0"]
        ctx = jnp.concatenate([lat, x], axis=1)
        q = apply_linear(a["to_q"], lat)
        k, v = jnp.split(apply_linear(a["to_kv"], ctx), 2, axis=-1)
        hd = q.shape[-1] // heads

        def split_heads(y):
            return y.reshape(y.shape[0], y.shape[1], heads, hd) \
                .transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(sim, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, lat.shape[1], -1)
        lat = apply_linear(a["to_out"], o) + lat
        # GEGLU feed-forward (ref :169-197)
        h = apply_linear(blk["1"]["0"], lat)
        hx, gate = jnp.split(h, 2, axis=-1)
        h = jax.nn.gelu(gate, approximate=False) * hx
        lat = lat + apply_linear(blk["1"]["2"], h)
    # lucidrains RMSNorm: l2-normalize * sqrt(dim) * gamma (ref :123-149)
    lat = lat / jnp.maximum(
        jnp.linalg.norm(lat, axis=-1, keepdims=True), 1e-12)
    return lat * math.sqrt(dim) * p["norm"]["gamma"]


# ------------------------------------------------------------ residual FSQ


def _fsq_consts(levels: Tuple[int, ...]):
    lv = np.asarray(levels, np.int64)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int64)
    return jnp.asarray(lv, jnp.float32), jnp.asarray(basis, jnp.int32)


def fsq_tokenize(p: dict, x: Array, levels: Tuple[int, ...]) -> Array:
    """(B, N, dim) -> (B, N) int32 codes.

    Ref finite_scalar_quantization.py:117-153 (bound/quantize/
    codes_to_indices); num_quantizers=1 so the residual scale is 1
    (residual_fsq.py:64-77).
    """
    lv, basis = _fsq_consts(levels)
    if "project_in" in p:
        x = apply_linear(p["project_in"], x)
    half_l = (lv - 1) * (1 + 1e-3) / 2
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    bounded = jnp.tanh(x + shift) * half_l - offset
    half_w = jnp.floor(lv / 2)
    level_idx = jnp.round(bounded) + half_w  # in [0, level)
    return jnp.sum(level_idx.astype(jnp.int32) * basis[None, None, :],
                   axis=-1)


def fsq_detokenize(p: dict, indices: Array,
                   levels: Tuple[int, ...]) -> Array:
    """(B, N) int32 -> (B, N, dim). Ref residual_fsq.py:93-170."""
    lv, basis = _fsq_consts(levels)
    li = (indices[..., None] // basis[None, None, :]) % \
        lv.astype(jnp.int32)[None, None, :]
    half_w = jnp.floor(lv / 2)
    codes = (li.astype(jnp.float32) - half_w) / half_w
    if "project_out" in p:
        codes = apply_linear(p["project_out"], codes)
    return codes


# -------------------------------------------------------- speaker encoder


def init_speaker_encoder(key, cfg) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    codebook_dim = len(cfg.fsq_levels)
    q = {}
    if cfg.latent_dim != codebook_dim:
        q["project_in"] = init_linear(k3, cfg.latent_dim, codebook_dim)
        q["project_out"] = init_linear(k3, codebook_dim, cfg.latent_dim)
    return {
        "speaker_encoder": init_ecapa(k1, cfg.input_dim,
                                      cfg.ecapa_channels, cfg.out_dim),
        "perceiver_sampler": init_perceiver(
            k2, cfg.latent_dim, 512 * 3, cfg.token_num),
        "quantizer": q,
        "project": init_linear(k4, cfg.latent_dim * cfg.token_num,
                               cfg.out_dim),
    }


def speaker_tokenize(p: dict, cfg, mels: Array) -> Array:
    """mels (B, T, num_mels) -> global token ids (B, token_num).

    Ref speaker_encoder.py:93-98.
    """
    _, latent = ecapa_forward(p["speaker_encoder"], mels)
    lat = perceiver_resample(p["perceiver_sampler"], latent)
    return fsq_tokenize(p["quantizer"], lat, cfg.fsq_levels)


def speaker_detokenize(p: dict, cfg, indices: Array) -> Array:
    """(B, token_num) -> d-vector (B, out_dim).

    Ref speaker_encoder.py:100-106 — the flatten is channel-major
    (latent, token) before the final projection.
    """
    zq = fsq_detokenize(p["quantizer"], indices, cfg.fsq_levels)
    flat = zq.transpose(0, 2, 1).reshape(zq.shape[0], -1)
    return apply_linear(p["project"], flat)


# ---------------------------------------------------------- wave generator


def init_wave_generator(key, cfg) -> dict:
    ks = iter(jax.random.split(key, 4 * len(cfg.rates) + 6))
    model = {"0": init_conv1d(next(ks), cfg.input_channel, cfg.channels, 7)}
    out_dim = cfg.channels
    for i, (k, s) in enumerate(zip(cfg.kernel_sizes, cfg.rates)):
        in_dim = cfg.channels // 2 ** i
        out_dim = cfg.channels // 2 ** (i + 1)
        model[str(i + 1)] = {"block": {
            "0": init_snake(in_dim),
            "1": init_conv_transpose1d(next(ks), in_dim, out_dim, k),
            "2": init_residual_unit(next(ks), out_dim, 1),
            "3": init_residual_unit(next(ks), out_dim, 3),
            "4": init_residual_unit(next(ks), out_dim, 9),
        }}
    n = len(cfg.rates)
    model[str(n + 1)] = init_snake(out_dim)
    model[str(n + 2)] = init_conv1d(next(ks), out_dim, cfg.d_out, 7)
    return {"model": model}


def wave_generate(p: dict, cfg, x: Array) -> Array:
    """(B, T, input_channel) -> (B, T * prod(rates), d_out).

    Ref wave_generator.py:39-72 (descript DecoderBlocks, dil 1/3/9).
    """
    m = p["model"]
    x = apply_conv1d(m["0"], x, padding=3)
    for i, (k, s) in enumerate(zip(cfg.kernel_sizes, cfg.rates)):
        blk = m[str(i + 1)]["block"]
        x = apply_snake(blk["0"], x)
        x = apply_conv_transpose1d(blk["1"], x, stride=s,
                                   padding=(k - s) // 2)
        x = apply_residual_unit(blk["2"], x, dilation=1)
        x = apply_residual_unit(blk["3"], x, dilation=3)
        x = apply_residual_unit(blk["4"], x, dilation=9)
    n = len(cfg.rates)
    x = apply_snake(m[str(n + 1)], x)
    x = apply_conv1d(m[str(n + 2)], x, padding=3)
    return jnp.tanh(x)


# ----------------------------------------------------------------- BiCodec


class BiCodec(FunctionalModel):
    """Functional BiCodec with jit-cached tokenize/detokenize drivers."""

    def __init__(self, config: BiCodecConfig = None, **kwargs):
        if config is None:
            config = BiCodecConfig.from_dict(kwargs) if kwargs else \
                BiCodecConfig()
        elif isinstance(config, dict):
            config = BiCodecConfig.from_dict(config)
        super().__init__(config)
        self._jit_cache: Dict = {}

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 8))
        return {
            "encoder": init_feat_encoder(next(ks), c.encoder),
            "quantizer": init_fvq(next(ks), c.quantizer),
            "speaker_encoder": init_speaker_encoder(next(ks),
                                                    c.speaker_encoder),
            "prenet": init_feat_decoder(next(ks), c.prenet),
            "postnet": init_feat_decoder(next(ks), c.postnet),
            "decoder": init_wave_generator(next(ks), c.decoder),
        }

    # ------------------------------------------------------------ drivers

    def tokenize(self, feat: np.ndarray, ref_wav: np.ndarray,
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """feat (B, T, D) wav2vec2 features; ref_wav (B, S) fixed-length
        reference clip -> (global (B, token_num), semantic (B, T'))."""
        c = self.config
        key = ("tok", feat.shape, ref_wav.shape)
        fn = self._jit_cache.get(key)
        if fn is None:
            def run(p, feat, ref):
                mel = mel_spectrogram(ref, c.mel_params)
                z = feat_encode(p["encoder"], c.encoder, feat)
                sem = fvq_tokenize(p["quantizer"], z)
                glob = speaker_tokenize(p["speaker_encoder"],
                                        c.speaker_encoder, mel)
                return glob, sem
            fn = jax.jit(run)
            self._jit_cache[key] = fn
        glob, sem = fn(self.params, jnp.asarray(feat),
                       jnp.asarray(ref_wav))
        return np.asarray(glob), np.asarray(sem)

    def detokenize(self, semantic: np.ndarray,
                   global_tokens: np.ndarray) -> np.ndarray:
        """(B, T) semantic ids + (B, token_num) global ids -> (B, S) audio.

        Exact-shape compile per T (non-causal stack; see module doc).
        Ref bicodec.py:202-222.
        """
        c = self.config
        key = ("det", semantic.shape, global_tokens.shape)
        fn = self._jit_cache.get(key)
        if fn is None:
            def run(p, sem, glob):
                z_q = fvq_detokenize(p["quantizer"], sem)
                d_vec = speaker_detokenize(p["speaker_encoder"],
                                           c.speaker_encoder, glob)
                x = feat_decode(p["prenet"], c.prenet, z_q, cond=d_vec)
                x = x + d_vec[:, None, :]
                return wave_generate(p["decoder"], c.decoder, x)[..., 0]
            fn = jax.jit(run)
            self._jit_cache[key] = fn
        wav = fn(self.params, jnp.asarray(semantic, jnp.int32),
                 jnp.asarray(global_tokens, jnp.int32))
        return np.asarray(wav)

    # ----------------------------------------------------------- sanitize

    def sanitize(self, weights: Dict) -> Dict:
        return sanitize_bicodec(weights)


# ------------------------------------------------------------- sanitize


def _fold_wn(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm dim=0: w = g * v / ||v||_(all dims but 0)."""
    g = np.asarray(g, np.float32)
    v = np.asarray(v, np.float32)
    norm = np.sqrt(np.sum(v * v, axis=tuple(range(1, v.ndim)),
                          keepdims=True))
    return g.reshape(norm.shape) * v / np.maximum(norm, 1e-12)


def sanitize_bicodec(weights: Dict) -> Dict:
    """torch BiCodec checkpoint -> functional channel-last tree.

    Folds weight-normed convs (weight_g/weight_v), converts conv kernels to
    WIO, pre-flips transposed convs, squeezes k=1 convs to linears
    (FVQ in/out projections, ASTP attention convs), and reshapes snake
    alphas (1, C, 1) -> (C,).
    """
    from ....nn.layers import convert_torch_conv_transpose_weight

    out: Dict = {}
    # 1. fold weight norm pairs
    plain: Dict = {}
    for k, v in weights.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith(".weight_g"):
            base = k[: -len(".weight_g")]
            plain[base + ".weight"] = jnp.asarray(_fold_wn(
                np.asarray(v), np.asarray(weights[base + ".weight_v"])))
        elif k.endswith(".weight_v"):
            continue
        else:
            plain[k] = jnp.asarray(v)

    def is_transposed(k: str) -> bool:
        # WaveGenerator DecoderBlock upsampler: decoder.model.N.block.1
        # (but NOT the k7 conv inside residual units at ...block.N.block.1)
        if k.startswith("decoder.model.") and ".block.1.weight" in k \
                and k.count(".block.") == 1:
            return True
        # SamplingBlock upsampler (prenet/postnet/encoder downsample lists)
        return "de_conv_upsampler" in k

    def depthwise_groups(k: str) -> int:
        if "de_conv_upsampler" in k or "conv_downsampler" in k:
            return 0  # marker: groups == dim (depthwise)
        return 1

    for k, v in plain.items():
        nk = k
        if k.endswith(".alpha") and v.ndim == 3:  # snake (1, C, 1)
            out[nk] = v.reshape(-1)
            continue
        if k.endswith(".weight") and v.ndim == 3:
            if is_transposed(k):
                g = v.shape[0] if depthwise_groups(k) == 0 else 1
                out[nk] = convert_torch_conv_transpose_weight(v, groups=g)
                continue
            # FVQ k=1 projections -> linear (O, I)
            if ("quantizer.in_project" in k or
                    "quantizer.out_project" in k) and v.shape[-1] == 1:
                out[nk] = v[..., 0]
                continue
            # ASTP pool convs k=1 -> linear
            if ".pool.linear" in k and v.shape[-1] == 1:
                out[nk] = v[..., 0]
                continue
            # plain conv torch (O, I/g, K) -> WIO (K, I/g, O)
            out[nk] = jnp.transpose(v, (2, 1, 0))
            continue
        out[nk] = v
    return out


__all__ = [
    "BiCodec", "mel_spectrogram", "sanitize_bicodec",
    "init_vocos_backbone", "vocos_backbone", "init_sampling_block",
    "sampling_block", "init_feat_encoder", "feat_encode",
    "init_feat_decoder", "feat_decode", "init_fvq", "fvq_tokenize",
    "fvq_detokenize", "init_ecapa", "ecapa_forward", "init_perceiver",
    "perceiver_resample", "fsq_tokenize", "fsq_detokenize",
    "init_speaker_encoder", "speaker_tokenize", "speaker_detokenize",
    "init_wave_generator", "wave_generate",
]
