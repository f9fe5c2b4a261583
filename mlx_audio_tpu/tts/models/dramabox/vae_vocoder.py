"""Dramabox audio VAE (causal 2-D mel VAE) + BWE vocoder stack.

Parity: /root/reference/mlx_audio/tts/models/dramabox/audio_vae.py
(PixelNorm resnet stages, HEIGHT-causal convs, per-channel latent
statistics) and vocoder.py (AMP BigVGAN-style 16 kHz vocoder + bandwidth
extension generator + hann-sinc 3x resampler + learned-basis MelSTFT).

Everything runs channels-last (NHWC / NWC); the public latent layout
stays (B, C, F, M) for parity with the reference.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....codec.models.bigvgan.bigvgan import (
    _downsample1d,
    _upsample1d,
    kaiser_sinc_filter1d,
)
from ....nn import apply_conv1d, apply_conv2d, init_conv1d, init_conv2d
from ....nn import apply_conv_transpose1d, init_conv_transpose1d

Array = jax.Array

LATENT_DOWNSAMPLE_FACTOR = 4
LRELU_SLOPE = 0.1


# ------------------------------------------------------------- audio VAE

def _pixel_norm(x: Array, eps: float = 1e-6) -> Array:
    # channels-last: normalize over the channel axis
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1,
                                      keepdims=True) + eps)


def _causal_conv2d(p: dict, x: Array, kernel: int = 3,
                   stride: int = 1) -> Array:
    """HEIGHT-causal conv on (B, F, M, C): full causal pad on time (F),
    symmetric on mel (M)."""
    pad_h = kernel - 1
    pad_w = kernel - 1
    x = jnp.pad(x, ((0, 0), (pad_h, 0),
                    (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
    return apply_conv2d(p, x, stride=(stride, stride))


def _resnet_init(ks, in_ch, out_ch):
    p = {"conv1": init_conv2d(next(ks), in_ch, out_ch, 3),
         "conv2": init_conv2d(next(ks), out_ch, out_ch, 3)}
    if in_ch != out_ch:
        p["nin_shortcut"] = init_conv2d(next(ks), in_ch, out_ch, 1)
    return p


def _resnet(p, x):
    h = _causal_conv2d(p["conv1"], jax.nn.silu(_pixel_norm(x)))
    h = _causal_conv2d(p["conv2"], jax.nn.silu(_pixel_norm(h)))
    if "nin_shortcut" in p:
        x = apply_conv2d(p["nin_shortcut"], x)
    return x + h


def init_audio_vae(key, ch: int = 128, ch_mult=(1, 2, 4),
                   num_res_blocks: int = 2, in_channels: int = 2,
                   out_ch: int = 2, z_channels: int = 8,
                   in_mel_bins: int = 64) -> dict:
    # per-channel stats run over patched (z * latent-mel) channels
    latent_mel = in_mel_bins // (2 ** (len(ch_mult) - 1))
    stats_ch = z_channels * latent_mel
    ks = iter(jax.random.split(key, 32 * len(ch_mult) * num_res_blocks
                               + 64))
    in_mult = (1, *ch_mult)
    enc = {"conv_in": init_conv2d(next(ks), in_channels, ch, 3),
           "down": {}}
    block_in = ch
    for level, mult in enumerate(ch_mult):
        block_in = ch * in_mult[level]
        block_out = ch * mult
        stage = {"block": {}}
        for j in range(num_res_blocks):
            stage["block"][str(j)] = _resnet_init(ks, block_in, block_out)
            block_in = block_out
        if level != len(ch_mult) - 1:
            stage["downsample"] = {"conv": init_conv2d(next(ks), block_in,
                                                       block_in, 3)}
        enc["down"][str(level)] = stage
    enc["mid"] = {"block_1": _resnet_init(ks, block_in, block_in),
                  "block_2": _resnet_init(ks, block_in, block_in)}
    enc["conv_out"] = init_conv2d(next(ks), block_in, 2 * z_channels, 3)
    enc["per_channel_statistics"] = {
        "std_of_means": jnp.ones((stats_ch,)),
        "mean_of_means": jnp.zeros((stats_ch,))}

    base = ch * ch_mult[-1]
    dec = {"conv_in": init_conv2d(next(ks), z_channels, base, 3),
           "mid": {"block_1": _resnet_init(ks, base, base),
                   "block_2": _resnet_init(ks, base, base)},
           "up": {}}
    block_in = base
    for level in reversed(range(len(ch_mult))):
        block_out = ch * ch_mult[level]
        stage = {"block": {}}
        for j in range(num_res_blocks + 1):
            stage["block"][str(j)] = _resnet_init(ks, block_in, block_out)
            block_in = block_out
        if level != 0:
            stage["upsample"] = {"conv": init_conv2d(next(ks), block_in,
                                                     block_in, 3)}
        dec["up"][str(level)] = stage
    dec["conv_out"] = init_conv2d(next(ks), block_in, out_ch, 3)
    dec["per_channel_statistics"] = {
        "std_of_means": jnp.ones((stats_ch,)),
        "mean_of_means": jnp.zeros((stats_ch,))}
    return {"encoder": enc, "decoder": dec}


def _vae_patchify(x_cf: Array) -> Array:
    """(B, C, F, M) -> (B, F, C*M)."""
    b, c, f, m = x_cf.shape
    return jnp.transpose(x_cf, (0, 2, 1, 3)).reshape(b, f, c * m)


def _vae_unpatchify(tokens: Array, c: int, m: int) -> Array:
    b, f, _ = tokens.shape
    return jnp.transpose(tokens.reshape(b, f, c, m), (0, 2, 1, 3))


def vae_encode(p: dict, spectrogram: Array, ch_mult=(1, 2, 4),
               num_res_blocks: int = 2, z_channels: int = 8) -> Array:
    """(B, 2, F, M) mel -> normalized latent (B, z, F', M')."""
    enc = p["encoder"]
    x = jnp.transpose(spectrogram, (0, 2, 3, 1))     # NHWC
    h = _causal_conv2d(enc["conv_in"], x)
    for level in range(len(ch_mult)):
        stage = enc["down"][str(level)]
        for j in range(num_res_blocks):
            h = _resnet(stage["block"][str(j)], h)
        if "downsample" in stage:
            # HEIGHT-causal downsample pad: time (2, 0), mel (0, 1)
            h = jnp.pad(h, ((0, 0), (2, 0), (0, 1), (0, 0)))
            h = apply_conv2d(stage["downsample"]["conv"], h,
                             stride=(2, 2))
    h = _resnet(enc["mid"]["block_1"], h)
    h = _resnet(enc["mid"]["block_2"], h)
    h = _causal_conv2d(enc["conv_out"], jax.nn.silu(_pixel_norm(h)))
    h = jnp.transpose(h, (0, 3, 1, 2))               # (B, 2z, F', M')
    means = h[:, :z_channels]
    st = enc["per_channel_statistics"]
    tokens = _vae_patchify(means)
    tokens = (tokens - st["mean_of_means"]) / st["std_of_means"]
    return _vae_unpatchify(tokens, z_channels, means.shape[3])


def vae_decode(p: dict, latent: Array, ch_mult=(1, 2, 4),
               num_res_blocks: int = 2, out_ch: int = 2,
               mel_bins: int = 64) -> Array:
    """latent (B, z, F', M') -> mel (B, out_ch, F, mel_bins)."""
    dec = p["decoder"]
    b, z, f, m = latent.shape
    st = dec["per_channel_statistics"]
    tokens = _vae_patchify(latent)
    tokens = tokens * st["std_of_means"] + st["mean_of_means"]
    latent = _vae_unpatchify(tokens, z, m)
    target_frames = max(f * LATENT_DOWNSAMPLE_FACTOR
                        - (LATENT_DOWNSAMPLE_FACTOR - 1), 1)

    x = jnp.transpose(latent, (0, 2, 3, 1))
    h = _causal_conv2d(dec["conv_in"], x)
    h = _resnet(dec["mid"]["block_1"], h)
    h = _resnet(dec["mid"]["block_2"], h)
    for level in reversed(range(len(ch_mult))):
        stage = dec["up"][str(level)]
        for j in range(num_res_blocks + 1):
            h = _resnet(stage["block"][str(j)], h)
        if "upsample" in stage:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = _causal_conv2d(stage["upsample"]["conv"], h)
            h = h[:, 1:]                              # HEIGHT-causal trim
    h = _causal_conv2d(dec["conv_out"], jax.nn.silu(_pixel_norm(h)))
    out = jnp.transpose(h, (0, 3, 1, 2))
    out = out[:, :out_ch, :target_frames, :mel_bins]
    pad_t = max(0, target_frames - out.shape[2])
    pad_m = max(0, mel_bins - out.shape[3])
    if pad_t or pad_m:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad_t), (0, pad_m)))
    return out


# --------------------------------------------------------------- vocoder

def _snakebeta(p: dict, x: Array) -> Array:
    alpha = jnp.exp(p["alpha"])
    beta = jnp.exp(p["beta"])
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


def _aa_act(p: dict, x: Array) -> Array:
    """Anti-aliased SnakeBeta: up2 -> snake -> down2 (channels-last)."""
    t = x.shape[1]
    y = _downsample1d(_snakebeta(p, _upsample1d(x, 2)), 2)
    if y.shape[1] > t:
        y = y[:, :t]
    elif y.shape[1] < t:
        y = jnp.pad(y, ((0, 0), (0, t - y.shape[1]), (0, 0)))
    return y


def _amp_init(ks, ch, kernel, dilations):
    p = {"convs1": {}, "convs2": {}, "acts1": {}, "acts2": {}}
    for i, d in enumerate(dilations):
        p["convs1"][str(i)] = init_conv1d(next(ks), ch, ch, kernel)
        p["convs2"][str(i)] = init_conv1d(next(ks), ch, ch, kernel)
        p["acts1"][str(i)] = {"alpha": jnp.zeros((ch,)),
                              "beta": jnp.zeros((ch,))}
        p["acts2"][str(i)] = {"alpha": jnp.zeros((ch,)),
                              "beta": jnp.zeros((ch,))}
    return p


def _amp_block(p, x, kernel, dilations):
    for i, d in enumerate(dilations):
        xt = apply_conv1d(p["convs1"][str(i)],
                          _aa_act(p["acts1"][str(i)], x),
                          padding=(kernel - 1) * d // 2, dilation=d)
        xt = apply_conv1d(p["convs2"][str(i)],
                          _aa_act(p["acts2"][str(i)], xt),
                          padding=(kernel - 1) // 2)
        x = x + xt
    return x


def init_vocoder(key, upsample_rates, upsample_kernel_sizes,
                 upsample_initial_channel: int,
                 resblock_kernel_sizes=(3, 7, 11),
                 resblock_dilation_sizes=((1, 3, 5),) * 3,
                 in_channels: int = 128, out_channels: int = 2,
                 use_bias_at_final: bool = False) -> dict:
    ks = iter(jax.random.split(key, 16 * len(upsample_rates)
                               * len(resblock_kernel_sizes) * 4 + 32))
    p = {"conv_pre": init_conv1d(next(ks), in_channels,
                                 upsample_initial_channel, 7),
         "ups": {}, "resblocks": {}}
    for i, (stride, kern) in enumerate(zip(upsample_rates,
                                           upsample_kernel_sizes)):
        cin = upsample_initial_channel // (2 ** i)
        cout = upsample_initial_channel // (2 ** (i + 1))
        p["ups"][str(i)] = init_conv_transpose1d(next(ks), cin, cout, kern)
        for j, (rk, rd) in enumerate(zip(resblock_kernel_sizes,
                                         resblock_dilation_sizes)):
            p["resblocks"][str(i * len(resblock_kernel_sizes) + j)] = \
                _amp_init(ks, cout, rk, rd)
    final = upsample_initial_channel // (2 ** len(upsample_rates))
    p["act_post"] = {"alpha": jnp.zeros((final,)),
                     "beta": jnp.zeros((final,))}
    p["conv_post"] = init_conv1d(next(ks), final, out_channels, 7,
                                 bias=use_bias_at_final)
    return p


def vocoder_forward(p: dict, mel: Array, upsample_rates,
                    upsample_kernel_sizes, resblock_kernel_sizes=(3, 7, 11),
                    resblock_dilation_sizes=((1, 3, 5),) * 3) -> Array:
    """mel (B, C_in, T) or (B, S, C, T) -> audio (B, out_ch, samples)."""
    if mel.ndim == 4:
        # (B, S, F, M) -> (B, S*M, F): each stereo channel contributes
        # its mel bins as vocoder input channels (reference :528-531)
        mel = jnp.transpose(mel, (0, 1, 3, 2))
        mel = mel.reshape(mel.shape[0], -1, mel.shape[3])
    x = jnp.transpose(mel, (0, 2, 1))                # (B, T, C)
    x = apply_conv1d(p["conv_pre"], x, padding=3)
    nk = len(resblock_kernel_sizes)
    for i, (stride, kern) in enumerate(zip(upsample_rates,
                                           upsample_kernel_sizes)):
        x = apply_conv_transpose1d(p["ups"][str(i)], x, stride=stride,
                                   padding=(kern - stride) // 2)
        outs = None
        for j, (rk, rd) in enumerate(zip(resblock_kernel_sizes,
                                         resblock_dilation_sizes)):
            o = _amp_block(p["resblocks"][str(i * nk + j)], x, rk, rd)
            outs = o if outs is None else outs + o
        x = outs / nk
    x = _aa_act(p["act_post"], x)
    x = apply_conv1d(p["conv_post"], x, padding=3)
    return jnp.transpose(x, (0, 2, 1))               # (B, out_ch, T)


# --------------------------------------------------- BWE composite stack

def _hann_upsample(x_cf: Array, ratio: int) -> Array:
    """torchaudio-compatible hann-windowed sinc upsample on (B, C, T)
    (reference vocoder.py:178-233, window_type='hann')."""
    rolloff = 0.99
    lp_width = 6
    width = math.ceil(lp_width / rolloff)
    kernel_size = 2 * width * ratio + 1
    taxis = (np.arange(kernel_size) / ratio - width) * rolloff
    tcl = np.clip(taxis, -lp_width, lp_width)
    window = np.cos(tcl * math.pi / lp_width / 2) ** 2
    filt = np.sinc(taxis) * window * rolloff / ratio
    pad = width
    pad_left = 2 * width * ratio
    pad_right = kernel_size - ratio
    b, c, t = x_cf.shape
    x = jnp.pad(x_cf, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    x = jnp.transpose(x, (0, 2, 1))                  # NWC
    w = jnp.broadcast_to(jnp.asarray(filt, jnp.float32)[:, None, None],
                         (kernel_size, 1, c))
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(ratio,), dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c)
    y = jnp.transpose(y, (0, 2, 1)) * ratio
    return y[..., pad_left:y.shape[-1] - pad_right]


def init_mel_stft(filter_length: int = 512, n_mels: int = 64) -> dict:
    n_freqs = filter_length // 2 + 1
    # learned-basis STFT (checkpoint constants); random init = zeros
    fourier = np.fft.fft(np.eye(filter_length))
    basis = np.vstack([np.real(fourier[:n_freqs]),
                       np.imag(fourier[:n_freqs])]).astype(np.float32)
    return {"stft_fn": {"forward_basis": jnp.asarray(basis[:, None, :]),
                        "inverse_basis": jnp.asarray(basis[:, None, :])},
            "mel_basis": jnp.zeros((n_mels, n_freqs))}


def mel_stft(p: dict, y_cf: Array, hop_length: int = 80,
             win_length: int = 512) -> Array:
    """(B, C, T) audio -> log-mel (B, C, n_mels, frames)."""
    b, c, t = y_cf.shape
    flat = y_cf.reshape(b * c, 1, -1)
    left = max(0, win_length - hop_length)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (left, 0)))
    w = p["stft_fn"]["forward_basis"]                # (2F, 1, K)
    x = jnp.transpose(flat, (0, 2, 1))               # NWC
    spec = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)), (hop_length,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    spec = jnp.transpose(spec, (0, 2, 1))            # (BC, 2F, frames)
    n_freqs = spec.shape[1] // 2
    real, imag = spec[:, :n_freqs], spec[:, n_freqs:]
    mag = jnp.sqrt(jnp.square(real) + jnp.square(imag) + 1e-12)
    mel = jnp.einsum("mf,bft->bmt", p["mel_basis"], mag)
    log_mel = jnp.log(jnp.clip(mel, 1e-5, None))
    return log_mel.reshape(b, c, log_mel.shape[1], log_mel.shape[2])


VOC_MAIN = dict(upsample_rates=(5, 2, 2, 2, 2, 2),
                upsample_kernel_sizes=(11, 4, 4, 4, 4, 4),
                upsample_initial_channel=1536)
VOC_BWE = dict(upsample_rates=(6, 5, 2, 2, 2),
               upsample_kernel_sizes=(12, 11, 4, 4, 4),
               upsample_initial_channel=512)


def init_vocoder_bwe(key, in_channels: int = 128) -> dict:
    k1, k2 = jax.random.split(key)
    return {"vocoder": init_vocoder(k1, in_channels=in_channels,
                                    **VOC_MAIN),
            "bwe_generator": init_vocoder(k2, in_channels=128, **VOC_BWE),
            "mel_stft": init_mel_stft()}


def vocoder_bwe_forward(p: dict, mel_spec: Array,
                        input_sr: int = 16000, output_sr: int = 48000,
                        hop_length: int = 80) -> Array:
    """decoded mel (B, S, F, M) -> stereo audio (B, 2, samples@48k)
    (reference VocoderWithBWE.__call__)."""
    x = vocoder_forward(p["vocoder"], mel_spec, **{
        k: VOC_MAIN[k] for k in ("upsample_rates",
                                 "upsample_kernel_sizes")})
    low_len = x.shape[-1]
    out_len = low_len * output_sr // input_sr
    rem = low_len % hop_length
    if rem:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hop_length - rem)))
    mel = mel_stft(p["mel_stft"], x, hop_length=hop_length)
    residual = vocoder_forward(
        p["bwe_generator"], jnp.transpose(mel, (0, 1, 3, 2)), **{
            k: VOC_BWE[k] for k in ("upsample_rates",
                                    "upsample_kernel_sizes")})
    skip = _hann_upsample(x, output_sr // input_sr)
    n = min(residual.shape[-1], skip.shape[-1])
    return jnp.clip(residual[..., :n] + skip[..., :n], -1, 1)[..., :out_len]
