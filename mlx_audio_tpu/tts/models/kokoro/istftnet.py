"""Kokoro ISTFTNet decoder (functional, channel-last, mask-aware).

Architecture parity: /root/reference/mlx_audio/tts/models/kokoro/istftnet.py
(ConvWeighted :96, AdaIN1d :327, AdaINResBlock1 :341, MLXSTFT :453,
SineGen :531, SourceModuleHnNSF :637, Generator :707, AdainResBlk1d :833,
Decoder :912). TPU redesign decisions:

* Weight-norm (g, v) pairs are **folded into dense kernels at load time**
  (sanitize) — zero runtime normalization cost.
* All streams are channel-last (B, T, C); transposed convs lower to one
  `conv_general_dilated` with lhs_dilation (see nn/layers.py).
* The harmonic-source STFT and the final inverse STFT run through the shared
  dsp batched framing/overlap-add path (MXU matmuls, no per-batch loops).
* Every op is validity-mask-aware: padded frame buckets produce *identical*
  samples in the valid region to tight shapes, so jit caches a handful of
  bucket sizes instead of recompiling per utterance length.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ....dsp import hanning
from ....nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    apply_linear,
    init_conv1d,
    init_conv_transpose1d,
    init_linear,
    leaky_relu,
)
from ....ops.interpolate import interpolate1d

Array = jax.Array


# ---------------------------------------------------------------------------
# Folded weight-norm convs
# ---------------------------------------------------------------------------


def init_conv_folded(key, in_ch: int, out_ch: int, kernel: int,
                     bias: bool = True, groups: int = 1) -> dict:
    """Init a conv that at load time comes from folded weight_g/weight_v."""
    return init_conv1d(key, in_ch, out_ch, kernel, bias=bias, groups=groups)


def apply_conv_weighted(p: dict, x: Array, stride: int = 1, padding: int = 0,
                        dilation: int = 1, groups: int = 1) -> Array:
    return apply_conv1d(p, x, stride=stride, padding=padding,
                        dilation=dilation, groups=groups)


def fold_weight_norm(g, v):
    """w = g * v / ||v||, norm over all dims except 0 (torch weight_norm dim=0).

    jnp (not numpy) so sanitize() is jax.eval_shape-traceable — the
    checkpoint-manifest tests validate full-size key mapping as pure
    shape metadata without materializing weights."""
    g = jnp.asarray(g, dtype=jnp.float32)
    v = jnp.asarray(v, dtype=jnp.float32)
    norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(1, v.ndim)),
                            keepdims=True))
    return (g * v / jnp.maximum(norm, 1e-12)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Masked instance norm + AdaIN
# ---------------------------------------------------------------------------


def instance_norm(x: Array, valid: Optional[Array] = None, eps: float = 1e-5) -> Array:
    """IN over the time axis of (B, T, C); masked stats when valid (B, T) given.

    Stats accumulate in f32 regardless of activation dtype (bf16-safe: a
    491k-step sum in bf16 loses ~all mantissa bits)."""
    xf = x.astype(jnp.float32)
    if valid is None:
        mean = jnp.mean(xf, axis=-2, keepdims=True)
        var = jnp.var(xf, axis=-2, keepdims=True)
    else:
        m = valid[..., None].astype(jnp.float32)
        count = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
        mean = jnp.sum(xf * m, axis=-2, keepdims=True) / count
        var = jnp.sum(((xf - mean) ** 2) * m, axis=-2, keepdims=True) / count
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def init_adain(key, style_dim: int, num_features: int) -> dict:
    return {"fc": init_linear(key, style_dim, num_features * 2)}


def adain(p: dict, x: Array, s: Array, valid: Optional[Array] = None) -> Array:
    h = apply_linear(p["fc"], s)  # (B, 2C)
    gamma, beta = jnp.split(h, 2, axis=-1)
    return (1 + gamma[:, None, :]) * instance_norm(x, valid) + beta[:, None, :]


def _mask(x: Array, valid: Optional[Array]) -> Array:
    if valid is None:
        return x
    return jnp.where(valid[..., None], x, 0.0)


# ---------------------------------------------------------------------------
# AdainResBlk1d (prosody/decoder residual block, optional 2x upsample)
# ---------------------------------------------------------------------------


def init_adain_res_blk_1d(key, dim_in: int, dim_out: int, style_dim: int,
                          upsample: bool = False) -> dict:
    ks = iter(jax.random.split(key, 8))
    p = {
        "conv1": init_conv_folded(next(ks), dim_in, dim_out, 3),
        "conv2": init_conv_folded(next(ks), dim_out, dim_out, 3),
        "norm1": init_adain(next(ks), style_dim, dim_in),
        "norm2": init_adain(next(ks), style_dim, dim_out),
    }
    if dim_in != dim_out:
        p["conv1x1"] = init_conv_folded(next(ks), dim_in, dim_out, 1, bias=False)
    if upsample:
        p["pool"] = init_conv_transpose1d(next(ks), dim_in, dim_in, 3,
                                          groups=dim_in)
    return p


def adain_res_blk_1d(p: dict, x: Array, s: Array,
                     valid: Optional[Array] = None) -> Array:
    """(B, T, Cin) -> (B, T[*2 if upsample], Cout).

    Parity: istftnet.py:833-910 (residual: AdaIN -> lrelu -> [pool upsample]
    -> conv1 -> AdaIN -> lrelu -> conv2; shortcut: [nearest 2x] -> [1x1]).
    """
    upsample = "pool" in p
    up_valid = None
    if valid is not None and upsample:
        up_valid = jnp.repeat(valid, 2, axis=-1)

    # residual
    h = adain(p["norm1"], x, s, valid)
    h = leaky_relu(h, 0.2)
    h = _mask(h, valid)
    if upsample:
        # depthwise transposed conv stride 2 (k=3, p=1) then left-pad 1 frame
        h = apply_conv_transpose1d(p["pool"], h, stride=2, padding=1,
                                   groups=h.shape[-1])
        h = jnp.pad(h, ((0, 0), (1, 0), (0, 0)))
        h = _mask(h, up_valid)
    h = apply_conv_weighted(p["conv1"], h, padding=1)
    h = adain(p["norm2"], h, s, up_valid if upsample else valid)
    h = leaky_relu(h, 0.2)
    h = _mask(h, up_valid if upsample else valid)
    h = apply_conv_weighted(p["conv2"], h, padding=1)
    h = _mask(h, up_valid if upsample else valid)

    # shortcut
    sc = x
    if upsample:
        sc = jnp.repeat(sc, 2, axis=-2)  # nearest 2x
    if "conv1x1" in p:
        sc = apply_conv_weighted(p["conv1x1"], sc, padding=0)
    sc = _mask(sc, up_valid if upsample else valid)
    return (h + sc) / math.sqrt(2)


# ---------------------------------------------------------------------------
# AdaINResBlock1 (generator snake resblock)
# ---------------------------------------------------------------------------


def init_adain_res_block1(key, channels: int, kernel: int,
                          dilations: Sequence[int], style_dim: int) -> dict:
    ks = iter(jax.random.split(key, 16))
    p = {"convs1": {}, "convs2": {}, "adain1": {}, "adain2": {},
         "alpha1": {}, "alpha2": {}}
    for i in range(3):
        p["convs1"][str(i)] = init_conv_folded(next(ks), channels, channels, kernel)
        p["convs2"][str(i)] = init_conv_folded(next(ks), channels, channels, kernel)
        p["adain1"][str(i)] = init_adain(next(ks), style_dim, channels)
        p["adain2"][str(i)] = init_adain(next(ks), style_dim, channels)
        p["alpha1"][str(i)] = jnp.ones((channels,))
        p["alpha2"][str(i)] = jnp.ones((channels,))
    return p


# Set by tests to exercise the fused Pallas path in interpreter mode on CPU.
_FORCE_FUSED_INTERPRET = False


def _masked_stats(x: Array, valid: Optional[Array]):
    """Per-(batch, channel) time-axis mean/var in f32 (instance_norm's
    exact two-pass formula, so the fused path matches the XLA path)."""
    xf = x.astype(jnp.float32)
    if valid is None:
        return jnp.mean(xf, axis=-2), jnp.var(xf, axis=-2)
    m = valid[..., None].astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    mean = jnp.sum(xf * m, axis=-2) / count
    var = jnp.sum(((xf - mean[..., None, :]) ** 2) * m, axis=-2) / count
    return mean, var


def _fused_adain_snake_conv(p_adain: dict, p_conv: dict, alpha: Array,
                            x: Array, s: Array, dilation: int,
                            valid: Optional[Array], vlen: Optional[Array],
                            interpret: bool) -> Array:
    """One adain->snake->conv leg through the fused Pallas kernel
    (ops/snake_conv_pallas.py) with the IN stats folded into scale/shift."""
    from ....ops.snake_conv_pallas import adain_snake_conv1d, fold_adain

    mean, var = _masked_stats(x, valid)
    h = apply_linear(p_adain["fc"], s)
    gamma, beta = jnp.split(h, 2, axis=-1)
    scale, shift = fold_adain(mean, var, gamma, beta)
    return adain_snake_conv1d(
        x, scale, shift, alpha, p_conv["weight"], p_conv.get("bias"),
        dilation=dilation, valid_len=vlen, interpret=interpret)


def adain_res_block1(p: dict, x: Array, s: Array, kernel: int,
                     dilations: Sequence[int],
                     valid: Optional[Array] = None) -> Array:
    """Snake-activated AdaIN residual block (istftnet.py:341-397).

    On TPU the adain+snake+conv legs run through the fused Pallas kernel
    (one HBM pass each instead of XLA's ~3); stats stay XLA reductions."""
    from ....ops.snake_conv_pallas import use_fused_snake_conv

    fused = use_fused_snake_conv(x) or _FORCE_FUSED_INTERPRET
    if fused:
        vlen = (None if valid is None
                else jnp.sum(valid.astype(jnp.int32), axis=-1))
        for i, d in enumerate(dilations):
            i = str(i)
            h = _fused_adain_snake_conv(
                p["adain1"][i], p["convs1"][i], p["alpha1"][i].reshape(-1),
                x, s, d, valid, vlen, _FORCE_FUSED_INTERPRET)
            h = _fused_adain_snake_conv(
                p["adain2"][i], p["convs2"][i], p["alpha2"][i].reshape(-1),
                h, s, 1, valid, vlen, _FORCE_FUSED_INTERPRET)
            x = _mask(h + x, valid)
        return x
    for i, d in enumerate(dilations):
        i = str(i)
        a1 = p["alpha1"][i].reshape(-1)
        a2 = p["alpha2"][i].reshape(-1)
        h = adain(p["adain1"][i], x, s, valid)
        h = h + (1.0 / a1) * jnp.sin(a1 * h) ** 2
        h = _mask(h, valid)
        h = apply_conv_weighted(p["convs1"][i], h, padding=(kernel - 1) // 2 * d,
                                dilation=d)
        h = adain(p["adain2"][i], h, s, valid)
        h = h + (1.0 / a2) * jnp.sin(a2 * h) ** 2
        h = _mask(h, valid)
        h = apply_conv_weighted(p["convs2"][i], h, padding=(kernel - 1) // 2)
        x = _mask(h + x, valid)
    return x


# ---------------------------------------------------------------------------
# Batched STFT helpers (magnitude/phase), shared-dsp framing
# ---------------------------------------------------------------------------


def _stft_mag_phase(x: Array, n_fft: int, hop: int):
    """x (B, T) -> (mag, phase) each (B, frames, n_fft//2+1). Center reflect.

    The 20-point rfft is a basis matmul (dsp.rdft_pair), not jnp.fft.rfft:
    XLA's TPU FFT lowering is pathological at tiny lengths over ~1M frames."""
    from ....dsp import _pad_center, _window_np, frame_signal, rdft_pair

    w = jnp.asarray(_window_np("hann", n_fft, False))  # symmetric, ref stft
    xp = _pad_center(x, n_fft // 2, "reflect")
    frames = frame_signal(xp, n_fft, hop) * w
    re, im = rdft_pair(frames, n_fft)
    return jnp.sqrt(re * re + im * im), jnp.arctan2(im, re)


def _istft_from_mag_phase(mag: Array, phase: Array, n_fft: int, hop: int):
    """(B, frames, bins) -> (B, samples); window-sum normalized, center-trim.

    Matches reference MLXSTFT.inverse -> dsp.istft(normalized=False) with the
    periodic hann window (istftnet.py:497-524). Windows and the normalization
    envelope are built host-side (static shapes) so this stays jit-safe.
    """
    from ....dsp import _window_envelope_np, _window_np, overlap_add

    w_np = _window_np("hann", n_fft, True)  # periodic, ref istft
    w = jnp.asarray(w_np)
    mag = mag.astype(jnp.float32)     # irfft needs f32; bins are tiny vs the
    phase = phase.astype(jnp.float32)  # conv stack, so f32 here is free
    real = mag * jnp.cos(phase)
    imag = mag * jnp.sin(phase)
    from ....dsp import irfft_pair

    frames_time = irfft_pair(real, imag, n=n_fft)
    rec = overlap_add(frames_time * w, hop, n_fft)
    env_np = _window_envelope_np(tuple(w_np.tolist()), mag.shape[-2], hop,
                                 n_fft, False)
    env = jnp.asarray(env_np)
    rec = jnp.where(env > 1e-10, rec / env, rec)
    return rec[..., n_fft // 2 : -(n_fft // 2)]


# ---------------------------------------------------------------------------
# Harmonic source (SineGen + SourceModuleHnNSF)
# ---------------------------------------------------------------------------


def init_source_module(key, harmonic_num: int = 8) -> dict:
    return {"l_linear": init_linear(key, harmonic_num + 1, 1)}


def harmonic_source(
    p: dict,
    f0: Array,
    sample_rate: int,
    upsample_scale: int,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 10.0,
    key: Optional[Array] = None,
) -> Array:
    """f0 (B, T, 1) at audio rate -> harmonic excitation (B, T).

    Parity: SineGen._f02sine + SourceModuleHnNSF (istftnet.py:531-692). The
    phase is integrated at the downsampled control rate then linearly
    re-upsampled, matching the NSF trick in the reference.
    """
    b, t, _ = f0.shape
    dim = harmonic_num + 1
    fn = f0 * jnp.arange(1, dim + 1, dtype=f0.dtype)[None, None, :]
    rad = (fn / sample_rate) % 1.0

    deterministic = key is None
    if not deterministic:
        k1, k2 = jax.random.split(key)
        rand_ini = jax.random.normal(k1, (b, dim), dtype=f0.dtype)
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)

    rad_ds = interpolate1d(rad, scale_factor=1.0 / upsample_scale, mode="linear")
    phase = jnp.cumsum(rad_ds, axis=1) * 2 * jnp.pi
    phase = interpolate1d(phase * upsample_scale,
                          scale_factor=float(upsample_scale), mode="linear")
    sines = jnp.sin(phase)
    if sines.shape[1] != t:
        if sines.shape[1] > t:
            sines = sines[:, :t, :]
        else:
            sines = jnp.pad(sines, ((0, 0), (0, t - sines.shape[1]), (0, 0)))
    sine_waves = sines * sine_amp

    uv = (f0 > voiced_threshold).astype(f0.dtype)  # (B, T, 1)
    if deterministic:
        noise = jnp.zeros_like(sine_waves)
    else:
        noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
        noise = noise_amp * jax.random.normal(k2, sine_waves.shape, dtype=f0.dtype)
    sine_waves = sine_waves * uv + noise
    merged = jnp.tanh(apply_linear(p["l_linear"], sine_waves))  # (B, T, 1)
    return merged[..., 0]


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def fused_generator_conv_flops(cfg, num_frames: int, batch: int = 1) -> float:
    """FLOPs of the generator's snake-conv legs that run through the fused
    Pallas kernel on TPU (ops/snake_conv_pallas.py). XLA's compiled-program
    cost model can't see inside pallas_call, so MFU accounting (bench.py)
    adds these analytically: 2*B*T*C*C*k per conv leg, over every
    resblock/noise_res leg at each upsample stage. Accepts the raw
    `config.istftnet` dict or any attribute-style config."""
    get = (cfg.get if isinstance(cfg, dict)
           else lambda k: getattr(cfg, k))
    rates = [int(r) for r in get("upsample_rates")]
    ch0 = int(get("upsample_initial_channel"))
    flops = 0.0
    t = num_frames
    for i, u in enumerate(rates):
        t = t * u
        c = ch0 // (2 ** (i + 1))
        legs = []
        for rk, rd in zip(get("resblock_kernel_sizes"),
                          get("resblock_dilation_sizes")):
            for _ in rd:
                legs += [int(rk), int(rk)]   # conv1 (dilated) + conv2
        nk = 11 if i + 1 == len(rates) else 7
        legs += [nk] * 6                     # noise_res block, 3 dil x 2
        flops += sum(2.0 * batch * t * c * c * k for k in legs)
    return flops


def init_generator(key, style_dim: int, resblock_kernel_sizes, upsample_rates,
                   upsample_initial_channel, resblock_dilation_sizes,
                   upsample_kernel_sizes, gen_istft_n_fft,
                   gen_istft_hop_size) -> dict:
    ks = iter(jax.random.split(key, 128))
    p = {"m_source": init_source_module(next(ks)), "ups": {},
         "noise_convs": {}, "noise_res": {}, "resblocks": {}}
    num_up = len(upsample_rates)
    for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
        c_in = upsample_initial_channel // (2 ** i)
        c_out = upsample_initial_channel // (2 ** (i + 1))
        p["ups"][str(i)] = init_conv_transpose1d(next(ks), c_in, c_out, int(k))
        for j, (rk, rd) in enumerate(
            zip(resblock_kernel_sizes, resblock_dilation_sizes)
        ):
            p["resblocks"][str(i * len(resblock_kernel_sizes) + j)] = (
                init_adain_res_block1(next(ks), c_out, rk, rd, style_dim)
            )
        if i + 1 < num_up:
            stride_f0 = math.prod([int(r) for r in upsample_rates[i + 1:]])
            p["noise_convs"][str(i)] = init_conv1d(
                next(ks), gen_istft_n_fft + 2, c_out, stride_f0 * 2)
            p["noise_res"][str(i)] = init_adain_res_block1(
                next(ks), c_out, 7, [1, 3, 5], style_dim)
        else:
            p["noise_convs"][str(i)] = init_conv1d(
                next(ks), gen_istft_n_fft + 2, c_out, 1)
            p["noise_res"][str(i)] = init_adain_res_block1(
                next(ks), c_out, 11, [1, 3, 5], style_dim)
    p["conv_post"] = init_conv_folded(
        next(ks), upsample_initial_channel // (2 ** num_up), gen_istft_n_fft + 2, 7)
    return p


def generator(
    p: dict,
    cfg,
    x: Array,
    s: Array,
    f0_curve: Array,
    valid: Optional[Array] = None,
    key: Optional[Array] = None,
) -> Array:
    """x (B, F2, C), s (B, style), f0_curve (B, F2) -> audio (B, samples).

    Parity: Generator.__call__ (istftnet.py:780-820).
    """
    rates = [int(r) for r in cfg.upsample_rates]
    kernels = [int(k) for k in cfg.upsample_kernel_sizes]
    n_fft = int(cfg.gen_istft_n_fft)
    hop = int(cfg.gen_istft_hop_size)
    num_kernels = len(cfg.resblock_kernel_sizes)
    num_up = len(rates)
    total_up = math.prod(rates) * hop

    # --- harmonic excitation at audio rate (f32 end to end: the NSF phase
    # cumsum over ~500k steps needs the mantissa; bins are few, so cheap)
    f0_up = interpolate1d(
        f0_curve[..., None].astype(jnp.float32),
        scale_factor=float(total_up), mode="nearest")
    src_key = None if key is None else jax.random.fold_in(key, 1)
    har = harmonic_source(p["m_source"], f0_up, 24000, total_up, key=src_key)
    if valid is not None:
        sample_valid = jnp.repeat(valid, total_up, axis=-1)
        har = jnp.where(sample_valid, har, 0.0)
    mag, phase = _stft_mag_phase(har, n_fft, hop)
    # joins the conv stack at its compute dtype
    har_spec = jnp.concatenate([mag, phase], axis=-1).astype(x.dtype)

    cur_valid = valid
    for i in range(num_up):
        u, k = rates[i], kernels[i]
        x = leaky_relu(x, 0.1)
        # noise branch
        if i + 1 < num_up:
            stride_f0 = math.prod(rates[i + 1:])
            x_source = apply_conv1d(p["noise_convs"][str(i)], har_spec,
                                    stride=stride_f0,
                                    padding=(stride_f0 + 1) // 2)
        else:
            x_source = apply_conv1d(p["noise_convs"][str(i)], har_spec)
        # main upsample
        x = apply_conv_transpose1d(p["ups"][str(i)], x, stride=u,
                                   padding=(k - u) // 2)
        if cur_valid is not None:
            cur_valid = jnp.repeat(cur_valid, u, axis=-1)
            x = _mask(x, cur_valid)
        if i == num_up - 1:
            # reflection pad (1, 0) in time
            x = jnp.concatenate([x[:, 1:2, :], x], axis=1)
            if cur_valid is not None:
                cur_valid = jnp.concatenate(
                    [cur_valid[:, 1:2], cur_valid], axis=-1)
        if x_source.shape[1] != x.shape[1]:
            if x_source.shape[1] > x.shape[1]:
                x_source = x_source[:, : x.shape[1], :]
            else:
                x_source = jnp.pad(
                    x_source,
                    ((0, 0), (0, x.shape[1] - x_source.shape[1]), (0, 0)))
        x_source = adain_res_block1(
            p["noise_res"][str(i)], _mask(x_source, cur_valid), s,
            7 if i + 1 < num_up else 11, [1, 3, 5], cur_valid)
        x = x + x_source
        xs = None
        for j in range(num_kernels):
            rb = p["resblocks"][str(i * num_kernels + j)]
            out = adain_res_block1(
                rb, x, s, int(cfg.resblock_kernel_sizes[j]),
                [int(d) for d in cfg.resblock_dilation_sizes[j]], cur_valid)
            xs = out if xs is None else xs + out
        x = xs / num_kernels

    x = leaky_relu(x, 0.01)
    x = apply_conv_weighted(p["conv_post"], x, padding=3)
    spec = jnp.exp(x[..., : n_fft // 2 + 1])
    phase_out = jnp.sin(x[..., n_fft // 2 + 1:])
    audio = _istft_from_mag_phase(spec, phase_out, n_fft, hop)
    return audio


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def init_decoder(key, dim_in: int, style_dim: int, dim_out: int, cfg,
                 bottleneck_dim: int = 1024, res_dim: int = 64) -> dict:
    ks = iter(jax.random.split(key, 16))
    bd, rd = bottleneck_dim, res_dim
    return {
        "encode": init_adain_res_blk_1d(next(ks), dim_in + 2, bd, style_dim),
        "decode": {
            "0": init_adain_res_blk_1d(next(ks), bd + 2 + rd, bd, style_dim),
            "1": init_adain_res_blk_1d(next(ks), bd + 2 + rd, bd, style_dim),
            "2": init_adain_res_blk_1d(next(ks), bd + 2 + rd, bd, style_dim),
            "3": init_adain_res_blk_1d(
                next(ks), bd + 2 + rd, cfg.upsample_initial_channel, style_dim,
                upsample=True),
        },
        "F0_conv": init_conv_folded(next(ks), 1, 1, 3),
        "N_conv": init_conv_folded(next(ks), 1, 1, 3),
        "asr_res": {"0": init_conv_folded(next(ks), dim_in, rd, 1)},
        "generator": init_generator(
            next(ks), style_dim, cfg.resblock_kernel_sizes, cfg.upsample_rates,
            cfg.upsample_initial_channel, cfg.resblock_dilation_sizes,
            cfg.upsample_kernel_sizes, cfg.gen_istft_n_fft,
            cfg.gen_istft_hop_size),
    }


def decoder_forward(
    p: dict,
    cfg,
    asr: Array,
    f0_curve: Array,
    n_curve: Array,
    s: Array,
    frame_valid: Optional[Array] = None,
    key: Optional[Array] = None,
) -> Array:
    """asr (B, F, C), f0/n (B, 2F), s (B, style) -> audio (B, samples).

    Parity: Decoder.__call__ (istftnet.py:947-974).

    Compute dtype follows `asr` (the acoustic stage casts it to the model's
    compute_dtype); f0/n curves stay f32 for the harmonic source's phase
    integral and are cast only for their conv branches.
    """
    cdt = asr.dtype
    f0_d = apply_conv_weighted(p["F0_conv"],
                               f0_curve[..., None].astype(cdt), stride=2,
                               padding=1)
    n_d = apply_conv_weighted(p["N_conv"], n_curve[..., None].astype(cdt),
                              stride=2, padding=1)
    f0_d = _mask(f0_d, frame_valid)
    n_d = _mask(n_d, frame_valid)
    x = jnp.concatenate([asr, f0_d, n_d], axis=-1)
    x = adain_res_blk_1d(p["encode"], x, s, frame_valid)
    asr_res = apply_conv_weighted(p["asr_res"]["0"], asr)
    asr_res = _mask(asr_res, frame_valid)
    res = True
    cur_valid = frame_valid
    for i in ("0", "1", "2", "3"):
        blk = p["decode"][i]
        if res:
            x = jnp.concatenate([x, asr_res, f0_d, n_d], axis=-1)
        x = adain_res_blk_1d(blk, x, s, cur_valid)
        if "pool" in blk:
            res = False
            if cur_valid is not None:
                cur_valid = jnp.repeat(cur_valid, 2, axis=-1)
    return generator(p["generator"], cfg, x, s, f0_curve, cur_valid, key=key)
