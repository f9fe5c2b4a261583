"""Confucius4 S2A flow estimator + anti-aliased BigVGAN vocoder.

Parity: /root/reference/mlx_audio/tts/models/confucius4/s2a.py (U-Net skip
DiT + WaveNet head, CFG Euler solve with re-zeroed prompt region, nearest
length regulator ×1.72) and vocoder.py (SnakeBeta with ×2 anti-aliased
up/down filters).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .confucius4 import ModelConfig, _conv1d, _lin, _ln, _mish, _rms

Array = jax.Array


def _g(W, name):
    return W["decoder.estimator." + name]


def _t_embed(W, t, prefix):
    half = 128
    emb = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / half))
    emb = 1000.0 * t[:, None] * emb[None]
    emb = jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)
    h = jax.nn.silu(_lin(emb, _g(W, prefix + ".time_mlp.0.weight"),
                         _g(W, prefix + ".time_mlp.0.bias")))
    return _lin(h, _g(W, prefix + ".time_mlp.2.weight"),
                _g(W, prefix + ".time_mlp.2.bias"))


def _rope_pairs(x, freqs):
    b, t, nh, hd = x.shape
    xs = x.reshape(b, t, nh, hd // 2, 2)
    c = freqs[:t, :, 0].reshape(1, t, 1, hd // 2)
    s = freqs[:t, :, 1].reshape(1, t, 1, hd // 2)
    xr, xi = xs[..., 0], xs[..., 1]
    return jnp.stack([xr * c - xi * s, xi * c + xr * s],
                     axis=-1).reshape(b, t, nh, hd)


def _adaln(W, x, cond, prefix):
    mod = _lin(cond, _g(W, prefix + ".modulation.weight"),
               _g(W, prefix + ".modulation.bias"))
    w, b = jnp.split(mod, 2, axis=-1)
    return _rms(x, _g(W, prefix + ".norm.weight")) * w[:, None] + b[:, None]


def s2a_forward(W: Dict[str, Array], cfg: ModelConfig, x_bct, mu, t, spks,
                cond_bct) -> Array:
    """x/cond (B, 80, T); mu (B, T, HID); t (B,); spks (B, 192)."""
    HID = cfg.s2a_hidden
    NH = cfg.s2a_heads
    HD = HID // NH
    b = x_bct.shape[0]
    x = jnp.transpose(x_bct, (0, 2, 1))
    cond = jnp.transpose(cond_bct, (0, 2, 1))
    t_seq = x.shape[1]
    freqs = _g(W, "freqs_cis")
    t1 = _t_embed(W, t, "t_embedder")
    mu_proj = _lin(mu, _g(W, "input_embed.mu_projection.weight"),
                   _g(W, "input_embed.mu_projection.bias"))
    spk_seq = jnp.broadcast_to(spks[:, None], (b, t_seq, spks.shape[-1]))
    h = _lin(jnp.concatenate([x, cond, mu_proj, spk_seq], axis=-1),
             _g(W, "input_embed.proj.weight"),
             _g(W, "input_embed.proj.bias"))

    depth = cfg.s2a_depth
    emit = set(range(depth // 2))
    recv = set(i for i in range(depth) if i > depth // 2)
    stack = []
    for idx in range(depth):
        p = f"transformer_blocks.{idx}."
        skip = stack.pop() if (idx in recv and stack) else None
        if skip is not None:
            h = _lin(jnp.concatenate([h, skip], axis=-1),
                     _g(W, p + "skip_in_linear.weight"),
                     _g(W, p + "skip_in_linear.bias"))
        hn = _adaln(W, h, t1, p + "attention_norm")
        qkv = _lin(hn, _g(W, p + "attention.wqkv.weight"))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rope_pairs(q.reshape(b, t_seq, NH, HD), freqs)
        k = _rope_pairs(k.reshape(b, t_seq, NH, HD), freqs)
        v = v.reshape(b, t_seq, NH, HD)
        sc = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(HD)
        a = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(sc, axis=-1), v) \
            .reshape(b, t_seq, HID)
        h = h + _lin(a, _g(W, p + "attention.wo.weight"))
        hn = _adaln(W, h, t1, p + "ffn_norm")
        h = h + _lin(jax.nn.silu(_lin(hn, _g(W, p + "feed_forward.w1"
                                             ".weight")))
                     * _lin(hn, _g(W, p + "feed_forward.w3.weight")),
                     _g(W, p + "feed_forward.w2.weight"))
        if idx in emit:
            stack.append(h)

    x_res = _adaln(W, h, t1, "transformer_norm")
    x_res = _lin(jnp.concatenate([x_res, x], axis=-1),
                 _g(W, "skip_linear.weight"), _g(W, "skip_linear.bias"))
    x_out = _lin(x_res, _g(W, "conv1.weight"), _g(W, "conv1.bias"))
    t2 = _t_embed(W, t, "t_embedder2")

    # wavenet over (B, T, HID) with global time conditioning
    gcond = _conv1d(t2[:, None], _g(W, "wavenet.cond_layer.conv.weight"),
                    _g(W, "wavenet.cond_layer.conv.bias"))     # (B, 1, 16H)
    wx = x_out
    out = jnp.zeros_like(wx)
    n = 8
    for i in range(n):
        xin = _conv1d(wx, _g(W, f"wavenet.in_layers.{i}.conv.weight"),
                      _g(W, f"wavenet.in_layers.{i}.conv.bias"), pad=2)
        gl = gcond[:, :, i * 2 * HID:(i + 1) * 2 * HID]
        ina = xin + gl
        acts = jnp.tanh(ina[..., :HID]) * jax.nn.sigmoid(ina[..., HID:])
        rs = _conv1d(acts, _g(W, f"wavenet.res_skip_layers.{i}.conv"
                              ".weight"),
                     _g(W, f"wavenet.res_skip_layers.{i}.conv.bias"))
        if i < n - 1:
            wx = wx + rs[..., :HID]
            out = out + rs[..., HID:]
        else:
            out = out + rs
    x_out = out + _lin(x_res, _g(W, "res_projection.weight"),
                       _g(W, "res_projection.bias"))

    # final adaLN layer (no-affine LN)
    mod = _lin(jax.nn.silu(t1),
               _g(W, "final_layer.adaLN_modulation.1.weight"),
               _g(W, "final_layer.adaLN_modulation.1.bias"))
    shift, scale = jnp.split(mod, 2, axis=-1)
    mu_ = x_out.mean(-1, keepdims=True)
    var = ((x_out - mu_) ** 2).mean(-1, keepdims=True)
    xn = (x_out - mu_) * jax.lax.rsqrt(var + 1e-6)
    x_out = xn * (1.0 + scale[:, None]) + shift[:, None]
    x_out = _lin(x_out, _g(W, "final_layer.linear.weight"),
                 _g(W, "final_layer.linear.bias"))
    x_out = _conv1d(x_out, _g(W, "conv2.weight"), _g(W, "conv2.bias"))
    return jnp.transpose(x_out, (0, 2, 1))                     # (B, 80, T)


def s2a_build_mu(W: Dict[str, Array], cfg: ModelConfig, codes: Array,
                 latent: Array, t_ref: int) -> Array:
    """(1, T) codes + (1, T, D) latent -> mu (1, T_ref + 1.72T, HID)."""
    HID = cfg.s2a_hidden
    emb = W["input_embedding.embedding.weight"][codes]
    sem = _conv1d(emb, W["input_embedding.out_project.weight"],
                  W["input_embedding.out_project.bias"])
    text_cond = _lin(jnp.concatenate([latent, sem], axis=-1),
                     W["encoder_proj.weight"], W["encoder_proj.bias"])
    x = _lin(text_cond, W["length_regulator.content_in_proj.weight"],
             W["length_regulator.content_in_proj.bias"])
    t = codes.shape[1]
    out_len = int(t * 1.72)
    idx = jnp.minimum((jnp.arange(out_len) * (t / out_len)).astype(
        jnp.int32), t - 1)
    x = x[:, idx]
    for ci, gi in [(0, 1), (3, 4), (6, 7), (9, 10)]:
        x = _conv1d(x, W[f"length_regulator.model.{ci}.weight"],
                    W[f"length_regulator.model.{ci}.bias"], pad=1)
        m = x.mean(axis=(1, 2), keepdims=True)
        v = ((x - m) ** 2).mean(axis=(1, 2), keepdims=True)
        x = (x - m) * jax.lax.rsqrt(v + 1e-5) \
            * W[f"length_regulator.model.{gi}.weight"] \
            + W[f"length_regulator.model.{gi}.bias"]
        x = _mish(x)
    cond_target = _conv1d(x, W["length_regulator.model.12.weight"],
                          W["length_regulator.model.12.bias"])
    prompt_cond = jnp.broadcast_to(W["prompt_cond"], (1, t_ref, HID))
    return jnp.concatenate([prompt_cond, cond_target], axis=1)


def s2a_solve_euler(W: Dict[str, Array], cfg: ModelConfig, z, prompt, mu,
                    spks, t_span, cfg_scale: float) -> Array:
    """CFG Euler ODE (ref s2a.py:241-270); prompt region re-zeroed per step.
    The whole integration traces into one program (static t_span)."""
    t_tot = z.shape[-1]
    t_ref = prompt.shape[-1]
    prompt_x = jnp.concatenate(
        [prompt, jnp.zeros((1, 80, t_tot - t_ref))], axis=-1)
    x = jnp.concatenate([jnp.zeros((1, 80, t_ref)), z[..., t_ref:]],
                        axis=-1)
    z80 = jnp.zeros_like(x)
    zmu = jnp.zeros_like(mu)
    zspk = jnp.zeros_like(spks)
    t_span = np.asarray(t_span, np.float64)
    t = float(t_span[0])
    dt = float(t_span[1] - t_span[0])
    for step in range(1, len(t_span)):
        x_in = jnp.concatenate([x, x], axis=0)
        px_in = jnp.concatenate([prompt_x, z80], axis=0)
        mu_in = jnp.concatenate([mu, zmu], axis=0)
        spk_in = jnp.concatenate([spks, zspk], axis=0)
        dphi = s2a_forward(W, cfg, x_in, mu_in,
                           jnp.asarray([t, t], jnp.float32), spk_in, px_in)
        d = (1.0 + cfg_scale) * dphi[:1] - cfg_scale * dphi[1:]
        x = x + dt * d
        t = t + dt
        if step < len(t_span) - 1:
            dt = float(t_span[step + 1] - t)
        x = jnp.concatenate([jnp.zeros((1, 80, t_ref)), x[..., t_ref:]],
                            axis=-1)
    return x


# ----------------------------------------------------------- ref mel 22k

def _slaney_mel(sr, n_fft, n_mels):
    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0, sr / 2, n_freqs)
    f_sp, min_log_hz = 200.0 / 3, 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0

    def hz_to_mel(f):
        f = np.asarray(f, float)
        mel = f / f_sp
        log = f >= min_log_hz
        mel[log] = min_log_mel + np.log(f[log] / min_log_hz) / logstep
        return mel

    def mel_to_hz(m):
        f = f_sp * m
        log = m >= min_log_mel
        f[log] = min_log_hz * np.exp(logstep * (m[log] - min_log_mel))
        return f

    mpts = np.linspace(0.0, hz_to_mel([sr / 2])[0], n_mels + 2)
    fpts = mel_to_hz(mpts)
    fdiff = np.diff(fpts)
    ramps = fpts[:, None] - fftfreqs[None, :]
    w = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        w[i] = np.maximum(0, np.minimum(lower, upper))
    w *= (2.0 / (fpts[2:n_mels + 2] - fpts[:n_mels]))[:, None]
    return w.astype(np.float32)


_REF_MEL_FB = _slaney_mel(22050, 1024, 80)


def ref_mel_22k(audio16k: np.ndarray) -> np.ndarray:
    """16 kHz ref audio -> (1, T, 80) log-mel at 22.05 kHz (ref :81-94)."""
    sr, nfft, hop, win = 22050, 1024, 256, 1024
    n_out = int(len(audio16k) * sr / 16000)
    idx = np.linspace(0, len(audio16k) - 1, n_out)
    a = np.interp(idx, np.arange(len(audio16k)),
                  np.asarray(audio16k, np.float32))
    hann = np.hanning(win + 1)[:-1].astype(np.float32)
    pad = (nfft - hop) // 2
    y = np.pad(a, (pad, pad), mode="reflect")
    nfr = 1 + (len(y) - nfft) // hop
    fr = np.stack([y[i * hop:i * hop + nfft] * hann for i in range(nfr)])
    spec = np.sqrt(np.abs(np.fft.rfft(fr, nfft, axis=1)).T ** 2 + 1e-9)
    return np.log(np.clip(_REF_MEL_FB @ spec, 1e-5,
                          None)).T[None].astype(np.float32)


# ----------------------------------------------------------- BigVGAN AA

def _rep_pad(x, left, right):
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")


def _snakebeta(W, x, prefix):
    a = jnp.exp(W[prefix + ".alpha"]).reshape(1, 1, -1)
    b = jnp.exp(W[prefix + ".beta"]).reshape(1, 1, -1)
    return x + (1.0 / (b + 1e-9)) * jnp.sin(x * a) ** 2


def _aa_act(W, x, prefix):
    """anti-aliased SnakeBeta: 2x depthwise upsample -> snake -> 2x down."""
    from ....nn import apply_conv_transpose1d
    from ....nn.layers import convert_torch_conv_transpose_weight

    b, t, c = x.shape
    filt = W[prefix + ".upsample.filter"].reshape(-1)
    k = filt.shape[0]
    wt = jnp.broadcast_to(filt.reshape(1, 1, k), (c, 1, k))
    wu = convert_torch_conv_transpose_weight(wt, groups=c)
    xu = _rep_pad(x, 5, 5)
    xu = 2.0 * apply_conv_transpose1d({"weight": wu}, xu, stride=2,
                                      groups=c)
    xu = xu[:, 15:-15]
    xu = _snakebeta(W, xu, prefix + ".act")
    fd = W[prefix + ".downsample.lowpass.filter"].reshape(-1)
    xd = _rep_pad(xu, 5, 6)
    xd = jax.lax.conv_general_dilated(
        xd, jnp.broadcast_to(fd.reshape(k, 1, 1), (k, 1, c)),
        window_strides=(2,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c)
    return xd


def vocoder_forward(W: Dict[str, Array], cfg: ModelConfig, mel_bct
                    ) -> Array:
    """(1, 80, T) mel -> (1, T*prod(ups)) waveform."""
    x = jnp.transpose(mel_bct, (0, 2, 1))
    x = _conv1d(x, W["conv_pre.weight"], W["conv_pre.bias"], pad=3)
    res_k = (3, 7, 11)
    res_d = (1, 3, 5)
    for i, (u, k) in enumerate(zip(cfg.voc_ups, cfg.voc_up_kernels)):
        from ....nn import apply_conv_transpose1d
        from ....nn.layers import convert_torch_conv_transpose_weight

        wt = convert_torch_conv_transpose_weight(W[f"ups.{i}.0.weight"])
        x = apply_conv_transpose1d({"weight": wt}, x, stride=u,
                                   padding=(k - u) // 2) \
            + W[f"ups.{i}.0.bias"]
        xs = None
        for j, rk in enumerate(res_k):
            p = f"resblocks.{i * 3 + j}."
            r = x
            for jj, d in enumerate(res_d):
                xt = _aa_act(W, r, p + f"activations.{2 * jj}")
                xt = _conv1d(xt, W[p + f"convs1.{jj}.weight"],
                             W[p + f"convs1.{jj}.bias"],
                             pad=d * (rk - 1) // 2, dilation=d)
                xt = _aa_act(W, xt, p + f"activations.{2 * jj + 1}")
                xt = _conv1d(xt, W[p + f"convs2.{jj}.weight"],
                             W[p + f"convs2.{jj}.bias"],
                             pad=(rk - 1) // 2)
                r = r + xt
            xs = r if xs is None else xs + r
        x = xs / 3.0
    x = _aa_act(W, x, "activation_post")
    x = _conv1d(x, W["conv_post.weight"], pad=3)
    return jnp.clip(x, -1.0, 1.0).transpose(0, 2, 1).reshape(1, -1)


__all__ = ["s2a_forward", "s2a_build_mu", "s2a_solve_euler", "ref_mel_22k",
           "vocoder_forward"]
