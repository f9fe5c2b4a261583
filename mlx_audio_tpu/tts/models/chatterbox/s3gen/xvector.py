"""CAMPPlus speaker x-vector encoder (D-TDNN with context-aware masking).

Parity: reference tts/models/chatterbox/s3gen/xvector.py — Kaldi fbank
(povey window, per-frame DC removal + pre-emphasis, n_fft 512, HTK mel
20-8k, log eps, :24-117), FCM conv2d resnet head (:120-209), TDNN +
CAM-dense blocks (12/24/16 layers, growth 32) with segment pooling
(:249-449), transit/dense layers, stats pooling, and the
block/transit/nonlinear key renames + conv layouts in sanitize (:581-659).

TPU notes: batch-norms run in inference form (scale/shift from running
stats, folded at sanitize); everything channel-last; one jitted embedding
program per frame bucket with validity handled by the caller (speaker
prompts are short, exact-length compile is fine).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .....dsp import mel_filters
from .....nn import apply_conv1d, apply_linear, init_conv1d, init_linear
from .....nn.layers import apply_conv2d, init_conv2d

Array = jax.Array


def kaldi_fbank(audio: np.ndarray, sample_rate: int = 16000,
                num_mel_bins: int = 80, frame_length: float = 25.0,
                frame_shift: float = 10.0) -> np.ndarray:
    """Kaldi fbank with snip_edges, povey window, per-frame preemph."""
    win = int(sample_rate * frame_length / 1000)
    hop = int(sample_rate * frame_shift / 1000)
    n_fft = 1 << (win - 1).bit_length()
    audio = np.asarray(audio, np.float32).reshape(-1)
    n_frames = max(1, (len(audio) - win) // hop + 1)
    if len(audio) < win:
        audio = np.pad(audio, (0, win - len(audio)))
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None]
    frames = audio[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)
    frames = np.concatenate([frames[:, :1],
                             frames[:, 1:] - 0.97 * frames[:, :-1]],
                            axis=1)
    n = np.arange(win)
    povey = (0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))) ** 0.85
    frames = frames * povey[None]
    spec = np.fft.rfft(frames, n=n_fft)
    power = np.abs(spec) ** 2
    fb = np.asarray(mel_filters(sample_rate, n_fft, num_mel_bins,
                                f_min=20.0, f_max=sample_rate / 2,
                                norm=None, mel_scale="htk"))
    return np.log(np.maximum(power @ fb.T, 1.1920929e-07)) \
        .astype(np.float32)


# --------------------------------------------------------------- helpers

def _bn(p: dict, x: Array, eps: float = 1e-5) -> Array:
    """Inference batch-norm from running stats."""
    scale = p["weight"] / jnp.sqrt(p["running_var"] + eps) \
        if "weight" in p else 1.0 / jnp.sqrt(p["running_var"] + eps)
    shift = (p.get("bias", 0.0)
             - p["running_mean"] * scale)
    return x * scale + shift


def _init_bn(c: int, affine: bool = True) -> dict:
    p = {"running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}
    if affine:
        p["weight"] = jnp.ones((c,))
        p["bias"] = jnp.zeros((c,))
    return p


def _init_res2d(ks, in_p: int, planes: int, stride: int) -> dict:
    p = {"conv1": init_conv2d(next(ks), in_p, planes, 3, bias=False),
         "bn1": _init_bn(planes),
         "conv2": init_conv2d(next(ks), planes, planes, 3, bias=False),
         "bn2": _init_bn(planes)}
    if stride != 1 or in_p != planes:
        p["shortcut"] = {"0": init_conv2d(next(ks), in_p, planes, 1,
                                          bias=False),
                         "1": _init_bn(planes)}
    return p


def _res2d(p: dict, x: Array, stride: int) -> Array:
    out = jax.nn.relu(_bn(p["bn1"], apply_conv2d(
        p["conv1"], x, stride=(stride, 1), padding=1)))
    out = _bn(p["bn2"], apply_conv2d(p["conv2"], out, padding=1))
    sc = x
    if "shortcut" in p:
        sc = _bn(p["shortcut"]["1"],
                 apply_conv2d(p["shortcut"]["0"], x, stride=(stride, 1)))
    return jax.nn.relu(out + sc)


def _seg_pool(x: Array, seg_len: int = 100) -> Array:
    """(B, T, C) avg pooling over fixed segments, broadcast back."""
    b, t, c = x.shape
    n_segs = (t + seg_len - 1) // seg_len
    pad = n_segs * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    seg = xp.reshape(b, n_segs, seg_len, c).mean(axis=2)
    seg = jnp.repeat(seg, seg_len, axis=1)[:, :t]
    return seg


class CAMPPlusConfig:
    def __init__(self, feat_dim=80, embedding_size=192, growth_rate=32,
                 bn_size=4, init_channels=128, m_channels=32):
        self.feat_dim = feat_dim
        self.embedding_size = embedding_size
        self.growth_rate = growth_rate
        self.bn_size = bn_size
        self.init_channels = init_channels
        self.m_channels = m_channels
        self.block_layers = (12, 24, 16)
        self.block_kernels = (3, 3, 3)
        self.block_dilations = (1, 2, 2)


def init_campplus(key, cfg: CAMPPlusConfig) -> dict:
    ks = iter(jax.random.split(key, 512))
    mc = cfg.m_channels
    head = {"conv1": init_conv2d(next(ks), 1, mc, 3, bias=False),
            "bn1": _init_bn(mc),
            "layer1": {"0": _init_res2d(ks, mc, mc, 2),
                       "1": _init_res2d(ks, mc, mc, 1)},
            "layer2": {"0": _init_res2d(ks, mc, mc, 2),
                       "1": _init_res2d(ks, mc, mc, 1)},
            "conv2": init_conv2d(next(ks), mc, mc, 3, bias=False),
            "bn2": _init_bn(mc)}
    channels = mc * (cfg.feat_dim // 8)
    tdnn = {"linear": init_conv1d(next(ks), channels, cfg.init_channels,
                                  5, bias=False),
            "nonlinear": {"0": _init_bn(cfg.init_channels)}}
    channels = cfg.init_channels
    blocks, transits = {}, {}
    g, bnc = cfg.growth_rate, cfg.bn_size * cfg.growth_rate
    for bi, (n_layers, ksz, dil) in enumerate(zip(
            cfg.block_layers, cfg.block_kernels, cfg.block_dilations)):
        layers = {}
        for li in range(n_layers):
            in_c = channels + li * g
            layers[str(li)] = {
                "nonlinear1": {"0": _init_bn(in_c)},
                "linear1": init_conv1d(next(ks), in_c, bnc, 1,
                                       bias=False),
                "nonlinear2": {"0": _init_bn(bnc)},
                "cam_layer": {
                    "linear_local": init_conv1d(next(ks), bnc, g, ksz,
                                                bias=False),
                    "linear1": init_conv1d(next(ks), bnc, bnc // 2, 1),
                    "linear2": init_conv1d(next(ks), bnc // 2, g, 1)}}
        blocks[str(bi)] = {"layers": layers}
        channels += n_layers * g
        transits[str(bi)] = {
            "nonlinear": {"0": _init_bn(channels)},
            "linear": init_conv1d(next(ks), channels, channels // 2, 1,
                                  bias=False)}
        channels //= 2
    return {"head": head, "tdnn": tdnn, "blocks": blocks,
            "transits": transits,
            "out_nonlinear": {"0": _init_bn(channels)},
            "dense": {"linear": init_conv1d(next(ks), 2 * channels,
                                            cfg.embedding_size, 1,
                                            bias=False),
                      "nonlinear": {"0": _init_bn(cfg.embedding_size,
                                                  affine=False)}}}


def campplus_forward(p: dict, cfg: CAMPPlusConfig, feats: Array) -> Array:
    """(B, T, F) fbank -> (B, embedding_size) speaker embedding."""
    x = jnp.transpose(feats, (0, 2, 1))[..., None]      # (B, F, T, 1)
    h = p["head"]
    x = jax.nn.relu(_bn(h["bn1"], apply_conv2d(h["conv1"], x, padding=1)))
    for li, stride in (("layer1", 2), ("layer2", 2)):
        for j, s in enumerate((stride, 1)):
            x = _res2d(h[li][str(j)], x, s)
    x = jax.nn.relu(_bn(h["bn2"], apply_conv2d(h["conv2"], x,
                                               stride=(2, 1), padding=1)))
    b, f, t, c = x.shape
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f)  # (B,T,C*F)

    td = p["tdnn"]
    x = apply_conv1d(td["linear"], x, stride=2, padding=2)
    x = jax.nn.relu(_bn(td["nonlinear"]["0"], x))

    for bi, (n_layers, ksz, dil) in enumerate(zip(
            cfg.block_layers, cfg.block_kernels, cfg.block_dilations)):
        blk = p["blocks"][str(bi)]["layers"]
        for li in range(n_layers):
            lp = blk[str(li)]
            h2 = jax.nn.relu(_bn(lp["nonlinear1"]["0"], x))
            h2 = apply_conv1d(lp["linear1"], h2)
            h2 = jax.nn.relu(_bn(lp["nonlinear2"]["0"], h2))
            cam = lp["cam_layer"]
            y = apply_conv1d(cam["linear_local"], h2,
                             padding=(ksz - 1) // 2 * dil, dilation=dil)
            ctx = h2.mean(axis=1, keepdims=True) + _seg_pool(h2)
            ctx = jax.nn.relu(apply_conv1d(cam["linear1"], ctx))
            m = jax.nn.sigmoid(apply_conv1d(cam["linear2"], ctx))
            x = jnp.concatenate([x, y * m], axis=-1)
        tr = p["transits"][str(bi)]
        x = jax.nn.relu(_bn(tr["nonlinear"]["0"], x))
        x = apply_conv1d(tr["linear"], x)
    x = jax.nn.relu(_bn(p["out_nonlinear"]["0"], x))
    mean = x.mean(axis=1)
    std = jnp.sqrt(x.var(axis=1) + 1e-5)
    stats = jnp.concatenate([mean, std], axis=-1)[:, None]   # (B, 1, 2C)
    emb = apply_conv1d(p["dense"]["linear"], stats)
    emb = _bn(p["dense"]["nonlinear"]["0"], emb)
    return emb[:, 0]


def sanitize_campplus(weights: Dict) -> Dict:
    """Reference key renames + torch conv layouts -> functional tree."""
    import re
    out = {}
    for k, v in weights.items():
        v = jnp.asarray(v)
        if "num_batches_tracked" in k:
            continue
        k = re.sub(r"xvector\.block(\d+)\.",
                   lambda m: f"blocks.{int(m.group(1)) - 1}.", k)
        k = re.sub(r"xvector\.transit(\d+)\.",
                   lambda m: f"transits.{int(m.group(1)) - 1}.", k)
        k = k.replace("xvector.tdnn.", "tdnn.")
        k = k.replace("xvector.dense.", "dense.")
        k = k.replace("xvector.out_nonlinear.", "out_nonlinear.")
        k = re.sub(r"\.tdnnd(\d+)\.",
                   lambda m: f".layers.{int(m.group(1)) - 1}.", k)
        k = re.sub(r"\.nonlinear(\d*)\.batchnorm\.", r".nonlinear\1.0.", k)
        if k.startswith("out_nonlinear.batchnorm."):
            k = k.replace("out_nonlinear.batchnorm.", "out_nonlinear.0.")
        if k.endswith(".weight") and v.ndim == 4 \
                and not (v.shape[0] == v.shape[1]
                         and v.shape[0] in (1, 3)):
            v = jnp.transpose(v, (2, 3, 1, 0))   # torch OIHW -> HWIO
        elif k.endswith(".weight") and v.ndim == 3 \
                and v.shape[-1] < v.shape[0]:
            v = jnp.transpose(v, (2, 1, 0))      # torch (O,I,K) -> WIO
        out[k] = v
    return out


class CAMPPlus:
    """Stateful wrapper: fbank -> embedding, jitted per frame bucket."""

    def __init__(self, cfg: CAMPPlusConfig = None, params: dict = None):
        self.cfg = cfg or CAMPPlusConfig()
        self.params = params
        self._jit = {}

    def init(self, key) -> "CAMPPlus":
        self.params = init_campplus(key, self.cfg)
        return self

    def inference(self, audio: np.ndarray) -> Array:
        fb = kaldi_fbank(np.asarray(audio, np.float32).reshape(-1),
                         num_mel_bins=self.cfg.feat_dim)
        fb = fb - fb.mean(axis=0, keepdims=True)
        t = fb.shape[0]
        fn = self._jit.get(t)
        if fn is None:
            fn = jax.jit(lambda p, f: campplus_forward(p, self.cfg, f))
            self._jit[t] = fn
        return fn(self.params, jnp.asarray(fb[None]))


__all__ = ["CAMPPlus", "CAMPPlusConfig", "init_campplus",
           "campplus_forward", "kaldi_fbank", "sanitize_campplus"]
