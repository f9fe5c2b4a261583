"""MossFormer2 SE 48K speech enhancement (mask-based, Kaldi fbank front).

Parity: /root/reference/mlx_audio/sts/models/mossformer2_se/ —
model.py (fbank+deltas front-end, MaskNet mask, STFT-mask-iSTFT loop,
segmented/chunked decode with discard-edge reassembly),
mossformer_masknet.py (gLN -> 1x1 encoder -> scaled sinusoidal pos ->
24 MossFormer2 blocks -> gated output -> mask head),
flash_sharea_ffconvm.py (FLASH shared dual attention: grouped ReLU²
quadratic + global linear attention, token shift, FFConvM with
depthwise conv), gated_fsmn*.py (gated FSMN with UniDeepFsmn memory).

TPU design: one jitted program spans fbank features -> mask -> masked
STFT -> iSTFT per bucketed chunk length; the reference recomputes each
stage eagerly.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .... import dsp
from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_conv2d, apply_layer_norm, apply_linear
from ....nn import init_conv2d, init_layer_norm, init_linear

Array = jax.Array

MAX_WAV_VALUE = 32768.0


@dataclass
class MossFormer2SEConfig(BaseModelArgs):
    model_type: str = "mossformer2_se"
    sample_rate: int = 48000
    win_len: int = 1920
    win_inc: int = 384
    fft_len: int = 1920
    win_type: str = "hamming"
    num_mels: int = 60
    preemphasis: float = 0.97
    one_time_decode_length: int = 20
    decode_window: int = 4
    chunk_seconds: float = 4.0
    chunk_overlap: float = 0.25
    auto_chunk_threshold: float = 60.0
    in_channels: int = 180
    out_channels: int = 512
    out_channels_final: int = 961
    num_blocks: int = 24
    group_size: int = 256
    query_key_dim: int = 128
    fsmn_inner: int = 256
    fsmn_lorder: int = 20
    model_path: Optional[str] = None

    @property
    def sampling_rate(self) -> int:
        return self.sample_rate


# ------------------------------------------------------------ primitives

def _scale_norm(p: dict, x: Array, eps: float = 1e-8) -> Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) \
        * (x.shape[-1] ** -0.5)
    return x * (p["g"] / jnp.maximum(norm, eps))


def _group_norm1(p: dict, x: Array, eps: float = 1e-8) -> Array:
    """GroupNorm(1, C) over (B, T, C): normalize over (T, C) jointly."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _layer_norm(p: dict, x: Array, eps: float = 1e-8) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _prelu(p: dict, x: Array) -> Array:
    a = p["weight"].reshape(-1)
    return jnp.where(x >= 0, x, a * x)


def _conv1x1_init(ks, cin, cout, bias=True):
    return init_linear(next(ks), cin, cout, bias=bias)


def _depthwise17_init(ks, ch, kernel=17):
    scale = 1.0 / math.sqrt(kernel)
    return {"weight": jax.random.uniform(next(ks), (kernel, 1, ch),
                                         jnp.float32, -scale, scale)}


def _depthwise17(p: dict, x: Array, kernel: int = 17) -> Array:
    pad = (kernel - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1])


def _ffconvm_init(ks, dim_in, dim_out, norm="scale"):
    p = {"linear": init_linear(next(ks), dim_in, dim_out),
         "conv_module": _depthwise17_init(ks, dim_out)}
    if norm == "scale":
        p["norm"] = {"g": jnp.ones((1,))}
    else:
        p["norm"] = init_layer_norm(dim_in)
    return p


def _ffconvm(p: dict, x: Array) -> Array:
    if "g" in p["norm"]:
        h = _scale_norm(p["norm"], x)
    else:
        h = _layer_norm(p["norm"], x, eps=1e-5)
    h = jax.nn.silu(apply_linear(p["linear"], h))
    return h + _depthwise17(p["conv_module"], h)


def _rope_partial(x: Array, dims: int = 32, base: float = 10000.0) -> Array:
    """NeoX-style rope on the first `dims` features (mlx nn.RoPE)."""
    t = x.shape[1]
    half = dims // 2
    inv = 1.0 / (base ** (jnp.arange(half, dtype=jnp.float32) / half))
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None]
    cos = jnp.cos(ang)[None]
    sin = jnp.sin(ang)[None]
    x1 = x[..., :half]
    x2 = x[..., half:dims]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
    return jnp.concatenate([rot, x[..., dims:]], axis=-1)


# --------------------------------------------------------- FLASH block

def _flash_init(ks, dim, qk_dim, expansion=4.0):
    hidden = int(dim * expansion)
    return {
        "to_hidden": _ffconvm_init(ks, dim, hidden),
        "to_qk": _ffconvm_init(ks, dim, qk_dim),
        "qk_offset_scale": {
            "gamma": jax.random.normal(next(ks), (4, qk_dim)) * 0.02 + 1.0,
            "beta": jnp.zeros((4, qk_dim))},
        "to_out": _ffconvm_init(ks, dim * 2, dim),
    }


def _flash_block(p: dict, x: Array, group_size: int, qk_dims: int = 32
                 ) -> Array:
    """FLASH shared dual attention (reference flash_sharea_ffconvm.py)."""
    b, n, d = x.shape
    # token shift on the first half of channels
    x_shift, x_pass = jnp.split(x, 2, axis=-1)
    x_shift = jnp.pad(x_shift, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    normed = jnp.concatenate([x_shift, x_pass], axis=-1)

    hidden = _ffconvm(p["to_hidden"], normed)
    v, u = jnp.split(hidden, 2, axis=-1)
    qk = _ffconvm(p["to_qk"], normed)
    heads = qk[..., None, :] * p["qk_offset_scale"]["gamma"] + \
        p["qk_offset_scale"]["beta"]
    quad_q, lin_q, quad_k, lin_k = [heads[..., i, :] for i in range(4)]
    quad_q = _rope_partial(quad_q, qk_dims)
    lin_q = _rope_partial(lin_q, qk_dims)
    quad_k = _rope_partial(quad_k, qk_dims)
    lin_k = _rope_partial(lin_k, qk_dims)

    g = group_size
    padding = (g - n % g) % g
    if padding:
        pad = ((0, 0), (0, padding), (0, 0))
        quad_q, quad_k, lin_q, lin_k, v, u = [
            jnp.pad(t, pad) for t in (quad_q, quad_k, lin_q, lin_k, v, u)]
    ng = quad_q.shape[1] // g

    def grp(t):
        return t.reshape(b, ng, g, t.shape[-1])

    quad_q, quad_k, lin_q, lin_k, vg, ug = map(
        grp, (quad_q, quad_k, lin_q, lin_k, v, u))

    sim = jnp.einsum("bgnd,bgmd->bgnm", quad_q, quad_k) / g
    attn = jnp.square(jax.nn.relu(sim))
    quad_v = jnp.einsum("bgnm,bgme->bgne", attn, vg)
    quad_u = jnp.einsum("bgnm,bgme->bgne", attn, ug)

    # global (non-causal) linear attention
    lin_kf = lin_k.reshape(b, -1, lin_k.shape[-1])
    vf = vg.reshape(b, -1, vg.shape[-1])
    uf = ug.reshape(b, -1, ug.shape[-1])
    lqf = lin_q.reshape(b, -1, lin_q.shape[-1])
    lin_kv = jnp.einsum("bnd,bne->bde", lin_kf, vf) / n
    lin_ku = jnp.einsum("bnd,bne->bde", lin_kf, uf) / n
    lin_v = jnp.einsum("bnd,bde->bne", lqf, lin_kv).reshape(vg.shape)
    lin_u = jnp.einsum("bnd,bde->bne", lqf, lin_ku).reshape(ug.shape)

    att_v = (quad_v + lin_v).reshape(b, -1, v.shape[-1])[:, :n]
    att_u = (quad_u + lin_u).reshape(b, -1, u.shape[-1])[:, :n]
    v = v[:, :n] if padding else v
    u = u[:, :n] if padding else u

    out = (att_u * v) * jax.nn.sigmoid(att_v * u)
    return x + _ffconvm(p["to_out"], out)


# ----------------------------------------------------------- gated FSMN

def _fsmn_init(ks, dim, inner, lorder):
    return {
        "conv1": _conv1x1_init(ks, dim, inner),
        "prelu": {"weight": jnp.full((1,), 0.25)},
        "norm1": init_layer_norm(inner),
        "norm2": init_layer_norm(inner),
        "gated_fsmn": {
            "to_u": _ffconvm_init(ks, inner, inner, norm="ln"),
            "to_v": _ffconvm_init(ks, inner, inner, norm="ln"),
            "fsmn": {
                "linear": init_linear(next(ks), inner, inner),
                "project": init_linear(next(ks), inner, inner,
                                       bias=False),
                "conv1": {"weight": jnp.zeros(
                    (2 * lorder - 1, 1, 1, inner))},
            }},
        "conv2": _conv1x1_init(ks, inner, dim),
    }


def _unideep_fsmn(p: dict, x: Array, lorder: int) -> Array:
    f1 = jax.nn.relu(apply_linear(p["linear"], x))
    p1 = apply_linear(p["project"], f1)
    y = jnp.pad(p1[:, :, None], ((0, 0), (lorder - 1, lorder - 1),
                                 (0, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        y, p["conv1"]["weight"].astype(y.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=y.shape[-1])[:, :, 0]
    out = p1 + out
    return x + out


def _gated_fsmn_block(p: dict, x: Array, lorder: int) -> Array:
    residual = x
    h = apply_linear(p["conv1"], x)
    h = _prelu(p["prelu"], h)
    h = _layer_norm(p["norm1"], h)
    g = p["gated_fsmn"]
    x_u = _ffconvm(g["to_u"], h)
    x_v = _ffconvm(g["to_v"], h)
    x_u = _unideep_fsmn(g["fsmn"], x_u, lorder)
    h = x_v * x_u + h
    h = _layer_norm(p["norm2"], h)
    return apply_linear(p["conv2"], h) + residual


# --------------------------------------------------------------- masknet

def init_masknet(key, c: MossFormer2SEConfig) -> dict:
    ks = iter(jax.random.split(key, 40 * c.num_blocks + 64))
    layers = {}
    fsmn = {}
    for i in range(c.num_blocks):
        layers[str(i)] = _flash_init(ks, c.out_channels, c.query_key_dim)
        fsmn[str(i)] = _fsmn_init(ks, c.out_channels, c.fsmn_inner,
                                  c.fsmn_lorder)
    return {
        "norm": {"weight": jnp.ones((c.in_channels, 1)),
                 "bias": jnp.zeros((c.in_channels, 1))},
        "conv1d_encoder": _conv1x1_init(ks, c.in_channels, c.out_channels,
                                        bias=False),
        "pos_enc": {"scale": jnp.ones((1,))},
        "mdl": {"intra_mdl": {
            "mossformerM": {"layers": layers, "fsmn": fsmn},
            "norm": init_layer_norm(c.out_channels)},
            "intra_norm": init_layer_norm(c.out_channels)},
        "conv1d_out": _conv1x1_init(ks, c.out_channels,
                                    c.out_channels * 2),
        "conv1_decoder": _conv1x1_init(ks, c.out_channels,
                                       c.out_channels_final, bias=False),
        "prelu": {"weight": jnp.full((1,), 0.25)},
        "output": _conv1x1_init(ks, c.out_channels, c.out_channels),
        "output_gate": _conv1x1_init(ks, c.out_channels, c.out_channels),
    }


def masknet_forward(p: dict, c: MossFormer2SEConfig, feats: Array
                    ) -> Array:
    """features (B, T, in_channels) -> mask (B, T, out_channels_final)."""
    b, t, _ = feats.shape
    # gLN over (C, T) jointly (channel-first semantics)
    xc = jnp.transpose(feats, (0, 2, 1))
    mean = jnp.mean(xc, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xc - mean), axis=(1, 2), keepdims=True)
    xc = (xc - mean) * jax.lax.rsqrt(var + 1e-8)
    xc = xc * p["norm"]["weight"].reshape(1, -1, 1) + \
        p["norm"]["bias"].reshape(1, -1, 1)
    x = jnp.transpose(xc, (0, 2, 1))
    x = apply_linear(p["conv1d_encoder"], x)

    # scaled sinusoidal positional embedding
    d = x.shape[-1]
    inv = 1.0 / (10000.0 ** (jnp.arange(0, d, 2,
                                        dtype=jnp.float32) / d))
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None]
    pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1) * \
        p["pos_enc"]["scale"]
    x = x + pe[None]

    m = p["mdl"]["intra_mdl"]["mossformerM"]
    h = x
    for i in range(c.num_blocks):
        h = _flash_block(m["layers"][str(i)], h, c.group_size)
        h = _gated_fsmn_block(m["fsmn"][str(i)], h, c.fsmn_lorder)
    h = _layer_norm(p["mdl"]["intra_mdl"]["norm"], h)
    h = _group_norm1(p["mdl"]["intra_norm"], h)
    x = h + x                        # skip around intra

    x = _prelu(p["prelu"], x)
    x = apply_linear(p["conv1d_out"], x)      # (B, T, 2*out)
    # two speakers stacked in batch; keep speaker 0 path fused
    x = x.reshape(b, t, 2, -1)
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * 2, t, -1)
    gated = jnp.tanh(apply_linear(p["output"], x)) * \
        jax.nn.sigmoid(apply_linear(p["output_gate"], x))
    mask = jax.nn.relu(apply_linear(p["conv1_decoder"], gated))
    mask = mask.reshape(b, 2, t, -1)
    return mask[:, 0]                # first speaker (B, T, final)


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """MossFormer2 SE 48K speech enhancer."""

    def __init__(self, config: MossFormer2SEConfig = None, **kwargs):
        if config is None:
            config = MossFormer2SEConfig.from_dict(kwargs) if kwargs else \
                MossFormer2SEConfig()
        elif isinstance(config, dict):
            config = MossFormer2SEConfig.from_dict(config)
        super().__init__(config)
        self._istft = dsp.ISTFTCache()

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_masknet(key, self.config)

    def sanitize(self, weights):
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            for prefix in ("model.model.mossformer.", "model.mossformer.",
                           "mossformer."):
                if k.startswith(prefix):
                    k = k[len(prefix):]
                    break
            # torch 1x1 convs (out, in, 1) / (out, in) -> linear (out, in)
            if v.ndim == 3 and v.shape[-1] == 1 and any(
                    s in k for s in ("conv1d", "conv1_decoder", "output",
                                     "conv1.", "conv2.")):
                v = v[..., 0]
            if k.endswith("gated_fsmn.fsmn.conv1.weight") and v.ndim == 4:
                # torch depthwise (C, 1, K, 1) -> HWIO (K, 1, 1, C)
                v = jnp.transpose(v, (2, 3, 1, 0))
            if "conv_module.weight" in k and v.ndim == 3:
                # torch depthwise (C, 1, K) -> WIO (K, 1, C)
                v = jnp.transpose(v, (2, 1, 0))
            out[k] = v
        return out

    # ---------------------------------------------------------- chunks

    def _chunk_fn(self, n_samples: int):
        c = self.config

        def run(p, audio, key):
            fb = dsp.compute_fbank_kaldi(
                audio, sample_rate=c.sample_rate, win_len=c.win_len,
                win_inc=c.win_inc, num_mels=c.num_mels,
                win_type=c.win_type, preemphasis=c.preemphasis, key=key)
            d1 = dsp.compute_deltas_kaldi(fb.T, win_length=5).T
            d2 = dsp.compute_deltas_kaldi(d1.T, win_length=5).T
            feats = jnp.concatenate([fb, d1, d2], axis=1)[None]
            mask = masknet_forward(p, c, feats)[0]      # (T, F)

            window = dsp.hamming(c.win_len, periodic=False)
            spec = dsp.stft(audio, n_fft=c.fft_len, hop_length=c.win_inc,
                            win_length=c.win_len, window=window,
                            center=False)               # (frames, freq)
            tmin = jnp.minimum(mask.shape[0], spec.shape[0])
            m = mask[:spec.shape[0]]
            if m.shape[0] < spec.shape[0]:
                m = jnp.pad(m, ((0, spec.shape[0] - m.shape[0]), (0, 0)))
            masked = spec * m[:, :spec.shape[1]]
            del tmin
            return jnp.real(masked).T, jnp.imag(masked).T

        return jax.jit(run)

    def _process_chunk(self, audio: np.ndarray,
                       chunk_length: int) -> np.ndarray:
        c = self.config
        # pad so center=False framing covers every sample (tail samples
        # that don't fill a hop would otherwise be dropped by the STFT)
        n = len(audio)
        if n < c.win_len:
            pad = c.win_len - n
        else:
            pad = (-(n - c.win_len)) % c.win_inc
        if pad:
            audio = np.pad(np.asarray(audio), (0, pad))
            n = len(audio)
        fn = self._jit_cache.get(("chunk", n))
        if fn is None:
            fn = self._chunk_fn(n)
            self._jit_cache[("chunk", n)] = fn
        real, imag = fn(self.params, jnp.asarray(audio, jnp.float32),
                        jax.random.PRNGKey(0))
        window = dsp.hamming(c.win_len, periodic=False)
        out = self._istft.istft(real[None], imag[None], c.fft_len,
                                c.win_inc, c.win_len, window,
                                center=False, audio_length=chunk_length)
        return np.asarray(out[0])

    # ---------------------------------------------------------- enhance

    def enhance(self, audio_input, chunked: Optional[bool] = None
                ) -> np.ndarray:
        c = self.config
        if isinstance(audio_input, str):
            from ....utils import load_audio

            audio = np.asarray(load_audio(audio_input, c.sample_rate))
        else:
            audio = np.asarray(audio_input, np.float32)
        if audio.ndim == 2:
            audio = audio[0] if audio.shape[0] <= audio.shape[1] \
                else audio[:, 0]
        duration = len(audio) / c.sample_rate
        use_chunked = chunked if chunked is not None else \
            duration >= c.auto_chunk_threshold
        if use_chunked:
            return self._decode_chunked(audio)
        return self._decode_one_audio(audio)

    def _decode_one_audio(self, audio: np.ndarray) -> np.ndarray:
        c = self.config
        original_len = len(audio)
        x = audio * MAX_WAV_VALUE
        if original_len > c.sample_rate * c.one_time_decode_length:
            window_size = int(c.sample_rate * c.decode_window)
            stride = int(window_size * 0.75)
            t = len(x)
            if t < window_size:
                x = np.pad(x, (0, window_size - t))
            elif t < window_size + stride:
                x = np.pad(x, (0, window_size + stride - t))
            elif (t - window_size) % stride != 0:
                x = np.pad(x, (0, t - (t - window_size) // stride
                               * stride))
            t = len(x)
            out = np.zeros(t)
            give_up = (window_size - stride) // 2
            idx = 0
            while idx + window_size <= t:
                seg = self._process_chunk(x[idx:idx + window_size],
                                          window_size)
                if idx == 0:
                    out[:window_size - give_up] = seg[:-give_up]
                else:
                    out[idx + give_up:idx + window_size - give_up] = \
                        seg[give_up:-give_up]
                idx += stride
            return out[:original_len] / MAX_WAV_VALUE
        out = self._process_chunk(x, len(x))
        return np.asarray(out) / MAX_WAV_VALUE

    def _decode_chunked(self, audio: np.ndarray) -> np.ndarray:
        c = self.config
        original_len = len(audio)
        x = audio * MAX_WAV_VALUE
        chunk_samples = int(c.sample_rate * c.chunk_seconds)
        overlap = int(chunk_samples * c.chunk_overlap)
        stride = chunk_samples - overlap
        give_up = overlap // 2
        if original_len <= chunk_samples:
            return self._process_chunk(x, original_len) / MAX_WAV_VALUE
        chunks, starts = [], []
        idx = 0
        while idx + chunk_samples <= original_len:
            chunks.append(self._process_chunk(x[idx:idx + chunk_samples],
                                              chunk_samples))
            starts.append(idx)
            idx += stride
        if idx < original_len:
            chunks.append(self._process_chunk(x[idx:],
                                              original_len - idx))
            starts.append(idx)
        out = np.zeros(original_len)
        for i, (chunk, start) in enumerate(zip(chunks, starts)):
            first, last = i == 0, i == len(chunks) - 1
            if last and len(chunk) < chunk_samples:
                ks = 0 if first else give_up
                ke = len(chunk)
            else:
                ks = 0 if first else give_up
                ke = len(chunk) - give_up
            os_, oe = start + ks, min(start + ke, original_len)
            out[os_:oe] = chunk[ks:ks + (oe - os_)]
        return out / MAX_WAV_VALUE

    # generic STS surface
    def __call__(self, audio, **kwargs):
        return self.enhance(audio, **kwargs)

    def generate(self, audio, **kwargs):
        t0 = time.perf_counter()
        out = self.enhance(audio, **kwargs)
        return {"audio": out, "sample_rate": self.config.sample_rate,
                "processing_time_seconds": time.perf_counter() - t0}


MossFormer2SEModel = Model

__all__ = ["Model", "MossFormer2SEModel", "MossFormer2SEConfig",
           "masknet_forward", "init_masknet"]
