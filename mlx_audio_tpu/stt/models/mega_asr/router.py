"""MegaASR audio-quality router (reference stt/models/mega_asr/router.py).

A small conv + transformer classifier over log-mel-80 that predicts whether
audio is degraded; degraded audio routes through the LoRA-adapted ASR
(router.py:182-322).  Checkpoint format is the reference's "converted"
layout (from_converted :214-241): frontend.conv.{0,4} convs with
frontend.conv.{1,5} batch-norms (folded into scale/shift here), fused qkv
in_proj, interleaved sin/cos positional table.

TPU design: one jitted program per time-length bucket with validity masks
in the attention and the pooling softmax, so padded buckets match tight
shapes exactly; batch-norms are folded at load so inference is pure
scale-and-shift.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import mel_filters, spec_abs, stft
from ....nn import apply_conv1d, apply_layer_norm, apply_linear
from ....ops.attention import attention

Array = jax.Array

TIME_BUCKETS = (64, 128, 256, 512, 850)


def log_mel80(audio: Array) -> Array:
    """(T,) -> (frames, 80): slaney mel, log10, (x+4)/4 (router.py:13-47)."""
    win = np.hanning(401)[:-1].astype(np.float32)
    spec = stft(audio, n_fft=400, hop_length=160, win_length=400,
                window=jnp.asarray(win), center=True, pad_mode="reflect")
    power = spec_abs(spec) ** 2.0
    fb = mel_filters(16000, 400, 80, f_min=0.0, f_max=8000.0,
                     norm="slaney", mel_scale="slaney")
    mel = power @ fb.T
    return (jnp.log10(jnp.maximum(mel, 1e-10)) + 4.0) / 4.0


def load_router_params(weights: Dict[str, np.ndarray]) -> dict:
    """Converted router.safetensors mapping -> functional params.

    Conv weights arrive in MLX (O, K, I) layout -> WIO (K, I, O); fused
    in_proj qkv is split; batch-norm running stats are folded.
    """
    w = {k: np.asarray(v) for k, v in weights.items()}

    def conv(i):
        return {"weight": jnp.asarray(
                    w[f"frontend.conv.{i}.weight"].transpose(1, 2, 0)),
                "bias": jnp.asarray(w[f"frontend.conv.{i}.bias"])}

    def bn(i, eps=1e-5):
        scale = w[f"frontend.conv.{i}.weight"] / np.sqrt(
            w[f"frontend.conv.{i}.running_var"] + eps)
        shift = w[f"frontend.conv.{i}.bias"] \
            - w[f"frontend.conv.{i}.running_mean"] * scale
        return {"scale": jnp.asarray(scale), "shift": jnp.asarray(shift)}

    n_layers = len({k.split(".")[2] for k in w
                    if k.startswith("transformer.layers.")})
    layers = {}
    for i in range(n_layers):
        pre = f"transformer.layers.{i}"
        qw, kw, vw = np.split(w[f"{pre}.self_attn.in_proj_weight"], 3, 0)
        qb, kb, vb = np.split(w[f"{pre}.self_attn.in_proj_bias"], 3, 0)
        layers[str(i)] = {
            "self_attn": {
                "q_proj": {"weight": jnp.asarray(qw),
                           "bias": jnp.asarray(qb)},
                "k_proj": {"weight": jnp.asarray(kw),
                           "bias": jnp.asarray(kb)},
                "v_proj": {"weight": jnp.asarray(vw),
                           "bias": jnp.asarray(vb)},
                "out_proj": {
                    "weight": jnp.asarray(
                        w[f"{pre}.self_attn.out_proj.weight"]),
                    "bias": jnp.asarray(
                        w[f"{pre}.self_attn.out_proj.bias"])}},
            "linear1": {"weight": jnp.asarray(w[f"{pre}.linear1.weight"]),
                        "bias": jnp.asarray(w[f"{pre}.linear1.bias"])},
            "linear2": {"weight": jnp.asarray(w[f"{pre}.linear2.weight"]),
                        "bias": jnp.asarray(w[f"{pre}.linear2.bias"])},
            "norm1": {"weight": jnp.asarray(w[f"{pre}.norm1.weight"]),
                      "bias": jnp.asarray(w[f"{pre}.norm1.bias"])},
            "norm2": {"weight": jnp.asarray(w[f"{pre}.norm2.weight"]),
                      "bias": jnp.asarray(w[f"{pre}.norm2.bias"])}}
    return {
        "conv1": conv(0), "bn1": bn(1), "conv2": conv(4), "bn2": bn(5),
        "pe": jnp.asarray(w["pos_encoder.pe"]),
        "layers": layers,
        "norm": {"weight": jnp.asarray(w["transformer.norm.weight"]),
                 "bias": jnp.asarray(w["transformer.norm.bias"])},
        "pooling": {"weight": jnp.asarray(w["pooling.query.weight"]),
                    "bias": jnp.asarray(w["pooling.query.bias"])},
        "fc1": {"weight": jnp.asarray(w["classifier.0.weight"]),
                "bias": jnp.asarray(w["classifier.0.bias"])},
        "fc2": {"weight": jnp.asarray(w["classifier.3.weight"]),
                "bias": jnp.asarray(w["classifier.3.bias"])},
    }


def init_router_params(key, d_model=256, nhead=4, dim_feedforward=1024,
                       num_layers=1, n_mels=80, frontend_hidden_dim=128,
                       classifier_hidden_dim=128, max_len=850) -> dict:
    """Random init matching load_router_params' tree (tests/fixtures)."""
    from ....nn import init_layer_norm, init_linear
    ks = iter(jax.random.split(key, 16 + 8 * num_layers))

    def conv(i, o):
        s = 1.0 / math.sqrt(i * 3)
        return {"weight": jax.random.uniform(next(ks), (3, i, o),
                                             minval=-s, maxval=s),
                "bias": jnp.zeros((o,))}

    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, np.float32)
                 * (-math.log(10000.0) / d_model))
    pe = np.zeros((1, max_len, d_model), np.float32)
    pe[0, :, 0::2] = np.sin(pos * div)
    pe[0, :, 1::2] = np.cos(pos * div)
    layers = {str(i): {
        "self_attn": {n: init_linear(next(ks), d_model, d_model)
                      for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
        "linear1": init_linear(next(ks), d_model, dim_feedforward),
        "linear2": init_linear(next(ks), dim_feedforward, d_model),
        "norm1": init_layer_norm(d_model),
        "norm2": init_layer_norm(d_model)} for i in range(num_layers)}
    return {"conv1": conv(n_mels, frontend_hidden_dim),
            "bn1": {"scale": jnp.ones((frontend_hidden_dim,)),
                    "shift": jnp.zeros((frontend_hidden_dim,))},
            "conv2": conv(frontend_hidden_dim, d_model),
            "bn2": {"scale": jnp.ones((d_model,)),
                    "shift": jnp.zeros((d_model,))},
            "pe": jnp.asarray(pe), "layers": layers,
            "norm": init_layer_norm(d_model),
            "pooling": init_linear(next(ks), d_model, 1),
            "fc1": init_linear(next(ks), d_model, classifier_hidden_dim),
            "fc2": init_linear(next(ks), classifier_hidden_dim, 2)}


def router_logits(p: dict, mel: Array, n_valid: Array) -> Array:
    """(1, T_bucket, n_mels) mel + valid frame count -> (2,) logits."""
    x = jax.nn.gelu(apply_conv1d(p["conv1"], mel, stride=2, padding=1)
                    * p["bn1"]["scale"] + p["bn1"]["shift"],
                    approximate=False)
    x = jax.nn.gelu(apply_conv1d(p["conv2"], x, stride=2, padding=1)
                    * p["bn2"]["scale"] + p["bn2"]["shift"],
                    approximate=False)
    t = x.shape[1]
    x = x + p["pe"][:, :t]
    valid = jnp.arange(t) < n_valid                    # conv keeps ceil/4
    amask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
    nh = 4
    hd = x.shape[-1] // nh
    for i in range(len(p["layers"])):
        blk = p["layers"][str(i)]
        h = apply_layer_norm(blk["norm1"], x)
        a = blk["self_attn"]
        q = apply_linear(a["q_proj"], h).reshape(1, t, nh, hd)
        k = apply_linear(a["k_proj"], h).reshape(1, t, nh, hd)
        v = apply_linear(a["v_proj"], h).reshape(1, t, nh, hd)
        o = attention(q, k, v, mask=amask).reshape(1, t, -1)
        x = x + apply_linear(a["out_proj"], o)
        h = apply_layer_norm(blk["norm2"], x)
        x = x + apply_linear(blk["linear2"],
                             jax.nn.gelu(apply_linear(blk["linear1"], h),
                                         approximate=False))
    x = apply_layer_norm(p["norm"], x)
    w = apply_linear(p["pooling"], x)[..., 0]          # (1, t)
    w = jax.nn.softmax(jnp.where(valid[None], w, -jnp.inf), axis=-1)
    pooled = jnp.sum(w[..., None] * x, axis=1)         # (1, d)
    h = jax.nn.gelu(apply_linear(p["fc1"], pooled), approximate=False)
    return apply_linear(p["fc2"], h)[0]


class AudioQualityRouter:
    """Functional router with bucketed jitted forward."""

    def __init__(self, params: dict):
        self.params = params
        self._jit: Dict = {}

    @classmethod
    def from_converted(cls, weights: Dict) -> "AudioQualityRouter":
        return cls(load_router_params(weights))

    def degraded_prob(self, audio: np.ndarray) -> float:
        mel = np.asarray(log_mel80(jnp.asarray(
            np.asarray(audio, np.float32).reshape(-1))))
        n_out = (mel.shape[0] + 3) // 4                # two stride-2 convs
        max_len = self.params["pe"].shape[1]
        n_out = min(n_out, max_len)
        frames = min(mel.shape[0], max_len * 4)
        b = next((x for x in TIME_BUCKETS if frames <= x * 4), max_len * 4)
        padded = np.zeros((1, b * 4, mel.shape[1]), np.float32)
        padded[0, :frames] = mel[:frames]
        fn = self._jit.get(b)
        if fn is None:
            fn = jax.jit(router_logits)
            self._jit[b] = fn
        logits = np.asarray(fn(self.params, jnp.asarray(padded),
                               jnp.int32(n_out)))
        e = np.exp(logits - logits.max())
        return float((e / e.sum())[1])

    def route(self, audio) -> Dict:
        p = self.degraded_prob(audio)
        return {"degraded_prob": p, "use_lora": p >= 0.5}
