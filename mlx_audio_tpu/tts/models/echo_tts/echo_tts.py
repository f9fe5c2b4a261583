"""Echo-TTS: joint-attention DiT flow TTS over Fish-DAC PCA latents.

Parity: /root/reference/mlx_audio/tts/models/echo_tts/
(EchoDiT model.py — text/speaker encoders feeding per-layer KV caches into
gated joint attention with low-rank AdaLN; sampling.py — Euler CFG with
independent text/speaker guidances, truncation, temporal score rescale,
speaker-KV scaling schedule, blockwise mode with latent-prefix KV;
audio.py — PCA-projected fish-s1-dac latents + flattening-point crop;
text.py — byte-level tokenizer with [S1] tagging).

TPU design: text/speaker encoders and every per-layer KV cache precompute
in one program; the FULL Euler integration (static t-grid, CFG window and
speaker-kv rescale points folded in as constants) traces into a single
jitted sampler — the reference syncs per step.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Dict, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_linear,
    init_embedding,
    init_linear,
)
from ....ops.attention import attention
from ..base import GenerationResult, format_duration, peak_memory_gb

Array = jax.Array

DEFAULT_TRUNCATION = 0.96


@dataclass
class EchoDiTConfig(BaseModelArgs):
    latent_size: int = 80
    model_size: int = 2048
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 5888
    norm_eps: float = 1e-5
    text_vocab_size: int = 256
    text_model_size: int = 1280
    text_num_layers: int = 14
    text_num_heads: int = 10
    text_intermediate_size: int = 3328
    speaker_patch_size: int = 4
    speaker_model_size: int = 1280
    speaker_num_layers: int = 14
    speaker_num_heads: int = 10
    speaker_intermediate_size: int = 3328
    timestep_embed_size: int = 512
    adaln_rank: int = 256


@dataclass
class SamplerConfig(BaseModelArgs):
    num_steps: int = 40
    cfg_scale_text: float = 3.0
    cfg_scale_speaker: float = 8.0
    cfg_min_t: float = 0.5
    cfg_max_t: float = 1.0
    truncation_factor: Optional[float] = None
    rescale_k: Optional[float] = None
    rescale_sigma: Optional[float] = None
    speaker_kv_scale: Optional[float] = None
    speaker_kv_max_layers: Optional[int] = None
    speaker_kv_min_t: Optional[float] = None
    sequence_length: int = 640


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "echo_tts"
    sample_rate: int = 44100
    max_text_length: int = 768
    max_speaker_latent_length: int = 6400
    audio_downsample_factor: int = 2048
    normalize_text: bool = True
    delete_blockwise_modules: bool = False
    pca_filename: str = "pca_state.safetensors"
    fish_codec_repo: str = "jordand/fish-s1-dac-min"
    model_path: Optional[str] = None
    dit: EchoDiTConfig = field(default_factory=EchoDiTConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)

    def __post_init__(self):
        if isinstance(self.dit, dict):
            self.dit = EchoDiTConfig.from_dict(self.dit)
        if isinstance(self.sampler, dict):
            self.sampler = SamplerConfig.from_dict(self.sampler)


# ------------------------------------------------------------ byte text

def normalize_text_prompt(text: str) -> str:
    text = (text.replace("…", "...").replace("’", "'").replace("”", '"')
            .replace("\n", " ").replace(":", ",").replace(";", ",")
            .replace("—", ", "))
    if (not text.startswith("[") and not text.startswith("(")
            and "S1" not in text and "S2" not in text):
        text = "[S1] " + text
    return text


def tokenize_bytes(text: str, normalize: bool = True) -> np.ndarray:
    if normalize:
        text = normalize_text_prompt(text)
    return np.asarray([0] + list(text.encode("utf-8")), np.int32)


# ------------------------------------------------------------- functional

def _rope_tables(dim: int, end: int) -> Tuple[Array, Array]:
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2,
                                          dtype=jnp.float32)[:dim // 2]
                               / dim))
    t = jnp.arange(end, dtype=jnp.float32)
    f = jnp.outer(t, freqs)
    return jnp.cos(f), jnp.sin(f)


def _apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    # x (B, T, H, D); tables (T, D/2); even/odd interleave
    e, o = x[..., 0::2], x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.stack([e * c - o * s, o * c + e * s],
                     axis=-1).reshape(x.shape)


def _rotary_half(x: Array, cos: Array, sin: Array) -> Array:
    """Full-dim rope on the FIRST HALF OF HEADS only (ref model.py:222)."""
    h = x.shape[-2] // 2
    x1 = _apply_rope(x[..., :h, :], cos, sin)
    return jnp.concatenate([x1, x[..., h:, :]], axis=-2)


def _rms(x: Array, w: Array, eps: float) -> Array:
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (x32 * w).astype(x.dtype)


def _mlp_init(ks, d, inter):
    return {"w1": init_linear(next(ks), d, inter, bias=False),
            "w3": init_linear(next(ks), d, inter, bias=False),
            "w2": init_linear(next(ks), inter, d, bias=False)}


def _mlp(p, x):
    return apply_linear(p["w2"], jax.nn.silu(apply_linear(p["w1"], x))
                        * apply_linear(p["w3"], x))


def _enc_block_init(ks, d, heads, inter):
    hd = d // heads
    return {"attention": {
        "wq": init_linear(next(ks), d, d, bias=False),
        "wk": init_linear(next(ks), d, d, bias=False),
        "wv": init_linear(next(ks), d, d, bias=False),
        "wo": init_linear(next(ks), d, d, bias=False),
        "gate": init_linear(next(ks), d, d, bias=False),
        "q_norm": {"weight": jnp.ones((heads, hd))},
        "k_norm": {"weight": jnp.ones((heads, hd))}},
        "mlp": _mlp_init(ks, d, inter),
        "attention_norm": {"weight": jnp.ones(d)},
        "mlp_norm": {"weight": jnp.ones(d)}}


def _enc_block(p, x, heads, eps, causal, key_mask=None):
    b, t, d = x.shape
    hd = d // heads
    h = _rms(x, p["attention_norm"]["weight"], eps)
    a = p["attention"]
    q = apply_linear(a["wq"], h).reshape(b, t, heads, hd)
    k = apply_linear(a["wk"], h).reshape(b, t, heads, hd)
    v = apply_linear(a["wv"], h).reshape(b, t, heads, hd)
    gate = apply_linear(a["gate"], h)
    q = _rms(q, a["q_norm"]["weight"], eps)
    k = _rms(k, a["k_norm"]["weight"], eps)
    cos, sin = _rope_tables(hd, t)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    mask = None
    if key_mask is not None:
        mask = jnp.where(key_mask[:, None, None, :], 0.0, -1e9)
    o = attention(q, k, v, mask=mask, causal=causal).reshape(b, t, d)
    x = x + apply_linear(a["wo"], o * jax.nn.sigmoid(gate))
    h = _rms(x, p["mlp_norm"]["weight"], eps)
    return x + _mlp(p["mlp"], h)


def init_echo_dit(key, d: EchoDiTConfig) -> dict:
    ks = iter(jax.random.split(
        key, 32 * (d.num_layers + d.text_num_layers
                   + 2 * d.speaker_num_layers) + 32))
    text_enc = {
        "text_embedding": init_embedding(next(ks), d.text_vocab_size,
                                         d.text_model_size),
        "blocks": {str(i): _enc_block_init(ks, d.text_model_size,
                                           d.text_num_heads,
                                           d.text_intermediate_size)
                   for i in range(d.text_num_layers)}}

    def spk_enc():
        return {"in_proj": init_linear(
            next(ks), d.latent_size * d.speaker_patch_size,
            d.speaker_model_size),
            "blocks": {str(i): _enc_block_init(
                ks, d.speaker_model_size, d.speaker_num_heads,
                d.speaker_intermediate_size)
                for i in range(d.speaker_num_layers)}}

    hd = d.model_size // d.num_heads
    blocks = {}
    for i in range(d.num_layers):
        att = {
            "wq": init_linear(next(ks), d.model_size, d.model_size,
                              bias=False),
            "wk": init_linear(next(ks), d.model_size, d.model_size,
                              bias=False),
            "wv": init_linear(next(ks), d.model_size, d.model_size,
                              bias=False),
            "wk_text": init_linear(next(ks), d.text_model_size,
                                   d.model_size, bias=False),
            "wv_text": init_linear(next(ks), d.text_model_size,
                                   d.model_size, bias=False),
            "wk_speaker": init_linear(next(ks), d.speaker_model_size,
                                      d.model_size, bias=False),
            "wv_speaker": init_linear(next(ks), d.speaker_model_size,
                                      d.model_size, bias=False),
            "wk_latent": init_linear(next(ks), d.speaker_model_size,
                                     d.model_size, bias=False),
            "wv_latent": init_linear(next(ks), d.speaker_model_size,
                                     d.model_size, bias=False),
            "gate": init_linear(next(ks), d.model_size, d.model_size,
                                bias=False),
            "wo": init_linear(next(ks), d.model_size, d.model_size,
                              bias=False),
            "q_norm": {"weight": jnp.ones((d.num_heads, hd))},
            "k_norm": {"weight": jnp.ones((d.num_heads, hd))}}

        def adaln():
            return {"shift_down": init_linear(next(ks), d.model_size,
                                              d.adaln_rank, bias=False),
                    "scale_down": init_linear(next(ks), d.model_size,
                                              d.adaln_rank, bias=False),
                    "gate_down": init_linear(next(ks), d.model_size,
                                             d.adaln_rank, bias=False),
                    "shift_up": init_linear(next(ks), d.adaln_rank,
                                            d.model_size),
                    "scale_up": init_linear(next(ks), d.adaln_rank,
                                            d.model_size),
                    "gate_up": init_linear(next(ks), d.adaln_rank,
                                           d.model_size)}

        blocks[str(i)] = {"attention": att,
                          "mlp": _mlp_init(ks, d.model_size,
                                           d.intermediate_size),
                          "attention_adaln": adaln(),
                          "mlp_adaln": adaln()}
    return {
        "text_encoder": text_enc,
        "speaker_encoder": spk_enc(),
        "latent_encoder": spk_enc(),
        "latent_norm": {"weight": jnp.ones(d.speaker_model_size)},
        "text_norm": {"weight": jnp.ones(d.text_model_size)},
        "speaker_norm": {"weight": jnp.ones(d.speaker_model_size)},
        "cond_module": {"layers": {
            "0": init_linear(next(ks), d.timestep_embed_size, d.model_size,
                             bias=False),
            "2": init_linear(next(ks), d.model_size, d.model_size,
                             bias=False),
            "4": init_linear(next(ks), d.model_size, 3 * d.model_size,
                             bias=False)}},
        "in_proj": init_linear(next(ks), d.latent_size, d.model_size),
        "blocks": blocks,
        "out_norm": {"weight": jnp.ones(d.model_size)},
        "out_proj": init_linear(next(ks), d.model_size, d.latent_size),
    }


def text_encode(p, d: EchoDiTConfig, ids: Array, mask: Array) -> Array:
    x = apply_embedding(p["text_encoder"]["text_embedding"], ids)
    for i in range(d.text_num_layers):
        x = _enc_block(p["text_encoder"]["blocks"][str(i)], x,
                       d.text_num_heads, d.norm_eps, causal=False,
                       key_mask=mask)
    return _rms(x, p["text_norm"]["weight"], d.norm_eps)


def _patched_encode(enc, norm_w, d: EchoDiTConfig, latent: Array) -> Array:
    ps = d.speaker_patch_size
    b, t, ls = latent.shape
    tp = (t // ps) * ps
    x = latent[:, :tp].reshape(b, tp // ps, ls * ps)
    x = apply_linear(enc["in_proj"], x) / 6.0
    for i in range(d.speaker_num_layers):
        x = _enc_block(enc["blocks"][str(i)], x, d.speaker_num_heads,
                       d.norm_eps, causal=True)
    return _rms(x, norm_w, d.norm_eps)


def _adaln_apply(p, x, cond, eps):
    shift, scale, gate = jnp.split(cond, 3, axis=-1)
    shift = apply_linear(p["shift_up"],
                         apply_linear(p["shift_down"],
                                      jax.nn.silu(shift))) + shift
    scale = apply_linear(p["scale_up"],
                         apply_linear(p["scale_down"],
                                      jax.nn.silu(scale))) + scale
    gate = apply_linear(p["gate_up"],
                        apply_linear(p["gate_down"],
                                     jax.nn.silu(gate))) + gate
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (x32 * (scale + 1.0) + shift).astype(x.dtype), jnp.tanh(gate)


def _timestep_embed(t: Array, size: int) -> Array:
    half = size // 2
    freqs = 1000.0 * jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def build_kv_caches(p, d: EchoDiTConfig, text_state, speaker_state,
                    latent_state=None, latent_freqs=None):
    """Per-layer (k, v) caches for text/speaker(/latent) streams."""
    hd = d.model_size // d.num_heads
    out = {"text": [], "speaker": [], "latent": []}
    for i in range(d.num_layers):
        a = p["blocks"][str(i)]["attention"]

        def kv(prefix, state):
            b, t, _ = state.shape
            k = apply_linear(a["wk_" + prefix], state).reshape(
                b, t, d.num_heads, hd)
            v = apply_linear(a["wv_" + prefix], state).reshape(
                b, t, d.num_heads, hd)
            return _rms(k, a["k_norm"]["weight"], d.norm_eps), v

        out["text"].append(kv("text", text_state))
        out["speaker"].append(kv("speaker", speaker_state))
        if latent_state is not None and latent_state.shape[1] > 0:
            k, v = kv("latent", latent_state)
            cos, sin = latent_freqs
            out["latent"].append((_rotary_half(k, cos, sin), v))
    return out


def dit_forward(p, d: EchoDiTConfig, x, t, text_mask, speaker_mask, kvs,
                start_pos: int = 0, latent_mask=None):
    """x (B, S, latent) noisy latents -> velocity (B, S, latent)."""
    b, s, _ = x.shape
    hd = d.model_size // d.num_heads
    cos, sin = _rope_tables(hd, start_pos + s)
    cos_q, sin_q = cos[start_pos:], sin[start_pos:]
    spk_mask = speaker_mask[..., ::d.speaker_patch_size]

    te = _timestep_embed(t, d.timestep_embed_size)
    cm = p["cond_module"]["layers"]
    cond = apply_linear(cm["4"], jax.nn.silu(
        apply_linear(cm["2"], jax.nn.silu(apply_linear(cm["0"], te)))))
    cond = cond[:, None]

    x = apply_linear(p["in_proj"], x)
    for i in range(d.num_layers):
        blk = p["blocks"][str(i)]
        a = blk["attention"]
        xn, att_gate = _adaln_apply(blk["attention_adaln"], x, cond,
                                    d.norm_eps)
        q = apply_linear(a["wq"], xn).reshape(b, s, d.num_heads, hd)
        k = apply_linear(a["wk"], xn).reshape(b, s, d.num_heads, hd)
        v = apply_linear(a["wv"], xn).reshape(b, s, d.num_heads, hd)
        gate = apply_linear(a["gate"], xn)
        q = _rms(q, a["q_norm"]["weight"], d.norm_eps)
        k = _rms(k, a["k_norm"]["weight"], d.norm_eps)
        q = _rotary_half(q, cos_q, sin_q)
        k = _rotary_half(k, cos_q, sin_q)

        kt, vt = kvs["text"][i]
        ksp, vsp = kvs["speaker"][i]
        parts_k, parts_v = [k], [v]
        parts_m = [jnp.ones((b, s), bool)]
        if kvs["latent"]:
            kl, vl = kvs["latent"][i]
            parts_k.append(kl)
            parts_v.append(vl)
            parts_m.append(latent_mask)
        parts_k += [kt, ksp]
        parts_v += [vt, vsp]
        parts_m += [text_mask, spk_mask]
        kk = jnp.concatenate(parts_k, axis=1)
        vv = jnp.concatenate(parts_v, axis=1)
        mm = jnp.concatenate(parts_m, axis=1)
        add = jnp.where(mm[:, None, None, :], 0.0, -1e9)
        o = attention(q, kk, vv, mask=add).reshape(b, s, d.model_size)
        x = x + att_gate * apply_linear(a["wo"],
                                        o * jax.nn.sigmoid(gate))
        xn, mlp_gate = _adaln_apply(blk["mlp_adaln"], x, cond, d.norm_eps)
        x = x + mlp_gate * _mlp(blk["mlp"], xn)
    x = _rms(x, p["out_norm"]["weight"], d.norm_eps)
    return apply_linear(p["out_proj"], x).astype(jnp.float32)


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """Echo-TTS (speaker-prompted flow TTS, 44.1 kHz Fish-DAC latents)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.fish_ae = None
        self.pca_state = None   # dict(pca_components, pca_mean, latent_scale)

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def latent_size(self) -> int:
        return self.config.dit.latent_size

    def init_params(self, key):
        return init_echo_dit(key, self.config.dit)

    def sanitize(self, weights):
        out = {}
        for k, v in weights.items():
            if k in ("pca_components", "pca_mean", "latent_scale"):
                continue
            if k.startswith("model."):
                k = k[len("model."):]
            parts = k.split(".")
            if parts[0] == "cond_module" and parts[1].isdigit():
                k = ".".join(["cond_module", "layers", *parts[1:]])
            out[k] = jnp.asarray(v)
        return out

    # ------------------------------------------------------------ latents

    def _pca_encode(self, z_q: Array) -> Array:
        st = self.pca_state
        z = (z_q - st["pca_mean"]) @ st["pca_components"].T
        return z * st["latent_scale"]

    def _pca_decode(self, z: Array) -> Array:
        st = self.pca_state
        return (z / st["latent_scale"]) @ st["pca_components"] + \
            st["pca_mean"]

    def speaker_latent_from_audio(self, audio: np.ndarray
                                  ) -> Tuple[np.ndarray, np.ndarray]:
        if self.fish_ae is None or self.pca_state is None:
            raise ValueError("Echo-TTS requires fish_ae + pca_state bound")
        cfg = self.config
        wav = np.asarray(audio, np.float32).reshape(1, -1)
        wav = wav[:, :cfg.max_speaker_latent_length
                  * cfg.audio_downsample_factor]
        z_q = np.asarray(self.fish_ae.encode_zq(wav))   # (1, T, 1024)
        z = np.asarray(self._pca_encode(jnp.asarray(z_q)))
        n = z.shape[1]
        ps = cfg.dit.speaker_patch_size
        n = (n // ps) * ps
        return z[:, :n], np.ones((1, n), bool)

    @staticmethod
    def find_flattening_point(latent: np.ndarray, window: int = 20,
                              std_threshold: float = 0.05) -> int:
        """First frame where the latent flatlines to ~0 (ref audio.py:44)."""
        padded = np.concatenate(
            [latent, np.zeros((window, latent.shape[-1]), latent.dtype)])
        for i in range(padded.shape[0] - window):
            w = padded[i:i + window]
            if w.std() < std_threshold and abs(w.mean()) < 0.1:
                return i
        return latent.shape[0]

    # ----------------------------------------------------------- sampler

    def _sampler_fn(self, s: SamplerConfig, seq_len: int, blockwise: bool):
        d = self.config.dit
        t_grid = np.linspace(0.999, 0.0, s.num_steps + 1, dtype=np.float64)
        trunc = s.truncation_factor if s.truncation_factor is not None \
            else DEFAULT_TRUNCATION

        def run(p, text_ids, text_mask, spk_latent, spk_mask, prefix_latent,
                start_pos, key):
            text_state = text_encode(p, d, text_ids, text_mask)
            spk_state = _patched_encode(p["speaker_encoder"],
                                        p["speaker_norm"]["weight"], d,
                                        spk_latent)
            latent_state = None
            latent_freqs = None
            latent_mask = None
            if blockwise and prefix_latent.shape[1] > 0:
                latent_state = _patched_encode(
                    p["latent_encoder"], p["latent_norm"]["weight"], d,
                    prefix_latent)
                hd = d.model_size // d.num_heads
                npat = latent_state.shape[1]
                cos, sin = _rope_tables(hd,
                                        npat * d.speaker_patch_size + 1)
                pos = jnp.arange(npat) * d.speaker_patch_size
                latent_freqs = (cos[pos], sin[pos])
                latent_mask = (pos[None] < start_pos)
                latent_mask = jnp.broadcast_to(latent_mask, (1, npat))

            kvs = build_kv_caches(p, d, text_state, spk_state, latent_state,
                                  latent_freqs)
            max_l = s.speaker_kv_max_layers \
                if s.speaker_kv_max_layers is not None else d.num_layers
            kvs_scaled = kvs
            if s.speaker_kv_scale is not None:
                kvs_scaled = dict(kvs)
                kvs_scaled["speaker"] = [
                    (k * s.speaker_kv_scale, v * s.speaker_kv_scale)
                    if li < max_l else (k, v)
                    for li, (k, v) in enumerate(kvs["speaker"])]

            # CFG runs the 3 guidance streams as one batch-3 forward:
            # [cond, text-uncond, speaker-uncond] (reference sampling.py:89)
            def tile3(kv):
                return {n: [(jnp.tile(k, (3, 1, 1, 1)),
                             jnp.tile(v, (3, 1, 1, 1))) for k, v in lst]
                        for n, lst in kv.items()}

            kvs3 = tile3(kvs)
            kvs3_scaled = tile3(kvs_scaled) \
                if kvs_scaled is not kvs else kvs3
            zeros_tm = jnp.zeros_like(text_mask)
            zeros_sm = jnp.zeros_like(spk_mask)
            tm3 = jnp.concatenate([text_mask, zeros_tm, text_mask], 0)
            sm3 = jnp.concatenate([spk_mask, spk_mask, zeros_sm], 0)
            lm3 = None if latent_mask is None else \
                jnp.tile(latent_mask, (3, 1))

            key, sub = jax.random.split(key)
            x = jax.random.normal(sub, (1, seq_len, d.latent_size),
                                  jnp.float32) * trunc
            for i in range(s.num_steps):
                t = float(t_grid[i])
                t_next = float(t_grid[i + 1])
                scaled = s.speaker_kv_scale is not None and (
                    s.speaker_kv_min_t is None or t >= s.speaker_kv_min_t)
                if s.cfg_min_t <= t <= s.cfg_max_t:
                    tv = jnp.full((3,), t, jnp.float32)
                    out = dit_forward(
                        p, d, jnp.tile(x, (3, 1, 1)), tv, tm3, sm3,
                        kvs3_scaled if scaled else kvs3, start_pos, lm3)
                    v_cond, v_ut, v_us = jnp.split(out, 3, axis=0)
                    v = (v_cond + s.cfg_scale_text * (v_cond - v_ut)
                         + s.cfg_scale_speaker * (v_cond - v_us))
                else:
                    tv = jnp.full((1,), t, jnp.float32)
                    v = dit_forward(p, d, x, tv, text_mask, spk_mask,
                                    kvs_scaled if scaled else kvs,
                                    start_pos, latent_mask)
                if s.rescale_k is not None and s.rescale_sigma is not None \
                        and t < 1.0:
                    snr = (1.0 - t) ** 2 / (t ** 2)
                    ratio = (snr * s.rescale_sigma ** 2 + 1.0) / (
                        snr * s.rescale_sigma ** 2 / s.rescale_k + 1.0)
                    v = (1.0 / (1.0 - t)) * (
                        ratio * ((1.0 - t) * v + x) - x)
                x = x + v * (t_next - t)
            return x, key

        return jax.jit(run, static_argnums=(6,))

    def generate_latents(self, text: str, speaker_latent=None,
                         speaker_mask=None, rng_seed: int = 0,
                         block_sizes: Optional[List[int]] = None,
                         **sampling_kwargs) -> np.ndarray:
        cfg = self.config
        d = cfg.dit
        ids = tokenize_bytes(text, cfg.normalize_text)[
            :cfg.max_text_length]
        text_ids = jnp.asarray(ids[None])
        text_mask = jnp.ones((1, len(ids)), bool)
        if speaker_latent is None:
            speaker_latent = np.zeros((1, d.speaker_patch_size,
                                       d.latent_size), np.float32)
            speaker_mask = np.zeros((1, d.speaker_patch_size), bool)
        speaker_latent = jnp.asarray(speaker_latent)
        speaker_mask = jnp.asarray(speaker_mask)

        s = SamplerConfig.from_dict({**cfg.sampler.__dict__,
                                     **{k: v for k, v
                                        in sampling_kwargs.items()
                                        if k in cfg.sampler.__dict__}})
        key = jax.random.PRNGKey(rng_seed)
        if block_sizes is None:
            fn_key = ("sample", tuple(sorted(s.__dict__.items())),
                      len(ids), speaker_latent.shape[1], False)
            fn = self._jit_cache.get(fn_key)
            if fn is None:
                fn = self._sampler_fn(s, s.sequence_length, False)
                self._jit_cache[fn_key] = fn
            x, _ = fn(self.params, text_ids, text_mask, speaker_latent,
                      speaker_mask,
                      jnp.zeros((1, 0, d.latent_size)), 0, key)
            return np.asarray(x)

        chunks: List[np.ndarray] = []
        start_pos = 0
        continuation = sampling_kwargs.get("continuation_latent")
        if continuation is not None:
            chunks.append(np.asarray(continuation, np.float32))
            start_pos = chunks[0].shape[1]
        for bs in block_sizes:
            prefix = np.concatenate(chunks, axis=1) if chunks else \
                np.zeros((1, 0, d.latent_size), np.float32)
            fn_key = ("sample", tuple(sorted(s.__dict__.items())),
                      len(ids), speaker_latent.shape[1], bs,
                      prefix.shape[1])
            fn = self._jit_cache.get(fn_key)
            if fn is None:
                fn = self._sampler_fn(s, bs, True)
                self._jit_cache[fn_key] = fn
            key, sub = jax.random.split(key)
            x, _ = fn(self.params, text_ids, text_mask, speaker_latent,
                      speaker_mask, jnp.asarray(prefix), start_pos, sub)
            chunks.append(np.asarray(x))
            start_pos += bs
        return np.concatenate(chunks, axis=1)

    # ----------------------------------------------------------- generate

    def generate(self, text: str, voice=None, ref_audio=None,
                 stream: bool = False, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        del voice
        if stream:
            raise NotImplementedError("Echo-TTS streaming TBD")
        cfg = self.config
        t0 = time.perf_counter()
        ids = tokenize_bytes(text, cfg.normalize_text)
        speaker_latent = speaker_mask = None
        if ref_audio is not None:
            if isinstance(ref_audio, str):
                from ....utils import load_audio

                ref_audio = np.asarray(load_audio(
                    ref_audio, sample_rate=cfg.sample_rate))
            speaker_latent, speaker_mask = self.speaker_latent_from_audio(
                np.asarray(ref_audio))
        latents = self.generate_latents(
            text, speaker_latent=speaker_latent, speaker_mask=speaker_mask,
            rng_seed=int(kwargs.pop("rng_seed", 0)),
            block_sizes=kwargs.pop("block_sizes", None), **kwargs)
        flat = self.find_flattening_point(latents[0])
        if self.fish_ae is not None and self.pca_state is not None:
            z_q = np.asarray(self._pca_decode(jnp.asarray(latents)))
            audio = np.asarray(self.fish_ae.decode_zq(z_q)).reshape(-1)
        else:
            audio = np.zeros(
                (latents.shape[1] * cfg.audio_downsample_factor,),
                np.float32)
        audio = audio[:flat * cfg.audio_downsample_factor]
        dt = max(time.perf_counter() - t0, 1e-6)
        dur = len(audio) / cfg.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=cfg.sample_rate,
            segment_idx=0, token_count=len(ids),
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3),
            prompt={"tokens": len(ids),
                    "tokens-per-sec": round(len(ids) / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb())


__all__ = ["Model", "ModelConfig", "EchoDiTConfig", "SamplerConfig",
           "normalize_text_prompt", "tokenize_bytes"]
