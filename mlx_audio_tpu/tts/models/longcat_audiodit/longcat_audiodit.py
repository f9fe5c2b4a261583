"""LongCat-AudioDiT: conditional flow-matching TTS (UMT5 + CrossDiT +
WAV-VAE).

Parity: /root/reference/mlx_audio/tts/models/longcat_audiodit/
(longcat_audiodit.py — char-count duration heuristic, prompt-latent
inpainting flow, CFG / APG (adaptive projected guidance with momentum),
streaming VAE decode with cosine crossfade; text_encoder.py — UMT5 with
per-layer relative bias, text_norm_feat + text_add_embed).

TPU design: the FULL Euler ODE (all steps, cond+uncond as one batch-2
forward, APG momentum as loop state) traces into a single jitted program
with a static t-grid; text encoding is bucketed; VAE decode compiles per
exact latent length (non-causal convs).
"""

from __future__ import annotations

import math
import re
import time as time_module
from dataclasses import dataclass, field
from typing import Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_embedding, apply_linear, init_embedding, init_linear
from ....sts.models.sam_audio.t5 import _relative_position_bucket
from ..base import GenerationResult, format_duration, peak_memory_gb
from .dit import DiTConfig, dit_forward, init_dit
from .vae import VaeConfig, init_vae, vae_decode, vae_encode

Array = jax.Array

EN_DUR_PER_CHAR = 0.082
ZH_DUR_PER_CHAR = 0.21
TEXT_BUCKETS = (32, 64, 128, 256, 512)


def _text_bucket(n: int) -> int:
    for b in TEXT_BUCKETS:
        if n <= b:
            return b
    return ((n + 127) // 128) * 128


def normalize_text(text: str) -> str:
    text = text.lower()
    text = re.sub(r'["“”‘’]', " ", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def approx_duration(text: str, max_duration: float = 30.0) -> float:
    """Char-count duration heuristic (reference longcat_audiodit.py:41)."""
    text = re.sub(r"\s+", "", text)
    num_zh = num_en = num_other = 0
    for ch in text:
        if "一" <= ch <= "鿿":
            num_zh += 1
        elif ch.isalpha():
            num_en += 1
        else:
            num_other += 1
    if num_zh > num_en:
        num_zh += num_other
    else:
        num_en += num_other
    return min(max_duration,
               num_zh * ZH_DUR_PER_CHAR + num_en * EN_DUR_PER_CHAR)


# ------------------------------------------------------------- UMT5 text

@dataclass
class TextEncoderConfig:
    vocab_size: int = 256384
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    is_gated_act: bool = True
    dense_act_fn: str = "gelu_new"


def init_umt5(key, c: TextEncoderConfig) -> dict:
    ks = iter(jax.random.split(key, 8 * c.num_layers + 8))
    inner = c.d_kv * c.num_heads
    blocks = {}
    for i in range(c.num_layers):
        attn = {"q": init_linear(next(ks), c.d_model, inner, bias=False),
                "k": init_linear(next(ks), c.d_model, inner, bias=False),
                "v": init_linear(next(ks), c.d_model, inner, bias=False),
                "o": init_linear(next(ks), inner, c.d_model, bias=False),
                # UMT5: a relative bias table in EVERY block
                "relative_attention_bias": init_embedding(
                    next(ks), c.relative_attention_num_buckets,
                    c.num_heads)}
        if c.is_gated_act:
            ff = {"wi_0": init_linear(next(ks), c.d_model, c.d_ff,
                                      bias=False),
                  "wi_1": init_linear(next(ks), c.d_model, c.d_ff,
                                      bias=False),
                  "wo": init_linear(next(ks), c.d_ff, c.d_model,
                                    bias=False)}
        else:
            ff = {"wi": init_linear(next(ks), c.d_model, c.d_ff,
                                    bias=False),
                  "wo": init_linear(next(ks), c.d_ff, c.d_model,
                                    bias=False)}
        blocks[str(i)] = {
            "SelfAttention": attn,
            "layer_norm_sa": {"weight": jnp.ones(c.d_model)},
            "DenseReluDense": ff,
            "layer_norm_ff": {"weight": jnp.ones(c.d_model)},
        }
    return {"shared": init_embedding(next(ks), c.vocab_size, c.d_model),
            "block": blocks,
            "final_layer_norm": {"weight": jnp.ones(c.d_model)}}


def _t5_ln(p, x, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
            ).astype(x.dtype) * p["weight"]


def umt5_encode(p: dict, c: TextEncoderConfig, ids: Array,
                attention_mask: Array):
    """(B, L) -> (last_hidden (B, L, d), initial_embedding (B, L, d))."""
    x = apply_embedding(p["shared"], ids)
    initial = x
    b, L = ids.shape
    h, dk = c.num_heads, c.d_kv
    pos = jnp.arange(L)
    buckets = _relative_position_bucket(
        pos[None, :] - pos[:, None], c.relative_attention_num_buckets,
        c.relative_attention_max_distance)
    pad = (1.0 - attention_mask[:, None, None, :]) * -1e9
    for i in range(c.num_layers):
        blk = p["block"][str(i)]
        a = blk["SelfAttention"]
        bias = jnp.transpose(a["relative_attention_bias"]["weight"][
            buckets], (2, 0, 1))[None] + pad
        hn = _t5_ln(blk["layer_norm_sa"], x, c.layer_norm_epsilon)
        q = apply_linear(a["q"], hn).reshape(b, L, h, dk)
        k = apply_linear(a["k"], hn).reshape(b, L, h, dk)
        v = apply_linear(a["v"], hn).reshape(b, L, h, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) + bias
        w = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, L, h * dk)
        x = x + apply_linear(a["o"], o)
        f = blk["DenseReluDense"]
        hn = _t5_ln(blk["layer_norm_ff"], x, c.layer_norm_epsilon)
        if c.is_gated_act:
            hidden = jax.nn.gelu(apply_linear(f["wi_0"], hn)) * \
                apply_linear(f["wi_1"], hn)
        else:
            hidden = jax.nn.gelu(apply_linear(f["wi"], hn))
        x = x + apply_linear(f["wo"], hidden)
    return _t5_ln(p["final_layer_norm"], x, c.layer_norm_epsilon), initial


def _ln_noaffine(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


# ------------------------------------------------------------------ config

@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "audiodit"
    dit_dim: int = 1536
    dit_depth: int = 24
    dit_heads: int = 24
    dit_ff_mult: float = 4.0
    dit_text_dim: int = 768
    dit_bias: bool = True
    dit_cross_attn: bool = True
    dit_adaln_type: str = "global"
    dit_adaln_use_text_cond: bool = True
    dit_long_skip: bool = True
    dit_text_conv: bool = True
    dit_qk_norm: bool = True
    dit_cross_attn_norm: bool = False
    dit_eps: float = 1e-6
    dit_use_latent_condition: bool = True
    repa_dit_layer: int = 8
    latent_dim: int = 64
    sigma: float = 0.0
    sampling_rate: int = 24000
    latent_hop: int = 2048
    max_wav_duration: float = 30.0
    text_encoder_model: str = "google/umt5-base"
    text_add_embed: bool = True
    text_norm_feat: bool = True
    vae_config: Optional[VaeConfig] = None
    text_encoder_config: Optional[TextEncoderConfig] = None
    model_path: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.vae_config, dict):
            self.vae_config = VaeConfig(**{
                k: v for k, v in self.vae_config.items()
                if k in VaeConfig.__dataclass_fields__})
        if self.vae_config is None:
            self.vae_config = VaeConfig()
        if isinstance(self.text_encoder_config, dict):
            self.text_encoder_config = TextEncoderConfig(**{
                k: v for k, v in self.text_encoder_config.items()
                if k in TextEncoderConfig.__dataclass_fields__})
        if self.text_encoder_config is None:
            self.text_encoder_config = TextEncoderConfig()

    @property
    def dit_config(self) -> DiTConfig:
        return DiTConfig(
            dim=self.dit_dim, depth=self.dit_depth, heads=self.dit_heads,
            ff_mult=self.dit_ff_mult, text_dim=self.dit_text_dim,
            bias=self.dit_bias, cross_attn=self.dit_cross_attn,
            adaln_type=self.dit_adaln_type,
            adaln_use_text_cond=self.dit_adaln_use_text_cond,
            long_skip=self.dit_long_skip, text_conv=self.dit_text_conv,
            qk_norm=self.dit_qk_norm,
            cross_attn_norm=self.dit_cross_attn_norm, eps=self.dit_eps,
            use_latent_condition=self.dit_use_latent_condition,
            repa_layer=self.repa_dit_layer, latent_dim=self.latent_dim)


# ------------------------------------------------------------------ model

class Model(FunctionalModel):
    """LongCat-AudioDiT flow-matching TTS."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None

    @property
    def sample_rate(self) -> int:
        return self.config.sampling_rate

    def init_params(self, key):
        cfg = self.config
        keys = jax.random.split(key, 3)
        return {"text_encoder": init_umt5(keys[0],
                                          cfg.text_encoder_config),
                "transformer": init_dit(keys[1], cfg.dit_config),
                "vae": init_vae(keys[2], cfg.vae_config)}

    # -------------------------------------------------------- encoders

    def encode_text(self, input_ids: np.ndarray,
                    attention_mask: np.ndarray) -> Array:
        """(B, L) -> conditioning (B, L, d_model) (reference :143-157)."""
        cfg = self.config
        tb = _text_bucket(input_ids.shape[1])
        ids = np.zeros((input_ids.shape[0], tb), np.int32)
        am = np.zeros((input_ids.shape[0], tb), np.float32)
        ids[:, :input_ids.shape[1]] = input_ids
        am[:, :input_ids.shape[1]] = attention_mask
        fn = self._jit_cache.get(("text", tb))
        if fn is None:
            def run(p, i, m):
                last, initial = umt5_encode(p["text_encoder"],
                                            cfg.text_encoder_config, i, m)
                if cfg.text_norm_feat:
                    last = _ln_noaffine(last)
                    initial = _ln_noaffine(initial)
                if cfg.text_add_embed:
                    last = last + initial
                return last.astype(jnp.float32)
            fn = jax.jit(run)
            self._jit_cache[("text", tb)] = fn
        return fn(self.params, jnp.asarray(ids), jnp.asarray(am)), am

    def encode_prompt_audio(self, prompt_audio: np.ndarray, seed: int = 0):
        """(L,) -> (latent (1, T, latent_dim), T) (reference :159-179)."""
        cfg = self.config
        hop = cfg.latent_hop
        off = 3
        wav = np.asarray(prompt_audio, np.float32).reshape(-1)
        if len(wav) % hop != 0:
            wav = np.pad(wav, (0, hop - len(wav) % hop))
        wav = np.pad(wav, (0, hop * off))
        fn = self._jit_cache.get(("vae_enc", len(wav)))
        if fn is None:
            fn = jax.jit(lambda p, w, k: vae_encode(
                p["vae"], cfg.vae_config, w, k))
            self._jit_cache[("vae_enc", len(wav))] = fn
        latent = fn(self.params, jnp.asarray(wav)[None, :, None],
                    jax.random.PRNGKey(seed))
        latent = latent[:, :-off] if off else latent
        return latent, latent.shape[1]

    def decode_latent(self, latent: Array) -> np.ndarray:
        cfg = self.config
        n = int(latent.shape[1])
        fn = self._jit_cache.get(("vae_dec", n))
        if fn is None:
            fn = jax.jit(lambda p, z: vae_decode(p["vae"], cfg.vae_config,
                                                 z))
            self._jit_cache[("vae_dec", n)] = fn
        return np.asarray(fn(self.params, latent))[0, :, 0]

    # ---------------------------------------------------------- sampler

    def _sampler_fn(self, total: int, prompt_dur: int, steps: int,
                    cfg_strength: float, guidance_method: str):
        cfg = self.config
        dc = cfg.dit_config
        t_steps = np.linspace(0, 1, steps)

        def run(p, text_cond, text_mask, text_len, latent_cond, key):
            b = text_cond.shape[0]
            mask = jnp.ones((b, total), bool)
            y = jax.random.normal(key, (b, total, cfg.latent_dim))
            prompt_noise = y[:, :prompt_dur] if prompt_dur else None
            running = jnp.zeros((b, total - prompt_dur, cfg.latent_dim))
            use_cfg = cfg_strength >= 1e-5

            for i in range(steps - 1):
                t_val = float(t_steps[i])
                dt = float(t_steps[i + 1] - t_steps[i])
                if prompt_dur:
                    y_prompt = prompt_noise * (1 - t_val) + \
                        latent_cond[:, :prompt_dur] * t_val
                    y = jnp.concatenate([y_prompt, y[:, prompt_dur:]],
                                        axis=1)
                if use_cfg:
                    y_null = y
                    if prompt_dur:
                        y_null = jnp.concatenate(
                            [jnp.zeros_like(y[:, :prompt_dur]),
                             y[:, prompt_dur:]], axis=1)
                    x2 = jnp.concatenate([y, y_null], axis=0)
                    text2 = jnp.concatenate(
                        [text_cond, jnp.zeros_like(text_cond)], axis=0)
                    lc2 = jnp.concatenate(
                        [latent_cond, jnp.zeros_like(latent_cond)], axis=0)
                    out2 = dit_forward(
                        p["transformer"], dc, x2,
                        text2, jnp.tile(text_len, 2),
                        jnp.full((2 * b,), t_val, jnp.float32),
                        mask=jnp.tile(mask, (2, 1)),
                        cond_mask=jnp.tile(text_mask, (2, 1)),
                        latent_cond=lc2)
                    pred, null_pred = out2[:b], out2[b:]
                    if guidance_method == "cfg":
                        pred = pred + (pred - null_pred) * cfg_strength
                    else:
                        # APG on the generated region only (ref :185-206)
                        x_s = y[:, prompt_dur:]
                        pred_s = pred[:, prompt_dur:]
                        null_s = null_pred[:, prompt_dur:]
                        p_smp = x_s + (1 - t_val) * pred_s
                        n_smp = x_s + (1 - t_val) * null_s
                        diff = p_smp - n_smp
                        running = diff + (-0.3) * running
                        d_par, d_orth = _project(running, p_smp)
                        out = p_smp + cfg_strength * (d_orth + 0.5 * d_par)
                        out = (out - x_s) / (1 - t_val)
                        pred = jnp.concatenate(
                            [pred[:, :prompt_dur], out], axis=1) \
                            if prompt_dur else out
                else:
                    pred = dit_forward(
                        p["transformer"], dc, y, text_cond, text_len,
                        jnp.full((b,), t_val, jnp.float32), mask=mask,
                        cond_mask=text_mask, latent_cond=latent_cond)
                y = y + pred * dt
            return y

        return jax.jit(run)

    # ---------------------------------------------------------- generate

    def generate(self, text: str, ref_audio=None,
                 ref_text: Optional[str] = None, steps: int = 16,
                 cfg_strength: float = 4.0, guidance_method: str = "cfg",
                 seed: int = 1024, stream: bool = False,
                 streaming_interval: float = 2.0,
                 chunk_seconds: float = 2.0, overlap_seconds: float = 0.5,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        cfg = self.config
        t0 = time_module.time()
        sr = cfg.sampling_rate
        hop = cfg.latent_hop
        if self.tokenizer is None:
            raise RuntimeError("longcat_audiodit requires a UMT5 "
                               "tokenizer; set model.tokenizer")

        text = normalize_text(text)
        no_prompt = ref_audio is None
        if not no_prompt and ref_text is not None:
            full_text = f"{normalize_text(ref_text)} {text}"
        else:
            full_text = text
        enc = self.tokenizer([full_text], padding="longest",
                             return_tensors="np")
        text_cond, am = self.encode_text(
            np.asarray(enc["input_ids"], np.int32),
            np.asarray(enc["attention_mask"], np.float32))
        text_len = jnp.asarray(am.sum(axis=1), jnp.float32)
        text_mask = jnp.asarray(am > 0)

        if not no_prompt:
            if isinstance(ref_audio, str):
                from ....utils import load_audio

                ref_audio = load_audio(ref_audio, sample_rate=sr)
            prompt_latent, prompt_dur = self.encode_prompt_audio(
                np.asarray(ref_audio), seed)
        else:
            prompt_latent, prompt_dur = None, 0

        prompt_time = prompt_dur * hop / sr
        dur_sec = approx_duration(
            text, max_duration=cfg.max_wav_duration - prompt_time)
        if not no_prompt and ref_text is not None:
            approx_pd = approx_duration(ref_text,
                                        max_duration=cfg.max_wav_duration)
            ratio = float(np.clip(prompt_time / max(approx_pd, 1e-6),
                                  1.0, 1.5))
            dur_sec *= ratio
        duration = int(dur_sec * sr // hop)
        total = min(duration + prompt_dur,
                    int(cfg.max_wav_duration * sr // hop))
        total = max(total, prompt_dur + 1)

        if prompt_dur:
            latent_cond = jnp.pad(prompt_latent,
                                  ((0, 0), (0, total - prompt_dur),
                                   (0, 0)))
        else:
            latent_cond = jnp.zeros((1, total, cfg.latent_dim))

        fn_key = ("sample", total, prompt_dur, steps, cfg_strength,
                  guidance_method, text_cond.shape[1])
        fn = self._jit_cache.get(fn_key)
        if fn is None:
            fn = self._sampler_fn(total, prompt_dur, steps, cfg_strength,
                                  guidance_method)
            self._jit_cache[fn_key] = fn
        y = fn(self.params, text_cond, text_mask, text_len, latent_cond,
               jax.random.PRNGKey(seed))
        pred_latent = y[:, prompt_dur:] if prompt_dur else y

        if stream:
            cs = streaming_interval if streaming_interval != 2.0 else \
                chunk_seconds
            yield from self._stream_decode(pred_latent, sr, t0, cs,
                                           overlap_seconds)
            return

        audio = self.decode_latent(pred_latent)
        dt = max(time_module.time() - t0, 1e-6)
        dur = len(audio) / sr
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=sr,
            segment_idx=0, token_count=int(pred_latent.shape[1]),
            audio_duration=format_duration(dur),
            # reference reports processing/audio (longcat_audiodit.py:268)
            real_time_factor=round(dt / max(dur, 1e-6), 3),
            prompt={"tokens": int(pred_latent.shape[1]),
                    "tokens-per-sec": round(pred_latent.shape[1] / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb())

    def _stream_decode(self, pred_latent: Array, sr: int,
                       start_time: float, chunk_seconds: float = 2.0,
                       overlap_seconds: float = 0.5
                       ) -> Generator[GenerationResult, None, None]:
        """Overlapped VAE decode with cosine crossfade (ref :183-266)."""
        cfg = self.config
        ratio = cfg.vae_config.downsampling_ratio
        chunk_frames = max(1, int(chunk_seconds * sr / ratio))
        overlap_frames = max(0, int(overlap_seconds * sr / ratio))
        hop_frames = max(1, chunk_frames - overlap_frames)
        overlap_samples = overlap_frames * ratio
        context_frames = overlap_frames
        total = int(pred_latent.shape[1])
        prev_tail = None
        chunk_idx = 0
        cum = 0
        start = 0
        while start < total:
            end = min(start + chunk_frames, total)
            is_last = end >= total
            lctx = min(context_frames, start)
            rctx = min(context_frames, total - end)
            audio_full = self.decode_latent(
                pred_latent[:, start - lctx:end + rctx])
            rt = rctx * ratio
            chunk = audio_full[lctx * ratio:len(audio_full) - rt] if rt \
                else audio_full[lctx * ratio:]
            if prev_tail is not None and overlap_samples > 0:
                ol = min(overlap_samples, len(prev_tail), len(chunk))
                fade_in = 0.5 * (1 - np.cos(np.pi * np.linspace(0, 1, ol)))
                blended = prev_tail[:ol] * (1 - fade_in) + \
                    chunk[:ol] * fade_in
                if is_last:
                    out = np.concatenate([blended, chunk[ol:]])
                else:
                    out = np.concatenate(
                        [blended, chunk[ol:-overlap_samples]])
                    prev_tail = chunk[-overlap_samples:]
            else:
                if is_last or overlap_frames == 0:
                    out = chunk
                else:
                    out = chunk[:-overlap_samples]
                    prev_tail = chunk[-overlap_samples:]
            cum += len(out)
            dt = max(time_module.time() - start_time, 1e-6)
            dur = cum / sr
            yield GenerationResult(
                audio=out, samples=len(out), sample_rate=sr,
                segment_idx=chunk_idx, token_count=0,
                audio_duration=format_duration(dur),
                real_time_factor=round(dt / max(dur, 1e-6), 3),
                prompt={"tokens": 0, "tokens-per-sec": 0},
                audio_samples={"samples": len(out),
                               "samples-per-sec": round(len(out) / dt, 2)},
                processing_time_seconds=dt,
                peak_memory_usage=peak_memory_gb(),
                is_streaming_chunk=True, is_final_chunk=is_last)
            chunk_idx += 1
            start += hop_frames

    # ---------------------------------------------------------- loading

    def post_load_hook(self, model_path):
        import warnings

        try:
            from transformers import AutoTokenizer

            try:
                self.tokenizer = AutoTokenizer.from_pretrained(
                    str(model_path))
            except Exception:
                self.tokenizer = AutoTokenizer.from_pretrained(
                    self.config.text_encoder_model)
        except Exception as e:  # pragma: no cover - env dependent
            warnings.warn(f"Could not load UMT5 tokenizer: {e}")
        return self

    def sanitize(self, weights):
        from ....nn.layers import convert_torch_conv_transpose_weight

        out = {}
        gs = {k: v for k, v in weights.items() if k.endswith(".weight_g")}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k.endswith(".weight_g"):
                continue
            if k.endswith(".weight_v"):
                base = k[:-len(".weight_v")]
                g = gs.get(base + ".weight_g")
                is_ct = bool(re.search(
                    r"vae\.decoder\.layers\.\d+\.layers\.1\.weight", k))
                vv = np.asarray(v, np.float64)
                norm = np.sqrt((vv * vv).sum(axis=(1, 2), keepdims=True)
                               + 1e-12)
                w = vv / norm
                if g is not None:
                    w = w * np.asarray(g, np.float64)
                w = jnp.asarray(w, jnp.float32)
                if is_ct:
                    # torch ConvTranspose1d (in, out, K)
                    w = convert_torch_conv_transpose_weight(w)
                else:
                    # torch Conv1d (out, in, K) -> WIO
                    w = jnp.transpose(w, (2, 1, 0))
                out[base + ".weight"] = w
                continue
            k = k.replace("text_encoder.encoder.embed_tokens.",
                          "text_encoder.shared.")
            k = re.sub(r"text_encoder\.encoder\.block\.(\d+)\.layer\.0\."
                       r"SelfAttention\.",
                       r"text_encoder.block.\1.SelfAttention.", k)
            k = re.sub(r"text_encoder\.encoder\.block\.(\d+)\.layer\.0\."
                       r"layer_norm\.",
                       r"text_encoder.block.\1.layer_norm_sa.", k)
            k = re.sub(r"text_encoder\.encoder\.block\.(\d+)\.layer\.1\."
                       r"DenseReluDense\.",
                       r"text_encoder.block.\1.DenseReluDense.", k)
            k = re.sub(r"text_encoder\.encoder\.block\.(\d+)\.layer\.1\."
                       r"layer_norm\.",
                       r"text_encoder.block.\1.layer_norm_ff.", k)
            k = k.replace("text_encoder.encoder.final_layer_norm.",
                          "text_encoder.final_layer_norm.")
            k = re.sub(r"\.proj\.2\.", ".proj.1.", k)
            k = re.sub(r"\.time_mlp\.2\.", ".time_mlp.1.", k)
            k = re.sub(r"\.mlp\.1\.", ".mlp.0.", k)
            k = re.sub(r"\.to_out\.0\.", ".to_out.", k)
            k = re.sub(r"\.ff\.3\.", ".ff.1.", k)
            if "dwconv.weight" in k and v.ndim == 3:
                # torch depthwise (dim, 1, K) -> WIO (K, 1, dim)
                v = jnp.transpose(v, (2, 1, 0))
                k = k.replace(".dwconv.weight", ".dwconv_weight")
            elif "dwconv.bias" in k:
                k = k.replace(".dwconv.bias", ".dwconv_bias")
            elif k.startswith("vae.") and k.endswith(".weight") and \
                    v.ndim == 3:
                v = jnp.transpose(v, (2, 1, 0))
            out[k] = v
        return out


def _project(v0: Array, v1: Array):
    v0 = v0.astype(jnp.float32)
    v1 = v1.astype(jnp.float32)
    v1n = v1 / (jnp.sqrt(jnp.sum(v1 * v1, axis=(-1, -2), keepdims=True))
                + 1e-8)
    par = jnp.sum(v0 * v1n, axis=(-1, -2), keepdims=True) * v1n
    return par, v0 - par


__all__ = ["Model", "ModelConfig", "TextEncoderConfig", "VaeConfig",
           "approx_duration", "normalize_text", "umt5_encode",
           "init_umt5"]
