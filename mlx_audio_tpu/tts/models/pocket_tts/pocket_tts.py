"""Pocket-TTS: streaming flow-matching TTS (the voice_pipeline TTS engine).

Parity: /root/reference/mlx_audio/tts/models/pocket_tts/
(FlowLMModel flow_lm.py:28 — LSD flow decode :15, SimpleMLPAdaLN mlp.py:128,
StreamingTransformer transformer.py:103 w/ interleaved-pair RoPE rope.py:7,
LUT text conditioner conditioners.py:34, MimiAdapter mimi.py:52, Model
pocket_tts.py:28 — voice-prompt state :144, sentence streaming :179-233,
text prep :472-543).

TPU design:
* One jitted frame step runs the whole per-frame pipeline — transformer
  step over a fixed-capacity KV cache, EOS head, and the N-step LSD flow
  unrolled statically (num steps is config-static).
* The voice prompt (mimi latents -> speaker_proj) and text prefill are one
  bucketed jitted prefill over the same cache.
* Audio comes out of the shared Mimi streaming latent decoder
  (codec/models/mimi decode_latent_step) — explicit-state, fully compiled.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache, kv_update
from ..base import GenerationResult, format_duration, peak_memory_gb

Array = jax.Array

DEFAULT_TEMPERATURE = 0.7
DEFAULT_LSD_DECODE_STEPS = 2
DEFAULT_NOISE_CLAMP = 5.0
DEFAULT_EOS_THRESHOLD = -4.0
MAX_FRAMES = 1024
PREFILL_BUCKETS = (16, 32, 64, 128, 256, 512)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


# ----------------------------------------------------------------- configs

@dataclass
class FlowLMConfig(BaseModelArgs):
    dim: int = 1024           # transformer d_model
    num_heads: int = 16
    num_layers: int = 12
    hidden_scale: int = 4
    max_period: float = 10000.0
    flow_dim: int = 1024      # flow net width
    flow_depth: int = 6
    lut_n_bins: int = 8000
    lut_dim: int = 1024

    @classmethod
    def from_reference_dict(cls, d: dict) -> "FlowLMConfig":
        t = d.get("transformer", {})
        f = d.get("flow", {})
        lut = d.get("lookup_table", {})
        return cls(
            dim=t.get("d_model", 1024), num_heads=t.get("num_heads", 16),
            num_layers=t.get("num_layers", 12),
            hidden_scale=t.get("hidden_scale", 4),
            max_period=float(t.get("max_period", 10000.0)),
            flow_dim=f.get("dim", 1024), flow_depth=f.get("depth", 6),
            lut_n_bins=lut.get("n_bins", 8000),
            lut_dim=lut.get("dim", 1024))


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "pocket_tts"
    flow_lm: dict = field(default_factory=dict)
    mimi: dict = field(default_factory=dict)
    sample_rate: int = 24000
    model_path: str = ""

    def __post_init__(self):
        self.flow_cfg = FlowLMConfig.from_reference_dict(self.flow_lm or {})
        m = self.mimi or {}
        self.latent_dim = m.get("quantizer", {}).get("dimension", 512)
        self.mimi_output_dim = m.get("quantizer", {}).get(
            "output_dimension", 512)
        if m.get("sample_rate"):
            self.sample_rate = m["sample_rate"]

    def mimi_config(self):
        from ....codec.models.mimi.mimi import MimiConfig

        m = self.mimi or {}
        s = m.get("seanet", {})
        t = m.get("transformer", {})
        return MimiConfig(
            channels=m.get("channels", 1),
            sample_rate=m.get("sample_rate", 24000),
            frame_rate=m.get("frame_rate", 12.5),
            seanet=dict(
                dimension=s.get("dimension", 512),
                channels=s.get("channels", 1),
                nfilters=s.get("n_filters", 64),
                nresidual_layers=s.get("n_residual_layers", 1),
                ratios=s.get("ratios", [8, 6, 5, 4]),
                ksize=s.get("kernel_size", 7),
                residual_ksize=s.get("residual_kernel_size", 3),
                last_ksize=s.get("last_kernel_size", 3),
                dilation_base=s.get("dilation_base", 2),
                pad_mode=s.get("pad_mode", "constant"),
                compress=s.get("compress", 2)),
            transformer=dict(
                d_model=t.get("d_model", 512),
                num_heads=t.get("num_heads", 8),
                num_layers=t.get("num_layers", 8),
                layer_scale=t.get("layer_scale", 0.01),
                context=t.get("context", 250),
                max_period=float(t.get("max_period", 10000.0)),
                dim_feedforward=t.get("dim_feedforward", 2048)),
            quantizer_nq=1,
            quantizer_bins=16,
            quantizer_dim=self.latent_dim,
        )


# ------------------------------------------------------- flow-lm components

def _rope_interleaved(x: Array, offset, max_period: float) -> Array:
    """Interleaved-pair RoPE (reference rope.py:7-39). x (B, T, H, D)."""
    b, t, h, d = x.shape
    half = d // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-math.log(max_period) * 2 / d))
    ts = (jnp.arange(t, dtype=jnp.float32) + offset)[None, :, None, None]
    xr = x.reshape(b, t, h, half, 2)
    re, im = xr[..., 0].astype(jnp.float32), xr[..., 1].astype(jnp.float32)
    c, s = jnp.cos(freqs * ts), jnp.sin(freqs * ts)
    out = jnp.stack([re * c - im * s, re * s + im * c], axis=-1)
    return out.reshape(b, t, h, d).astype(x.dtype)


def init_streaming_transformer(key, cfg: FlowLMConfig) -> dict:
    ks = iter(jax.random.split(key, 8 * cfg.num_layers))
    ff = int(cfg.hidden_scale * cfg.dim)
    return {"layers": {str(i): {
        "self_attn": {
            "in_proj": init_linear(next(ks), cfg.dim, 3 * cfg.dim,
                                   bias=False),
            "out_proj": init_linear(next(ks), cfg.dim, cfg.dim, bias=False)},
        "norm1": init_layer_norm(cfg.dim),
        "norm2": init_layer_norm(cfg.dim),
        "linear1": init_linear(next(ks), cfg.dim, ff, bias=False),
        "linear2": init_linear(next(ks), ff, cfg.dim, bias=False),
    } for i in range(cfg.num_layers)}}


def streaming_transformer(p: dict, cfg: FlowLMConfig, x: Array,
                          caches: List[KVCache], offset
                          ) -> Tuple[Array, List[KVCache]]:
    b, t, d = x.shape
    h = cfg.num_heads
    hd = d // h
    new_caches = []
    for i in range(cfg.num_layers):
        lp = p["layers"][str(i)]
        hn = apply_layer_norm(lp["norm1"], x)
        qkv = apply_linear(lp["self_attn"]["in_proj"], hn)
        qkv = qkv.reshape(b, t, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _rope_interleaved(q, offset, cfg.max_period)
        k = _rope_interleaved(k, offset, cfg.max_period)
        cache = kv_update(caches[i], k, v, offset)
        new_caches.append(cache)
        slen = cache.k.shape[1]
        pos_s = jnp.arange(slen)[None, None, None, :]
        causal = pos_s <= (offset + jnp.arange(t))[None, None, :, None]
        mask = jnp.where(causal, 0.0, -jnp.inf)
        o = attention(q, cache.k, cache.v, mask=mask)
        x = x + apply_linear(lp["self_attn"]["out_proj"],
                             o.reshape(b, t, d))
        hn = apply_layer_norm(lp["norm2"], x)
        x = x + apply_linear(lp["linear2"],
                             jax.nn.gelu(apply_linear(lp["linear1"], hn)))
    return x, new_caches


def init_timestep_embedder(key, hidden: int, freq_size: int = 256) -> dict:
    k1, k2 = jax.random.split(key)
    return {"mlp": {"0": init_linear(k1, freq_size, hidden),
                    "2": init_linear(k2, hidden, hidden),
                    "3": {"alpha": jnp.ones((hidden,))}}}


def timestep_embed(p: dict, t: Array, hidden: int, freq_size: int = 256,
                   max_period: float = 10000.0) -> Array:
    half = freq_size // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    if t.ndim == 1:
        t = t[:, None]
    args = t.astype(jnp.float32) * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    h = jax.nn.silu(apply_linear(p["mlp"]["0"], emb))
    h = apply_linear(p["mlp"]["2"], h)
    # torch-style RMSNorm with ddof=1 variance (reference mlp.py:13-18)
    var = 1e-5 + jnp.var(h.astype(jnp.float32), axis=-1, keepdims=True,
                         ddof=1)
    return (h * p["mlp"]["3"]["alpha"] * jax.lax.rsqrt(var)).astype(h.dtype)


def init_flow_net(key, in_ch: int, model_ch: int, cond_ch: int,
                  depth: int) -> dict:
    ks = iter(jax.random.split(key, 8 + 6 * depth))
    p = {
        "time_embed": {"0": init_timestep_embedder(next(ks), model_ch),
                       "1": init_timestep_embedder(next(ks), model_ch)},
        "cond_embed": init_linear(next(ks), cond_ch, model_ch),
        "input_proj": init_linear(next(ks), in_ch, model_ch),
        "res_blocks": {},
        "final_layer": {
            "linear": init_linear(next(ks), model_ch, in_ch),
            "adaLN_modulation": {"1": init_linear(next(ks), model_ch,
                                                  2 * model_ch)}},
    }
    for i in range(depth):
        p["res_blocks"][str(i)] = {
            "in_ln": init_layer_norm(model_ch),
            "mlp": {"0": init_linear(next(ks), model_ch, model_ch),
                    "2": init_linear(next(ks), model_ch, model_ch)},
            "adaLN_modulation": {"1": init_linear(next(ks), model_ch,
                                                  3 * model_ch)},
        }
    return p


def flow_net_forward(p: dict, c: Array, s: Array, t: Array, x: Array,
                     model_ch: int) -> Array:
    """SimpleMLPAdaLN (reference mlp.py:128-186): c cond (B, C), s/t times
    (B, 1), x noisy latent (B, ldim)."""
    x = apply_linear(p["input_proj"], x)
    tc = (timestep_embed(p["time_embed"]["0"], s, model_ch)
          + timestep_embed(p["time_embed"]["1"], t, model_ch)) / 2.0
    y = tc + apply_linear(p["cond_embed"], c)
    for i in range(len(p["res_blocks"])):
        bp = p["res_blocks"][str(i)]
        mod = apply_linear(bp["adaLN_modulation"]["1"], jax.nn.silu(y))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        h = apply_layer_norm(bp["in_ln"], x) * (1 + scale) + shift
        h = apply_linear(bp["mlp"]["2"],
                         jax.nn.silu(apply_linear(bp["mlp"]["0"], h)))
        x = x + gate * h
    fl = p["final_layer"]
    mod = apply_linear(fl["adaLN_modulation"]["1"], jax.nn.silu(y))
    shift, scale = jnp.split(mod, 2, axis=-1)
    mean = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    xn = ((x - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
    return apply_linear(fl["linear"], xn * (1 + scale) + shift)


# -------------------------------------------------------------------- model

class Model(FunctionalModel):
    """Pocket-TTS (flow-matching streaming TTS with voice cloning)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.temp = DEFAULT_TEMPERATURE
        self.lsd_decode_steps = DEFAULT_LSD_DECODE_STEPS
        self.noise_clamp = DEFAULT_NOISE_CLAMP
        self.eos_threshold = DEFAULT_EOS_THRESHOLD
        self.tokenizer = None
        self._mimi = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def frame_rate(self) -> float:
        return (self.mimi_model().config.frame_rate
                if self.params else 12.5)

    def mimi_model(self):
        if self._mimi is None:
            from ....codec.models.mimi.mimi import Mimi

            self._mimi = Mimi(self.config.mimi_config())
            self._mimi.bind(self.params["mimi"])
        return self._mimi

    def init_params(self, key):
        cfg = self.config
        f = cfg.flow_cfg
        ks = iter(jax.random.split(key, 16))
        from ....codec.models.mimi.mimi import Mimi

        flow_lm = {
            "conditioner": {"embed": init_embedding(
                next(ks), f.lut_n_bins + 1, f.lut_dim)},
            "transformer": init_streaming_transformer(next(ks), f),
            "flow_net": init_flow_net(next(ks), cfg.latent_dim, f.flow_dim,
                                      f.dim, f.flow_depth),
            "input_linear": init_linear(next(ks), cfg.latent_dim, f.dim,
                                        bias=False),
            "out_norm": init_layer_norm(f.dim),
            "out_eos": init_linear(next(ks), f.dim, 1),
            "emb_std": jnp.ones((cfg.latent_dim,)),
            "emb_mean": jnp.zeros((cfg.latent_dim,)),
            "bos_emb": jax.random.normal(next(ks), (cfg.latent_dim,)),
        }
        if f.lut_dim != f.dim:
            flow_lm["conditioner"]["output_proj"] = init_linear(
                next(ks), f.lut_dim, f.dim, bias=False)
        return {
            "flow_lm": flow_lm,
            "mimi": Mimi(cfg.mimi_config()).init_params(next(ks)),
            "speaker_proj_weight": jnp.zeros((f.dim, cfg.mimi_output_dim)),
        }

    # ---------------------------------------------------------- compiled

    def _init_caches(self) -> List[KVCache]:
        f = self.config.flow_cfg
        return [KVCache.init(1, MAX_FRAMES, f.num_heads,
                             f.dim // f.num_heads, jnp.float32)
                for _ in range(f.num_layers)]

    def _prefill_fn(self, tb: int):
        f = self.config.flow_cfg

        def prefill(params, embeds, n, caches, offset):
            # mask-pad: positions >= n are garbage — later queries must not
            # see them; write them but mark via big negative k? Instead we
            # rely on offset bookkeeping: caller advances offset by n only,
            # and subsequent writes overwrite the padded region.
            _, caches = streaming_transformer(
                params["flow_lm"]["transformer"], f, embeds, caches, offset)
            return caches

        return jax.jit(prefill)

    def _frame_fn(self, lsd_steps: int, temp: float, noise_clamp,
                  eos_threshold: float):
        cfg = self.config
        f = cfg.flow_cfg

        def frame(params, caches, offset, prev_latent, use_bos, key):
            lm = params["flow_lm"]
            seq = jnp.where(use_bos, lm["bos_emb"][None, None, :],
                            prev_latent)
            x = apply_linear(lm["input_linear"], seq)
            out, caches = streaming_transformer(lm["transformer"], f, x,
                                                caches, offset)
            out = apply_layer_norm(lm["out_norm"], out)[:, -1]
            out = out.astype(jnp.float32)
            is_eos = apply_linear(lm["out_eos"], out)[:, 0] > eos_threshold
            noise = jax.random.normal(key, (1, cfg.latent_dim)) \
                * (temp ** 0.5)
            if noise_clamp is not None:
                noise = jnp.clip(noise, -noise_clamp, noise_clamp)
            cur = noise
            for i in range(lsd_steps):
                s = jnp.full((1, 1), i / lsd_steps)
                t = jnp.full((1, 1), (i + 1) / lsd_steps)
                cur = cur + flow_net_forward(lm["flow_net"], out, s, t, cur,
                                             f.flow_dim) / lsd_steps
            return cur[:, None, :], is_eos, caches

        return jax.jit(frame)

    # ------------------------------------------------------------- prompt

    def _text_embeds(self, tokens: np.ndarray) -> Array:
        lm = self.params["flow_lm"]
        e = apply_embedding(lm["conditioner"]["embed"],
                            jnp.asarray(tokens).reshape(1, -1))
        if "output_proj" in lm["conditioner"]:
            e = apply_linear(lm["conditioner"]["output_proj"], e)
        return e

    def encode_voice_prompt(self, audio) -> Array:
        """Reference audio -> conditioning frames (1, F, d_model)."""
        audio = np.asarray(audio, np.float32).reshape(1, -1)
        latents = self.mimi_model().encode_to_latent(audio)  # (1, F, D)
        return latents @ self.params["speaker_proj_weight"].T

    def get_state_for_audio_prompt(self, audio) -> Dict[str, Any]:
        """Build the reusable voice-prompt transformer state."""
        if isinstance(audio, (str, Path)):
            from ....utils import load_audio

            audio = np.asarray(load_audio(str(audio),
                                          sample_rate=self.sample_rate))
        cond = self.encode_voice_prompt(audio)
        caches = self._init_caches()
        n = cond.shape[1]
        tb = _bucket(n, PREFILL_BUCKETS)
        cond = jnp.pad(cond, ((0, 0), (0, tb - n), (0, 0)))
        fn = self._jit_cache.setdefault(("prefill", tb), self._prefill_fn(tb))
        caches = fn(self.params, cond, jnp.int32(n), caches, jnp.int32(0))
        return {"caches": caches, "prompt_frames": int(n), "offset": int(n)}

    # ----------------------------------------------------------- generate

    def generate_audio_stream(self, model_state, text_to_generate: str,
                              frames_after_eos: Optional[int] = None,
                              seed: int = 0) -> Iterable[np.ndarray]:
        if self.tokenizer is None:
            raise ValueError("pocket_tts text tokenizer not loaded")
        mimi = self.mimi_model()
        prompt_frames = model_state["prompt_frames"]
        for chunk in split_into_best_sentences(self.tokenizer,
                                               text_to_generate):
            model_state["offset"] = prompt_frames  # slice back to prompt
            _, guess = prepare_text_prompt(chunk)
            fae = frames_after_eos if frames_after_eos is not None \
                else guess + 2
            yield from self._stream_short_text(model_state, chunk, fae, seed)

    def _stream_short_text(self, model_state, text: str,
                           frames_after_eos: int, seed: int
                           ) -> Iterable[np.ndarray]:
        cfg = self.config
        mimi = self.mimi_model()
        dec_state = mimi.init_decode_stream_state(batch=1)
        max_gen = int((len(text.split()) * 1 + 2.0) * mimi.config.frame_rate)

        tokens = np.asarray(self.tokenizer.encode(text), np.int32)
        embeds = self._text_embeds(tokens)
        n = embeds.shape[1]
        tb = _bucket(n, PREFILL_BUCKETS)
        embeds = jnp.pad(embeds, ((0, 0), (0, tb - n), (0, 0)))
        pf = self._jit_cache.setdefault(("prefill", tb), self._prefill_fn(tb))
        caches = pf(self.params, embeds, jnp.int32(n), model_state["caches"],
                    jnp.int32(model_state["offset"]))
        offset = model_state["offset"] + n

        frame = self._jit_cache.get(("frame", self.lsd_decode_steps,
                                     self.temp, self.noise_clamp,
                                     self.eos_threshold))
        if frame is None:
            frame = self._frame_fn(self.lsd_decode_steps, self.temp,
                                   self.noise_clamp, self.eos_threshold)
            self._jit_cache[("frame", self.lsd_decode_steps, self.temp,
                             self.noise_clamp, self.eos_threshold)] = frame
        dec_fn = self._jit_cache.get("latent_decode")
        if dec_fn is None:
            dec_fn = jax.jit(lambda st, lat: mimi.decode_latent_step(
                st, lat))
            self._jit_cache["latent_decode"] = dec_fn

        key = jax.random.PRNGKey(seed)
        prev = jnp.zeros((1, 1, cfg.latent_dim))
        use_bos = jnp.bool_(True)
        eos_step = None
        lm = self.params["flow_lm"]
        for step in range(max_gen):
            key, k = jax.random.split(key)
            latent, is_eos, caches = frame(self.params, caches,
                                           jnp.int32(offset), prev, use_bos,
                                           k)
            offset += 1
            if bool(np.asarray(is_eos)[0]) and eos_step is None:
                eos_step = step
            if eos_step is not None and step >= eos_step + frames_after_eos:
                break
            dec_in = latent * lm["emb_std"] + lm["emb_mean"]
            q = jnp.einsum("btd,xdo->bto", dec_in, self._qproj_weight())
            dec_state, audio = dec_fn(dec_state, q)
            yield np.asarray(audio[0, 0])
            prev = latent
            use_bos = jnp.bool_(False)
        model_state["caches"] = caches
        model_state["offset"] = offset

    def _qproj_weight(self) -> Array:
        """DummyQuantizer output_proj (checkpoint key
        mimi.quantizer.output_proj; random init uses the rvq_first slot)."""
        q = self.params["mimi"]["quantizer"]
        if "output_proj" in q:
            return q["output_proj"]["weight"]
        return q["rvq_first"]["output_proj"]["weight"]

    def generate(self, text: str, voice: Optional[str] = None,
                 ref_audio=None, temperature: Optional[float] = None,
                 stream: bool = False, streaming_interval: float = 2.0,
                 frames_after_eos: Optional[int] = None, seed: int = 0,
                 verbose: bool = False, **kwargs
                 ) -> Iterable[GenerationResult]:
        if ref_audio is None and voice is not None and \
                Path(str(voice)).exists():
            ref_audio = voice
        if ref_audio is None:
            ref_audio = np.zeros(int(0.5 * self.sample_rate), np.float32)
        if isinstance(ref_audio, (str, Path)):
            from ....utils import load_audio

            ref_audio = np.asarray(load_audio(
                str(ref_audio), sample_rate=self.sample_rate))
        model_state = self.get_state_for_audio_prompt(ref_audio)
        if temperature is not None:
            self.temp = temperature
        for k in ("lsd_decode_steps", "noise_clamp", "eos_threshold"):
            if kwargs.get(k) is not None:
                setattr(self, k, kwargs[k])

        token_count = len(text.split())
        interval = max(int(streaming_interval * self.sample_rate), 1)
        buf: List[np.ndarray] = []
        buffered = 0
        seg = 0
        t0 = time.perf_counter()
        for chunk in self.generate_audio_stream(model_state, text,
                                                frames_after_eos, seed):
            buf.append(chunk)
            buffered += len(chunk)
            if stream and buffered >= interval:
                audio = np.concatenate(buf)
                yield self._result(audio, seg, token_count,
                                   time.perf_counter() - t0, streaming=True)
                buf, buffered, seg = [], 0, seg + 1
                t0 = time.perf_counter()
        if buf or not stream:
            audio = np.concatenate(buf) if buf else np.zeros(
                (0,), np.float32)
            yield self._result(audio, seg, token_count,
                               time.perf_counter() - t0, streaming=stream,
                               final=True)

    def _result(self, audio, seg, token_count, dt, streaming=False,
                final=False) -> GenerationResult:
        dur = len(audio) / self.sample_rate
        return GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=seg, token_count=token_count,
            audio_duration=format_duration(dur),
            # reference reports audio/elapsed (pocket_tts.py:443-444)
            real_time_factor=round(dur / dt, 3) if dt > 0 else 0.0,
            prompt={"tokens": token_count,
                    "tokens-per-sec": round(token_count / dt, 2)
                    if dt > 0 else 0},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)
                           if dt > 0 else 0},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb(),
            is_streaming_chunk=streaming, is_final_chunk=final)

    # ------------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """Reference (MLX) / torch checkpoint keys -> our tree."""
        from ....codec.models.mimi.mimi import Mimi

        mimi = Mimi(self.config.mimi_config())
        mimi_w = {}
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k.startswith("mimi."):
                mimi_w[k[len("mimi."):]] = v
                continue
            k = k.replace("flow_lm.transformer.", "flow_lm.transformer.")
            if k.endswith("speaker_proj_weight"):
                out["speaker_proj_weight"] = v
                continue
            # flow-net inner list-module names: mlp.0/mlp.2 linear, mlp.3 rms
            out[k] = v
        for k, v in mimi.sanitize(mimi_w).items():
            out[f"mimi.{k}"] = v
        return out

    @classmethod
    def post_load_hook(cls, model: "Model", model_path) -> "Model":
        model_path = Path(model_path)
        for name in ("tokenizer.model", "spm.model"):
            f = model_path / name
            if f.exists():
                try:
                    import sentencepiece as spm

                    sp = spm.SentencePieceProcessor()
                    sp.load(str(f))
                    model.tokenizer = _SpTokenizer(sp)
                    return model
                except Exception:
                    pass
        tokens = model_path / "tokens.json"
        if tokens.exists():
            import json

            model.tokenizer = _PieceTokenizer(
                json.loads(tokens.read_text()))
        return model


class _SpTokenizer:
    def __init__(self, sp):
        self.sp = sp

    def encode(self, text):
        return self.sp.encode(text, out_type=int)

    def decode(self, ids):
        return self.sp.decode(ids)


class _PieceTokenizer:
    """Piece-list fallback (decode-only checkpoints ship tokens.json)."""

    def __init__(self, pieces: List[str]):
        self.pieces = pieces
        self.t2i = {p: i for i, p in enumerate(pieces)}

    def encode(self, text):
        # greedy longest-piece encode over the raw characters
        ids, i = [], 0
        while i < len(text):
            best = None
            for ln in range(min(12, len(text) - i), 0, -1):
                cand = "▁" + text[i:i + ln] if (i == 0 or
                                                     text[i - 1] == " ") \
                    else text[i:i + ln]
                if cand in self.t2i:
                    best = (ln, self.t2i[cand])
                    break
            if best is None:
                i += 1
                continue
            ids.append(best[1])
            i += best[0]
        return ids or [0]

    def decode(self, ids):
        return "".join(self.pieces[i] for i in ids
                       if 0 <= i < len(self.pieces)).replace("▁",
                                                             " ").strip()


# ------------------------------------------------------------ text helpers

def prepare_text_prompt(text: str) -> Tuple[str, int]:
    """Normalize text + guess frames_after_eos (reference :472-493)."""
    text = text.strip()
    if text == "":
        raise ValueError("Text prompt cannot be empty")
    text = text.replace("\n", " ").replace("\r", " ").replace("  ", " ")
    guess = 3 if len(text.split()) <= 4 else 1
    if not text[0].isupper():
        text = text[0].upper() + text[1:]
    if text[-1].isalnum():
        text = text + "."
    if len(text.split()) < 5:
        text = " " * 8 + text
    return text, guess


def split_into_best_sentences(tokenizer, text: str,
                              max_tokens: int = 50) -> List[str]:
    """Sentence packing to <=50-token chunks (reference :495-543), with a
    punctuation-based fallback when the tokenizer can't round-trip."""
    text, _ = prepare_text_prompt(text)
    text = text.strip()
    import re

    sentences = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text)
                 if s.strip()]
    chunks: List[str] = []
    cur, cur_n = "", 0
    for s in sentences:
        n = len(tokenizer.encode(s))
        if not cur:
            cur, cur_n = s, n
        elif cur_n + n > max_tokens:
            chunks.append(cur)
            cur, cur_n = s, n
        else:
            cur, cur_n = cur + " " + s, cur_n + n
    if cur:
        chunks.append(cur)
    return chunks


__all__ = ["Model", "ModelConfig", "prepare_text_prompt",
           "split_into_best_sentences"]
