"""Irodori-TTS: Japanese rectified-flow DiT TTS over Semantic-DACVAE.

Parity: /root/reference/mlx_audio/tts/models/irodori_tts/irodori_tts.py —
DACVAE reference encode/decode, duration prediction or manual seconds,
silence-point trim (Echo-style heuristic), caption ("Voice Design") and
dual conditioning modes.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ..base import GenerationResult, format_duration, peak_memory_gb
from .duration import build_duration_features
from .model import (
    IrodoriDiTConfig,
    SamplerConfig,
    build_kv_caches,
    dit_forward,
    encode_caption_state,
    encode_speaker_state,
    encode_text_state,
    init_irodori,
    predict_duration_log_frames,
)
from .text import encode_text, normalize_text

Array = jax.Array


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "irodori_tts"
    sample_rate: int = 48000
    max_text_length: int = 256
    max_caption_length: int = 512
    max_speaker_latent_length: int = 6400
    audio_downsample_factor: int = 1920
    dacvae_repo: str = "Aratako/Semantic-DACVAE-Japanese-32dim"
    model_path: Optional[str] = None
    dit: IrodoriDiTConfig = field(default_factory=IrodoriDiTConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)

    def __post_init__(self):
        if isinstance(self.dit, dict):
            self.dit = IrodoriDiTConfig.from_dict(self.dit)
        if isinstance(self.sampler, dict):
            self.sampler = SamplerConfig.from_dict(self.sampler)


def find_silence_point(latent: np.ndarray, window: int = 20,
                       std_threshold: float = 0.05) -> int:
    padded = np.concatenate(
        [latent, np.zeros((window, latent.shape[-1]), latent.dtype)])
    for i in range(padded.shape[0] - window):
        w = padded[i:i + window]
        if w.std() < std_threshold and abs(w.mean()) < 0.1:
            return i
    return latent.shape[0]


class Model(FunctionalModel):
    """Irodori-TTS (v1 speaker / v2 semantic / v3 VoiceDesign)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.dacvae = None
        self.tokenizer = None
        self.caption_tokenizer = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_irodori(key, self.config.dit)

    def sanitize(self, weights):
        out = {}
        for k, v in weights.items():
            if k.startswith("cond_module."):
                parts = k.split(".")
                if len(parts) > 1 and parts[1].isdigit():
                    k = ".".join(["cond_module", "layers", *parts[1:]])
            if k.startswith("model."):
                k = k[len("model."):]
            out[k] = jnp.asarray(v)
        return out

    # ----------------------------------------------------------- text

    def _prepare_text(self, text: str, max_length: Optional[int] = None):
        if self.tokenizer is None:
            raise ValueError("irodori_tts requires a text tokenizer")
        return encode_text(normalize_text(text), self.tokenizer,
                           max_length or self.config.max_text_length,
                           add_bos=self.config.dit.text_add_bos)

    def _prepare_caption(self, caption: str):
        tok = self.caption_tokenizer or self.tokenizer
        add_bos = self.config.dit.caption_add_bos
        if add_bos is None:
            add_bos = self.config.dit.text_add_bos
        return encode_text(caption, tok, self.config.max_caption_length,
                           add_bos=add_bos)

    # ------------------------------------------------------ ref audio

    def encode_ref_audio(self, audio: np.ndarray
                         ) -> tuple[np.ndarray, np.ndarray]:
        if self.dacvae is None:
            raise ValueError("DACVAE not loaded; set model.dacvae")
        cfg = self.config
        wav = np.asarray(audio, np.float32).reshape(-1)
        wav = wav[:cfg.max_speaker_latent_length
                  * cfg.audio_downsample_factor]
        latent = np.asarray(self.dacvae.encode(wav))       # (1, D, T)
        latent = np.transpose(latent, (0, 2, 1))           # (1, T, D)
        actual = min(len(wav) // cfg.audio_downsample_factor,
                     latent.shape[1])
        p = cfg.dit.speaker_patch_size
        if p > 1:
            actual = (actual // p) * p
        return latent[:, :actual], np.ones((1, actual), bool)

    # ----------------------------------------------------------- sampler

    def _sampler_fn(self, s: SamplerConfig, seq_len: int,
                    has_speaker: bool, has_caption: bool):
        c = self.config.dit
        init_scale = 0.999
        grid = np.linspace(init_scale, 0.0, s.num_steps + 1,
                           dtype=np.float64)
        if str(s.t_schedule_mode).strip().lower() == "sway":
            u = np.linspace(0.0, 1.0, s.num_steps + 1)
            u = u + float(s.sway_coeff) * (np.cos(0.5 * np.pi * u)
                                           + u - 1.0)
            grid = (1.0 - np.clip(u, 0.0, 1.0)) * init_scale
        mode = s.cfg_guidance_mode.strip().lower()
        if mode not in ("independent", "joint", "alternating"):
            raise ValueError(f"Unknown cfg_guidance_mode={mode!r}")
        use_spk = c.use_speaker
        use_cap = c.use_caption_condition
        dual = use_spk and use_cap
        has_t = s.cfg_scale_text > 0
        has_s = s.cfg_scale_speaker > 0 and use_spk
        has_c = s.cfg_scale_caption > 0 and use_cap
        max_l = s.speaker_kv_max_layers \
            if s.speaker_kv_max_layers is not None else c.num_layers

        def scale_spk(kvs, scale):
            out = dict(kvs)
            out["speaker"] = [
                (k * scale, v * scale) if li < max_l else (k, v)
                for li, (k, v) in enumerate(kvs["speaker"])]
            return out

        def run(p, text_ids, text_mask, ref_latent, ref_mask, cap_ids,
                cap_mask, key):
            ts = encode_text_state(p, c, text_ids, text_mask)
            spk_state = spk_mask = None
            cap_state = None
            if use_spk:
                spk_state, spk_mask = encode_speaker_state(
                    p, c, ref_latent, ref_mask)
            if use_cap:
                cap_state = encode_caption_state(p, c, cap_ids, cap_mask)

            # single-context caption models route caption through the
            # speaker slot layout of the reference; here we just keep
            # separate streams and build accordingly.
            kv_cond = build_kv_caches(p, c, ts, spk_state, cap_state)
            zeros_tm = jnp.zeros_like(text_mask)
            zeros_ts = jnp.zeros_like(ts)
            zeros_ss = jnp.zeros_like(spk_state) if use_spk else None
            zeros_sm = jnp.zeros_like(spk_mask) if use_spk else None
            zeros_cs = jnp.zeros_like(cap_state) if use_cap else None
            zeros_cm = jnp.zeros_like(cap_mask) if use_cap else None

            key, sub = jax.random.split(key)
            x = jax.random.normal(sub, (1, seq_len, c.patched_latent_dim),
                                  jnp.float32)
            if s.truncation_factor is not None:
                x = x * float(s.truncation_factor)

            def fwd(x_in, tv, tm, kvs, sm, cmk):
                return dit_forward(p, c, x_in, tv, tm, kvs,
                                   speaker_mask=sm, caption_mask=cmk)

            def tile_kv(kvs, n):
                return {name: [(jnp.tile(k, (n, 1, 1, 1)),
                                jnp.tile(v, (n, 1, 1, 1)))
                               for k, v in lst]
                        for name, lst in kvs.items()}

            for i in range(s.num_steps):
                t = float(grid[i])
                t_next = float(grid[i + 1])
                spk_scaled = use_spk and s.speaker_kv_scale is not None \
                    and (s.speaker_kv_min_t is None
                         or t >= s.speaker_kv_min_t)
                kvs = scale_spk(kv_cond, s.speaker_kv_scale) \
                    if spk_scaled else kv_cond
                use_cfg = (has_t or has_s or has_c) and \
                    (s.cfg_min_t <= t <= s.cfg_max_t)
                if not use_cfg:
                    tv = jnp.full((1,), t, jnp.float32)
                    v = fwd(x, tv, text_mask, kvs, spk_mask, cap_mask)
                elif mode == "joint":
                    tv = jnp.full((1,), t, jnp.float32)
                    v_c = fwd(x, tv, text_mask, kvs, spk_mask, cap_mask)
                    kv_un = build_kv_caches(p, c, zeros_ts, zeros_ss,
                                            zeros_cs)
                    v_u = fwd(x, tv, zeros_tm, kv_un, zeros_sm, zeros_cm)
                    scale = s.cfg_scale_text if has_t else \
                        (s.cfg_scale_speaker if has_s
                         else s.cfg_scale_caption)
                    v = v_c + scale * (v_c - v_u)
                elif mode == "alternating":
                    tv = jnp.full((1,), t, jnp.float32)
                    v_c = fwd(x, tv, text_mask, kvs, spk_mask, cap_mask)
                    use_text_u = (has_t and (has_s or has_c)
                                  and i % 2 == 0) or \
                        (has_t and not (has_s or has_c))
                    if use_text_u:
                        kv_alt = build_kv_caches(p, c, zeros_ts,
                                                 spk_state, cap_state)
                        if spk_scaled:
                            kv_alt = scale_spk(kv_alt,
                                               s.speaker_kv_scale)
                        v_u = fwd(x, tv, zeros_tm, kv_alt, spk_mask,
                                  cap_mask)
                        v = v_c + s.cfg_scale_text * (v_c - v_u)
                    else:
                        kv_alt = build_kv_caches(p, c, ts, zeros_ss,
                                                 zeros_cs)
                        if spk_scaled and use_spk:
                            kv_alt = scale_spk(kv_alt,
                                               s.speaker_kv_scale)
                        v_u = fwd(x, tv, text_mask, kv_alt, zeros_sm,
                                  zeros_cm)
                        scale = s.cfg_scale_speaker if use_spk else \
                            s.cfg_scale_caption
                        v = v_c + scale * (v_c - v_u)
                else:  # independent — one batched forward
                    bundles = [("cond", text_mask, spk_mask, cap_mask)]
                    if has_t:
                        bundles.append(("text", zeros_tm, spk_mask,
                                        cap_mask))
                    if has_s:
                        bundles.append(("spk", text_mask, zeros_sm,
                                        cap_mask))
                    if has_c:
                        bundles.append(("cap", text_mask, spk_mask,
                                        zeros_cm))
                    nb = len(bundles)
                    tv = jnp.full((nb,), t, jnp.float32)
                    tm = jnp.concatenate([b[1] for b in bundles], 0)
                    sm = jnp.concatenate([b[2] for b in bundles], 0) \
                        if use_spk else None
                    cmk = jnp.concatenate([b[3] for b in bundles], 0) \
                        if use_cap else None
                    out = fwd(jnp.tile(x, (nb, 1, 1)), tv, tm,
                              tile_kv(kvs, nb), sm, cmk)
                    v_c = out[0:1]
                    v = v_c
                    idx = 1
                    if has_t:
                        v = v + s.cfg_scale_text * (v_c - out[idx:idx + 1])
                        idx += 1
                    if has_s:
                        v = v + s.cfg_scale_speaker * \
                            (v_c - out[idx:idx + 1])
                        idx += 1
                    if has_c:
                        v = v + s.cfg_scale_caption * \
                            (v_c - out[idx:idx + 1])
                if s.rescale_k is not None and s.rescale_sigma is not None \
                        and t < 1.0:
                    snr = (1.0 - t) ** 2 / (t ** 2)
                    ratio = (snr * s.rescale_sigma ** 2 + 1.0) / (
                        snr * s.rescale_sigma ** 2 / s.rescale_k + 1.0)
                    v = (ratio * ((1.0 - t) * v + x) - x) / (1.0 - t)
                x = x + v * (t_next - t)
            return x

        return jax.jit(run)

    # -------------------------------------------------------- duration

    def _predict_frames(self, text: str, text_ids, text_mask, ref_latent,
                        ref_mask, cap_ids, cap_mask) -> float:
        c = self.config.dit
        has_speaker = bool(ref_mask is not None and np.any(ref_mask))
        has_caption = bool(cap_mask is not None and np.any(cap_mask))
        fn_key = ("dur", text_ids.shape[1],
                  None if ref_latent is None else ref_latent.shape[1],
                  None if cap_ids is None else cap_ids.shape[1],
                  has_speaker, has_caption)
        fn = self._jit_cache.get(fn_key)
        feats = build_duration_features(
            [normalize_text(text)],
            token_counts=[int(np.asarray(text_mask).sum())],
            max_text_len=self.config.max_text_length,
            has_speaker=[has_speaker])

        if fn is None:
            def run(p, ti, tm, rl, rm, ci, cmk):
                ts = encode_text_state(p, c, ti, tm)
                spk = None
                if c.use_speaker and rl is not None:
                    spk, _ = encode_speaker_state(p, c, rl, rm)
                cap = None
                if c.use_caption_condition and ci is not None:
                    cap = encode_caption_state(p, c, ci, cmk)
                return predict_duration_log_frames(
                    p, c, ts, tm, spk, has_speaker, cap, cmk, has_caption)
            fn = jax.jit(run)
            self._jit_cache[fn_key] = fn
        log_frames = fn(self.params, jnp.asarray(text_ids),
                        jnp.asarray(text_mask),
                        None if ref_latent is None
                        else jnp.asarray(ref_latent),
                        None if ref_mask is None else jnp.asarray(ref_mask),
                        None if cap_ids is None else jnp.asarray(cap_ids),
                        None if cap_mask is None
                        else jnp.asarray(cap_mask))
        del feats  # aux features unused by token-sum architectures
        return float(np.expm1(np.asarray(log_frames)[0]))

    # -------------------------------------------------------- latents

    def generate_latents(self, text: str, ref_latent=None, ref_mask=None,
                         caption: Optional[str] = None, rng_seed: int = 0,
                         seconds: Optional[float] = None,
                         duration_scale: float = 1.0,
                         min_seconds: float = 0.5,
                         max_seconds: float = 30.0,
                         **sampling_kwargs):
        cfg = self.config
        c = cfg.dit
        text_ids, text_mask = self._prepare_text(text)
        cap_ids = cap_mask = None
        if c.use_caption_condition:
            cap_ids, cap_mask = self._prepare_caption(caption or "")
        if c.use_speaker:
            if ref_latent is None:
                ref_latent = np.zeros((1, c.speaker_patch_size,
                                       c.latent_dim), np.float32)
                ref_mask = np.zeros((1, ref_latent.shape[1]), bool)

        spf = cfg.sample_rate / cfg.audio_downsample_factor
        if seconds is not None:
            sec = min(max_seconds, max(min_seconds, float(seconds)))
            latent_steps = math.ceil(sec * cfg.sample_rate
                                     / cfg.audio_downsample_factor)
        elif c.use_duration_predictor:
            pred = self._predict_frames(text, text_ids, text_mask,
                                        ref_latent, ref_mask, cap_ids,
                                        cap_mask)
            latent_steps = int(round(pred * duration_scale))
            latent_steps = max(max(1, math.ceil(min_seconds * spf)),
                               min(max(1, math.floor(max_seconds * spf)),
                                   latent_steps))
        else:
            latent_steps = cfg.sampler.sequence_length

        patched = math.ceil(latent_steps / c.latent_patch_size)
        s = SamplerConfig.from_dict({**cfg.sampler.__dict__,
                                     **{k: v for k, v
                                        in sampling_kwargs.items()
                                        if k in cfg.sampler.__dict__}})
        fn_key = ("sample", tuple(sorted(
            (k, str(v)) for k, v in s.__dict__.items())), patched,
            text_ids.shape[1],
            None if ref_latent is None else ref_latent.shape[1],
            None if cap_ids is None else cap_ids.shape[1])
        fn = self._jit_cache.get(fn_key)
        if fn is None:
            fn = self._sampler_fn(s, patched,
                                  ref_latent is not None,
                                  cap_ids is not None)
            self._jit_cache[fn_key] = fn
        latent = fn(self.params, jnp.asarray(text_ids),
                    jnp.asarray(text_mask),
                    None if ref_latent is None else jnp.asarray(ref_latent),
                    None if ref_mask is None else jnp.asarray(ref_mask),
                    None if cap_ids is None else jnp.asarray(cap_ids),
                    None if cap_mask is None else jnp.asarray(cap_mask),
                    jax.random.PRNGKey(rng_seed))
        return np.asarray(latent), latent_steps

    # -------------------------------------------------------- generate

    def generate(self, text: str, voice=None, ref_audio=None,
                 caption: Optional[str] = None, stream: bool = False,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        del voice
        caption = caption or kwargs.pop("instruct", None)
        if stream:
            raise NotImplementedError(
                "Irodori-TTS streaming is not yet implemented.")
        if self.dacvae is None:
            raise ValueError("Irodori-TTS requires DACVAE; set "
                             "model.dacvae")
        cfg = self.config
        t0 = time.perf_counter()
        text_ids, _ = self._prepare_text(text)
        ref_latent = ref_mask = None
        if ref_audio is not None:
            if isinstance(ref_audio, (str, Path)):
                from ....utils import load_audio

                ref_audio = load_audio(str(ref_audio),
                                       sample_rate=cfg.sample_rate)
            ref_latent, ref_mask = self.encode_ref_audio(
                np.asarray(ref_audio))
        latent, latent_steps = self.generate_latents(
            text, ref_latent=ref_latent, ref_mask=ref_mask,
            caption=caption, rng_seed=int(kwargs.pop("rng_seed", 0)),
            seconds=kwargs.pop("seconds", None),
            duration_scale=float(kwargs.pop("duration_scale", 1.0)),
            min_seconds=float(kwargs.pop("min_seconds",
                                         cfg.sampler.min_seconds)),
            max_seconds=float(kwargs.pop("max_seconds",
                                         cfg.sampler.max_seconds)),
            **kwargs)

        audio = np.asarray(self.dacvae.decode(
            np.transpose(latent, (0, 2, 1)), chunk_size=50))[0, :, 0]
        silence_t = find_silence_point(latent[0])
        trim = min(silence_t * cfg.audio_downsample_factor,
                   latent_steps * cfg.audio_downsample_factor)
        audio = audio[:trim]
        dt = max(time.perf_counter() - t0, 1e-6)
        dur = len(audio) / cfg.sample_rate
        tc = int(text_ids.shape[1])
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=cfg.sample_rate,
            segment_idx=0, token_count=tc,
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3),
            prompt={"tokens": tc, "tokens-per-sec": round(tc / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb())

    # --------------------------------------------------------- loading

    def post_load_hook(self, model_path):
        import warnings

        model_path = Path(model_path)
        try:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                str(model_path))
        except Exception as e:  # pragma: no cover
            warnings.warn(f"Could not load text tokenizer: {e}")
        dac_dir = model_path / "dacvae"
        if dac_dir.is_dir():
            try:
                from ....utils import base_load_model

                self.dacvae = base_load_model(
                    dac_dir, category="codec",
                    model_remapping={"dacvae": "dacvae"},
                    model_type="dacvae")
            except Exception as e:  # pragma: no cover
                warnings.warn(f"Could not load DACVAE: {e}")
        return self


__all__ = ["Model", "ModelConfig", "IrodoriDiTConfig", "SamplerConfig",
           "find_silence_point"]
