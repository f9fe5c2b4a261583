"""Dramabox TTS: audio-only LTX flow-matching DiT (48 kHz stereo).

Parity: /root/reference/mlx_audio/tts/models/dramabox/dramabox.py —
Gemma-3 text conditioning, duration heuristic with non-verbal cues,
reference-latent voice conditioning with cross-attention mask, guided
Euler loop (CFG + STG + auto rescale), mel VAE + BWE vocoder decode.

TPU design: the FULL guided Euler loop (all steps; cond, negative, and
STG-perturbed forwards per step) traces into one jitted program with a
static LTX2 sigma grid; the VAE decode + vocoder run as one program per
latent length.
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from typing import Generator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from .... import dsp
from ..base import GenerationResult, format_duration, peak_memory_gb
from .dit import (
    TransformerConfig,
    auto_rescale_for_cfg,
    guided_prediction,
    init_ltx_transformer,
    init_text_conditioner,
    ltx2_sigmas,
    ltx_forward,
    text_conditioner_forward,
    x0_from_velocity,
)
from .vae_vocoder import (
    LATENT_DOWNSAMPLE_FACTOR,
    init_audio_vae,
    init_vocoder_bwe,
    vae_decode,
    vae_encode,
    vocoder_bwe_forward,
)

Array = jax.Array


@dataclass
class AudioConfig(BaseModelArgs):
    sample_rate: int = 48000
    latent_sample_rate: int = 16000
    hop_length: int = 160
    latent_downsample_factor: int = 4
    vae_channels: int = 8
    mel_bins: int = 16
    fps: float = 25.0


@dataclass
class InferenceDefaults(BaseModelArgs):
    cfg_scale: float = 2.5
    stg_scale: float = 1.5
    stg_block: int = 29
    rescale_scale: object = "auto"
    modality_scale: float = 1.0
    duration_multiplier: float = 1.1
    seed: int = 42
    steps: int = 30
    ref_duration: float = 10.0
    negative_prompt: str = (
        "worst quality, inconsistent motion, blurry, jittery, distorted, "
        "robotic voice, echo, background noise, off-sync audio, "
        "repetitive speech")


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "dramabox-tts"
    architecture: str = "DiT-FlowMatching"
    text_encoder: str = "mlx-community/gemma-3-12b-it-8bit"
    text_encoder_hidden_size: int = 3840
    num_gemma_layers: int = 49
    model_path: Optional[str] = None
    transformer: TransformerConfig = field(
        default_factory=TransformerConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    inference_defaults: InferenceDefaults = field(
        default_factory=InferenceDefaults)

    def __post_init__(self):
        if isinstance(self.transformer, dict):
            self.transformer = TransformerConfig.from_dict(self.transformer)
        if isinstance(self.audio, dict):
            self.audio = AudioConfig.from_dict(self.audio)
        if isinstance(self.inference_defaults, dict):
            self.inference_defaults = InferenceDefaults.from_dict(
                self.inference_defaults)


# ----------------------------------------------------- duration heuristic

_LAUGH_VERBS = {
    r"\blaugh(?:s|ed|ing)?\b": 1.5,
    r"\bcackl(?:e|es|ed|ing)\b": 1.5,
    r"\bchuckl(?:e|es|ed|ing)\b": 1.0,
    r"\bgiggl(?:e|es|ed|ing)\b": 1.0,
    r"\bsnicker(?:s|ed|ing)?\b": 0.8,
}

_NONVERBAL = {
    r"\bsighs?\b": 0.8, r"\bshaky breath\b": 1.0,
    r"\bbreathing deeply\b": 1.0, r"\bgasps?\b": 0.5, r"\byawns?\b": 1.0,
    r"\bpants?\b": 0.8, r"\bwheezes?\b": 0.8, r"\bcoughs?\b": 0.8,
    r"\bsniffles?\b": 0.5, r"\bsnorts?\b": 0.3, r"\bgroans?\b": 0.8,
    r"\blong pause\b": 1.0, r"\bpauses? briefly\b": 0.3,
    r"\bpauses?\b": 0.5, r"\bsilence\b": 1.0, r"\bslams?\b": 0.5,
    r"\bclaps?\b": 0.3, r"\bwhistles?\b": 1.0, r"\bhums?\b": 0.8,
    r"\bmutters?\b": 1.5, r"\bmumbles?\b": 1.0,
    r"\bclears? (?:his|her) throat\b": 0.5, r"\bgulps?\b": 0.5,
    r"\bswallows?\b": 0.5,
    r"\bvoice (?:breaks?|cracks?|trembles?|drops?|rises?)\b": 0.5,
    r"\bcatches? (?:his|her) breath\b": 1.0,
    r"\bcomposes? (?:him|her)self\b": 0.8,
}


def estimate_speech_duration(text: str, speed: float = 1.0) -> float:
    """Heuristic duration from quoted speech + non-verbal cues
    (reference duration.py:96-116)."""
    quotes = re.findall(r'"([^"]+)"', text)
    if not quotes:
        quotes = [q for q in re.findall(
            r"'((?:[^']|'(?![\s.,!?)\]]))+)'", text)
            if len(q.split()) > 3]
    if quotes:
        spoken = " ".join(quotes)
    elif ":" in text:
        spoken = text.split(":", 1)[1].strip()
    else:
        spoken = text
    cps = 14.0
    n = len(spoken)
    if n < 40:
        cps *= 0.6
    elif n < 80:
        cps *= 0.8
    duration = n / (cps * speed)
    duration += (spoken.count(".") + spoken.count("!")
                 + spoken.count("?")) * 0.3
    extra = 0.0
    for pat, dur in {**_NONVERBAL, **_LAUGH_VERBS}.items():
        extra += dur * len(re.findall(pat, text, re.IGNORECASE))
    return max(3.0, round(duration + extra + 2.0, 1))


def aligned_frame_count(duration: float, fps: float = 25.0) -> int:
    frames = int(round(duration * fps)) + 1
    return ((frames - 1 + 4) // 8) * 8 + 1


def latent_frames_for_duration(duration: float, a: AudioConfig) -> int:
    frames = aligned_frame_count(duration, fps=a.fps)
    latent_dur = float(frames) / float(a.fps)
    lps = float(a.latent_sample_rate) / a.hop_length / \
        a.latent_downsample_factor
    return round(latent_dur * lps)


def _patch_grid_bounds(frames: int, offset: float = 0.0,
                       hop: int = 160, sr: int = 16000,
                       factor: int = 4) -> np.ndarray:
    """(1, 1, frames, 2) start/end time bounds (reference latent.py:95)."""
    def t(start, end):
        idx = np.arange(start, end, dtype=np.float64)
        mel = np.maximum(idx * factor + 1 - factor, 0)
        return mel * hop / sr
    start = t(0, frames)
    end = t(1, frames + 1)
    return (np.stack([start, end], axis=-1)[None, None]
            + offset).astype(np.float32)


class Model(FunctionalModel):
    """Dramabox flow-matching TTS."""

    preserve_ref_audio_path = True

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        # injected: fn(prompts: list[str]) -> list of
        # (hidden_states (1, T, D, L), attention_mask (1, T))
        self.text_encoder_fn = None

    @property
    def sample_rate(self) -> int:
        return self.config.audio.sample_rate

    def estimate_duration(self, text: str, speed: float = 1.0) -> float:
        return estimate_speech_duration(text, speed=speed)

    def init_params(self, key):
        cfg = self.config
        keys = jax.random.split(key, 4)
        voc_in = 2 * 64  # stereo mel channels
        return {
            "transformer": init_ltx_transformer(keys[0], cfg.transformer),
            "text_conditioner": init_text_conditioner(
                keys[1], cfg.transformer,
                embedding_dim=cfg.text_encoder_hidden_size,
                num_gemma_layers=cfg.num_gemma_layers),
            "audio_vae": init_audio_vae(
                keys[2], z_channels=cfg.audio.vae_channels),
            "vocoder": init_vocoder_bwe(keys[3], in_channels=voc_in),
        }

    # ----------------------------------------------------- conditioning

    def encode_prompt_context(self, prompt: str) -> Array:
        if self.text_encoder_fn is None:
            raise RuntimeError(
                "dramabox requires a Gemma text encoder; set "
                "model.text_encoder_fn(prompts) -> "
                "[(hidden_states, attention_mask), ...]")
        (hidden, mask), = self.text_encoder_fn([prompt])
        fn = self._jit_cache.get(("cond", hidden.shape))
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, h, m: text_conditioner_forward(
                p["text_conditioner"], cfg.transformer, h, m,
                embedding_dim=cfg.text_encoder_hidden_size))
            self._jit_cache[("cond", hidden.shape)] = fn
        return fn(self.params, jnp.asarray(hidden),
                  jnp.asarray(mask))

    def encode_reference_audio(self, ref_audio) -> Array:
        """audio -> reference latent (1, z, F', M') via stereo log-mel."""
        cfg = self.config
        a = cfg.audio
        if isinstance(ref_audio, str):
            from ....audio_io import read as read_audio

            audio, sr = read_audio(ref_audio, always_2d=True,
                                   dtype="float32")
            audio = np.asarray(audio)
        else:
            audio = np.asarray(ref_audio, np.float32)
            sr = a.latent_sample_rate
            if audio.ndim == 1:
                audio = audio[:, None]
            elif audio.shape[0] <= 2 and audio.shape[1] > 2:
                audio = audio.T
        if audio.shape[1] == 1:
            audio = np.repeat(audio, 2, axis=1)
        audio = audio[:, :2]
        if sr != a.latent_sample_rate:
            from ....utils import resample_audio

            audio = np.stack([np.asarray(resample_audio(
                audio[:, i], sr, a.latent_sample_rate))
                for i in range(2)], axis=1)
        max_samples = int(cfg.inference_defaults.ref_duration
                          * a.latent_sample_rate)
        if audio.shape[0] < max_samples:
            reps = max_samples // max(audio.shape[0], 1) + 1
            audio = np.tile(audio, (reps, 1))
        audio = audio[:max_samples]
        peak = np.max(np.abs(audio))
        if peak > 0:
            audio = audio * ((10 ** (-4.0 / 20.0)) / peak)
        mels = []
        for i in range(2):
            spec = dsp.stft(jnp.asarray(audio[:, i]), n_fft=1024,
                            hop_length=a.hop_length, win_length=1024,
                            window="hann")
            fb = dsp.mel_filters(a.latent_sample_rate, 1024, 64,
                                 norm="slaney", mel_scale="slaney")
            mel = jnp.log(jnp.maximum(dsp.spec_abs(spec) @ fb.T, 1e-5))
            mels.append(mel)
        spectrogram = jnp.stack(mels, axis=0)[None]   # (1, 2, F, 64)
        fn = self._jit_cache.get(("vae_enc", spectrogram.shape))
        if fn is None:
            fn = jax.jit(lambda p, s: vae_encode(
                p["audio_vae"], s, z_channels=cfg.audio.vae_channels))
            self._jit_cache[("vae_enc", spectrogram.shape)] = fn
        return fn(self.params, spectrogram)

    # --------------------------------------------------------- sampling

    def _euler_fn(self, frames: int, ref_frames: int, steps: int,
                  cfg_scale: float, stg_scale: float, stg_block: int,
                  rescale: float):
        cfg = self.config
        tc = cfg.transformer
        a = cfg.audio
        z, m = a.vae_channels, a.mel_bins
        latent_dim = z * m
        sigmas = ltx2_sigmas(steps, token_count=frames * m)
        total = frames + ref_frames
        positions = np.concatenate(
            [_patch_grid_bounds(frames, 0.0, a.hop_length,
                                a.latent_sample_rate,
                                a.latent_downsample_factor),
             _patch_grid_bounds(ref_frames, 0.5, a.hop_length,
                                a.latent_sample_rate,
                                a.latent_downsample_factor)],
            axis=2) if ref_frames else _patch_grid_bounds(
                frames, 0.0, a.hop_length, a.latent_sample_rate,
                a.latent_downsample_factor)
        positions = jnp.asarray(positions)
        # denoise mask: 1 for generated tokens, 0 for reference tokens
        dmask = jnp.concatenate(
            [jnp.ones((1, frames, 1)), jnp.zeros((1, ref_frames, 1))],
            axis=1)
        self_mask = None
        if ref_frames:
            sm = np.zeros((1, total, total), np.float32)
            sm[:, :frames, :] = 1.0
            sm[:, frames:, frames:] = 1.0
            sm[:, frames:, :frames] = 0.0
            sm[:, :frames, :frames] = 1.0
            self_mask = jnp.asarray(sm)

        use_cfg = cfg_scale > 1.0
        use_stg = stg_scale != 0.0

        def run(p, context, neg_context, ref_tokens, key):
            noise = jax.random.normal(key, (1, total, latent_dim),
                                      jnp.float32)
            clean = jnp.concatenate(
                [jnp.zeros((1, frames, latent_dim)), ref_tokens],
                axis=1) if ref_frames else jnp.zeros(
                    (1, frames, latent_dim))
            cur = noise * dmask + clean * (1.0 - dmask)

            for i in range(steps):
                sig = float(sigmas[i])
                ts = dmask[..., 0] * sig                  # (1, total)
                sig_arr = jnp.full((1,), sig, jnp.float32)

                def x0(ctx, stg):
                    v = ltx_forward(p["transformer"], tc, cur, sig_arr,
                                    ts, positions, ctx,
                                    self_mask=self_mask,
                                    stg_blocks=(stg_block,) if stg
                                    else ())
                    return x0_from_velocity(cur, v, ts)

                cond = x0(context, False)
                if use_cfg or use_stg:
                    un_text = x0(neg_context, False) if use_cfg else cond
                    un_pert = x0(context, True) if use_stg else cond
                    denoised = guided_prediction(cond, un_text, un_pert,
                                                 cfg_scale, stg_scale,
                                                 rescale)
                else:
                    denoised = cond
                denoised = denoised * dmask + clean * (1.0 - dmask)
                sig_next = float(sigmas[i + 1])
                velocity = (cur.astype(jnp.float32) - denoised) / sig
                cur = cur + velocity * (sig_next - sig)
            return cur[:, :frames]

        return jax.jit(run)

    def decode_latents(self, latents: Array) -> np.ndarray:
        """(1, z, F, M) -> stereo audio (samples, 2) at 48 kHz."""
        cfg = self.config
        fn = self._jit_cache.get(("dec", latents.shape))
        if fn is None:
            def run(p, z):
                mel = vae_decode(p["audio_vae"], z,
                                 out_ch=2, mel_bins=64)
                return vocoder_bwe_forward(p["vocoder"], mel)
            fn = jax.jit(run)
            self._jit_cache[("dec", latents.shape)] = fn
        wav = np.asarray(fn(self.params, latents))
        return wav[0].T                                # (samples, 2)

    # --------------------------------------------------------- generate

    def generate(self, text: str, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        cfg = self.config
        d = cfg.inference_defaults
        t0 = time.time()
        cfg_scale = float(kwargs.get("cfg_scale", d.cfg_scale))
        stg_scale = float(kwargs.get("stg_scale", d.stg_scale))
        stg_block = int(kwargs.get("stg_block", d.stg_block))
        steps = int(kwargs.get("steps", d.steps))
        speed = float(kwargs.get("speed", 1.0))
        gen_duration = float(kwargs.get("gen_duration",
                                        kwargs.get("duration", 0.0)))
        if gen_duration > 0:
            duration = gen_duration
        else:
            duration = max(3.0, round(
                estimate_speech_duration(text, speed)
                * float(kwargs.get("duration_multiplier",
                                   d.duration_multiplier)), 1))
        frames = latent_frames_for_duration(duration, cfg.audio)

        ref_tokens = None
        ref_frames = 0
        ref_audio = kwargs.get("ref_audio")
        if ref_audio is not None:
            ref_latent = self.encode_reference_audio(ref_audio)
            b, z, f, m = ref_latent.shape
            ref_tokens = jnp.transpose(ref_latent, (0, 2, 1, 3)).reshape(
                1, f, z * m)
            ref_frames = f

        context = self.encode_prompt_context(text)
        neg_context = context
        if cfg_scale > 1.0:
            neg_context = self.encode_prompt_context(
                str(kwargs.get("negative_prompt", d.negative_prompt)))

        rescale_setting = kwargs.get("rescale_scale", d.rescale_scale)
        rescale = auto_rescale_for_cfg(cfg_scale) \
            if rescale_setting == "auto" else float(rescale_setting)

        fn_key = ("euler", frames, ref_frames, steps, cfg_scale,
                  stg_scale, stg_block, rescale, context.shape[1])
        fn = self._jit_cache.get(fn_key)
        if fn is None:
            fn = self._euler_fn(frames, ref_frames, steps, cfg_scale,
                                stg_scale, stg_block, rescale)
            self._jit_cache[fn_key] = fn
        tokens = fn(self.params, context, neg_context,
                    ref_tokens if ref_tokens is not None
                    else jnp.zeros((1, 0, cfg.audio.vae_channels
                                    * cfg.audio.mel_bins)),
                    jax.random.PRNGKey(int(kwargs.get("seed", d.seed))))

        z, m = cfg.audio.vae_channels, cfg.audio.mel_bins
        latents = jnp.transpose(
            tokens.reshape(1, frames, z, m), (0, 2, 1, 3))
        audio = self.decode_latents(latents)
        samples = audio.shape[0]
        dt = max(time.time() - t0, 1e-6)
        dur = samples / self.sample_rate
        yield GenerationResult(
            audio=audio, samples=samples, sample_rate=self.sample_rate,
            segment_idx=0, token_count=frames,
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3),
            prompt={"tokens": frames,
                    "tokens-per-sec": round(frames / dt, 2)},
            audio_samples={"samples": samples,
                           "samples-per-sec": round(samples / dt, 2)},
            processing_time_seconds=dt,
            peak_memory_usage=peak_memory_gb())

    def post_load_hook(self, model_path):
        self.config.model_path = str(model_path)
        return self


__all__ = ["Model", "ModelConfig", "TransformerConfig", "AudioConfig",
           "estimate_speech_duration", "aligned_frame_count",
           "latent_frames_for_duration"]
