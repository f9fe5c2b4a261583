"""MeloTTS: VITS2 end-to-end multi-speaker TTS.

Parity: reference tts/models/melotts/melotts.py — TextEncoder + DP/SDP
blend -> ceil durations -> monotonic alignment path -> latent sample ->
4x transformer coupling flows (reversed) -> HiFi-GAN (:147-196), speaker
embedding conditioning throughout, spk2id voice map (:225-237), and the
generate() streaming chunk split along the latent time axis (:296-330).

TPU design: two-stage bucketed compilation like kokoro — stage 1 (text
encoder + duration predictors) jitted per phone bucket; durations come to
the host only to pick the frame bucket; stage 2 (path expansion via cumsum
comparisons + flows + vocoder) jitted per (phone, frame) bucket pair with
validity masks everywhere, so the whole synthesis runs as two compiled
programs per shape class.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import init_embedding, apply_embedding
from ....nn.layers import convert_torch_conv_transpose_weight
from ..base import GenerationResult, format_duration
from . import modules as M
from .hifigan import apply_generator, init_generator
from .text import load_symbols_from_config, process_text

Array = jax.Array

PHONE_BUCKETS = (32, 64, 128, 256, 512)
FRAME_BUCKETS = (128, 256, 512, 1024, 2048, 4096)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "melotts"
    sampling_rate: int = 44100
    filter_length: int = 2048
    hop_length: int = 512
    add_blank: bool = True
    n_speakers: int = 256
    spk2id: Dict[str, int] = field(default_factory=dict)
    symbols: Optional[List[str]] = None

    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    n_layers_trans_flow: int = 3
    kernel_size: int = 3
    resblock: str = "1"
    resblock_kernel_sizes: List[int] = field(
        default_factory=lambda: [3, 7, 11])
    resblock_dilation_sizes: List[List[int]] = field(
        default_factory=lambda: [[1, 3, 5]] * 3)
    upsample_rates: List[int] = field(default_factory=lambda: [8, 8, 2, 2,
                                                               2])
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: List[int] = field(
        default_factory=lambda: [16, 16, 8, 2, 2])
    gin_channels: int = 256
    use_spk_conditioned_encoder: bool = True

    num_tones: int = 16
    num_languages: int = 10
    n_vocab: int = 219

    @property
    def sample_rate(self) -> int:
        return self.sampling_rate

    @property
    def upsample_factor(self) -> int:
        f = 1
        for r in self.upsample_rates:
            f *= r
        return f


def _build_path(durations: Array, x_mask: Array, t_y: int) -> Array:
    """(B, T_x) ceil durations -> (B, T_x, T_y) monotonic alignment
    (reference _generate_path, via cumsum comparisons)."""
    cum = jnp.cumsum(durations * x_mask, axis=1)
    start = cum - durations
    pos = jnp.arange(t_y)[None, None, :]
    path = (pos >= start[..., None]) & (pos < cum[..., None])
    return path.astype(jnp.float32) * x_mask[..., None]


class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        if config.symbols:
            load_symbols_from_config(config.symbols)
        self._jit_cache: Dict = {}
        self._bert_tokenizer = None

    @property
    def sample_rate(self) -> int:
        return self.config.sampling_rate

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 16))
        gin = c.gin_channels
        p = {
            "enc_p": M.init_text_encoder(
                next(ks), c.n_vocab, c.inter_channels, c.hidden_channels,
                c.filter_channels, c.n_heads, c.n_layers, c.kernel_size,
                gin_channels=gin if c.use_spk_conditioned_encoder else 0,
                num_tones=c.num_tones, num_languages=c.num_languages),
            "dec": init_generator(
                next(ks), c.inter_channels, c.resblock,
                c.resblock_kernel_sizes, c.resblock_dilation_sizes,
                c.upsample_rates, c.upsample_initial_channel,
                c.upsample_kernel_sizes, gin_channels=gin),
            "enc_q": M.init_posterior_encoder(
                next(ks), c.filter_length // 2 + 1, c.inter_channels,
                c.inter_channels, 5, 1, 16, gin_channels=gin),
            "flow_layers": {str(i): M.init_transformer_coupling(
                next(ks), c.inter_channels, c.inter_channels, 5,
                c.n_layers_trans_flow, c.n_heads, c.filter_channels,
                gin_channels=gin) for i in range(4)},
            "dp": M.init_dp(next(ks), c.hidden_channels, 256, 3,
                            gin_channels=gin),
            "sdp": M.init_sdp(next(ks), c.hidden_channels, 192, 3,
                              n_flows=4, gin_channels=gin),
            "emb_g": init_embedding(next(ks), c.n_speakers, gin),
        }
        return p

    # ------------------------------------------------ compiled stages

    def _stage1(self, pb: int, sdp_ratio: float):
        key_ = ("s1", pb, sdp_ratio)
        fn = self._jit_cache.get(key_)
        if fn is None:
            c = self.config

            def run(p, phones, tones, langs, bert, ja_bert, length, sid,
                    rng, noise_scale_w):
                mask = (jnp.arange(phones.shape[1])[None, :]
                        < length[:, None]).astype(jnp.float32)
                g = apply_embedding(p["emb_g"], sid)      # (B, gin)
                g_t = g[:, None, :]
                x, m_p, logs_p = M.apply_text_encoder(
                    p["enc_p"], phones, mask, tones, langs, bert, ja_bert,
                    c.n_heads, c.kernel_size, c.inter_channels,
                    g=g if c.use_spk_conditioned_encoder else None)
                logw_dp = M.apply_dp(p["dp"], x, mask, 3, g=g_t)
                if sdp_ratio > 0:
                    logw_sdp = M.apply_sdp_reverse(
                        p["sdp"], x, mask, 3, 192, rng, g=g_t,
                        noise_scale=noise_scale_w)
                    logw = sdp_ratio * logw_sdp + \
                        (1 - sdp_ratio) * logw_dp
                else:
                    logw = logw_dp
                return m_p, logs_p, logw[..., 0], mask, g

            fn = jax.jit(run)
            self._jit_cache[key_] = fn
        return fn

    def _stage2(self, pb: int, fb: int):
        key_ = ("s2", pb, fb)
        fn = self._jit_cache.get(key_)
        if fn is None:
            c = self.config

            def run(p, m_p, logs_p, durations, x_mask, y_len, g, rng,
                    noise_scale):
                y_mask = (jnp.arange(fb)[None, :]
                          < y_len[:, None]).astype(jnp.float32)
                path = _build_path(durations, x_mask, fb)  # (B, Tx, Ty)
                m_y = jnp.einsum("bxy,bxc->byc", path, m_p)
                logs_y = jnp.einsum("bxy,bxc->byc", path, logs_p)
                z_p = m_y + jax.random.normal(rng, m_y.shape) \
                    * jnp.exp(logs_y) * noise_scale
                z_p = z_p * y_mask[..., None]
                g_t = g[:, None, :]
                # reversed flows: [c0 F c1 F c2 F c3 F] backwards
                z = z_p
                for i in range(3, -1, -1):
                    z = M.flip_channels(z)
                    z = M.apply_transformer_coupling_reverse(
                        p["flow_layers"][str(i)], z, y_mask, c.n_heads, 5,
                        g=g if c.use_spk_conditioned_encoder else None)
                z = z * y_mask[..., None]
                audio = apply_generator(p["dec"], z, c, g=g_t)
                return audio[..., 0]

            fn = jax.jit(run)
            self._jit_cache[key_] = fn
        return fn

    # --------------------------------------------------------- infer

    def synthesize(self, phone_ids, tone_ids, lang_ids, bert, ja_bert,
                   sid: int, speed: float = 1.0,
                   noise_scale: float = 0.667,
                   noise_scale_w: float = 0.8, sdp_ratio: float = 0.0,
                   seed: int = 0) -> np.ndarray:
        n = len(phone_ids)
        pb = _bucket(n, PHONE_BUCKETS)

        def pad_ids(v):
            out = np.zeros((1, pb), np.int32)
            out[0, :n] = v
            return jnp.asarray(out)

        bert_pad = np.zeros((1, pb, 1024), np.float32)
        ja_pad = np.zeros((1, pb, 768), np.float32)
        ja_pad[0, :n] = np.asarray(ja_bert, np.float32).T[:n]
        if bert is not None:
            bert_pad[0, :n] = np.asarray(bert, np.float32).T[:n]

        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        m_p, logs_p, logw, x_mask, g = self._stage1(pb, sdp_ratio)(
            self.params, pad_ids(phone_ids), pad_ids(tone_ids),
            pad_ids(lang_ids), jnp.asarray(bert_pad), jnp.asarray(ja_pad),
            jnp.asarray([n]), jnp.asarray([sid]), k1,
            jnp.float32(noise_scale_w))

        w = np.ceil(np.exp(np.asarray(logw))
                    * np.asarray(x_mask) / speed)
        y_len = max(int(w.sum()), 1)
        fb = _bucket(y_len, FRAME_BUCKETS)
        audio = self._stage2(pb, fb)(
            self.params, m_p, logs_p, jnp.asarray(w), x_mask,
            jnp.asarray([y_len]), g, k2, jnp.float32(noise_scale))
        samples = y_len * self.config.upsample_factor
        return np.asarray(audio)[0, :samples]

    def generate(self, text: str, voice: Optional[str] = None,
                 speed: float = 1.0, lang_code: str = "EN-US",
                 noise_scale: float = 0.667, noise_scale_w: float = 0.8,
                 sdp_ratio: float = 0.0, stream: bool = False,
                 streaming_interval: float = 1.0, seed: int = 0,
                 **kwargs):
        t0 = time.time()
        spk2id = self.config.spk2id or {}
        if voice and voice in spk2id:
            sid = spk2id[voice]
        elif lang_code in spk2id:
            sid = spk2id[lang_code]
        else:
            sid = spk2id.get("EN-Default", 0)

        result = process_text(text, language="EN",
                              add_blank=self.config.add_blank,
                              tokenizer=self._bert_tokenizer)
        audio = self.synthesize(
            result["phone_ids"], result["tone_ids"], result["lang_ids"],
            None, result["bert_features"], sid, speed, noise_scale,
            noise_scale_w, sdp_ratio, seed)

        sr = self.sample_rate
        if not stream:
            chunks = [audio]
        else:
            step = max(1, int(streaming_interval * sr))
            chunks = [audio[i: i + step]
                      for i in range(0, len(audio), step)]
        for idx, chunk in enumerate(chunks):
            dt = time.time() - t0
            dur = len(chunk) / sr
            yield GenerationResult(
                audio=jnp.asarray(chunk), samples=len(chunk),
                sample_rate=sr, segment_idx=idx,
                token_count=len(result["phone_ids"]),
                audio_duration=format_duration(dur),
                real_time_factor=round(dt / max(dur, 1e-6), 2),
                prompt={"tokens": len(result["phone_ids"]),
                        "tokens-per-sec": 0.0},
                audio_samples={"samples": len(chunk),
                               "samples-per-sec":
                                   round(len(chunk) / dt, 2) if dt else 0},
                processing_time_seconds=dt, peak_memory_usage=0.0)
            t0 = time.time()

    # -------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """torch MeloTTS checkpoint -> channel-last layout: fold
        weight-norm pairs, strip Conv1dPT `.conv.` wrappers, convert conv
        kernels to WIO, pre-flip transposed-conv kernels, flatten
        ElementwiseAffine (2,1) -> (2,)."""
        import re as _re

        staged_g, staged_v, out = {}, {}, {}
        for k, v in weights.items():
            k = k.replace(".conv_t.", ".").replace(".conv.", ".")
            k = _re.sub(r"^flow\.flows\.(\d+)\.", lambda m: (
                f"flow_layers.{int(m.group(1)) // 2}."
                if int(m.group(1)) % 2 == 0 else "DROPFLIP."), k)
            if k.startswith("DROPFLIP."):
                continue
            if k.endswith(".weight_g"):
                staged_g[k[:-len(".weight_g")]] = np.asarray(v)
                continue
            if k.endswith(".weight_v"):
                staged_v[k[:-len(".weight_v")]] = np.asarray(v)
                continue
            out[k] = v
        for base, v in staged_v.items():
            g = staged_g.get(base)
            if g is not None:
                norm = np.sqrt((v * v).sum(
                    axis=tuple(range(1, v.ndim)), keepdims=True))
                v = np.asarray(g) * v / np.maximum(norm, 1e-12)
            out[base + ".weight"] = v

        fixed = {}
        for k, v in out.items():
            v = jnp.asarray(v)
            if k.endswith(".weight") and v.ndim == 3:
                if ".ups." in k or k.split(".")[-2].startswith("ups"):
                    v = convert_torch_conv_transpose_weight(v)
                else:
                    v = jnp.transpose(v, (2, 1, 0))
            if _re.search(r"(sdp|flows)\.\d+\.(m|logs)$", k) and \
                    v.ndim == 2:
                v = v.reshape(-1)
            fixed[k] = v
        return fixed


__all__ = ["Model", "ModelConfig"]
