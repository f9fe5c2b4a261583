"""SAM-Audio: text-guided audio source separation (flow-matching ODE).

Parity: /root/reference/mlx_audio/sts/models/sam_audio/model.py
(SAMAudio :119, separate :494, separate_long :647 chunk+crossfade,
separate_streaming :832; processor.py anchor encoding :229-310).

TPU design: the ENTIRE ODE integration (euler or midpoint, all steps) runs
as one `lax.scan` inside a single jitted program per (feature-bucket,
text-bucket) — the reference evals per step; here the host only touches the
result. The DACVAE codec and T5 text encoder are the shared functional
stacks.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_linear, init_linear
from ....codec.models.dacvae.dacvae import (
    ModelConfig as DACVAEConfig,
    dacvae_decode,
    dacvae_encode,
    init_dacvae,
)
from .dit import (
    TransformerConfig,
    dit_forward,
    embed_anchors,
    init_dit,
    init_embed_anchors,
)
from .t5 import T5Config, init_t5_encoder, sanitize_t5, t5_encode

Array = jax.Array

DFLT_ODE_OPT = {"step_size": 2 / 32, "method": "midpoint"}
ANCHOR_DICT = {"<null>": 0, "+": 1, "-": 2, "<pad>": 3}
FEATURE_BUCKETS = (64, 128, 256, 512, 1024, 2048)
TEXT_BUCKETS = (16, 32, 64, 128)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "sam_audio"
    in_channels: int = 768
    audio_codec: dict = field(default_factory=dict)
    text_encoder: dict = field(default_factory=dict)
    transformer: dict = field(default_factory=dict)
    num_anchors: int = 3
    anchor_embedding_dim: int = 128

    def __post_init__(self):
        self.codec_cfg = DACVAEConfig.from_dict(self.audio_codec or {})
        self.t5_cfg = T5Config.from_dict(self.text_encoder or {})
        if "dim" in (self.text_encoder or {}):
            self.t5_cfg.d_model = self.text_encoder["dim"]
        self.dit_cfg = TransformerConfig.from_dict(self.transformer or {})


@dataclass
class SeparationResult:
    target: List[np.ndarray]
    residual: List[np.ndarray]
    noise: Optional[np.ndarray] = None
    peak_memory: float = 0.0


class Model(FunctionalModel):
    """SAM-Audio (separate / separate_long / separate_streaming)."""

    def __init__(self, config: Union[ModelConfig, dict, None] = None,
                 **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.tokenizer = None

    @property
    def sample_rate(self) -> int:
        return self.config.codec_cfg.sample_rate

    @property
    def hop_length(self) -> int:
        return self.config.codec_cfg.hop_length

    def init_params(self, key):
        cfg = self.config
        ks = iter(jax.random.split(key, 8))
        return {
            "audio_codec": init_dacvae(next(ks), cfg.codec_cfg),
            "text_encoder": init_t5_encoder(next(ks), cfg.t5_cfg),
            "transformer": init_dit(next(ks), cfg.dit_cfg),
            "proj": init_linear(next(ks), cfg.in_channels, cfg.dit_cfg.dim),
            "embed_anchors": init_embed_anchors(
                next(ks), cfg.num_anchors, cfg.anchor_embedding_dim,
                cfg.dit_cfg.dim),
            "memory_proj": init_linear(next(ks), cfg.t5_cfg.d_model,
                                       cfg.dit_cfg.dim),
        }

    # ------------------------------------------------------------ indices

    def wav_idx_to_feature_idx(self, n: int) -> int:
        return math.ceil(n / self.hop_length)

    def feature_idx_to_wav_idx(self, n: int) -> int:
        return int(n) * self.hop_length

    # ------------------------------------------------------------- text

    def encode_text(self, descriptions: List[str]
                    ) -> Tuple[Array, Array]:
        """texts -> (features (B, L, d), bool mask (B, L))."""
        if self.tokenizer is None:
            raise RuntimeError("T5 tokenizer not loaded (post_load_hook)")
        enc = self.tokenizer(descriptions, truncation=True, max_length=512,
                             padding="longest", return_tensors="np")
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        lb = _bucket(ids.shape[1], TEXT_BUCKETS)
        ids = np.pad(ids, ((0, 0), (0, lb - ids.shape[1])))
        mask = np.pad(mask, ((0, 0), (0, lb - mask.shape[1])))
        fn = self._jit_cache.get(("t5", ids.shape))
        if fn is None:
            cfg = self.config.t5_cfg
            fn = jax.jit(lambda p, i, m: t5_encode(p["text_encoder"], cfg,
                                                   i, m))
            self._jit_cache[("t5", ids.shape)] = fn
        feats = fn(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return feats, jnp.asarray(mask, bool)

    # --------------------------------------------------------------- ODE

    def _ode_fn(self, feat_bucket: int, text_bucket: int, num_steps: int,
                method: str):
        key_ = ("ode", feat_bucket, text_bucket, num_steps, method)
        fn = self._jit_cache.get(key_)
        if fn is not None:
            return fn
        cfg = self.config
        dit_cfg = cfg.dit_cfg
        dt = 1.0 / num_steps

        def velocity(p, noisy, audio_features, text_features, t_scalar,
                     text_mask, anchor_ids, anchor_alignment, pad_mask):
            x = jnp.concatenate(
                [noisy, jnp.zeros_like(audio_features), audio_features],
                axis=2)
            aligned = apply_linear(p["proj"], x)
            aligned = embed_anchors(p["embed_anchors"], aligned, anchor_ids,
                                    anchor_alignment)
            b = noisy.shape[0]
            tt = jnp.full((b,), t_scalar)
            # sinusoidal timestep embedding added to the text memory
            half = dit_cfg.dim // 2
            freqs = jnp.exp(-math.log(10000.0)
                            * jnp.arange(half, dtype=jnp.float32) / half)
            ang = tt[:, None] * freqs[None]
            t_emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
            memory = apply_linear(p["memory_proj"], text_features) \
                + t_emb[:, None]
            return dit_forward(p["transformer"], dit_cfg, aligned, tt,
                               padding_mask=pad_mask, memory=memory,
                               memory_padding_mask=text_mask)

        def ode(p, noise, audio_features, text_features, text_mask,
                anchor_ids, anchor_alignment, pad_mask):
            def step(noisy, i):
                t = i.astype(jnp.float32) * dt
                v1 = velocity(p, noisy, audio_features, text_features, t,
                              text_mask, anchor_ids, anchor_alignment,
                              pad_mask)
                if method == "euler":
                    return noisy + dt * v1, None
                mid = noisy + 0.5 * dt * v1
                v2 = velocity(p, mid, audio_features, text_features,
                              t + 0.5 * dt, text_mask, anchor_ids,
                              anchor_alignment, pad_mask)
                return noisy + dt * v2, None

            out, _ = jax.lax.scan(step, noise, jnp.arange(num_steps))
            return out

        fn = jax.jit(ode)
        self._jit_cache[key_] = fn
        return fn

    # ----------------------------------------------------------- separate

    def separate(
        self,
        audios,
        descriptions: List[str],
        sizes: Optional[np.ndarray] = None,
        anchors: Optional[List[List[Tuple[str, float, float]]]] = None,
        noise: Optional[np.ndarray] = None,
        ode_opt: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        _text_features=None,
        _text_mask=None,
        **kwargs,
    ) -> SeparationResult:
        """Text-guided separation of (B, 1, T) audio (reference :494)."""
        audios, sizes, anchor_ids, anchor_alignment = self._prepare(
            audios, descriptions, anchors, sizes)
        ode_opt = dict(DFLT_ODE_OPT, **(ode_opt or {}))
        step_size = ode_opt["step_size"]
        if not (0 < step_size < 1):
            raise ValueError(f"step_size {step_size} must be in (0, 1)")
        num_steps = int(1.0 / step_size)
        method = ode_opt.get("method", "midpoint")

        cfg = self.config
        b = audios.shape[0]
        # encode audio -> (B, T_feat, 2*codebook) duplicated features
        hop = self.hop_length
        t_samples = audios.shape[2]
        pad_t = (hop - t_samples % hop) % hop
        wav = jnp.asarray(np.transpose(audios, (0, 2, 1)), jnp.float32)
        if pad_t:
            wav = jnp.pad(wav, ((0, 0), (0, pad_t), (0, 0)))
        enc_fn = self._jit_cache.setdefault(
            ("enc", wav.shape[1]),
            jax.jit(lambda p, w: dacvae_encode(p["audio_codec"],
                                               cfg.codec_cfg, w)))
        feats = enc_fn(self.params, wav)                 # (B, C, T_feat)
        feats = jnp.transpose(feats, (0, 2, 1))
        feats = jnp.concatenate([feats, feats], axis=2)  # (B, T, 2C)
        t_feat = feats.shape[1]
        if sizes is None:
            sizes = np.full((b,), t_feat, np.int64)

        fb = _bucket(t_feat, FEATURE_BUCKETS)
        feats = jnp.pad(feats, ((0, 0), (0, fb - t_feat), (0, 0)))
        pad_mask = np.zeros((b, fb), bool)
        for i, s in enumerate(np.asarray(sizes)):
            pad_mask[i, :int(s)] = True
        if anchor_alignment is not None:
            aa = np.ones((b, fb), np.int32)
            aa[:, :anchor_alignment.shape[1]] = anchor_alignment[:, :fb]
            anchor_alignment = jnp.asarray(aa)
            anchor_ids = jnp.asarray(anchor_ids)

        if _text_features is not None:
            text_features, text_mask = _text_features, _text_mask
        else:
            text_features, text_mask = self.encode_text(descriptions)

        if noise is None:
            noise = jax.random.normal(jax.random.PRNGKey(seed), feats.shape)
        else:
            noise = jnp.asarray(noise)
            if noise.shape[1] < fb:
                noise = jnp.pad(noise, ((0, 0), (0, fb - noise.shape[1]),
                                        (0, 0)))

        ode = self._ode_fn(fb, text_features.shape[1], num_steps, method)
        generated = ode(self.params, noise, feats, text_features,
                        jnp.asarray(text_mask), anchor_ids,
                        anchor_alignment, jnp.asarray(pad_mask))

        c = cfg.codec_cfg.codebook_dim
        dec_fn = self._jit_cache.setdefault(
            ("dec", fb),
            jax.jit(lambda p, f: dacvae_decode(p["audio_codec"],
                                               cfg.codec_cfg, f)))
        target_w = np.asarray(dec_fn(self.params, generated[..., :c]))
        residual_w = np.asarray(dec_fn(self.params, generated[..., c:]))

        target, residual = [], []
        for i in range(b):
            n = self.feature_idx_to_wav_idx(int(sizes[i]))
            target.append(target_w[i, :n])
            residual.append(residual_w[i, :n])
        return SeparationResult(target=target, residual=residual,
                                noise=np.asarray(noise))

    def separate_long(
        self,
        audios,
        descriptions: List[str],
        chunk_seconds: float = 10.0,
        overlap_seconds: float = 3.0,
        ode_opt: Optional[Dict[str, Any]] = None,
        seed: int = 42,
        verbose: bool = False,
        **kwargs,
    ) -> SeparationResult:
        """Chunked separation with cosine crossfade (reference :647)."""
        chunks = list(self._stream_chunks(
            audios, descriptions, chunk_seconds, overlap_seconds, ode_opt,
            seed, verbose))
        target = np.concatenate([c[0] for c in chunks], axis=0)
        residual = np.concatenate([c[1] for c in chunks], axis=0)
        return SeparationResult(target=[target], residual=[residual])

    def separate_streaming(
        self,
        audios,
        descriptions: List[str],
        chunk_seconds: float = 10.0,
        overlap_seconds: float = 3.0,
        ode_opt: Optional[Dict[str, Any]] = None,
        seed: int = 42,
        verbose: bool = False,
        **kwargs,
    ) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
        """Yield (target_chunk, residual_chunk) incrementally
        (reference :832-1139)."""
        yield from self._stream_chunks(audios, descriptions, chunk_seconds,
                                       overlap_seconds, ode_opt, seed,
                                       verbose)

    def _stream_chunks(self, audios, descriptions, chunk_seconds,
                       overlap_seconds, ode_opt, seed, verbose):
        audios, _, _, _ = self._prepare(audios, descriptions, None, None)
        if audios.shape[0] != 1:
            raise ValueError("long/streaming separation supports batch=1")
        sr = self.sample_rate
        chunk_n = int(chunk_seconds * sr)
        overlap_n = int(overlap_seconds * sr)
        hop_n = chunk_n - overlap_n
        total = audios.shape[2]
        if total <= chunk_n:
            res = self.separate(audios, descriptions, ode_opt=ode_opt,
                                seed=seed)
            yield res.target[0], res.residual[0]
            return

        text_features, text_mask = self.encode_text(descriptions)
        num_chunks = math.ceil((total - overlap_n) / hop_n)
        prev_t = prev_r = None
        for i in range(num_chunks):
            start = i * hop_n
            end = min(start + chunk_n, total)
            res = self.separate(
                audios[:, :, start:end], descriptions, ode_opt=ode_opt,
                seed=seed + i, _text_features=text_features,
                _text_mask=text_mask)
            t_c, r_c = res.target[0], res.residual[0]
            if prev_t is not None and overlap_n > 0:
                ov = min(overlap_n, len(prev_t), len(t_c))
                w = 0.5 * (1 - np.cos(
                    math.pi * np.linspace(0, 1, ov)))[:, None]
                head_t = prev_t[-ov:] * (1 - w) + t_c[:ov] * w
                head_r = prev_r[-ov:] * (1 - w) + r_c[:ov] * w
                yield (np.concatenate([prev_t[:-ov], head_t]),
                       np.concatenate([prev_r[:-ov], head_r]))
                prev_t, prev_r = t_c[ov:], r_c[ov:]
            else:
                prev_t, prev_r = t_c, r_c
        if prev_t is not None:
            yield prev_t, prev_r

    # ------------------------------------------------------------ helpers

    def _prepare(self, audios, descriptions, anchors, sizes):
        """Normalize audio inputs + encode anchors (processor.py:229-360)."""
        if isinstance(audios, (list, tuple)) and audios \
                and isinstance(audios[0], (str, Path)):
            from ....utils import load_audio

            waves = [np.asarray(load_audio(str(p), self.sample_rate))
                     for p in audios]
            max_n = max(len(w) for w in waves)
            arr = np.zeros((len(waves), 1, max_n), np.float32)
            wav_sizes = []
            for i, w in enumerate(waves):
                arr[i, 0, :len(w)] = w
                wav_sizes.append(len(w))
            audios = arr
            sizes = np.asarray([self.wav_idx_to_feature_idx(n)
                                for n in wav_sizes])
        else:
            audios = np.asarray(audios, np.float32)
            if audios.ndim == 1:
                audios = audios[None, None]
            elif audios.ndim == 2:
                audios = audios[:, None]
        anchor_ids = anchor_alignment = None
        if anchors is not None:
            b = audios.shape[0]
            t_feat = self.wav_idx_to_feature_idx(audios.shape[2])
            alignment = np.zeros((b, t_feat), np.int32)
            all_ids = []
            for i, spans in enumerate(anchors):
                current = [ANCHOR_DICT["<null>"], ANCHOR_DICT["<pad>"]]
                for token, start_s, end_s in spans:
                    s = self.wav_idx_to_feature_idx(
                        int(start_s * self.sample_rate))
                    e = self.wav_idx_to_feature_idx(
                        int(end_s * self.sample_rate))
                    alignment[i, s:min(e, t_feat)] = len(current)
                    current.append(ANCHOR_DICT.get(token, 0))
                all_ids.append(current)
            width = max(len(x) for x in all_ids)
            anchor_ids = np.asarray(
                [x + [ANCHOR_DICT["<pad>"]] * (width - len(x))
                 for x in all_ids], np.int32)
            anchor_alignment = alignment
        return audios, sizes, anchor_ids, anchor_alignment

    # ------------------------------------------------------------ loading

    def sanitize(self, weights: Dict) -> Dict:
        """Reference-module names pass through; torch conv layouts to WIO;
        T5 weights routed through sanitize_t5; DACVAE weights through the
        codec's own sanitize."""
        from ....codec.models.dacvae.dacvae import Model as DACVAE

        codec = DACVAE(self.config.codec_cfg)
        codec_w, rest = {}, {}
        for k, v in weights.items():
            if k.startswith("audio_codec."):
                codec_w[k[len("audio_codec."):]] = v
            elif k.startswith("text_encoder."):
                continue  # handled below
            else:
                rest[k] = v
        out = {}
        out.update({f"audio_codec.{k}": v
                    for k, v in codec.sanitize(codec_w).items()})
        out.update(sanitize_t5(weights, prefix="text_encoder."))
        for k, v in rest.items():
            v = jnp.asarray(v)
            if k.endswith(".weight") and v.ndim == 3 and (
                    "project" in k or "to_out" in k or "x_embedder" in k):
                v = jnp.transpose(v, (2, 1, 0))   # torch OIK -> KIO
            out[k] = v
        return out

    @classmethod
    def post_load_hook(cls, model: "Model", model_path) -> "Model":
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(
                str(model_path), use_fast=True)
        except Exception:
            try:
                from transformers import AutoTokenizer

                model.tokenizer = AutoTokenizer.from_pretrained(
                    model.config.text_encoder.get("name", "t5-base"))
            except Exception:
                model.tokenizer = None
        return model


SAMAudio = Model

__all__ = ["Model", "ModelConfig", "SAMAudio", "SeparationResult",
           "ANCHOR_DICT"]
