"""IndexTTS: GPT2 AR mel-token model with conformer-perceiver speaker
conditioning and a speaker-conditioned BigVGAN vocoder.

Parity: /root/reference/mlx_audio/tts/models/indextts/indextts.py
(Model :63 — text+cond prompt assembly :262, AR loop :339-385, BigVGAN on
final-norm latents :387), mel.py (magnitude mel, log floor 1e-5).

TPU design: prompt embeddings prefill a fixed-capacity KV cache at a
bucketed length; decode runs as `lax.scan` chunks with in-graph top-k
sampling and stop masking (the reference syncs per token); the collected
final-norm hidden states feed one bucketed BigVGAN call.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Generator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .... import dsp
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
from ....ops.sampling import top_k_top_p_filter
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..moss_tts_nano.gpt2 import (
    GPT2Config,
    gpt2_forward,
    gpt2_make_caches,
    init_gpt2,
)
from . import normalize
from .bigvgan_cond import BigVGANConditioning, BigVGANConditioningConfig
from .conformer import (
    ConformerArgs,
    conformer_forward,
    init_conformer,
    init_perceiver,
    perceiver_forward,
)

Array = jax.Array

PROMPT_BUCKETS = (64, 128, 256, 512, 1024)
DEC_CHUNK = 32


def _bucket(n: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


@dataclass
class GPTConfig(BaseModelArgs):
    model_dim: int = 1024
    heads: int = 16
    layers: int = 20
    max_mel_tokens: int = 1815
    max_text_tokens: int = 600
    number_text_tokens: int = 12000
    number_mel_codes: int = 8194
    start_mel_token: int = 8192
    stop_mel_token: int = 8193
    start_text_token: int = 0
    stop_text_token: int = 1
    use_mel_codes_as_input: bool = True
    mel_length_compression: int = 1024
    condition_type: str = "conformer_perceiver"
    condition_module: ConformerArgs = field(default_factory=ConformerArgs)
    max_conditioning_inputs: int = 1
    condition_num_latent: int = 32

    def __post_init__(self):
        if isinstance(self.condition_module, dict):
            known = {k: v for k, v in self.condition_module.items()
                     if k in ConformerArgs.__dataclass_fields__}
            self.condition_module = ConformerArgs(**known)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "indextts"
    gpt: GPTConfig = field(default_factory=GPTConfig)
    bigvgan: BigVGANConditioningConfig = field(
        default_factory=BigVGANConditioningConfig)
    tokenizer_name: str = ""
    sample_rate: int = 24000
    model_path: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.gpt, dict):
            self.gpt = GPTConfig.from_dict(self.gpt)
        if isinstance(self.bigvgan, dict):
            self.bigvgan = BigVGANConditioningConfig.from_dict(self.bigvgan)


def log_mel_spectrogram(audio, sample_rate: int = 24_000, n_mels: int = 100,
                        n_fft: int = 1024, hop_length: int = 256) -> Array:
    """Magnitude (not power) mel with ln floor 1e-5 (reference mel.py:8)."""
    spec = dsp.stft(jnp.asarray(audio, jnp.float32), n_fft=n_fft,
                    hop_length=hop_length, win_length=n_fft, window="hann")
    mag = dsp.spec_abs(spec)
    fb = dsp.mel_filters(sample_rate=sample_rate, n_fft=n_fft,
                         n_mels=n_mels, norm=None, mel_scale="htk")
    mel = mag @ fb.T
    out = jnp.log(jnp.maximum(mel, 1e-5))
    return out[None] if out.ndim == 2 else out


class Model(FunctionalModel):
    """IndexTTS-1.5 voice-cloning TTS."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        if not config.gpt.use_mel_codes_as_input:
            raise NotImplementedError(
                "use_mel_codes_as_input=false is not supported")
        if config.gpt.condition_type != "conformer_perceiver":
            raise NotImplementedError(
                f"condition_type={config.gpt.condition_type} unsupported")
        super().__init__(config)
        self.tokenizer = None
        self.bigvgan = BigVGANConditioning(config.bigvgan)

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def _gpt2_cfg(self) -> GPT2Config:
        g = self.config.gpt
        return GPT2Config(
            n_embd=g.model_dim, n_head=g.heads, n_layer=g.layers,
            n_inner=4 * g.model_dim, position_embedding_type="none",
            vocab_size=1)

    def init_params(self, key):
        cfg = self.config
        g = cfg.gpt
        cm = g.condition_module
        keys = jax.random.split(key, 12)
        return {
            "text_embedding": init_embedding(
                keys[0], g.number_text_tokens + 1, g.model_dim),
            "mel_embedding": init_embedding(
                keys[1], g.number_mel_codes, g.model_dim),
            "text_pos_embedding": {"emb": init_embedding(
                keys[2], g.max_text_tokens + 2, g.model_dim)},
            "mel_pos_embedding": {"emb": init_embedding(
                keys[3], g.max_mel_tokens + 2 + g.max_conditioning_inputs,
                g.model_dim)},
            "text_head": init_linear(keys[4], g.model_dim,
                                     g.number_text_tokens + 1),
            "mel_head": init_linear(keys[5], g.model_dim,
                                    g.number_mel_codes),
            "conditioning_encoder": init_conformer(keys[6], cm),
            "perceiver_encoder": init_perceiver(
                keys[7], g.model_dim, cm.output_size, cm.attention_heads,
                cm.perceiver_mult, g.condition_num_latent),
            "gpt": init_gpt2(keys[8], self._gpt2_cfg,
                             use_token_embedding=False),
            "final_norm": init_layer_norm(g.model_dim),
            "bigvgan": self.bigvgan.init_params(keys[9]),
        }

    def bind(self, params, strict: bool = False):
        super().bind(params, strict)
        self.bigvgan.bind(params.get("bigvgan"))

    # ------------------------------------------------------ conditioning

    def get_conditioning(self, ref_mel: Array) -> Array:
        """log-mel (B, T, 100) -> speaker latents (B, 32, model_dim)."""
        g = self.config.gpt
        fn = self._jit_cache.get(("cond", ref_mel.shape[1]))
        if fn is None:
            fn = jax.jit(lambda p, m: perceiver_forward(
                p["perceiver_encoder"],
                conformer_forward(p["conditioning_encoder"],
                                  g.condition_module, m),
                g.condition_module.attention_heads))
            self._jit_cache[("cond", ref_mel.shape[1])] = fn
        return fn(self.params, ref_mel)

    def prepare_input_embedding(self, text: str, conditioning: Array
                                ) -> Array:
        g = self.config.gpt
        if self.tokenizer is None:
            raise ValueError("indextts requires a sentencepiece tokenizer")
        toks = self.tokenizer.encode(
            normalize.tokenize_by_CJK_char(normalize.normalize(text)))
        toks = [g.start_text_token] + list(toks[:g.max_text_tokens]) + \
            [g.stop_text_token, g.start_mel_token]
        ids = jnp.asarray(toks, jnp.int32)[None]
        p = self.params
        emb = apply_embedding(p["text_embedding"], ids) + \
            apply_embedding(p["text_pos_embedding"]["emb"],
                            jnp.arange(len(toks)))[None]
        return jnp.concatenate([conditioning, emb], axis=1)

    # ------------------------------------------------------------ decode

    def _decode_fns(self, pb: int, cap: int, temperature: float,
                    top_k: int):
        cfg = self.config
        g = cfg.gpt
        gcfg = self._gpt2_cfg

        def prefill(params, embeds, plen):
            caches = gpt2_make_caches(gcfg, 1, cap)
            pad = jnp.where(jnp.arange(cap) < plen, 0.0,
                            -jnp.inf)[None, None, None, :]
            hidden, caches = gpt2_forward(params["gpt"], gcfg, embeds,
                                          caches=caches, offset=0,
                                          pad_mask=pad)
            hidden = apply_layer_norm(params["final_norm"], hidden)
            h = jax.lax.dynamic_slice_in_dim(
                hidden, jnp.clip(plen - 1, 0, pb - 1), 1, axis=1)
            return caches, h[:, 0]  # (1, D)

        def sample(key, logits):
            lg = logits.astype(jnp.float32)
            if temperature <= 0:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lg = top_k_top_p_filter(lg / temperature, top_k=top_k)
            return jax.random.categorical(key, lg, axis=-1).astype(
                jnp.int32)

        def chunk(params, caches, offset, pos, h, key, done):
            def step(carry, _):
                caches, offset, pos, h, key, done = carry
                logits = apply_linear(params["mel_head"], h)  # (1, V)
                key, sub = jax.random.split(key)
                tok = sample(sub, logits)[0]
                tok = jnp.where(done, jnp.int32(g.stop_mel_token), tok)
                emit = (h[0], tok, done)
                done = done | (tok == g.stop_mel_token)
                emb = apply_embedding(params["mel_embedding"],
                                      tok[None, None]) + \
                    apply_embedding(params["mel_pos_embedding"]["emb"],
                                    pos[None, None])
                hidden, caches = gpt2_forward(params["gpt"], gcfg, emb,
                                              caches=caches, offset=offset)
                h_next = apply_layer_norm(params["final_norm"],
                                          hidden)[:, -1]
                return (caches, offset + 1, pos + 1, h_next, key, done), \
                    emit
            carry, (hs, toks, dones) = jax.lax.scan(
                step, (caches, offset, pos, h, key, done), None,
                length=DEC_CHUNK)
            return carry, hs, toks, dones

        return jax.jit(prefill), jax.jit(chunk, donate_argnums=(1,))

    # ---------------------------------------------------------- generate

    def generate(self, text: str, ref_audio=None, ref_mel=None,
                 max_tokens: int = 1024, temperature: float = 0.8,
                 top_k: int = 30, seed: int = 0, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        cfg = self.config
        g = cfg.gpt
        t0 = time.perf_counter()
        if ref_audio is not None:
            if isinstance(ref_audio, (str, Path)):
                from ....utils import load_audio

                ref_audio = load_audio(ref_audio,
                                       sample_rate=cfg.sample_rate)
            ref_mel = log_mel_spectrogram(
                np.asarray(ref_audio, np.float32).reshape(-1),
                sample_rate=cfg.sample_rate,
                n_mels=cfg.bigvgan.num_mels)
        if ref_mel is None:
            raise ValueError("Must provide one of ref_audio or ref_mel")
        ref_mel = jnp.asarray(ref_mel)

        conditioning = self.get_conditioning(ref_mel)
        embeds = self.prepare_input_embedding(text, conditioning)
        plen = embeds.shape[1]
        pb = _bucket(plen)
        embeds = jnp.pad(embeds, ((0, 0), (0, pb - plen), (0, 0)))
        cap = pb + ((max_tokens + DEC_CHUNK) // DEC_CHUNK) * DEC_CHUNK

        fn_key = ("dec", pb, cap, float(temperature), int(top_k))
        fns = self._jit_cache.get(fn_key)
        if fns is None:
            fns = self._decode_fns(pb, cap, temperature, top_k)
            self._jit_cache[fn_key] = fns
        prefill, chunk = fns

        caches, h = prefill(self.params, embeds, jnp.int32(plen))
        key = jax.random.PRNGKey(seed)
        offset, pos = jnp.int32(plen), jnp.int32(plen)
        done = jnp.asarray(False)
        hs_all: List[np.ndarray] = []
        toks_all: List[np.ndarray] = []
        steps = 0
        while steps < max_tokens:
            (caches, offset, pos, h, key, done), hs, toks, dones = chunk(
                self.params, caches, offset, pos, h, key, done)
            hs_all.append(np.asarray(hs))             # (chunk, D)
            toks_all.append(np.asarray(toks))
            steps += DEC_CHUNK
            if bool(np.asarray(done)):
                break

        toks = np.concatenate(toks_all)[:max_tokens]
        hs = np.concatenate(hs_all, axis=0)[:max_tokens]
        stop_idx = np.argmax(toks == g.stop_mel_token) \
            if (toks == g.stop_mel_token).any() else len(toks) - 1
        latents = hs[:stop_idx + 1][None]             # (1, N, D)
        n_lat = latents.shape[1]

        # vocoder (bucketed on latent length; trim to true length)
        hop = math.prod(cfg.bigvgan.upsample_rates)
        nb = ((n_lat + 63) // 64) * 64
        lat_pad = np.zeros((1, nb, latents.shape[2]), np.float32)
        lat_pad[:, :n_lat] = latents
        voc_key = ("voc", nb, ref_mel.shape[1])
        voc = self._jit_cache.get(voc_key)
        if voc is None:
            voc = jax.jit(self.bigvgan.decode_conditioned)
            self._jit_cache[voc_key] = voc
        audio = np.asarray(voc(self.params["bigvgan"],
                               jnp.asarray(lat_pad), ref_mel))
        audio = audio[0, :n_lat * hop, 0]

        dt = max(time.perf_counter() - t0, 1e-6)
        dur = len(audio) / cfg.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=cfg.sample_rate,
            segment_idx=0, token_count=n_lat,
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3),
            prompt={"tokens": n_lat,
                    "tokens-per-sec": round(n_lat / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb())

    # ---------------------------------------------------------- loading

    def post_load_hook(self, model_path):
        p = Path(model_path) / "tokenizer.model"
        if p.exists():
            try:
                import sentencepiece as spm

                self.tokenizer = spm.SentencePieceProcessor(
                    model_file=str(p))
            except ImportError:
                pass
        return self

    def sanitize(self, weights):
        g = self.config.gpt
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if "num_batches_tracked" in k or "pos_enc" in k or \
                    k.startswith(("gpt.wte", "gpt.wpe")):
                continue
            if k.startswith("gpt.h.") and k.endswith(".attn.bias"):
                continue
            # HF GPT2 Conv1D stores (in, out)
            if k.startswith("gpt.h.") and k.endswith(".weight") and any(
                    s in k for s in (".c_attn.", ".c_proj.", ".c_fc.")):
                v = v.T if ".attn." in k or ".mlp." in k else v
            k = k.replace(".mlp.c_fc.", ".mlp.fc_in.")
            k = k.replace(".mlp.c_proj.", ".mlp.fc_out.")
            if k.startswith("perceiver_encoder."):
                k = k.replace(".norm.gamma", ".norm.weight")
                if ".0.to_kv." in k:
                    kk, vv = jnp.split(v, 2, axis=0)
                    out[k.replace(".0.to_kv.", ".0.linear_k.")] = kk
                    out[k.replace(".0.to_kv.", ".0.linear_v.")] = vv
                    continue
                k = k.replace(".0.to_q.", ".0.linear_q.")
                k = k.replace(".0.to_out.", ".0.linear_out.")
                k = k.replace(".1.0.", ".1.w_1.")
                k = k.replace(".1.2.", ".1.w_2.")
            if k.startswith("conditioning_encoder.") and \
                    k.endswith(".weight"):
                if v.ndim == 3:
                    v = jnp.transpose(v, (2, 1, 0))
                elif v.ndim == 4:
                    v = jnp.transpose(v, (2, 3, 1, 0))
            if k.startswith("bigvgan."):
                k = k.replace("speaker_encoder.blocks.0.",
                              "speaker_encoder.block0.")
                for i in (1, 2, 3):
                    k = k.replace(f"speaker_encoder.blocks.{i}.",
                                  f"speaker_encoder.block{i}.")
                if k.endswith(".weight") and v.ndim == 3 and \
                        ".ups." not in k:
                    v = jnp.transpose(v, (2, 1, 0))
                elif ".ups." in k and k.endswith(".weight") and v.ndim == 3:
                    from ....nn.layers import (
                        convert_torch_conv_transpose_weight,
                    )

                    v = convert_torch_conv_transpose_weight(v)
            out[k] = v
        del g
        return out


__all__ = ["Model", "ModelConfig", "GPTConfig", "log_mel_spectrogram"]
