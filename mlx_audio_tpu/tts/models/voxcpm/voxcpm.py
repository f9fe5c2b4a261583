"""VoxCPM: MiniCPM LM + residual LM + patch flow-matching TTS (44.1 kHz).

Parity: /root/reference/mlx_audio/tts/models/voxcpm/voxcpm.py
(ScalarQuantizationLayer FSQ :16-29, prompt/audio interleave for cloning
:276-336, base+residual LM AR loop with per-patch CFM sampling
:352-421, stop head with 5-step warmup :396-399).

TPU design: one compiled program per AR step fuses the base-LM decode
step, FSQ rounding, residual-LM step, the ENTIRE CFM Euler integration
(all timesteps + CFG-zero-star), the local patch encoder for feedback, and
the stop head — the host only reads the stop flag. The reference runs ~10
device syncs per generated patch.
"""

from __future__ import annotations

import time
from typing import Generator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import apply_embedding, apply_linear, init_linear
from ..base import GenerationResult, format_duration, peak_memory_gb
from .config import ModelArgs
from .dit import cfm_sample, init_loc_dit, init_loc_enc, loc_enc_forward
from .minicpm import init_minicpm, minicpm_caches, minicpm_forward
from .vae import init_vae_decoder, init_vae_encoder, vae_decode, vae_encode

Array = jax.Array

ModelConfig = ModelArgs

AUDIO_START_TOKEN = 101
MAX_CACHE_LEN = 4096
PROMPT_BUCKETS = (64, 128, 256, 512, 1024, 2048)
LATENT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def fsq_apply(p: dict, x: Array, scale: int) -> Array:
    """Scalar quantization: tanh -> round to grid -> project back
    (ref :16-29). Rounding is straight-through at inference."""
    h = jnp.tanh(apply_linear(p["in_proj"], x))
    h = jnp.round(h * scale) / scale
    return apply_linear(p["out_proj"], h)


class Model(FunctionalModel):
    """VoxCPM-0.5B (zero-shot + voice cloning)."""

    IS_V2 = False

    def __init__(self, config: ModelArgs = None, **kwargs):
        if config is None:
            config = ModelArgs.from_dict(kwargs) if kwargs else ModelArgs()
        elif isinstance(config, dict):
            config = ModelArgs.from_dict(config)
        super().__init__(config)
        self.tokenizer = None

    @property
    def sample_rate(self) -> int:
        a = self.config.audio_vae_config
        return int(a.out_sample_rate or a.sample_rate)

    @property
    def encode_sample_rate(self) -> int:
        return int(self.config.audio_vae_config.sample_rate)

    def init_params(self, key):
        cfg = self.config
        ks = iter(jax.random.split(key, 16))
        lm_h = cfg.lm_config.hidden_size
        p = {
            "base_lm": init_minicpm(next(ks), cfg.lm_config),
            "residual_lm": init_minicpm(next(ks), cfg.res_lm_config()),
            "feat_encoder": init_loc_enc(next(ks), cfg.enc_lm_config(),
                                         cfg.feat_dim),
            "feat_decoder": {"estimator": init_loc_dit(
                next(ks), cfg.dit_lm_config(), cfg.feat_dim)},
            "fsq_layer": {
                "in_proj": init_linear(next(ks), lm_h,
                                       cfg.scalar_quantization_latent_dim),
                "out_proj": init_linear(next(ks),
                                        cfg.scalar_quantization_latent_dim,
                                        lm_h)},
            "enc_to_lm_proj": init_linear(next(ks),
                                          cfg.encoder_config.hidden_dim,
                                          lm_h),
            "lm_to_dit_proj": init_linear(next(ks), lm_h,
                                          cfg.dit_config.hidden_dim),
            "res_to_dit_proj": init_linear(next(ks), lm_h,
                                           cfg.dit_config.hidden_dim),
            "stop_proj": init_linear(next(ks), lm_h, lm_h),
            "stop_head": init_linear(next(ks), lm_h, 2, bias=False),
            "audio_vae": {
                "encoder": init_vae_encoder(next(ks), cfg.audio_vae_config),
                "decoder": init_vae_decoder(next(ks), cfg.audio_vae_config)},
        }
        if self.IS_V2:
            p["fusion_concat_proj"] = init_linear(next(ks), lm_h * 2, lm_h)
        return p

    def sanitize(self, weights):
        """Fold VAE weight-norm (weight_g/weight_v) and drop fc_logvar."""
        out, pend = {}, {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if "fc_logvar" in k or "rotary_emb.inv_freq" in k or \
                    ".rope." in k:
                continue
            if k.endswith(".weight_g") or k.endswith(".weight_v"):
                pend[k] = v
                continue
            out[k] = v
        for k in list(pend):
            if k.endswith(".weight_g"):
                base = k[:-len(".weight_g")]
                v = pend.get(base + ".weight_v")
                if v is not None:
                    g = pend[k]
                    flat = v.reshape(v.shape[0], -1)
                    norm = jnp.linalg.norm(flat, axis=1).reshape(g.shape)
                    out[base + ".weight"] = g * (v / (norm + 1e-9))
        return out

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model.tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        except Exception:
            model.tokenizer = None
        return model

    # ------------------------------------------------------------ pieces

    def _scale_emb(self) -> float:
        lm = self.config.lm_config
        if self.IS_V2:
            return float(lm.scale_emb) if lm.use_mup else 1.0
        return float(lm.scale_emb) if not lm.use_mup else 1.0

    def encode_prompt_audio(self, audio: np.ndarray,
                            padding_mode: str = "right") -> np.ndarray:
        """(T,) -> (n_patches, patch_size, latent)."""
        cfg = self.config
        a = cfg.audio_vae_config
        patch_len = cfg.patch_size * a.hop_length
        audio = np.asarray(audio, np.float32).reshape(-1)
        rem = len(audio) % patch_len
        if rem:
            pad = patch_len - rem
            audio = np.pad(audio, (pad, 0) if padding_mode == "left"
                           else (0, pad))
        fn = self._jit_cache.get(("vae_enc", len(audio)))
        if fn is None:
            fn = jax.jit(lambda p, x: vae_encode(
                p["audio_vae"]["encoder"], a, x))
            self._jit_cache[("vae_enc", len(audio))] = fn
        feat = np.asarray(fn(self.params,
                             jnp.asarray(audio)[None, :, None]))[0]
        n = feat.shape[0] // cfg.patch_size
        return feat[:n * cfg.patch_size].reshape(n, cfg.patch_size, -1)

    def _residual_input(self, p, enc_out, feat_term):
        if self.IS_V2:
            return apply_linear(
                p["fusion_concat_proj"],
                jnp.concatenate([enc_out, feat_term], axis=-1))
        return enc_out + feat_term

    def _dit_mu(self, p, lm_hidden, residual_hidden):
        h1 = apply_linear(p["lm_to_dit_proj"], lm_hidden)
        h2 = apply_linear(p["res_to_dit_proj"], residual_hidden)
        if self.IS_V2:
            return jnp.concatenate([h1, h2], axis=-1)
        return h1 + h2

    # --------------------------------------------------------- compiled

    def _prefill_fn(self, pb: int, clone: bool):
        cfg = self.config
        lm = cfg.lm_config
        enc_cfg = cfg.enc_lm_config()
        res_cfg = cfg.res_lm_config()
        scale_emb = self._scale_emb()
        sq = cfg.scalar_quantization_scale

        def prefill(p, tokens, feats, text_mask, audio_mask, n):
            text_embed = apply_embedding(p["base_lm"]["embed_tokens"],
                                         tokens) * scale_emb
            if clone:
                feat_embed = loc_enc_forward(p["feat_encoder"], enc_cfg,
                                             feats)
                feat_embed = apply_linear(p["enc_to_lm_proj"], feat_embed)
                combined = (text_mask[:, :, None] * text_embed
                            + audio_mask[:, :, None] * feat_embed)
            else:
                feat_embed = jnp.zeros_like(text_embed)
                combined = text_embed
            lm_caches = minicpm_caches(lm, 1, MAX_CACHE_LEN)
            pad = jnp.where(jnp.arange(MAX_CACHE_LEN) < n, 0.0,
                            -jnp.inf)[None, None, None, :]
            enc_out, lm_caches = minicpm_forward(
                p["base_lm"], lm, combined, lm_caches, 0, pad)
            if clone:
                enc_out = (fsq_apply(p["fsq_layer"], enc_out, sq)
                           * audio_mask[:, :, None]
                           + enc_out * text_mask[:, :, None])
            idx = jnp.clip(n - 1, 0, pb - 1)
            lm_hidden = jax.lax.dynamic_slice_in_dim(enc_out, idx, 1,
                                                     axis=1)[:, 0]
            if not clone:
                lm_hidden = fsq_apply(p["fsq_layer"], lm_hidden, sq)
            res_in = self._residual_input(
                p, enc_out, audio_mask[:, :, None] * feat_embed
                if clone else jnp.zeros_like(enc_out))
            res_caches = minicpm_caches(res_cfg, 1, MAX_CACHE_LEN)
            res_out, res_caches = minicpm_forward(
                p["residual_lm"], res_cfg, res_in, res_caches, 0, pad)
            res_hidden = jax.lax.dynamic_slice_in_dim(res_out, idx, 1,
                                                      axis=1)[:, 0]
            return lm_caches, res_caches, lm_hidden, res_hidden

        return jax.jit(prefill)

    def _step_fn(self, timesteps: int, cfg_value: float):
        cfg = self.config
        lm = cfg.lm_config
        enc_cfg = cfg.enc_lm_config()
        res_cfg = cfg.res_lm_config()
        dit_cfg = cfg.dit_lm_config()
        sq = cfg.scalar_quantization_scale

        def step(p, lm_caches, res_caches, offset, lm_hidden, res_hidden,
                 prefix_cond, key):
            mu = self._dit_mu(p, lm_hidden, res_hidden)
            key, sub = jax.random.split(key)
            pred = cfm_sample(
                p["feat_decoder"]["estimator"], dit_cfg, mu, prefix_cond,
                sub, in_channels=cfg.feat_dim, patch_size=cfg.patch_size,
                n_timesteps=timesteps, cfg_value=cfg_value, v2=self.IS_V2)
            stop_logits = apply_linear(
                p["stop_head"], jax.nn.silu(apply_linear(p["stop_proj"],
                                                         lm_hidden)))
            stop = jnp.argmax(stop_logits, axis=-1)[0]
            curr = loc_enc_forward(p["feat_encoder"], enc_cfg,
                                   pred[:, None])
            curr = apply_linear(p["enc_to_lm_proj"], curr)   # (1, 1, H)
            lm_out, lm_caches = minicpm_forward(
                p["base_lm"], lm, curr, lm_caches, offset)
            new_lm_hidden = fsq_apply(p["fsq_layer"], lm_out[:, -1], sq)
            res_in = self._residual_input(p, new_lm_hidden[:, None], curr)
            res_out, res_caches = minicpm_forward(
                p["residual_lm"], res_cfg, res_in, res_caches, offset)
            return (lm_caches, res_caches, new_lm_hidden, res_out[:, -1],
                    pred, stop, key)

        return jax.jit(step, donate_argnums=(1, 2))

    # ---------------------------------------------------------- generate

    def _tokenize(self, text: str) -> List[int]:
        return list(self.tokenizer.encode(text))

    def generate(self, text: str, max_tokens: int = 4096,
                 ref_text: Optional[str] = None, ref_audio=None,
                 inference_timesteps: int = 10, cfg_value: float = 2.0,
                 cfg_scale: Optional[float] = None,
                 ddpm_steps: Optional[int] = None, seed: int = 0, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        if self.tokenizer is None:
            raise ValueError("Tokenizer not loaded")
        if cfg_scale is not None:
            cfg_value = cfg_scale
        if ddpm_steps is not None:
            inference_timesteps = ddpm_steps
        cfg = self.config
        t0 = time.perf_counter()

        if isinstance(ref_audio, str):
            from ....utils import load_audio

            ref_audio = np.asarray(load_audio(
                ref_audio, sample_rate=self.encode_sample_rate))

        clone = ref_audio is not None and ref_text is not None
        if clone:
            ids = self._tokenize(ref_text + text) + [AUDIO_START_TOKEN]
            text_len = len(ids)
            feat = self.encode_prompt_audio(ref_audio, "left")
            audio_len = feat.shape[0]
            total = text_len + audio_len
            tokens = np.zeros(total, np.int32)
            tokens[:text_len] = ids
            feats = np.zeros((total, cfg.patch_size, cfg.feat_dim),
                             np.float32)
            feats[text_len:] = feat
            text_mask = np.zeros(total, np.float32)
            text_mask[:text_len] = 1.0
            audio_mask = 1.0 - text_mask
            prefix_cond = feat[-1:]
        else:
            ids = self._tokenize(text) + [AUDIO_START_TOKEN]
            total = len(ids)
            tokens = np.asarray(ids, np.int32)
            feats = np.zeros((total, cfg.patch_size, cfg.feat_dim),
                             np.float32)
            text_mask = np.ones(total, np.float32)
            audio_mask = np.zeros(total, np.float32)
            prefix_cond = np.zeros((1, cfg.patch_size, cfg.feat_dim),
                                   np.float32)
        token_count = len(ids)

        pb = _bucket(total, PROMPT_BUCKETS)
        tok_b = np.zeros((1, pb), np.int32)
        tok_b[0, :total] = tokens
        feat_b = np.zeros((1, pb, cfg.patch_size, cfg.feat_dim), np.float32)
        feat_b[0, :total] = feats
        tm = np.zeros((1, pb), np.float32)
        tm[0, :total] = text_mask
        am = np.zeros((1, pb), np.float32)
        am[0, :total] = audio_mask

        pf = self._jit_cache.get(("prefill", pb, clone))
        if pf is None:
            pf = self._prefill_fn(pb, clone)
            self._jit_cache[("prefill", pb, clone)] = pf
        lm_caches, res_caches, lm_hidden, res_hidden = pf(
            self.params, jnp.asarray(tok_b), jnp.asarray(feat_b),
            jnp.asarray(tm), jnp.asarray(am), jnp.int32(total))

        sk = ("step", inference_timesteps, cfg_value)
        step = self._jit_cache.get(sk)
        if step is None:
            step = self._step_fn(inference_timesteps, cfg_value)
            self._jit_cache[sk] = step

        key = jax.random.PRNGKey(seed)
        prefix = jnp.asarray(prefix_cond[None] if prefix_cond.ndim == 2
                             else prefix_cond)
        if prefix.ndim == 2:
            prefix = prefix[None]
        prefix = prefix.reshape(1, cfg.patch_size, cfg.feat_dim)
        preds: List[np.ndarray] = []
        offset = total
        for i in range(int(max_tokens)):
            (lm_caches, res_caches, lm_hidden, res_hidden, pred, stop,
             key) = step(self.params, lm_caches, res_caches,
                         jnp.int32(offset), lm_hidden, res_hidden, prefix,
                         key)
            preds.append(np.asarray(pred))
            prefix = pred
            offset += 1
            if i > 5 and int(stop) == 1:
                break

        flat = np.concatenate(preds, axis=1).reshape(1, -1, cfg.feat_dim)
        n_lat = flat.shape[1]
        lb = _bucket(n_lat, LATENT_BUCKETS)
        dec = self._jit_cache.get(("vae_dec", lb))
        if dec is None:
            a = cfg.audio_vae_config
            dec = jax.jit(lambda p, z: vae_decode(
                p["audio_vae"]["decoder"], a, z,
                sr=a.out_sample_rate))
            self._jit_cache[("vae_dec", lb)] = dec
        pad_lat = np.zeros((1, lb, cfg.feat_dim), np.float32)
        pad_lat[:, :n_lat] = flat
        hop = cfg.audio_vae_config.decode_hop
        audio = np.asarray(dec(self.params, jnp.asarray(pad_lat)))[
            0, :n_lat * hop]

        dt = max(time.perf_counter() - t0, 1e-6)
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=token_count,
            audio_duration=format_duration(dur),
            real_time_factor=round(dur / dt, 3),
            prompt={"tokens": token_count,
                    "tokens-per-sec": round(token_count / dt, 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / dt, 2)},
            processing_time_seconds=dt, peak_memory_usage=peak_memory_gb())


__all__ = ["Model", "ModelConfig", "ModelArgs", "fsq_apply",
           "AUDIO_START_TOKEN"]
