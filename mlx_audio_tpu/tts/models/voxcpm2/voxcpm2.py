"""VoxCPM2: 16 kHz-encode / 48 kHz-decode flow-matching TTS.

Parity: /root/reference/mlx_audio/tts/models/voxcpm2/voxcpm2.py
(v2 changes over voxcpm: multi-token DiT mu (concat, not sum),
fusion_concat_proj residual input, ref prefix tokens 103/104 :278-314,
five generation modes (zero-shot / voice design (instruct) / continuation
/ reference cloning / combined) :404-560, warmup patches + streaming
prefix trim :615-680, SR-conditioned VAE decode at out_sample_rate,
multi-character Chinese token splitting :199-210).

Runs on the shared voxcpm functional stack (minicpm/vae/dit) with
IS_V2=True switching the fusion and DiT mu conventions.
"""

from __future__ import annotations

import time
from typing import Generator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import apply_linear
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..voxcpm.config import ModelArgs as V1Args
from ..voxcpm.voxcpm import Model as V1Model, _bucket, LATENT_BUCKETS, \
    PROMPT_BUCKETS

Array = jax.Array


class ModelConfig(V1Args):
    @classmethod
    def from_dict(cls, params):
        params = dict(params or {})
        params.setdefault("model_type", "voxcpm2")
        lm = dict(params.get("lm_config") or {})
        lm.setdefault("use_mup", True)
        params["lm_config"] = lm
        return super().from_dict(params)


class Model(V1Model):
    """VoxCPM2 (multi-mode cloning, 48 kHz output)."""

    IS_V2 = True

    AUDIO_START = 101
    AUDIO_END = 102
    REF_AUDIO_START = 103
    REF_AUDIO_END = 104

    def __init__(self, config=None, **kwargs):
        if config is None and kwargs:
            config = ModelConfig.from_dict(kwargs)
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)

    # ------------------------------------------------------------ prompt

    def _tokenize(self, text: str) -> List[int]:
        """Tokenize without BOS; split multi-char Chinese tokens
        (ref :192-210)."""
        if hasattr(self.tokenizer, "tokenize"):
            toks = self.tokenizer.tokenize(text)
            out = []
            for t in toks:
                clean = t.replace("▁", "")
                if len(clean) >= 2 and all("一" <= c <= "鿿"
                                           for c in clean):
                    out.extend(list(clean))
                else:
                    out.append(t)
            return list(self.tokenizer.convert_tokens_to_ids(out))
        return list(self.tokenizer.encode(text))

    def _ref_prefix(self, ref_feat: np.ndarray):
        """[ref_start | ref audio patches | ref_end] segments
        (ref _make_ref_prefix :278-314)."""
        cfg = self.config
        n = ref_feat.shape[0]
        lat = cfg.feat_dim
        z1 = np.zeros((1, cfg.patch_size, lat), np.float32)
        tokens = np.concatenate([[self.REF_AUDIO_START],
                                 np.zeros(n, np.int32),
                                 [self.REF_AUDIO_END]]).astype(np.int32)
        feats = np.concatenate([z1, ref_feat, z1], axis=0)
        t_mask = np.concatenate([[1.0], np.zeros(n), [1.0]]).astype(
            np.float32)
        return tokens, feats, t_mask, 1.0 - t_mask

    # ---------------------------------------------------------- generate

    def generate(self, text: str, max_tokens: int = 2000,
                 min_tokens: int = 2, ref_text: Optional[str] = None,
                 ref_audio=None, prompt_text: Optional[str] = None,
                 prompt_audio=None, inference_timesteps: int = 10,
                 cfg_value: float = 2.0, streaming_prefix_len: int = 4,
                 warmup_patches: int = 0,
                 cfg_scale: Optional[float] = None,
                 ddpm_steps: Optional[int] = None,
                 instruct: Optional[str] = None, seed: int = 0, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        if self.tokenizer is None:
            raise ValueError("Tokenizer not loaded")
        if cfg_scale is not None:
            cfg_value = max(cfg_scale, 2.0)
        if ddpm_steps is not None:
            inference_timesteps = ddpm_steps
        if instruct:
            text = f"({instruct}){text}"
            warmup_patches = min(warmup_patches, 1)
        cfg = self.config
        t0 = time.perf_counter()

        def load(a):
            if isinstance(a, str):
                from ....utils import load_audio

                return np.asarray(load_audio(
                    a, sample_rate=self.encode_sample_rate))
            return np.asarray(a, np.float32)

        has_ref = ref_audio is not None
        has_prompt = prompt_audio is not None and prompt_text is not None

        segs_tok, segs_feat, segs_tm, segs_am = [], [], [], []
        if has_ref:
            ref_feat = self.encode_prompt_audio(load(ref_audio), "right")
            rt, rf, rtm, ram = self._ref_prefix(ref_feat)
            segs_tok.append(rt)
            segs_feat.append(rf)
            segs_tm.append(rtm)
            segs_am.append(ram)

        text_all = (prompt_text + text) if has_prompt else text
        text_ids = self._tokenize(text_all)
        ids = np.asarray(text_ids + [self.AUDIO_START], np.int32)
        segs_tok.append(ids)
        segs_feat.append(np.zeros((len(ids), cfg.patch_size, cfg.feat_dim),
                                  np.float32))
        segs_tm.append(np.ones(len(ids), np.float32))
        segs_am.append(np.zeros(len(ids), np.float32))

        prompt_feat = None
        if has_prompt:
            prompt_feat = self.encode_prompt_audio(load(prompt_audio),
                                                   "left")
            n = prompt_feat.shape[0]
            segs_tok.append(np.zeros(n, np.int32))
            segs_feat.append(prompt_feat)
            segs_tm.append(np.zeros(n, np.float32))
            segs_am.append(np.ones(n, np.float32))

        tokens = np.concatenate(segs_tok)
        feats = np.concatenate(segs_feat, axis=0)
        text_mask = np.concatenate(segs_tm)
        audio_mask = np.concatenate(segs_am)
        total = len(tokens)
        token_count = len(text_ids)
        clone = bool(audio_mask.any())

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

        has_continuation = bool(audio_mask[-1] == 1.0)
        preds: List[np.ndarray] = []
        if has_continuation:
            ctx = min(streaming_prefix_len - 1, prompt_feat.shape[0])
            for k in range(prompt_feat.shape[0] - ctx,
                           prompt_feat.shape[0]):
                preds.append(prompt_feat[None, k])
            warmup = 0
            prefix = jnp.asarray(prompt_feat[-1:])
        else:
            warmup = warmup_patches
            prefix = jnp.zeros((1, cfg.patch_size, cfg.feat_dim),
                               jnp.float32)
        n_ctx = len(preds)

        key = jax.random.PRNGKey(seed)
        offset = total
        for i in range(int(max_tokens) + warmup):
            (lm_caches, res_caches, lm_hidden, res_hidden, pred, stop,
             key) = step(self.params, lm_caches, res_caches,
                         jnp.int32(offset), lm_hidden, res_hidden, prefix,
                         key)
            if i >= warmup:
                preds.append(np.asarray(pred))
            prefix = pred
            offset += 1
            if (i - warmup) > min_tokens and int(stop) == 1:
                break

        flat = np.concatenate([np.asarray(p) for p in preds],
                              axis=1).reshape(1, -1, cfg.feat_dim)
        n_lat = flat.shape[1]
        lb = _bucket(n_lat, LATENT_BUCKETS)
        dec = self._jit_cache.get(("vae_dec", lb))
        if dec is None:
            from ..voxcpm.vae import vae_decode

            a = cfg.audio_vae_config
            dec = jax.jit(lambda p, z: vae_decode(
                p["audio_vae"]["decoder"], a, z, sr=a.out_sample_rate))
            self._jit_cache[("vae_dec", lb)] = dec
        pad_lat = np.zeros((1, lb, cfg.feat_dim), np.float32)
        pad_lat[:, :n_lat] = flat
        hop = cfg.audio_vae_config.decode_hop
        audio = np.asarray(dec(self.params, jnp.asarray(pad_lat)))[
            0, :n_lat * hop]
        if has_continuation and n_ctx:
            trim = cfg.patch_size * hop * n_ctx
            if trim < len(audio):
                audio = audio[trim:]

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


__all__ = ["Model", "ModelConfig"]
