"""S3Gen flow: token -> mel (CFM over the matcha UNet) -> wav (HiFT).

Parity: reference tts/models/chatterbox/s3gen/{flow.py, flow_matching.py,
s3gen.py} — speaker-embedding affine + prompt-token concat + upsample
conformer encoder + encoder_proj (flow.py:46-117), prompt-mel conditioning,
Euler CFG solve over the cosine time grid (flow_matching.py:69-117), the
token/mel 2x ratio alignment in embed_ref (s3gen.py:83-160), and the
HiFT vocoding stage (S3Token2Wav).

TPU design: the whole Euler CFG loop is one `lax.scan` over precomputed
(t, dt) tables with the CFG pair as static batch-2; token->mel runs as one
jitted program per token-length bucket (causal pre-lookahead + masks keep
the valid prefix exact).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .....nn import apply_embedding, apply_linear, init_embedding, \
    init_linear
from .hifigan import HiFTConfig, hift_generate, init_hift
from .matcha import (DecoderConfig, conditional_decoder,
                     init_conditional_decoder)
from .mel import mel_spectrogram
from .upsample_encoder import init_upsample_encoder, upsample_encode
from .xvector import (CAMPPlusConfig, campplus_forward, init_campplus,
                      kaldi_fbank)

Array = jax.Array

S3GEN_SR = 24000
S3_SR = 16000


class S3GenConfig:
    def __init__(self, input_size=512, output_size=80, spk_embed_dim=192,
                 vocab_size=6561, num_blocks=6, num_up_blocks=4,
                 up_stride=2, pre_lookahead_len=3, attention_heads=8,
                 linear_units=2048, n_timesteps=10,
                 inference_cfg_rate=0.7, token_mel_ratio=2,
                 decoder: Optional[DecoderConfig] = None,
                 hift: Optional[HiFTConfig] = None,
                 campplus: Optional[CAMPPlusConfig] = None):
        self.input_size = input_size
        self.output_size = output_size
        self.spk_embed_dim = spk_embed_dim
        self.vocab_size = vocab_size
        self.num_blocks = num_blocks
        self.num_up_blocks = num_up_blocks
        self.up_stride = up_stride
        self.pre_lookahead_len = pre_lookahead_len
        self.attention_heads = attention_heads
        self.linear_units = linear_units
        self.n_timesteps = n_timesteps
        self.inference_cfg_rate = inference_cfg_rate
        self.token_mel_ratio = token_mel_ratio
        self.decoder = decoder or DecoderConfig(
            in_channels=320, out_channels=output_size)
        self.hift = hift or HiFTConfig(
            sampling_rate=24000, upsample_rates=[8, 5, 3],
            upsample_kernel_sizes=[16, 11, 7],
            source_resblock_kernel_sizes=[7, 7, 11],
            source_resblock_dilation_sizes=[[1, 3, 5]] * 3,
            use_interpolation=False)
        self.campplus = campplus or CAMPPlusConfig()


def init_s3gen(key, cfg: S3GenConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ks = iter(jax.random.split(k1, 1024))
    flow = {
        "input_embedding": init_embedding(next(ks), cfg.vocab_size,
                                          cfg.input_size),
        "spk_embed_affine_layer": init_linear(next(ks), cfg.spk_embed_dim,
                                              cfg.output_size),
        "encoder": init_upsample_encoder(
            ks, cfg.input_size, cfg.attention_heads, cfg.linear_units,
            cfg.num_blocks, cfg.num_up_blocks, cfg.up_stride,
            cfg.pre_lookahead_len),
        "encoder_proj": init_linear(next(ks), cfg.input_size,
                                    cfg.output_size),
        "decoder": {"estimator": init_conditional_decoder(k2,
                                                          cfg.decoder)}}
    return {"flow": flow, "mel2wav": init_hift(k3, cfg.hift),
            "speaker_encoder": init_campplus(k4, cfg.campplus)}


def cfm_solve(p: dict, cfg: S3GenConfig, mu: Array, spks: Array,
              cond: Array, mask: Array, noise: Array,
              n_timesteps: int) -> Array:
    """Euler CFG over the cosine grid as one lax.scan; channel-last."""
    ts = 1.0 - np.cos(np.linspace(0.0, 1.0, n_timesteps + 1)
                      * 0.5 * np.pi)
    t_arr = jnp.asarray(ts[:-1], jnp.float32)
    dt_arr = jnp.asarray(np.diff(ts), jnp.float32)
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    rate = cfg.inference_cfg_rate

    def body(x, td):
        t, dt = td
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((x2.shape[0],), t)
        v = conditional_decoder(p["estimator"], cfg.decoder, x2, mask2,
                                mu2, t2, spks2, cond2)
        v_c, v_u = jnp.split(v, 2, axis=0)
        return x + dt * ((1.0 + rate) * v_c - rate * v_u), None

    x, _ = jax.lax.scan(body, noise, (t_arr, dt_arr))
    return x


def flow_inference(p: dict, cfg: S3GenConfig, tokens: Array,
                   n_valid: Array, prompt_feat: Array,
                   n_prompt_mel: Array, embedding: Array, noise: Array,
                   n_timesteps: int) -> Array:
    """(1, T_bucket) prompt+gen tokens -> (1, T*ratio, 80) mel."""
    emb = embedding / (jnp.linalg.norm(embedding, axis=1,
                                       keepdims=True) + 1e-8)
    emb = apply_linear(p["spk_embed_affine_layer"], emb)
    tok = jnp.clip(tokens, 0, cfg.vocab_size - 1)
    mask = (jnp.arange(tok.shape[1]) < n_valid)[None]
    x = apply_embedding(p["input_embedding"], tok) * mask[..., None]
    h = upsample_encode(p["encoder"], cfg.input_size, cfg.attention_heads,
                        cfg.num_blocks, cfg.num_up_blocks, cfg.up_stride,
                        cfg.pre_lookahead_len, x, n_valid)
    h = apply_linear(p["encoder_proj"], h)
    t2 = h.shape[1]
    cond = jnp.where((jnp.arange(t2) < n_prompt_mel)[None, :, None],
                     jnp.pad(prompt_feat,
                             ((0, 0), (0, t2 - prompt_feat.shape[1]),
                              (0, 0))),
                     0.0)
    fmask = ((jnp.arange(t2) < n_valid * cfg.token_mel_ratio)[None]
             .astype(h.dtype))
    return cfm_solve(p["decoder"], cfg, h, emb, cond, fmask, noise,
                     n_timesteps)


class S3Token2Wav:
    """Stateful wrapper over the functional s3gen (token -> wav)."""

    TOKEN_BUCKETS = (64, 128, 256, 512, 1024)

    def __init__(self, cfg: Optional[S3GenConfig] = None,
                 params: Optional[dict] = None):
        self.cfg = cfg or S3GenConfig()
        self.params = params
        self._jit: Dict = {}

    def init(self, key) -> "S3Token2Wav":
        self.params = init_s3gen(key, self.cfg)
        return self

    def embed_ref(self, ref_wav_24k: np.ndarray,
                  ref_speech_tokens: np.ndarray,
                  ref_wav_16k: Optional[np.ndarray] = None) -> Dict:
        """Reference s3gen.py embed_ref: 24 kHz prompt mel, CAMPPlus
        x-vector, and the mel = 2 * tokens alignment."""
        cfg = self.cfg
        mels = np.asarray(mel_spectrogram(
            jnp.asarray(ref_wav_24k)[None],
            num_mels=cfg.output_size))[0]               # (T', 80)
        if ref_wav_16k is None:
            from .....utils import resample_audio
            ref_wav_16k = np.asarray(resample_audio(
                np.asarray(ref_wav_24k, np.float32), S3GEN_SR, S3_SR))
        fb = kaldi_fbank(ref_wav_16k, num_mel_bins=cfg.campplus.feat_dim)
        fb = fb - fb.mean(axis=0, keepdims=True)
        xvec = np.asarray(campplus_forward(
            self.params["speaker_encoder"], cfg.campplus,
            jnp.asarray(fb[None])))
        tokens = np.asarray(ref_speech_tokens, np.int32).reshape(1, -1)
        expected = mels.shape[0] // cfg.token_mel_ratio
        if tokens.shape[1] < expected:
            mels = mels[: tokens.shape[1] * cfg.token_mel_ratio]
        elif tokens.shape[1] > expected:
            tokens = tokens[:, :expected]
        return {"prompt_token": tokens,
                "prompt_feat": mels[None].astype(np.float32),
                "embedding": xvec}

    def __call__(self, speech_tokens: np.ndarray, ref_dict: Dict,
                 n_timesteps: Optional[int] = None, seed: int = 0,
                 finalize: bool = True) -> np.ndarray:
        cfg = self.cfg
        nt = n_timesteps or cfg.n_timesteps
        tokens = np.asarray(speech_tokens, np.int32).reshape(1, -1)
        pt = np.asarray(ref_dict["prompt_token"], np.int32).reshape(1, -1)
        full = np.concatenate([pt, tokens], axis=1)
        n = full.shape[1]
        b = next((x for x in self.TOKEN_BUCKETS if n <= x),
                 ((n + 511) // 512) * 512)
        padded = np.zeros((1, b), np.int32)
        padded[0, :n] = full
        n_prompt_mel = pt.shape[1] * cfg.token_mel_ratio
        key_ = ("flow", b, nt)
        fn = self._jit.get(key_)
        if fn is None:
            fn = jax.jit(lambda p, tk, nv, pf, npm, e, z: flow_inference(
                p["flow"], cfg, tk, nv, pf, npm, e, z, nt))
            self._jit[key_] = fn
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, b * cfg.token_mel_ratio, cfg.output_size))
        mel = np.asarray(fn(self.params, jnp.asarray(padded),
                            jnp.int32(n),
                            jnp.asarray(ref_dict["prompt_feat"]),
                            jnp.int32(n_prompt_mel),
                            jnp.asarray(ref_dict["embedding"]), noise))
        gen = mel[:, n_prompt_mel: n * cfg.token_mel_ratio]
        wav, _ = hift_generate(self.params["mel2wav"], cfg.hift,
                               jnp.asarray(gen),
                               key=jax.random.PRNGKey(seed + 1))
        return np.asarray(wav)[0]


__all__ = ["S3GenConfig", "S3Token2Wav", "init_s3gen", "flow_inference",
           "cfm_solve"]
