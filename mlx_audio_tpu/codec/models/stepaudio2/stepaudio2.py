"""Step-Audio-2 token2wav: flow-matching DiT + HiFT over S3 tokens.

Parity: reference codec/models/stepaudio2/ — CausalMaskedDiffWithXvec
(flow.py: speaker-embed affine, prompt-token concat, upsample conformer
encoder, encoder_proj, prompt-mel conditioning, CFM decode of the
non-prompt mel span), UpsampleConformerEncoderV2 (upsample_encoder_v2.py:
linear embed + ESPnet rel-pos conformer blocks, PreLookaheadLayer with
right-context conv, repeat-upsample + causal conv, second conformer
stack), DiT estimator (decoder_dit.py: adaLN with 9-way modulation over
attn/conv/mlp, qk-layernorm attention, causal conv block, tanh-gelu MLP,
t*1000 sinusoidal embedding), Euler CFG solver over the cosine time grid
(flow_matching.py), HiFT vocoder + CAMPPlus speaker encoder (shared
chatterbox s3gen modules), and token2wav prompt preparation (token2wav.py:
S3 prompt tokens, 24 kHz prompt mel padded/truncated to up_rate * tokens).

TPU design: the WHOLE Euler CFG loop is one `lax.scan` over precomputed
(t, dt) tables with the CFG pair as a static batch-2; the encoder and DiT
run channel-last as one jitted program per token-length bucket.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....ops.attention import attention
from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_embedding, apply_layer_norm,
                    apply_linear, init_conv1d, init_embedding,
                    init_layer_norm, init_linear)
from ...models.s3 import Model as S3Model
from ....tts.models.chatterbox.s3gen.hifigan import (HiFTConfig,
                                                     hift_generate,
                                                     init_hift)
from ....tts.models.chatterbox.s3gen.mel import mel_spectrogram
from ....tts.models.chatterbox.s3gen.upsample_encoder import (
    init_espnet_block, init_upsample_encoder, upsample_encode)
from ....tts.models.chatterbox.s3gen.xvector import (CAMPPlusConfig,
                                                     campplus_forward,
                                                     init_campplus,
                                                     kaldi_fbank)

Array = jax.Array

TOKEN_BUCKETS = (32, 64, 128, 256, 512, 1024)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "stepaudio2_token2wav"
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 6561
    num_blocks: int = 6
    num_up_blocks: int = 4
    up_stride: int = 2
    pre_lookahead_len: int = 3
    attention_heads: int = 8
    linear_units: int = 2048
    dit_depth: int = 16
    dit_heads: int = 8
    dit_head_dim: int = 64
    dit_hidden: int = 512
    dit_mlp_ratio: float = 4.0
    inference_cfg_rate: float = 0.7
    sample_rate: int = 24000
    model_path: str = ""


# ------------------------------------------------------------------ init

def init_flow(key, cfg: ModelConfig) -> dict:
    d = cfg.input_size
    ks = iter(jax.random.split(key, 1024))
    enc = init_upsample_encoder(ks, d, cfg.attention_heads,
                                cfg.linear_units, cfg.num_blocks,
                                cfg.num_up_blocks, cfg.up_stride,
                                cfg.pre_lookahead_len)

    h = cfg.dit_hidden
    blocks = {}
    for i in range(cfg.dit_depth):
        inner = cfg.dit_heads * cfg.dit_head_dim
        blocks[str(i)] = {
            "attn": {"to_q": init_linear(next(ks), h, inner),
                     "to_k": init_linear(next(ks), h, inner),
                     "to_v": init_linear(next(ks), h, inner),
                     "q_norm": init_layer_norm(cfg.dit_head_dim),
                     "k_norm": init_layer_norm(cfg.dit_head_dim),
                     "proj": init_linear(next(ks), inner, h)},
            "mlp": {"fc1": init_linear(next(ks), h,
                                       int(h * cfg.dit_mlp_ratio)),
                    "fc2": init_linear(next(ks),
                                       int(h * cfg.dit_mlp_ratio), h)},
            "conv": {"block": {"1": init_conv1d(next(ks), h, h, 3),
                               "3": init_layer_norm(h),
                               "6": init_conv1d(next(ks), h, h, 3)}},
            "adaLN_modulation": {"1": init_linear(next(ks), h, 9 * h)}}
    estimator = {
        "t_embedder": {"mlp": {"0": init_linear(next(ks), 256, h),
                               "2": init_linear(next(ks), h, h)}},
        "in_proj": init_linear(next(ks), 4 * cfg.output_size, h),
        "blocks": blocks,
        "final_layer": {
            "adaLN_modulation": {"1": init_linear(next(ks), h, 2 * h)},
            "linear": init_linear(next(ks), h, cfg.output_size)}}
    return {
        "input_embedding": init_embedding(next(ks), cfg.vocab_size, d),
        "spk_embed_affine_layer": init_linear(next(ks), cfg.spk_embed_dim,
                                              cfg.output_size),
        "encoder": enc,
        "encoder_proj": init_linear(next(ks), d, cfg.output_size),
        "decoder": {"estimator": estimator}}


# -------------------------------------------------------------------- DiT

def _tanh_gelu(x: Array) -> Array:
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                                     * (x + 0.044715 * x ** 3)))


def dit_forward(p: dict, cfg: ModelConfig, x_lat: Array, mu: Array,
                t: Array, spks: Array, cond: Array, mask: Array) -> Array:
    """All channel-last: x_lat/mu/cond (B, T, 80), spks (B, 80),
    t (B,), mask (B, T) bool -> v (B, T, 80)."""
    h = cfg.dit_hidden
    half = 128
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = (t * 1000.0)[:, None] * freqs[None]
    temb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    te = p["t_embedder"]["mlp"]
    c = apply_linear(te["2"], jax.nn.silu(apply_linear(te["0"], temb)))
    c = c[:, None]                                       # (B, 1, H)

    spks_b = jnp.broadcast_to(spks[:, None],
                              (x_lat.shape[0], x_lat.shape[1],
                               spks.shape[-1]))
    x = jnp.concatenate([x_lat, mu, spks_b, cond], axis=-1)
    x = apply_linear(p["in_proj"], x)
    amask = jnp.where(mask[:, None, None, :], 0.0, -jnp.inf)
    nh, hd = cfg.dit_heads, cfg.dit_head_dim
    b, tt = x.shape[:2]
    for i in range(cfg.dit_depth):
        blk = p["blocks"][str(i)]
        mod = apply_linear(blk["adaLN_modulation"]["1"], jax.nn.silu(c))
        (sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp, sh_cv, sc_cv,
         g_cv) = jnp.split(mod, 9, axis=-1)
        xn = _ln_noaffine(x) * (1 + sc_msa) + sh_msa
        a = blk["attn"]
        q = apply_linear(a["to_q"], xn).reshape(b, tt, nh, hd)
        k = apply_linear(a["to_k"], xn).reshape(b, tt, nh, hd)
        v = apply_linear(a["to_v"], xn).reshape(b, tt, nh, hd)
        q = apply_layer_norm(a["q_norm"], q, eps=1e-5)
        k = apply_layer_norm(a["k_norm"], k, eps=1e-5)
        o = attention(q, k, v, mask=amask).reshape(b, tt, -1)
        x = x + g_msa * apply_linear(a["proj"], o)
        xn = _ln_noaffine(x) * (1 + sc_cv) + sh_cv
        cb = blk["conv"]["block"]
        hcv = xn * mask[..., None]
        hcv = apply_conv1d(cb["1"], jnp.pad(hcv, ((0, 0), (2, 0),
                                                  (0, 0))))
        hcv = apply_layer_norm(cb["3"], hcv, eps=1e-5)
        hcv = hcv * jnp.tanh(jax.nn.softplus(hcv))       # Mish
        hcv = apply_conv1d(cb["6"], jnp.pad(hcv, ((0, 0), (2, 0),
                                                  (0, 0))))
        x = x + g_cv * (hcv * mask[..., None])
        xn = _ln_noaffine(x) * (1 + sc_mlp) + sh_mlp
        m = blk["mlp"]
        x = x + g_mlp * apply_linear(m["fc2"],
                                     _tanh_gelu(apply_linear(m["fc1"],
                                                             xn)))
    fl = p["final_layer"]
    mod = apply_linear(fl["adaLN_modulation"]["1"], jax.nn.silu(c))
    sh, sc = jnp.split(mod, 2, axis=-1)
    return apply_linear(fl["linear"], _ln_noaffine(x) * (1 + sc) + sh)


def _ln_noaffine(x: Array, eps: float = 1e-6) -> Array:
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def cfm_solve(p: dict, cfg: ModelConfig, mu: Array, spks: Array,
              cond: Array, mask: Array, noise: Array,
              n_timesteps: int) -> Array:
    """Euler CFG flow matching as one lax.scan (reference
    flow_matching.py:18-64). All channel-last."""
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
        v = dit_forward(p["estimator"], cfg, x2, mu2, t2, spks2, cond2,
                        mask2)
        v_c, v_u = jnp.split(v, 2, axis=0)
        guided = (1.0 + rate) * v_c - rate * v_u
        return x + dt * guided, None

    x, _ = jax.lax.scan(body, noise, (t_arr, dt_arr))
    return x


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    """StepAudio2 token2wav (flow + hift + campplus + s3 tokenizer)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.hift_cfg = HiFTConfig(
            sampling_rate=24000, upsample_rates=[8, 5, 3],
            upsample_kernel_sizes=[16, 11, 7],
            source_resblock_kernel_sizes=[7, 7, 11],
            source_resblock_dilation_sizes=[[1, 3, 5]] * 3,
            use_interpolation=True)
        self.campplus_cfg = CAMPPlusConfig()
        self.speech_tokenizer: Optional[S3Model] = None
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def up_rate(self) -> int:
        return self.config.up_stride

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"flow": init_flow(k1, self.config),
                "hift": init_hift(k2, self.hift_cfg),
                "campplus": init_campplus(k3, self.campplus_cfg)}

    # -------------------------------------------------------- prompting

    def prepare_prompt(self, prompt_wav_16k: np.ndarray,
                       prompt_wav_24k: Optional[np.ndarray] = None,
                       prompt_tokens: Optional[np.ndarray] = None,
                       speaker_embedding: Optional[np.ndarray] = None
                       ) -> Dict:
        """Reference token2wav.prepare_prompt: S3 prompt tokens, CAMPPlus
        embedding, 24 kHz prompt mel padded to up_rate * tokens."""
        if prompt_tokens is None:
            if self.speech_tokenizer is None:
                raise ValueError("prompt_tokens required without a "
                                 "loaded S3 speech tokenizer")
            prompt_tokens = np.asarray(
                self.speech_tokenizer.encode(prompt_wav_16k))
        prompt_tokens = np.asarray(prompt_tokens,
                                   np.int32).reshape(1, -1)
        if speaker_embedding is None:
            fb = kaldi_fbank(prompt_wav_16k,
                             num_mel_bins=self.campplus_cfg.feat_dim)
            fb = fb - fb.mean(axis=0, keepdims=True)
            speaker_embedding = np.asarray(campplus_forward(
                self.params["campplus"], self.campplus_cfg,
                jnp.asarray(fb[None])))
        speaker_embedding = np.asarray(speaker_embedding,
                                       np.float32).reshape(1, -1)
        if prompt_wav_24k is None:
            from ....utils import resample_audio
            prompt_wav_24k = resample_audio(
                np.asarray(prompt_wav_16k, np.float32), 16000, 24000)
        nm = self.config.output_size
        mels = np.asarray(mel_spectrogram(
            jnp.asarray(prompt_wav_24k)[None], num_mels=nm))[0]
        target = prompt_tokens.shape[1] * self.up_rate
        if mels.shape[0] < target:
            tail = np.broadcast_to(mels[-1:],
                                   (target - mels.shape[0], nm))
            mels = np.concatenate([mels, tail], axis=0)
        else:
            mels = mels[:target]
        return {"prompt_token": prompt_tokens,
                "prompt_feat": mels[None].astype(np.float32),
                "embedding": speaker_embedding}

    # ---------------------------------------------------------- decode

    def _flow_fn(self, bucket: int, n_timesteps: int):
        key_ = ("flow", bucket, n_timesteps)
        fn = self._jit_cache.get(key_)
        if fn is None:
            cfg = self.config

            def run(p, tokens, n_valid, prompt_feat, n_prompt_mel, emb,
                    noise):
                emb = emb / (jnp.linalg.norm(emb, axis=1,
                                             keepdims=True) + 1e-8)
                emb = apply_linear(p["spk_embed_affine_layer"], emb)
                tok = jnp.clip(tokens, 0, cfg.vocab_size - 1)
                mask = (jnp.arange(tok.shape[1]) < n_valid)[None]
                x = apply_embedding(p["input_embedding"], tok) \
                    * mask[..., None]
                h = upsample_encode(p["encoder"], cfg.input_size,
                                    cfg.attention_heads, cfg.num_blocks,
                                    cfg.num_up_blocks, cfg.up_stride,
                                    cfg.pre_lookahead_len, x, n_valid)
                h = apply_linear(p["encoder_proj"], h)
                t2 = h.shape[1]
                cond = jnp.where(
                    (jnp.arange(t2) < n_prompt_mel)[None, :, None],
                    jnp.pad(prompt_feat,
                            ((0, 0), (0, t2 - prompt_feat.shape[1]),
                             (0, 0))),
                    0.0)
                fmask = (jnp.arange(t2) < n_valid * cfg.up_stride)[None]
                feat = cfm_solve(p["decoder"], cfg, h, emb, cond, fmask,
                                 noise, n_timesteps)
                return feat

            fn = jax.jit(run)
            self._jit_cache[key_] = fn
        return fn

    def decode(self, speech_tokens: np.ndarray, prompt: Dict,
               n_timesteps: int = 10, seed: int = 0) -> np.ndarray:
        """tokens (T,) + prompt dict -> waveform (samples,) @ 24 kHz."""
        cfg = self.config
        tokens = np.asarray(speech_tokens, np.int32).reshape(1, -1)
        pt = prompt["prompt_token"]
        full = np.concatenate([pt, tokens], axis=1)
        n = full.shape[1]
        b = next((x for x in TOKEN_BUCKETS if n <= x),
                 ((n + 511) // 512) * 512)
        padded = np.zeros((1, b), np.int32)
        padded[0, :n] = full
        n_prompt_mel = pt.shape[1] * self.up_rate
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  (1, b * self.up_rate, cfg.output_size))
        fn = self._flow_fn(b, n_timesteps)
        feat = np.asarray(fn(self.params["flow"], jnp.asarray(padded),
                             jnp.int32(n), jnp.asarray(
                                 prompt["prompt_feat"]),
                             jnp.int32(n_prompt_mel),
                             jnp.asarray(prompt["embedding"]), noise))
        mel = feat[:, n_prompt_mel: n * self.up_rate]    # generated span
        wav, _ = hift_generate(self.params["hift"], self.hift_cfg,
                               jnp.asarray(mel),
                               key=jax.random.PRNGKey(seed + 1))
        return np.asarray(wav)[0]

    def __call__(self, speech_tokens, prompt_wav_16k,
                 prompt_tokens=None, speaker_embedding=None,
                 n_timesteps: int = 10, seed: int = 0) -> np.ndarray:
        prompt = self.prepare_prompt(prompt_wav_16k,
                                     prompt_tokens=prompt_tokens,
                                     speaker_embedding=speaker_embedding)
        return self.decode(speech_tokens, prompt,
                           n_timesteps=n_timesteps, seed=seed)

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """flow.safetensors / hift.safetensors / campplus.safetensors
        merged with prefixes; torch layouts to channel-last."""
        from ....tts.models.chatterbox.s3gen.hifigan import sanitize_hift
        from ....tts.models.chatterbox.s3gen.xvector import \
            sanitize_campplus
        flow, hift, camp, out = {}, {}, {}, {}
        for k, v in weights.items():
            if k.startswith("flow."):
                flow[k[len("flow."):]] = v
            elif k.startswith("hift."):
                hift[k[len("hift."):]] = v
            elif k.startswith("campplus."):
                camp[k[len("campplus."):]] = v
            else:
                out[k] = jnp.asarray(v)
        for k, v in self._sanitize_flow(flow).items():
            out[f"flow.{k}"] = v
        for k, v in sanitize_hift(hift, self.hift_cfg).items():
            out[f"hift.{k}"] = v
        for k, v in sanitize_campplus(camp).items():
            out[f"campplus.{k}"] = v
        return out

    @staticmethod
    def _sanitize_flow(weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k.endswith(".weight") and v.ndim == 3 \
                    and v.shape[-1] < v.shape[0]:
                v = jnp.transpose(v, (2, 1, 0))   # torch conv (O,I,K)
            out[k] = v
        return out


StepAudio2Token2Wav = Model


__all__ = ["Model", "ModelConfig", "StepAudio2Token2Wav", "init_flow",
           "upsample_encode", "dit_forward", "cfm_solve"]
