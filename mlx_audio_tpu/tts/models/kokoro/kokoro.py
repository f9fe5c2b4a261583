"""Kokoro-82M: non-autoregressive TTS (PL-BERT -> prosody -> ISTFTNet).

Parity target: /root/reference/mlx_audio/tts/models/kokoro/kokoro.py
(ModelConfig :39, forward :111, sanitize :179, generate :293).

TPU-first execution design (vs the reference's per-call dynamic shapes +
Python duration loop):

* Two jitted stages with **bucketed static shapes**:
  - frontend(ids_bucket):  ALBERT -> duration encoder -> durations + t_en
  - acoustic(ids_bucket, frame_bucket): on-device alignment matmul -> F0/N ->
    ISTFTNet decode -> audio
  One host sync between stages (the scalar total-frame count) picks the frame
  bucket. Validity masks make padded runs numerically identical to tight
  shapes, so each bucket compiles once and is reused.
* The alignment matrix is built with a broadcasted cumsum comparison on
  device (modules.build_alignment), replacing the host-side repeat loop
  (reference kokoro.py:148-160).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_linear, init_linear
from ....nn.layers import convert_torch_conv_transpose_weight
from ..base import GenerationResult, format_duration, peak_memory_gb
from .albert import AlbertModelArgs, apply_albert, init_albert
from .istftnet import decoder_forward, fold_weight_norm, init_decoder
from .modules import (
    build_alignment,
    duration_encoder,
    f0n_train,
    init_prosody_predictor,
    init_text_encoder,
    predict_durations,
    text_encoder,
)



@dataclass
class IstftNetConfig:
    resblock_kernel_sizes: tuple = (3, 7, 11)
    upsample_rates: tuple = (10, 6)
    upsample_initial_channel: int = 512
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_kernel_sizes: tuple = (20, 12)
    gen_istft_n_fft: int = 20
    gen_istft_hop_size: int = 5


@dataclass
class ModelConfig(BaseModelArgs):
    istftnet: dict = field(default_factory=dict)
    dim_in: int = 64
    dropout: float = 0.2
    hidden_dim: int = 512
    max_conv_dim: int = 512
    max_dur: int = 50
    multispeaker: bool = True
    n_layer: int = 3
    n_mels: int = 80
    n_token: int = 178
    style_dim: int = 128
    text_encoder_kernel_size: int = 5
    plbert: dict = field(default_factory=dict)
    vocab: Dict[str, int] = field(default_factory=dict)
    sample_rate: int = 24000
    model_path: str = ""
    # internal width knobs (checkpoint values; overridable for tiny tests)
    decoder_bottleneck: int = 1024
    decoder_res_dim: int = 64
    # acoustic-stage compute dtype. The ISTFTNet conv stack is activation-
    # bandwidth-bound (profiled 545 ms of a 1.01 s synth at f32 on v5e);
    # bf16 halves every activation read/write. Numerically-sensitive pieces
    # stay f32 regardless: instance-norm statistics, the NSF harmonic-source
    # phase integral, and the final ISTFT (istftnet.py). Set "float32" for
    # bit-exact parity with the f32 reference.
    compute_dtype: str = "bfloat16"
    # device->host dtype for the synthesized waveform. f16 halves the
    # transfer (the tunnel D2H link measured ~35 MB/s) at ~90 dB SNR on
    # [-1, 1] audio — above PCM16. The public API still returns f32.
    transfer_dtype: str = "float16"


_LSTM_SUFFIX_MAP = {
    "weight_ih_l0_reverse": "backward.weight_ih",
    "weight_hh_l0_reverse": "backward.weight_hh",
    "bias_ih_l0_reverse": "backward.bias_ih",
    "bias_hh_l0_reverse": "backward.bias_hh",
    "weight_ih_l0": "forward.weight_ih",
    "weight_hh_l0": "forward.weight_hh",
    "bias_ih_l0": "forward.bias_ih",
    "bias_hh_l0": "forward.bias_hh",
}

TOKEN_BUCKETS = (32, 64, 128, 256, 512)
# 8192 frames = 204 s of audio: a 510-token segment at the published
# model's ~10-16 frames/token average can exceed 4096, so the top bucket
# must cover the worst realistic segment (beyond it the synth is clamped
# with a warning rather than silently truncated).
FRAME_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class Model(FunctionalModel):
    """Kokoro TTS model (language-blind; G2P lives in pipeline.py)."""

    REPO_ID = "prince-canuma/Kokoro-82M"

    def __init__(self, config: ModelConfig, repo_id: Optional[str] = None):
        super().__init__(config)
        self.repo_id = repo_id
        self.vocab = config.vocab
        plbert = dict(config.plbert)
        plbert.pop("vocab_size", None)
        self.albert_cfg = AlbertModelArgs(vocab_size=config.n_token, **plbert)
        self.istft_cfg = IstftNetConfig(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in config.istftnet.items()
        })
        self.context_length = self.albert_cfg.max_position_embeddings
        # 2x prosody upsample * prod(upsample_rates) * istft hop (600 for the
        # published 24 kHz checkpoint)
        self.samples_per_frame = (
            2 * math.prod(int(r) for r in self.istft_cfg.upsample_rates)
            * int(self.istft_cfg.gen_istft_hop_size)
        )
        self._pipelines: Dict[str, object] = {}
        self._frontend_jit = None
        self._acoustic_jit = None

    # ------------------------------------------------------------------
    # Params
    # ------------------------------------------------------------------

    def init_params(self, key) -> dict:
        cfg = self.config
        ks = iter(jax.random.split(key, 8))
        return {
            "bert": init_albert(next(ks), self.albert_cfg),
            "bert_encoder": init_linear(
                next(ks), self.albert_cfg.hidden_size, cfg.hidden_dim),
            "predictor": init_prosody_predictor(
                next(ks), cfg.style_dim, cfg.hidden_dim, cfg.n_layer,
                cfg.max_dur),
            "text_encoder": init_text_encoder(
                next(ks), cfg.hidden_dim, cfg.text_encoder_kernel_size,
                cfg.n_layer, cfg.n_token),
            "decoder": init_decoder(
                next(ks), cfg.hidden_dim, cfg.style_dim, cfg.n_mels,
                self.istft_cfg, bottleneck_dim=cfg.decoder_bottleneck,
                res_dim=cfg.decoder_res_dim),
        }

    def sanitize(self, weights: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Remap the published torch-layout checkpoint:

        * drop position_ids; .gamma/.beta -> LayerNorm weight/bias
        * LSTM torch suffixes -> forward/backward sub-trees
        * weight-norm (g, v) pairs folded to dense kernels, then layout
          conversion: forward convs (O,I,W)->(W,I,O); transposed convs
          (ups/pool) -> pre-flipped equivalent forward kernels
        * plain convs (noise_convs, F0/N_proj, F0/N_conv) -> WIO
        * snake alphas (1,C,1) -> (C,)

        (Reference equivalent: kokoro.py:179-276 + istftnet Decoder.sanitize.)
        """
        out: Dict[str, jnp.ndarray] = {}
        gs = {k: v for k, v in weights.items() if k.endswith("weight_g")}
        for key, w in weights.items():
            if "position_ids" in key:
                continue
            if key.endswith("weight_g"):
                continue
            if key.endswith("weight_v"):
                base = key[: -len(".weight_v")]
                g = gs.get(base + ".weight_g")
                folded = fold_weight_norm(g, w) if g is not None else jnp.asarray(w)
                if ".pool" in base:
                    groups = folded.shape[0]
                    out[base + ".weight"] = convert_torch_conv_transpose_weight(
                        folded, groups=groups)
                elif "generator.ups" in base:
                    out[base + ".weight"] = convert_torch_conv_transpose_weight(
                        folded)
                else:
                    out[base + ".weight"] = jnp.transpose(
                        jnp.asarray(folded), (2, 1, 0))
                continue
            if key.endswith(".gamma"):
                out[key[: -len(".gamma")] + ".weight"] = w
                continue
            if key.endswith(".beta"):
                out[key[: -len(".beta")] + ".bias"] = w
                continue
            lstm_done = False
            for suffix, repl in _LSTM_SUFFIX_MAP.items():
                if key.endswith("." + suffix):
                    out[key[: -len(suffix)] + repl] = w
                    lstm_done = True
                    break
            if lstm_done:
                continue
            if (("noise_convs" in key or "F0_proj" in key or "N_proj" in key
                 or key.endswith("F0_conv.weight") or key.endswith("N_conv.weight"))
                    and key.endswith(".weight") and w.ndim == 3):
                out[key] = jnp.transpose(w, (2, 1, 0))
                continue
            if ("alpha1" in key or "alpha2" in key) and w.ndim == 3:
                out[key] = w.reshape(-1)
                continue
            out[key] = w
        return out

    # ------------------------------------------------------------------
    # Compiled stages
    # ------------------------------------------------------------------

    def _frontend(self, params, ids, valid, speed):
        """ids (B, L) -> (d (B,L,Dh+S), t_en (B,L,Dh), pred_dur (B,L))."""
        cfg = self.config
        mask_i32 = valid.astype(jnp.int32)
        bert_out, _ = apply_albert(params["bert"], self.albert_cfg, ids, mask_i32)
        d_en = apply_linear(params["bert_encoder"], bert_out)
        # ref_s style half enters through `d`; pass style separately
        return d_en

    def _run_frontend(self, params, ids, valid, ref_s, speed):
        cfg = self.config
        s = ref_s[:, cfg.style_dim:]
        d_en = self._frontend(params, ids, valid, speed)
        d = duration_encoder(params["predictor"]["text_encoder"], d_en, s,
                             valid, cfg.n_layer)
        pred_dur = predict_durations(params["predictor"], d, valid, speed)
        t_en = text_encoder(params["text_encoder"], ids, valid,
                            cfg.text_encoder_kernel_size)
        # total frame count rides along so the host's bucket-pick sync is
        # ONE scalar fetch of this program's output (no extra dispatch+RTT)
        return d, t_en, pred_dur, jnp.sum(pred_dur)

    def _run_acoustic(self, params, d, t_en, pred_dur, ref_s, num_frames, key):
        """Alignment -> prosody -> decode. num_frames is static (bucket).

        The decoder subtree + its inputs are cast to config.compute_dtype
        (default bf16 — the conv stack is activation-bandwidth-bound);
        prosody (F0/N LSTMs) stays f32, it is ~5% of the stage. The waveform
        is returned in config.transfer_dtype to halve the D2H fetch.
        """
        cfg = self.config
        s = ref_s[:, cfg.style_dim:]
        style = ref_s[:, : cfg.style_dim]
        total = jnp.sum(pred_dur, axis=-1)  # (B,)
        frame_valid = jnp.arange(num_frames)[None, :] < total[:, None]
        aln = build_alignment(pred_dur, num_frames)  # (B, L, F)
        en = jnp.einsum("blf,blc->bfc", aln, d)
        f0, n = f0n_train(params["predictor"], en, s, frame_valid)
        asr = jnp.einsum("blf,blc->bfc", aln, t_en)
        cdt = jnp.dtype(cfg.compute_dtype)
        dec = params["decoder"]
        if cdt != jnp.float32:
            dec = jax.tree.map(
                lambda w: w.astype(cdt)
                if jnp.issubdtype(w.dtype, jnp.floating) else w, dec)
        audio = decoder_forward(dec, self.istft_cfg, asr.astype(cdt), f0, n,
                                style.astype(cdt), frame_valid, key=key)
        tdt = jnp.dtype(cfg.transfer_dtype)
        if tdt == jnp.float16:
            # real checkpoints emit [-1, 1] audio, where f16 is a no-op with
            # ~90 dB SNR; clamp to the finite range so out-of-spec weights
            # (e.g. random init in tests) degrade to clipping, never inf
            audio = jnp.clip(audio, -65504.0, 65504.0)
        return audio.astype(tdt), total

    def _get_jits(self):
        if self._frontend_jit is None:
            self._frontend_jit = jax.jit(self._run_frontend)
            self._acoustic_jit = jax.jit(
                self._run_acoustic, static_argnames=("num_frames",))
        return self._frontend_jit, self._acoustic_jit

    # ------------------------------------------------------------------
    # Public surface
    # ------------------------------------------------------------------

    @property
    def sample_rate(self):
        return self.config.sample_rate

    def phonemes_to_ids(self, phonemes: str):
        ids = [self.vocab.get(p) for p in phonemes]
        return [i for i in ids if i is not None]

    def __call__(self, phonemes: str, ref_s, speed: float = 1.0,
                 deterministic_noise: bool = False, seed: int = 0,
                 tight: bool = False):
        """Synthesize one phoneme string -> float32 audio (samples,).

        ref_s: (1, 256) style+speaker vector from a voice pack.
        """
        input_ids = self.phonemes_to_ids(phonemes)
        assert len(input_ids) + 2 <= self.context_length, (
            len(input_ids) + 2, self.context_length)
        ids_list = [0, *input_ids, 0]
        n = len(ids_list)
        lb = n if tight else _bucket(n, TOKEN_BUCKETS)
        ids = np.zeros((1, lb), dtype=np.int32)
        ids[0, :n] = ids_list
        valid = np.zeros((1, lb), dtype=bool)
        valid[0, :n] = True

        frontend, acoustic = self._get_jits()
        ref_s = jnp.asarray(ref_s, dtype=jnp.float32)
        if ref_s.ndim == 1:
            ref_s = ref_s[None]
        speed_arr = jnp.float32(speed)
        d, t_en, pred_dur, total_dev = frontend(
            self.params, jnp.asarray(ids), jnp.asarray(valid), ref_s,
            speed_arr)
        total_frames = int(total_dev)  # the one host sync (scalar fetch)
        if total_frames > FRAME_BUCKETS[-1] and not tight:
            import warnings

            warnings.warn(
                f"Kokoro segment predicts {total_frames} frames "
                f"(> max bucket {FRAME_BUCKETS[-1]}); clamping to "
                f"{FRAME_BUCKETS[-1] / 12.5:.0f}s of audio — split the text "
                f"into shorter segments (split_pattern).")
            total_frames = FRAME_BUCKETS[-1]
        fb = total_frames if tight else _bucket(total_frames, FRAME_BUCKETS)
        key = None if deterministic_noise else jax.random.PRNGKey(seed)
        audio, total = acoustic(self.params, d, t_en, pred_dur, ref_s,
                                num_frames=fb, key=key)
        samples = total_frames * self.samples_per_frame
        return (np.asarray(audio[0][:samples], dtype=np.float32),
                pred_dur)

    def generate(
        self,
        text: str,
        voice: Optional[str] = None,
        speed: float = 1.0,
        lang_code: str = "a",
        split_pattern: str = r"\n+",
        **kwargs,
    ):
        """Streaming generator of GenerationResult per text segment
        (parity: reference kokoro.py:293-367)."""
        from .pipeline import KokoroPipeline

        if lang_code not in self._pipelines:
            self._pipelines[lang_code] = KokoroPipeline(
                model=self,
                repo_id=self.repo_id or self.config.model_path or self.REPO_ID,
                lang_code=lang_code,
            )
        pipeline = self._pipelines[lang_code]
        if voice is None:
            voice = "af_heart"

        start = time.time()
        for segment_idx, (graphemes, phonemes, audio) in enumerate(
            pipeline(text, voice=voice, speed=speed, split_pattern=split_pattern)
        ):
            now = time.time()
            seg_time = now - start
            start = now
            samples = int(audio.shape[0]) if audio is not None else 0
            assert samples > 0, "No audio generated"
            token_count = len(phonemes) if phonemes else 0
            sr = self.config.sample_rate
            dur_s = samples / sr
            yield GenerationResult(
                audio=audio,
                samples=samples,
                sample_rate=sr,
                segment_idx=segment_idx,
                token_count=token_count,
                audio_duration=format_duration(dur_s),
                real_time_factor=round(seg_time / dur_s, 2) if dur_s > 0 else 0,
                prompt={
                    "tokens": token_count,
                    "tokens-per-sec": round(token_count / seg_time, 2)
                    if seg_time > 0 else 0,
                },
                audio_samples={
                    "samples": samples,
                    "samples-per-sec": round(samples / seg_time, 2)
                    if seg_time > 0 else 0,
                },
                processing_time_seconds=seg_time,
                peak_memory_usage=peak_memory_gb(),
            )
