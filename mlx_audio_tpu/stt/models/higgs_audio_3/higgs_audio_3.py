"""Higgs Audio v3 STT: Whisper-style tower + Qwen3 LM with VAD chunking.

Parity: /root/reference/mlx_audio/stt/models/higgs_audio_3/
(HiggsAudioEncoder with mean-pool-by-2 higgs_audio_3.py:105-130,
HiggsAudioFeatureProjector depthwise temporal conv :133-158, VAD-cut 4-s
chunking vad.py:58-88, chatml prompt with per-chunk audio splices
:262-300, <think> stripping :318-323).

TPU design: VAD chunks are padded to one static shape and encoded as a
single batch; the projected features splice into the prompt embedding on
host; decoding uses the shared compiled DEC_CHUNK stepper
(stt/models/qwen3_lm.py).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....dsp import log_mel_spectrogram
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_conv1d,
    init_linear,
)
from ....ops.rope import rope_freqs
from ....tts.models.moss_tts.config import Qwen3LMConfig
from ....tts.models.moss_tts.moss_tts import init_qwen3_lm
from ....tts.models.qwen3_tts.talker import qwen3_layer_forward
from ..base import STTOutput
from ..moss_transcribe_diarize.moss_transcribe_diarize import (
    init_whisper_encoder,
    whisper_encoder_forward,
)
from ..qwen3_lm import make_decode_fns, prompt_bucket, run_decode

Array = jax.Array

DEFAULT_PROMPT = ("Transcribe the speech. Output only the spoken words in "
                  "lowercase with no punctuation.")
DEFAULT_SILERO_REPO = "mlx-community/silero-vad"


@dataclass
class AudioEncoderConfig(BaseModelArgs):
    model_type: str = "higgs_audio_encoder"
    num_mel_bins: int = 128
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    d_model: int = 1280
    max_source_positions: int = 1500
    frame_rate: int = 25


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "higgs_audio_3"
    audio_encoder_config: AudioEncoderConfig = field(
        default_factory=AudioEncoderConfig)
    text_config: Optional[Qwen3LMConfig] = None
    model_path: Optional[str] = None
    audio_adapter_type: str = "stack"
    projector_type: str = "mlp"
    projector_temporal_downsample: int = 2
    audio_in_token_idx: int = 151672
    audio_out_token_idx: int = 151673
    audio_bos_token_id: int = 151669
    audio_eos_token_id: int = 151670
    chunk_size_seconds: float = 4.0
    pad_token_id: int = 151643
    sample_rate: int = 16000
    vad_cut: bool = True
    split_vads: bool = False

    def __post_init__(self):
        if isinstance(self.audio_encoder_config, dict):
            self.audio_encoder_config = AudioEncoderConfig.from_dict(
                self.audio_encoder_config)
        if self.text_config is None:
            self.text_config = Qwen3LMConfig(tie_word_embeddings=False)
        elif isinstance(self.text_config, dict):
            self.text_config = Qwen3LMConfig.from_dict(self.text_config)
        self.text_config.tie_word_embeddings = False


# ------------------------------------------------------- VAD chunking

def split_long(start: int, end: int, max_samples: int
               ) -> List[Tuple[int, int]]:
    out, pos = [], start
    while pos < end:
        nxt = min(end, pos + max_samples)
        out.append((pos, nxt))
        pos = nxt
    return out


def vad_chunk_ranges(wav: np.ndarray, chunk_samples: int, backend=None,
                     split_vads: bool = False) -> List[Tuple[int, int]]:
    """Chunk at VAD speech boundaries; plain splits without a backend
    (ref vad.py:58-88)."""
    total = len(wav)
    cuts: List[Tuple[int, int]] = []
    if backend is not None:
        try:
            cuts = backend(wav)
        except Exception:
            cuts = []
    if not cuts:
        return split_long(0, total, chunk_samples)
    if split_vads:
        spans = list(cuts)
    else:
        spans, prev_e = [], 0
        for idx, (start, end) in enumerate(cuts):
            s = min(prev_e, start)
            e = total if idx == len(cuts) - 1 else end
            if e > s:
                spans.append((s, e))
            prev_e = e
    out: List[Tuple[int, int]] = []
    for s, e in spans:
        out.extend(split_long(s, e, chunk_samples))
    return out or split_long(0, total, chunk_samples)


# ----------------------------------------------------------------- model

class Model(FunctionalModel):
    """Higgs Audio v3 speech understanding (ASR + instructions)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None
        self._vad_backend = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        cfg = self.config
        a, tc = cfg.audio_encoder_config, cfg.text_config
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        proj = {
            "linear1": init_linear(k3, a.d_model, 2048),
            "linear2": init_linear(k4, 2048, tc.hidden_size),
        }
        if cfg.projector_temporal_downsample > 1:
            proj["temporal"] = init_conv1d(k5, a.d_model, a.d_model, 3,
                                           groups=a.d_model)
        return {
            "audio_tower": init_whisper_encoder(k1, a),
            "audio_encoder_proj": proj,
            "language_model": init_qwen3_lm(k2, tc),
            "lm_head": init_linear(k6, tc.hidden_size, tc.vocab_size,
                                   bias=False),
        }

    def model_quant_predicate(self, path, w):
        return not path.startswith(("audio_tower", "audio_encoder_proj"))

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k == "audio_decoder_proj.text_lm_head.weight":
                out["lm_head.weight"] = v
                continue
            if k.startswith("model."):
                k = "language_model." + k[len("model."):]
            elif k in ("embed_tokens.weight", "norm.weight") or \
                    k.startswith("layers."):
                k = "language_model." + k
            if ("weight" in k and v.ndim == 3
                    and ("audio_tower.conv" in k
                         or "audio_encoder_proj.temporal" in k)):
                v = jnp.transpose(v, (2, 1, 0)) if v.shape[0] > v.shape[2] \
                    else v
            out[k] = v
        return out

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path), trust_remote_code=False)
        except Exception:
            model._tokenizer = None
        return model

    # ------------------------------------------------------------- audio

    def _mel(self, wav: np.ndarray) -> np.ndarray:
        """(T,) -> (frames, n_mels) whisper-normalized mel (no slaney
        scale — ref audio.py uses mel_scale=None/htk)."""
        mel = np.asarray(log_mel_spectrogram(
            jnp.asarray(wav, jnp.float32), n_fft=400, hop_length=160,
            n_mels=self.config.audio_encoder_config.num_mel_bins,
            sample_rate=16000, log_base="log10_whisper", mel_norm="slaney",
            mel_scale="htk"))
        return mel[:-1] if mel.shape[0] > 1 else mel

    def _vad_ranges(self, wav: np.ndarray):
        if not self.config.vad_cut:
            return None
        if self._vad_backend is None:
            def backend(w):
                from ....vad import load_model as load_vad

                m = load_vad(DEFAULT_SILERO_REPO)
                ts = m.get_speech_timestamps(
                    np.asarray(w, np.float32), sample_rate=self.sample_rate,
                    threshold=0.5, min_speech_duration_ms=250,
                    min_silence_duration_ms=100, speech_pad_ms=30,
                    return_seconds=False)
                return [(int(t["start"]), int(t["end"])) for t in ts
                        if t["end"] > t["start"]]

            self._vad_backend = backend
        return self._vad_backend

    def get_audio_features(self, wav: np.ndarray
                           ) -> Tuple[List[np.ndarray], int]:
        """VAD-chunk, encode as one batch -> per-chunk projected features."""
        cfg = self.config
        a = cfg.audio_encoder_config
        chunk = int(cfg.chunk_size_seconds * self.sample_rate)
        ranges = vad_chunk_ranges(wav, chunk, backend=self._vad_ranges(wav),
                                  split_vads=cfg.split_vads)
        pieces = [wav[s:e] for s, e in ranges]
        max_len = max(len(p) for p in pieces)
        mels = np.stack([self._mel(np.pad(p, (0, max_len - len(p))))
                         for p in pieces])
        key_ = ("enc", mels.shape[0], mels.shape[1])
        fn = self._jit_cache.get(key_)
        if fn is None:
            def enc(p, m):
                x = whisper_encoder_forward(p["audio_tower"], a, m,
                                            final_pool2=True)
                pr = p["audio_encoder_proj"]
                if "temporal" in pr:
                    x = apply_conv1d(pr["temporal"], x, stride=2, padding=1,
                                     groups=a.d_model)
                x = jax.nn.relu(apply_linear(pr["linear1"], x))
                return apply_linear(pr["linear2"], x)

            fn = jax.jit(enc)
            self._jit_cache[key_] = fn
        feats = np.asarray(fn(self.params, jnp.asarray(mels)))
        return [feats[i] for i in range(len(pieces))], len(pieces)

    # ------------------------------------------------------------ prompt

    def get_input_embeddings(self, wav: np.ndarray,
                             user_prompt: str = DEFAULT_PROMPT
                             ) -> Tuple[np.ndarray, int]:
        if self._tokenizer is None:
            raise RuntimeError("Tokenizer not initialized.")
        feats, n_chunks = self.get_audio_features(wav)
        enc = lambda s: list(self._tokenizer.encode(
            s, add_special_tokens=False))
        prefix = (enc("<|im_start|>user\n") + enc(user_prompt)
                  + enc("<|audio_bos|>"))
        suffix = (enc("<|audio_eos|>") + enc("<|im_end|>\n")
                  + enc("<|im_start|>assistant\n"))
        embed_w = self.params["language_model"]["embed_tokens"]
        pre = np.asarray(apply_embedding(
            embed_w, jnp.asarray([prefix], jnp.int32)))[0]
        suf = np.asarray(apply_embedding(
            embed_w, jnp.asarray([suffix], jnp.int32)))[0]
        embeds = np.concatenate([pre] + feats + [suf], axis=0)
        return embeds[None], embeds.shape[0]

    # ------------------------------------------------------------ decode

    def _lm_forward(self, p, embeds, caches, offset, pad_mask):
        tc = self.config.text_config
        x = embeds
        t = x.shape[1]
        positions = offset + jnp.arange(t)[None, :]
        inv_freq = rope_freqs(tc.head_dim, tc.rope_theta)
        new_caches = []
        for i in range(tc.num_hidden_layers):
            x, nc = qwen3_layer_forward(
                p["language_model"]["layers"][str(i)], x, positions,
                inv_freq, tc.num_attention_heads, tc.num_key_value_heads,
                tc.head_dim, tc.rms_norm_eps, caches[i], offset, pad_mask,
                causal=True)
            new_caches.append(nc)
        return apply_rms_norm(p["language_model"]["norm"], x,
                              tc.rms_norm_eps), new_caches

    @staticmethod
    def parse_output(text: str) -> str:
        text = re.sub(r"<think>.*?</think>", "", text, flags=re.DOTALL)
        if "<think>" in text:
            text = text[text.index("<think>") + len("<think>"):]
        return re.sub(r"<\|.*?\|>", "", text).strip()

    def generate(self, audio, *, max_tokens: int = 1024,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, min_p: float = 0.0,
                 repetition_penalty: float = 1.0,
                 repetition_context_size: int = 20,
                 min_tokens_to_keep: int = 1,
                 prompt: str = DEFAULT_PROMPT,
                 seed: int = 0, verbose: bool = False,
                 **kwargs) -> STTOutput:
        t0 = time.time()
        if isinstance(audio, list):
            audio = audio[0]
        if isinstance(audio, str):
            from ...utils import load_audio

            audio = load_audio(audio, sample_rate=self.sample_rate)
        wav = np.asarray(audio, np.float32).reshape(-1)
        embeds, prompt_len = self.get_input_embeddings(wav, prompt)
        pb = prompt_bucket(prompt_len)
        padded = np.zeros((1, pb, embeds.shape[-1]), np.float32)
        padded[:, :prompt_len] = embeds
        key_ = ("lm", pb, temperature, top_k, top_p, min_p,
                repetition_penalty, repetition_context_size,
                min_tokens_to_keep)
        fns = self._jit_cache.get(key_)
        if fns is None:
            fns = make_decode_fns(
                text_config=self.config.text_config,
                lm_params=lambda p: p["language_model"],
                logits_fn=lambda p, h: apply_linear(p["lm_head"], h),
                forward_fn=self._lm_forward, bucket=pb,
                temperature=temperature, top_k=top_k, top_p=top_p,
                min_p=min_p, min_tokens_to_keep=min_tokens_to_keep,
                repetition_penalty=repetition_penalty,
                repetition_context_size=repetition_context_size,
                eos_ids=(151645, 151643))
            self._jit_cache[key_] = fns
        tokens = run_decode(self, fns, padded, prompt_len,
                            max_tokens=max_tokens, seed=seed)
        text = self.parse_output(self._tokenizer.decode(
            tokens, skip_special_tokens=False))
        if verbose:
            print(text)
        wall = time.time() - t0
        return STTOutput(
            text=text, segments=[{"start": 0.0, "end": wall, "text": text}],
            prompt_tokens=prompt_len, generation_tokens=len(tokens),
            total_tokens=prompt_len + len(tokens), total_time=wall,
            generation_tps=len(tokens) / wall if wall else 0.0)


__all__ = ["Model", "ModelConfig", "AudioEncoderConfig", "vad_chunk_ranges",
           "split_long", "DEFAULT_PROMPT"]
