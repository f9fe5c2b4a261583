"""MOSS-Music: conv2d-stem audio encoder + deepstack-injected Qwen3 LM.

Parity: /root/reference/mlx_audio/stt/models/moss_music/
(MossMusicEncoder :105-215 — conv2d x3 stride-2 stem over (mel, time),
sinusoidal positions, deepstack captures at layers [8,16,24];
GatedMLP adapter + per-deepstack mergers injected into the first N LM
layers :254-319; time-marker audio spans processor.py:97-135; structured
timestamp segment parsing :551-702).

TPU design: mel chunks (n_window*2 frames) run through one static-shape
batched encoder program; deepstack features merge on host into the padded
prompt embedding streams; the prefill compiles once per prompt bucket with
per-layer deepstack addition, and decode is the DEC_CHUNK lax.scan stepper
(deepstack contributes nothing past the prompt).
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Generator, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....dsp import log_mel_spectrogram
from ....model import FunctionalModel
from ....nn import (
    apply_conv2d,
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_conv2d,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache
from ....ops.rope import rope_freqs
from ....ops.sampling import make_sampler
from ....nn import apply_rms_norm, init_rms_norm
from ....tts.models.qwen3_tts.talker import (
    init_qwen3_layer,
    qwen3_layer_forward,
)
from ..base import STTOutput

Array = jax.Array

DEC_CHUNK = 32
PROMPT_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)


@dataclass
class StreamingResult:
    text: str
    is_final: bool
    start_time: float
    end_time: float
    language: str = "en"
    prompt_tokens: int = 0
    generation_tokens: int = 0


@dataclass
class AudioEncoderConfig(BaseModelArgs):
    model_type: str = "moss_music_audio_encoder"
    d_model: int = 1280
    output_dim: int = 1280
    num_mel_bins: int = 128
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    downsample_hidden_size: int = 480
    max_source_positions: int = 1500
    layer_norm_eps: float = 1e-5
    n_window: int = 200
    conv_chunksize: int = 64
    deepstack_encoder_layer_indexes: List[int] = field(
        default_factory=lambda: [8, 16, 24])


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "moss_music"
    audio_config: AudioEncoderConfig = field(
        default_factory=AudioEncoderConfig)
    language_config: Optional[Any] = None
    adapter_hidden_size: int = 8192
    deepstack_num_inject_layers: int = 3
    model_path: Optional[str] = None
    sample_rate: int = 16000
    audio_token_id: int = 151654
    audio_start_id: int = 151669
    audio_end_id: int = 151670
    bos_token_id: int = 151643
    eos_token_id: int = 151645
    pad_token_id: int = 151643
    enable_time_marker: bool = True
    strip_thinking: bool = True
    default_prompt: str = ("Please give a detailed musical description of "
                           "this clip.")

    def __post_init__(self):
        from ....tts.models.moss_tts.config import Qwen3LMConfig

        if isinstance(self.audio_config, dict):
            self.audio_config = AudioEncoderConfig.from_dict(
                self.audio_config)
        if self.language_config is None:
            self.language_config = Qwen3LMConfig(tie_word_embeddings=False)
        elif isinstance(self.language_config, dict):
            self.language_config = Qwen3LMConfig.from_dict(
                self.language_config)


def sinusoids(length: int, channels: int) -> np.ndarray:
    log_ts = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_ts * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def conv3_downsample_len(n: int) -> int:
    for _ in range(3):
        n = (int(n) - 1) // 2 + 1
    return n


# ------------------------------------------------------------------ init

def init_music_encoder(key, a: AudioEncoderConfig) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * a.encoder_layers))
    d, h = a.d_model, a.downsample_hidden_size
    freq_after = conv3_downsample_len(a.num_mel_bins)
    layers = {}
    for i in range(a.encoder_layers):
        layers[str(i)] = {
            "self_attn": {
                "q_proj": init_linear(next(ks), d, d),
                "k_proj": init_linear(next(ks), d, d, bias=False),
                "v_proj": init_linear(next(ks), d, d),
                "out_proj": init_linear(next(ks), d, d)},
            "self_attn_layer_norm": init_layer_norm(d),
            "fc1": init_linear(next(ks), d, a.encoder_ffn_dim),
            "fc2": init_linear(next(ks), a.encoder_ffn_dim, d),
            "final_layer_norm": init_layer_norm(d)}
    p = {"conv1": init_conv2d(next(ks), 1, h, 3),
         "conv2": init_conv2d(next(ks), h, h, 3),
         "conv3": init_conv2d(next(ks), h, h, 3),
         "stem_proj": init_linear(next(ks), h * freq_after, d),
         "layers": layers,
         "layer_norm": init_layer_norm(d)}
    if a.output_dim != a.d_model:
        p["out_proj"] = init_linear(next(ks), d, a.output_dim, bias=False)
    return p


def music_encoder_forward(p: dict, a: AudioEncoderConfig, mel: Array,
                          lengths: Array, capture: Sequence[int]
                          ) -> Tuple[Array, List[Array]]:
    """mel (B, n_mels, T) -> (features (B, T', out), deepstack list)."""
    x = mel[..., None]                     # (B, F, T, 1) NHWC over (F, T)
    x = jax.nn.gelu(apply_conv2d(p["conv1"], x, stride=2, padding=1))
    x = jax.nn.gelu(apply_conv2d(p["conv2"], x, stride=2, padding=1))
    x = jax.nn.gelu(apply_conv2d(p["conv3"], x, stride=2, padding=1))
    b, f, t, c = x.shape
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f)
    x = apply_linear(p["stem_proj"], x)
    pos = jnp.asarray(sinusoids(a.max_source_positions, a.d_model))[:t]
    x = x + pos[None].astype(x.dtype)
    down = lengths
    mask = jnp.where(jnp.arange(t)[None, None, None, :]
                     < down[:, None, None, None], 0.0, -jnp.inf)
    nh = a.encoder_attention_heads
    hd = a.d_model // nh
    deepstack: List[Array] = []
    for i in range(a.encoder_layers):
        blk = p["layers"][str(i)]
        h = apply_layer_norm(blk["self_attn_layer_norm"], x,
                             a.layer_norm_eps)
        at = blk["self_attn"]
        q = apply_linear(at["q_proj"], h).reshape(b, t, nh, hd)
        k = apply_linear(at["k_proj"], h).reshape(b, t, nh, hd)
        v = apply_linear(at["v_proj"], h).reshape(b, t, nh, hd)
        x = x + apply_linear(at["out_proj"],
                             attention(q, k, v, mask=mask).reshape(b, t, -1))
        h = apply_layer_norm(blk["final_layer_norm"], x, a.layer_norm_eps)
        x = x + apply_linear(blk["fc2"],
                             jax.nn.gelu(apply_linear(blk["fc1"], h)))
        if i in capture:
            deepstack.append(x)
    x = apply_layer_norm(p["layer_norm"], x, a.layer_norm_eps)
    if "out_proj" in p:
        x = apply_linear(p["out_proj"], x)
        deepstack = [apply_linear(p["out_proj"], s) for s in deepstack]
    return x, deepstack


def _init_gated_mlp(key, in_dim: int, hidden: int, out_dim: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {"gate_proj": init_linear(k1, in_dim, hidden, bias=False),
            "up_proj": init_linear(k2, in_dim, hidden, bias=False),
            "down_proj": init_linear(k3, hidden, out_dim, bias=False)}


def _gated_mlp(p: dict, x: Array) -> Array:
    return apply_linear(p["down_proj"],
                        jax.nn.silu(apply_linear(p["gate_proj"], x))
                        * apply_linear(p["up_proj"], x))


# ----------------------------------------------------------------- model

class Model(FunctionalModel):
    """MOSS-Music audio-understanding LM (music captioning / analysis)."""

    _TIME_VALUE = (r"(?:\d{1,2}:\d{2}(?::\d{2})?(?:[.,]\d+)?"
                   r"|\d+(?:[.,]\d+)?\s*s"
                   r"|\d+(?:[.,]\d+)?)")
    _LINE_TIME_VALUE = (r"(?:\d{1,2}:\d{2}(?::\d{2})?(?:[.,]\d+)?"
                        r"|\d+(?:[.,]\d+)?\s*s)")
    _RANGE_SEP = r"(?:-|\u2013|\u2014|~|to|\u2192)"
    _BRACKETED_RE = re.compile(
        rf"(?P<open>[\[\(<\u3010])\s*(?P<start>{_TIME_VALUE})\s*"
        rf"(?:(?:{_RANGE_SEP})\s*(?P<end>{_TIME_VALUE}))?"
        rf"\s*(?P<close>[\]\)>\u3011])", re.IGNORECASE)
    _LINE_RE = re.compile(
        rf"(?m)(?:^|\n)\s*(?P<start>{_LINE_TIME_VALUE})\s*"
        rf"(?:(?:{_RANGE_SEP})\s*(?P<end>{_LINE_TIME_VALUE}))?"
        r"\s*[:\uff1a\-\u2013\u2014]\s*", re.IGNORECASE)

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None
        self._digit_token_ids: Optional[Dict[str, int]] = None
        self.audio_tokens_per_second = 12.5
        self.time_marker_every_seconds = 2

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def _n_deepstack(self) -> int:
        n = len(self.config.audio_config.deepstack_encoder_layer_indexes
                or [])
        if self.config.deepstack_num_inject_layers is not None:
            n = min(n, int(self.config.deepstack_num_inject_layers))
        return n

    def init_params(self, key):
        from ....tts.models.moss_tts.moss_tts import init_qwen3_lm

        cfg = self.config
        a, tc = cfg.audio_config, cfg.language_config
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return {
            "audio_encoder": init_music_encoder(k1, a),
            "language_model": init_qwen3_lm(k2, tc),
            "audio_adapter": _init_gated_mlp(
                k3, a.output_dim, cfg.adapter_hidden_size, tc.hidden_size),
            "deepstack_audio_merger_list": {
                str(i): _init_gated_mlp(k, a.output_dim,
                                        cfg.adapter_hidden_size,
                                        tc.hidden_size)
                for i, k in enumerate(jax.random.split(
                    k4, max(self._n_deepstack(), 1))[:self._n_deepstack()])},
            "lm_head": init_linear(k5, tc.hidden_size, tc.vocab_size,
                                   bias=False),
        }

    def model_quant_predicate(self, path, w):
        return not path.startswith("audio_encoder")

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k == "audio_encoder.embed_positions.inv_timescales":
                continue
            m = re.match(r"(audio_encoder\.layers\.\d+)\."
                         r"(q_proj|k_proj|v_proj|out_proj)\.(.+)", k)
            if m:
                k = f"{m.group(1)}.self_attn.{m.group(2)}.{m.group(3)}"
            if (k.startswith("audio_encoder.conv") and k.endswith(".weight")
                    and v.ndim == 4):
                # torch (out, in, kh, kw) -> repo conv2d (kh, kw, in, out)
                if v.shape[-1] != v.shape[-2]:
                    v = jnp.transpose(v, (2, 3, 1, 0))
                elif v.shape[0] > 4 and v.shape[1] <= 4 and v.shape[2] == 3:
                    v = jnp.transpose(v, (2, 3, 1, 0))
            out[k] = v
        return out

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path), trust_remote_code=False, use_fast=False)
            digits = {}
            for d in "0123456789":
                ids = model._tokenizer.encode(d, add_special_tokens=False)
                if len(ids) == 1:
                    digits[d] = int(ids[0])
            model._digit_token_ids = digits if len(digits) == 10 else None
        except Exception:
            model._tokenizer = None
        return model

    # ------------------------------------------------------------- audio

    def _mel(self, wav: np.ndarray) -> np.ndarray:
        """(T,) -> (n_mels, frames), whisper-normalized slaney mel."""
        mel = np.asarray(log_mel_spectrogram(
            jnp.asarray(wav, jnp.float32), n_fft=400, hop_length=160,
            n_mels=self.config.audio_config.num_mel_bins, sample_rate=16000,
            log_base="log10_whisper", mel_norm="slaney", mel_scale="slaney",
            precise=True))
        if mel.shape[0] > 1:
            mel = mel[:-1]
        return mel.T

    def encode_audio(self, wav: np.ndarray
                     ) -> Tuple[np.ndarray, List[np.ndarray], int, float]:
        """-> (adapted (n_tok, D_lm), deepstack [(n_tok, D_lm)], n_tok,
        duration)."""
        cfg = self.config
        a = cfg.audio_config
        duration = len(wav) / self.sample_rate
        mel = self._mel(wav)               # (n_mels, T)
        chunk_frames = a.n_window * 2
        chunks, lengths = [], []
        for start in range(0, max(mel.shape[1], 1), chunk_frames):
            piece = mel[:, start:start + chunk_frames]
            lengths.append(conv3_downsample_len(piece.shape[1]))
            if piece.shape[1] < chunk_frames:
                piece = np.pad(piece,
                               ((0, 0), (0, chunk_frames - piece.shape[1])))
            chunks.append(piece)
        batch = np.stack(chunks)
        capture = tuple(a.deepstack_encoder_layer_indexes
                        [:self._n_deepstack()])
        key_ = ("enc", batch.shape[0], capture)
        fn = self._jit_cache.get(key_)
        if fn is None:
            fn = jax.jit(lambda p, m, ln: music_encoder_forward(
                p["audio_encoder"], a, m, ln, capture))
            self._jit_cache[key_] = fn
        feats, deepstack = fn(self.params, jnp.asarray(batch),
                              jnp.asarray(lengths, jnp.int32))
        feats = np.asarray(feats)
        deepstack = [np.asarray(d) for d in deepstack]
        parts = [feats[i, :lengths[i]] for i in range(len(lengths))]
        flat = np.concatenate(parts, axis=0)
        ds_flat = [np.concatenate([d[i, :lengths[i]]
                                   for i in range(len(lengths))], axis=0)
                   for d in deepstack]

        adapted = np.asarray(_gated_mlp(self.params["audio_adapter"],
                                        jnp.asarray(flat)))
        mergers = self.params["deepstack_audio_merger_list"]
        ds_merged = [np.asarray(_gated_mlp(mergers[str(i)],
                                           jnp.asarray(ds_flat[i])))
                     for i in range(min(len(ds_flat), self._n_deepstack()))]
        return adapted, ds_merged, flat.shape[0], duration

    # ------------------------------------------------------------ prompt

    def _audio_span_ids(self, n: int, enable_time_marker: Optional[bool]
                        ) -> List[int]:
        cfg = self.config
        use = cfg.enable_time_marker if enable_time_marker is None \
            else bool(enable_time_marker)
        if not use or self._digit_token_ids is None or n <= 0:
            return [cfg.audio_token_id] * max(n, 0)
        per = int(self.audio_tokens_per_second
                  * self.time_marker_every_seconds)
        out, consumed = [], 0
        for sec in range(self.time_marker_every_seconds,
                         int(n / self.audio_tokens_per_second) + 1,
                         self.time_marker_every_seconds):
            pos = (sec // self.time_marker_every_seconds) * per
            if pos - consumed > 0:
                out.extend([cfg.audio_token_id] * (pos - consumed))
                consumed = pos
            out.extend(self._digit_token_ids[d] for d in str(sec))
        if n - consumed > 0:
            out.extend([cfg.audio_token_id] * (n - consumed))
        return out

    def _build_prompt_ids(self, text: str, n_audio: Optional[int],
                          enable_time_marker: Optional[bool]) -> List[int]:
        if self._tokenizer is None:
            raise RuntimeError("Tokenizer is not initialized.")
        enc = lambda s: list(self._tokenizer.encode(
            s, add_special_tokens=False))
        head = ("<|im_start|>system\nYou are a helpful assistant."
                "<|im_end|>\n<|im_start|>user\n")
        tail = f"{text}<|im_end|>\n<|im_start|>assistant\n"
        if n_audio is None:
            return enc(head + tail)
        cfg = self.config
        return (enc(head) + [cfg.audio_start_id]
                + self._audio_span_ids(n_audio, enable_time_marker)
                + [cfg.audio_end_id] + enc("\n" + tail))

    # ------------------------------------------------------------ decode

    def _lm_forward(self, p, embeds, caches, offset, pad_mask=None,
                    deepstack=None):
        tc = self.config.language_config
        b, t, _ = embeds.shape
        x = embeds
        positions = offset + jnp.arange(t)[None, :]
        inv_freq = rope_freqs(tc.head_dim, tc.rope_theta)
        new_caches = []
        for i in range(tc.num_hidden_layers):
            x, nc = qwen3_layer_forward(
                p["language_model"]["layers"][str(i)], x, positions,
                inv_freq, tc.num_attention_heads, tc.num_key_value_heads,
                tc.head_dim, tc.rms_norm_eps,
                caches[i] if caches is not None else None, offset,
                pad_mask, causal=True)
            if deepstack is not None and i < len(deepstack):
                x = x + deepstack[i]
            if caches is not None:
                new_caches.append(nc)
        x = apply_rms_norm(p["language_model"]["norm"], x, tc.rms_norm_eps)
        return x, (new_caches if caches is not None else None)

    def _lm_fns(self, bucket: int, sampling, n_ds: int):
        key_ = ("lm", bucket, tuple(sampling), n_ds)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        tc = self.config.language_config
        cap = bucket + 2048
        (temperature, top_k, top_p, min_p, repetition_penalty,
         repetition_context_size, min_tokens_to_keep) = sampling
        sampler = make_sampler(temperature=temperature, top_k=top_k,
                               top_p=top_p, min_p=min_p,
                               min_tokens_to_keep=min_tokens_to_keep,
                               repetition_penalty=repetition_penalty)
        use_rep = repetition_penalty != 1.0
        eos = jnp.asarray([self.config.eos_token_id], jnp.int32)

        def prefill(p, embeds, deepstack, length):
            caches = [KVCache.init(1, cap, tc.num_key_value_heads,
                                   tc.head_dim, jnp.float32)
                      for _ in range(tc.num_hidden_layers)]
            pad = jnp.where(jnp.arange(cap) < length, 0.0,
                            -jnp.inf)[None, None, None, :]
            hidden, caches = self._lm_forward(p, embeds, caches, 0, pad,
                                              deepstack)
            idx = jnp.clip(length - 1, 0, bucket - 1)
            last = jax.lax.dynamic_slice_in_dim(hidden, idx, 1, axis=1)
            return apply_linear(p["lm_head"], last)[:, 0], caches

        def chunk(p, lg, caches, t0, rng, done):
            hist0 = jnp.full((1, max(repetition_context_size, 1)), -1,
                             jnp.int32)

            def body(carry, i):
                lg, caches, key, done, hist = carry
                key, sub = jax.random.split(key)
                tok = sampler(sub, lg, hist if use_rep else None) \
                    .astype(jnp.int32)
                done2 = jnp.logical_or(done, jnp.any(tok[0] == eos))
                hist = jnp.concatenate([hist[:, 1:], tok[:, None]],
                                       axis=1) if use_rep else hist
                emb = apply_embedding(
                    p["language_model"]["embed_tokens"], tok[:, None])
                hidden, caches = self._lm_forward(p, emb, caches, t0 + i)
                return (apply_linear(p["lm_head"], hidden)[:, -1], caches,
                        key, done2, hist), jnp.where(done2, -1, tok[0])

            (lg, caches, rng, done, _), toks = jax.lax.scan(
                body, (lg, caches, rng, done, hist0),
                jnp.arange(DEC_CHUNK))
            return lg, caches, rng, done, toks

        fns = (jax.jit(prefill), jax.jit(chunk))
        self._jit_cache[key_] = fns
        return fns

    def _decode(self, ids: List[int], audio: Optional[np.ndarray],
                deepstack: Optional[List[np.ndarray]], max_tokens: int,
                sampling, seed: int, on_token=None) -> List[int]:
        if isinstance(sampling, float):
            sampling = (sampling, 0, 1.0, 0.0, 1.0, 20, 1)
        cfg = self.config
        n = len(ids)
        pb = next((b for b in PROMPT_BUCKETS if n <= b),
                  ((n + 511) // 512) * 512)
        tok_ids = np.zeros((1, pb), np.int32)
        tok_ids[0, :n] = ids
        arr = np.asarray(ids)
        pos = np.flatnonzero(arr == cfg.audio_token_id)
        embeds = np.asarray(apply_embedding(
            self.params["language_model"]["embed_tokens"],
            jnp.asarray(tok_ids)), np.float32).copy()
        n_ds = 0
        ds_pad = None
        if audio is not None:
            if len(pos) != len(audio):
                raise ValueError(
                    f"Audio token count mismatch: prompt has {len(pos)} "
                    f"tokens but encoder produced {len(audio)} embeddings.")
            embeds[0, pos] = audio
            if deepstack:
                n_ds = len(deepstack)
                ds_pad = np.zeros((n_ds, 1, pb, embeds.shape[-1]),
                                  np.float32)
                for i, d in enumerate(deepstack):
                    ds_pad[i, 0, pos] = d
        prefill, chunk = self._lm_fns(pb, sampling, n_ds)
        ds_arg = [jnp.asarray(ds_pad[i]) for i in range(n_ds)] \
            if ds_pad is not None else None
        lg, caches = prefill(self.params, jnp.asarray(embeds), ds_arg,
                             jnp.int32(n))
        rng = jax.random.PRNGKey(seed)
        done = jnp.bool_(False)
        t = jnp.int32(n)
        out: List[int] = []
        while len(out) < max_tokens:
            lg, caches, rng, done, toks = chunk(self.params, lg, caches, t,
                                                rng, done)
            t = t + DEC_CHUNK
            arr2 = np.asarray(toks)
            new = [int(x) for x in arr2[arr2 >= 0]][:max_tokens - len(out)]
            out.extend(new)
            if on_token is not None:
                for x in new:
                    on_token(x)
            if bool(done):
                break
        return out

    # -------------------------------------------------- segment parsing

    @staticmethod
    def _strip_thinking(text: str) -> str:
        text = re.sub(r"<think>.*?</think>", "", text, flags=re.DOTALL)
        text = re.sub(r"^\s*<think>.*", "", text, flags=re.DOTALL)
        return text.strip()

    @staticmethod
    def _parse_ts(value: str) -> float:
        value = value.strip().lower().replace(",", ".")
        if value.endswith("s"):
            value = value[:-1].strip()
        parts = value.split(":")
        if len(parts) == 3:
            return int(parts[0]) * 3600 + int(parts[1]) * 60 + float(parts[2])
        if len(parts) == 2:
            return int(parts[0]) * 60 + float(parts[1])
        return float(value)

    @classmethod
    def _collect_markers(cls, text: str):
        markers = []
        for pat in (cls._BRACKETED_RE, cls._LINE_RE):
            for m in pat.finditer(text):
                try:
                    start = cls._parse_ts(m.group("start"))
                    end = cls._parse_ts(m.group("end")) if m.group("end") \
                        else None
                except ValueError:
                    continue
                markers.append((m.start(), m.end(), start, end,
                                m.group(0).strip()))
        markers.sort(key=lambda x: (x[0], x[1]))
        deduped, last_end = [], -1
        for mk in markers:
            if mk[0] < last_end:
                continue
            deduped.append(mk)
            last_end = mk[1]
        return deduped

    @classmethod
    def parse_structured_segments(cls, text: str, *,
                                  audio_duration: Optional[float] = None,
                                  total_time: Optional[float] = None
                                  ) -> List[Dict[str, object]]:
        markers = cls._collect_markers(text)
        fallback_end = audio_duration if audio_duration is not None \
            else (total_time or 0.0)
        if not markers:
            return [{"text": text, "start": 0.0,
                     "end": round(float(fallback_end), 3), "kind": "text",
                     "marker": None}]
        segments = []
        for i, (s0, s1, start, end, raw) in enumerate(markers):
            body_end = markers[i + 1][0] if i + 1 < len(markers) \
                else len(text)
            seg_text = re.sub(r"^[\s:\uff1a,;|\-\u2013\u2014>]+", "",
                              text[s1:body_end].strip())
            seg_text = re.sub(r"[\s|]+$", "", seg_text).strip()
            if not seg_text and end is None:
                continue
            e = end
            if e is None and i + 1 < len(markers):
                e = markers[i + 1][2]
            if e is None:
                e = fallback_end
            e = max(e, start)
            segments.append({"text": seg_text,
                             "start": round(float(start), 3),
                             "end": round(float(e), 3),
                             "kind": "timestamped_text", "marker": raw})
        if not segments:
            return [{"text": text, "start": 0.0,
                     "end": round(float(fallback_end), 3), "kind": "text",
                     "marker": None}]
        return segments

    # ---------------------------------------------------------- generate

    def _load_audio(self, audio) -> Optional[np.ndarray]:
        if audio is None:
            return None
        if isinstance(audio, str):
            from ...utils import load_audio

            audio = load_audio(audio, sample_rate=self.sample_rate)
        wav = np.asarray(audio, np.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=0 if wav.shape[0] <= 8 else 1)
        return wav.reshape(-1)

    def generate(self, audio=None, *, max_tokens: int = 1024,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, min_p: float = 0.0,
                 repetition_penalty: float = 1.0,
                 repetition_context_size: int = 20,
                 min_tokens_to_keep: int = 1,
                 prompt: Optional[str] = None,
                 strip_thinking: Optional[bool] = None,
                 enable_time_marker: Optional[bool] = None,
                 stream: bool = False, seed: int = 0,
                 verbose: bool = False, **kwargs
                 ) -> Union[STTOutput, Generator[StreamingResult, None,
                                                 None]]:
        sampling = (float(temperature), int(top_k), float(top_p),
                    float(min_p), float(repetition_penalty),
                    int(repetition_context_size), int(min_tokens_to_keep))
        if stream:
            return self._stream(audio, max_tokens=max_tokens,
                                temperature=sampling, prompt=prompt,
                                enable_time_marker=enable_time_marker,
                                seed=seed)
        t0 = time.time()
        wav = self._load_audio(audio)
        feats = ds = None
        n_audio = None
        duration = None
        if wav is not None:
            feats, ds, n_audio, duration = self.encode_audio(wav)
        ids = self._build_prompt_ids(prompt or self.config.default_prompt,
                                     n_audio, enable_time_marker)
        gen = self._decode(ids, feats, ds, max_tokens, sampling, seed)
        text = self._tokenizer.decode(gen, skip_special_tokens=True)
        if verbose:
            print(text)
        do_strip = self.config.strip_thinking if strip_thinking is None \
            else strip_thinking
        if do_strip:
            text = self._strip_thinking(text)
        wall = time.time() - t0
        return STTOutput(
            text=text,
            segments=self.parse_structured_segments(
                text, audio_duration=duration, total_time=wall),
            prompt_tokens=len(ids), generation_tokens=len(gen),
            total_tokens=len(ids) + len(gen), total_time=wall,
            generation_tps=len(gen) / wall if wall else 0.0)

    def _stream(self, audio, *, max_tokens, temperature, prompt,
                enable_time_marker, seed
                ) -> Generator[StreamingResult, None, None]:
        wav = self._load_audio(audio)
        feats = ds = None
        n_audio = None
        if wav is not None:
            feats, ds, n_audio, _ = self.encode_audio(wav)
        ids = self._build_prompt_ids(prompt or self.config.default_prompt,
                                     n_audio, enable_time_marker)
        pieces: List[str] = []

        def on_token(tok):
            pieces.append(self._tokenizer.decode(
                [tok], skip_special_tokens=True))

        gen = self._decode(ids, feats, ds, max_tokens, temperature, seed,
                           on_token=on_token)
        for i, piece in enumerate(pieces):
            yield StreamingResult(text=piece, is_final=False, start_time=0.0,
                                  end_time=0.0, prompt_tokens=len(ids),
                                  generation_tokens=i + 1)
        yield StreamingResult(text="", is_final=True, start_time=0.0,
                              end_time=0.0, prompt_tokens=len(ids),
                              generation_tokens=len(gen))


__all__ = ["Model", "ModelConfig", "AudioEncoderConfig", "StreamingResult",
           "init_music_encoder", "music_encoder_forward",
           "conv3_downsample_len", "sinusoids"]
