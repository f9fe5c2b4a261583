"""MOSS-Transcribe-Diarize: Whisper encoder + Qwen3 LM, speaker-tagged output.

Parity: /root/reference/mlx_audio/stt/models/moss_transcribe_diarize/
(MossWhisperEncoder :62-88, VQAdaptor :46-59, time_merge x4 :109-115,
time-marker audio spans :428-463, [t][Sxx]text[t] segment parsing :28-32,
chatml prompt :465-516, generate/stream :584-729).

TPU design: 30-s mel chunks run through a static-shape encoder batch; the
merged+adapted audio embeddings are spliced into the prompt embedding on
host once, and decoding is the compiled DEC_CHUNK stepper (lax.scan with
in-graph EOS masking) over fixed-capacity KV caches, sharing the qwen3 LM
stack with tts/models/moss_tts.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass
from typing import Any, Dict, Generator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention
from ....ops.kvcache import KVCache
from ....ops.sampling import make_sampler
from ....tts.models.moss_tts.moss_tts import init_qwen3_lm, qwen3_lm_forward
from ....tts.models.moss_tts.config import Qwen3LMConfig
from ....dsp import log_mel_spectrogram
from ..base import STTOutput

Array = jax.Array

DEC_CHUNK = 32
WHISPER_ENCODER_STRIDE = 2
MEL_CHUNK_FRAMES = 3000            # 30 s at hop 160
PROMPT_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)
DEFAULT_PROMPT = (
    "Transcribe the audio into text. Start each segment with the start "
    "timestamp and speaker label ([S01], [S02], [S03], ...), write the "
    "corresponding spoken content, and end each segment with the ending "
    "timestamp to clearly mark the segment range.")
SEGMENT_RE = re.compile(
    r"\[(?P<start>\d+(?:\.\d+)?)\]\[(?P<speaker>S\d+)\]"
    r"(?P<text>.*?)\[(?P<end>\d+(?:\.\d+)?)\]", re.DOTALL)


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
class AudioConfig(BaseModelArgs):
    model_type: str = "whisper"
    num_mel_bins: int = 80
    d_model: int = 1024
    encoder_layers: int = 24
    encoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    max_source_positions: int = 1500


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "moss_transcribe_diarize"
    text_config: Optional[Qwen3LMConfig] = None
    audio_config: Optional[AudioConfig] = None
    audio_token_id: int = 151671
    audio_merge_size: int = 4
    adaptor_input_dim: Optional[int] = None
    tie_word_embeddings: bool = True
    sample_rate: int = 16000

    def __post_init__(self):
        if self.audio_config is None:
            self.audio_config = AudioConfig()
        elif isinstance(self.audio_config, dict):
            self.audio_config = AudioConfig.from_dict(self.audio_config)
        if self.text_config is None:
            self.text_config = Qwen3LMConfig()
        elif isinstance(self.text_config, dict):
            self.text_config = Qwen3LMConfig.from_dict(self.text_config)
        self.text_config.tie_word_embeddings = self.tie_word_embeddings
        if self.adaptor_input_dim is None:
            self.adaptor_input_dim = (self.audio_config.d_model
                                      * self.audio_merge_size)


# ------------------------------------------------------------------ init

def init_whisper_encoder(key, a: AudioConfig) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * a.encoder_layers))
    d = a.d_model
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
    return {
        "conv1": init_conv1d(next(ks), a.num_mel_bins, d, 3),
        "conv2": init_conv1d(next(ks), d, d, 3),
        "embed_positions": init_embedding(next(ks),
                                          a.max_source_positions, d),
        "layers": layers,
        "layer_norm": init_layer_norm(d)}


def whisper_encoder_forward(p: dict, a, mel: Array,
                            valid: Optional[Array] = None,
                            final_pool2: bool = False) -> Array:
    """(B, T, n_mels) -> (B, T//2, d) (or T//4 with final_pool2, used by
    higgs_audio_3's mean-pool-by-2 before the final LayerNorm)."""
    x = jax.nn.gelu(apply_conv1d(p["conv1"], mel, padding=1),
                    approximate=False)
    x = jax.nn.gelu(apply_conv1d(p["conv2"], x, stride=2, padding=1),
                    approximate=False)
    b, t, d = x.shape
    x = x + p["embed_positions"]["weight"][None, :t]
    mask = None
    if valid is not None:
        mask = jnp.where(jnp.arange(t)[None, None, None, :]
                         < valid[:, None, None, None], 0.0, -jnp.inf)
    nh = a.encoder_attention_heads
    hd = d // nh
    for i in range(a.encoder_layers):
        blk = p["layers"][str(i)]
        h = apply_layer_norm(blk["self_attn_layer_norm"], x)
        at = blk["self_attn"]
        q = apply_linear(at["q_proj"], h).reshape(b, t, nh, hd)
        k = apply_linear(at["k_proj"], h).reshape(b, t, nh, hd)
        v = apply_linear(at["v_proj"], h).reshape(b, t, nh, hd)
        x = x + apply_linear(at["out_proj"],
                             attention(q, k, v, mask=mask)
                             .reshape(b, t, -1))
        h = apply_layer_norm(blk["final_layer_norm"], x)
        x = x + apply_linear(blk["fc2"],
                             jax.nn.gelu(apply_linear(blk["fc1"], h),
                                         approximate=False))
    if final_pool2:
        x = x[:, :(x.shape[1] // 2) * 2].reshape(
            b, x.shape[1] // 2, 2, d).mean(axis=2)
    return apply_layer_norm(p["layer_norm"], x)


def init_moss_std(key, cfg: ModelConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    tc = cfg.text_config
    ks = iter(jax.random.split(k3, 4))
    return {
        "model": {
            "language_model": init_qwen3_lm(k1, tc),
            "whisper_encoder": init_whisper_encoder(k2, cfg.audio_config),
            "vq_adaptor": {
                "fc1": init_linear(next(ks), cfg.adaptor_input_dim,
                                   tc.hidden_size),
                "fc2": init_linear(next(ks), tc.hidden_size,
                                   tc.hidden_size),
                "norm": init_layer_norm(tc.hidden_size)},
        },
        **({} if cfg.tie_word_embeddings else {
            "lm_head": init_linear(next(ks), tc.hidden_size, tc.vocab_size,
                                   bias=False)}),
    }


# ----------------------------------------------------------------- model

class Model(FunctionalModel):
    """MOSS-Transcribe-Diarize (speaker-attributed long-form STT)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer = None
        self.audio_tokens_per_second = 12.5
        self.time_marker_every_seconds = 5
        self.enable_time_marker = True
        self._digit_token_ids: Optional[Dict[str, int]] = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        return init_moss_std(key, self.config)

    def model_quant_predicate(self, path, w):
        return not (path.startswith("model.whisper_encoder")
                    or path.startswith("model.vq_adaptor"))

    def sanitize(self, weights: Dict) -> Dict:
        """HF key remap: vq_ad(w)aptor.layers.{0,2,3} -> fc1/fc2/norm; whisper
        conv weights to (kernel, in, out) if shipped torch-layout."""
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if k == "lm_head.weight" and self.config.tie_word_embeddings:
                continue
            k = k.replace("model.vq_adwaptor.", "model.vq_adaptor.")
            m = re.match(r"model\.vq_adaptor\.(?:layers\.)+(\d)\.(.+)", k)
            if m:
                idx, rest = m.group(1), m.group(2)
                name = {"0": "fc1", "2": "fc2", "3": "norm"}.get(idx)
                if name is None:
                    continue
                k = f"model.vq_adaptor.{name}.{rest}"
            if ("whisper_encoder" in k and "conv" in k
                    and k.endswith(".weight") and v.ndim == 3):
                # torch (out, in, k) -> repo conv1d (k, in, out)
                v = jnp.transpose(v, (2, 1, 0))
            out[k] = v
        return out

    @classmethod
    def post_load_hook(cls, model, model_path):
        try:
            from transformers import AutoTokenizer

            model._tokenizer = AutoTokenizer.from_pretrained(
                str(model_path), trust_remote_code=False)
            digits = {}
            for d in "0123456789":
                ids = model._tokenizer.encode(d, add_special_tokens=False)
                if len(ids) == 1:
                    digits[d] = int(ids[0])
            model._digit_token_ids = digits if len(digits) == 10 else None
        except Exception:
            model._tokenizer = None
        import json
        from pathlib import Path

        pc = Path(model_path) / "processor_config.json"
        if pc.exists():
            try:
                c = json.loads(pc.read_text())
                model.audio_tokens_per_second = float(
                    c.get("audio_tokens_per_second",
                          model.audio_tokens_per_second))
                model.time_marker_every_seconds = int(
                    c.get("time_marker_every_seconds",
                          model.time_marker_every_seconds))
                model.enable_time_marker = bool(
                    c.get("enable_time_marker", model.enable_time_marker))
            except (OSError, ValueError):
                pass
        return model

    # ----------------------------------------------------------- encoder

    def _mel_chunks(self, wav: np.ndarray
                    ) -> Tuple[np.ndarray, List[int], float]:
        """Split into 30-s mel chunks -> (chunks, token_lengths, duration)."""
        cfg = self.config
        duration = len(wav) / self.sample_rate
        n_samples = MEL_CHUNK_FRAMES * 160
        chunks, lengths = [], []
        stride = 160 * WHISPER_ENCODER_STRIDE * cfg.audio_merge_size
        for start in range(0, max(len(wav), 1), n_samples):
            piece = wav[start:start + n_samples]
            lengths.append((len(piece) - 1) // stride + 1)
            piece = np.pad(piece, (0, n_samples - len(piece)))
            mel = np.asarray(log_mel_spectrogram(
                jnp.asarray(piece, jnp.float32), n_fft=400, hop_length=160,
                n_mels=cfg.audio_config.num_mel_bins, sample_rate=16000,
                log_base="log10_whisper", mel_norm="slaney",
                mel_scale="slaney"))[:MEL_CHUNK_FRAMES]
            chunks.append(mel)
        return np.stack(chunks), lengths, duration

    def encode_audio(self, wav: np.ndarray) -> Tuple[np.ndarray, int, float]:
        """-> (audio_embeds (n_tokens, D), n_tokens, duration)."""
        cfg = self.config
        mels, lengths, duration = self._mel_chunks(wav)
        key_ = ("enc", mels.shape[0])
        fn = self._jit_cache.get(key_)
        if fn is None:
            def enc(p, m):
                feats = whisper_encoder_forward(
                    p["model"]["whisper_encoder"], cfg.audio_config, m)
                return feats

            fn = jax.jit(enc)
            self._jit_cache[key_] = fn
        feats = np.asarray(fn(self.params, jnp.asarray(mels)))
        # per-chunk trim to token_len*merge*? — ref keeps token_len*4 frames
        parts = [feats[i, :lengths[i] * cfg.audio_merge_size]
                 for i in range(len(lengths))]
        flat = np.concatenate(parts, axis=0)
        ms = cfg.audio_merge_size
        n_merged = flat.shape[0] // ms
        merged = flat[:n_merged * ms].reshape(n_merged, ms * feats.shape[-1])

        ad = self.params["model"]["vq_adaptor"]
        h = jax.nn.silu(apply_linear(ad["fc1"], jnp.asarray(merged)))
        h = apply_linear(ad["fc2"], h)
        h = apply_layer_norm(ad["norm"], h,
                             self.config.text_config.rms_norm_eps)
        return np.asarray(h), n_merged, duration

    # ------------------------------------------------------------ prompt

    def _audio_span_ids(self, n: int) -> List[int]:
        """Audio pad ids with digit time markers every N seconds
        (ref :428-463)."""
        cfg = self.config
        if (not self.enable_time_marker or n <= 0
                or self.time_marker_every_seconds <= 0
                or self._digit_token_ids is None):
            return [cfg.audio_token_id] * max(n, 0)
        per_marker = int(self.audio_tokens_per_second
                         * self.time_marker_every_seconds)
        if per_marker <= 0:
            return [cfg.audio_token_id] * n
        duration = n / self.audio_tokens_per_second
        out, consumed = [], 0
        for sec in range(self.time_marker_every_seconds, int(duration) + 1,
                         self.time_marker_every_seconds):
            pos = (sec // self.time_marker_every_seconds) * per_marker
            seg = pos - consumed
            if seg > 0:
                out.extend([cfg.audio_token_id] * seg)
                consumed += seg
            out.extend(self._digit_token_ids[d] for d in str(sec))
        if n - consumed > 0:
            out.extend([cfg.audio_token_id] * (n - consumed))
        return out

    def _build_prompt(self, n_audio: int, prompt: Optional[str]
                      ) -> List[int]:
        if self._tokenizer is None:
            raise RuntimeError("Tokenizer is not initialized.")
        prompt = prompt or DEFAULT_PROMPT
        audio_tok = "<|audio_pad|>"
        rendered = (f"<|im_start|>user\n<|audio_start|>{audio_tok}"
                    f"<|audio_end|>\n{prompt}<|im_end|>\n"
                    "<|im_start|>assistant\n")
        before, after = rendered.split(audio_tok, 1)
        enc = lambda s: list(self._tokenizer.encode(
            s, add_special_tokens=False))
        return enc(before) + self._audio_span_ids(n_audio) + enc(after)

    # ------------------------------------------------------------ decode

    def _lm_fns(self, bucket: int, sampling,
                eos_ids: Tuple[int, ...]):
        key_ = ("lm", bucket, tuple(sampling), eos_ids)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        tc = self.config.text_config
        cap = bucket + 4096
        (temperature, top_k, top_p, min_p, repetition_penalty,
         repetition_context_size, min_tokens_to_keep) = sampling
        sampler = make_sampler(temperature=temperature, top_k=top_k,
                               top_p=top_p, min_p=min_p,
                               min_tokens_to_keep=min_tokens_to_keep,
                               repetition_penalty=repetition_penalty)
        use_rep = repetition_penalty != 1.0
        eos = jnp.asarray(eos_ids, jnp.int32)

        def logits_of(p, hidden):
            if "lm_head" in p:
                return apply_linear(p["lm_head"], hidden)
            w = p["model"]["language_model"]["embed_tokens"]["weight"]
            return hidden @ w.T

        def prefill(p, embeds, length):
            caches = [KVCache.init(1, cap, tc.num_key_value_heads,
                                   tc.head_dim, jnp.float32)
                      for _ in range(tc.num_hidden_layers)]
            pad = jnp.where(jnp.arange(cap) < length, 0.0,
                            -jnp.inf)[None, None, None, :]
            hidden, caches = qwen3_lm_forward(
                p["model"]["language_model"], tc, embeds, caches, 0, pad)
            idx = jnp.clip(length - 1, 0, bucket - 1)
            last = jax.lax.dynamic_slice_in_dim(hidden, idx, 1, axis=1)
            return logits_of(p, last)[:, 0], caches

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
                    p["model"]["language_model"]["embed_tokens"],
                    tok[:, None])
                hidden, caches = qwen3_lm_forward(
                    p["model"]["language_model"], tc, emb, caches, t0 + i)
                return (logits_of(p, hidden)[:, -1], caches, key, done2,
                        hist), jnp.where(done2, -1, tok[0])

            (lg, caches, rng, done, _), toks = jax.lax.scan(
                body, (lg, caches, rng, done, hist0),
                jnp.arange(DEC_CHUNK))
            return lg, caches, rng, done, toks

        fns = (jax.jit(prefill), jax.jit(chunk))
        self._jit_cache[key_] = fns
        return fns

    def _eos_ids(self) -> Tuple[int, ...]:
        ids = {151643, 151645}
        if self._tokenizer is not None and \
                isinstance(getattr(self._tokenizer, "eos_token_id", None),
                           int):
            ids.add(self._tokenizer.eos_token_id)
        return tuple(sorted(ids))

    def _decode(self, ids: List[int], audio_embeds: np.ndarray,
                max_tokens: int, sampling, seed: int,
                on_token=None) -> List[int]:
        if isinstance(sampling, float):
            sampling = (sampling, 0, 1.0, 0.0, 1.0, 20, 1)
        cfg = self.config
        n = len(ids)
        pb = next((b for b in PROMPT_BUCKETS if n <= b),
                  ((n + 511) // 512) * 512)
        tok_ids = np.zeros((1, pb), np.int32)
        tok_ids[0, :n] = ids
        embeds = np.asarray(apply_embedding(
            self.params["model"]["language_model"]["embed_tokens"],
            jnp.asarray(tok_ids)), np.float32).copy()
        pos = np.flatnonzero(np.asarray(ids) == cfg.audio_token_id)
        if len(pos) != len(audio_embeds):
            raise ValueError(
                f"Audio features and audio tokens do not match: "
                f"tokens: {len(pos)}, features: {len(audio_embeds)}")
        embeds[0, pos] = audio_embeds
        prefill, chunk = self._lm_fns(pb, sampling, self._eos_ids())
        lg, caches = prefill(self.params, jnp.asarray(embeds), jnp.int32(n))
        rng = jax.random.PRNGKey(seed)
        done = jnp.bool_(False)
        t = jnp.int32(n)
        out: List[int] = []
        while len(out) < max_tokens:
            lg, caches, rng, done, toks = chunk(self.params, lg, caches, t,
                                                rng, done)
            t = t + DEC_CHUNK
            arr = np.asarray(toks)
            new = [int(x) for x in arr[arr >= 0]][:max_tokens - len(out)]
            out.extend(new)
            if on_token is not None:
                for x in new:
                    on_token(x)
            if bool(done):
                break
        return out

    # ---------------------------------------------------------- generate

    @staticmethod
    def _parse_segments(text: str, fallback_end: float) -> List[dict]:
        segments = []
        for m in SEGMENT_RE.finditer(text):
            start, end = float(m.group("start")), float(m.group("end"))
            seg_text = m.group("text").strip()
            if end < start or not seg_text:
                continue
            segments.append({"start": start, "end": end,
                             "text": f"[{m.group('speaker')}] {seg_text}",
                             "speaker_id": m.group("speaker")})
        return segments or [{"start": 0.0, "end": max(fallback_end, 0.0),
                             "text": text}]

    def _load_audio(self, audio) -> np.ndarray:
        if isinstance(audio, str):
            from ...utils import load_audio

            audio = load_audio(audio, sample_rate=self.sample_rate)
        wav = np.asarray(audio, np.float32).squeeze()
        if wav.ndim != 1:
            raise ValueError(f"Expected mono audio, got {wav.shape}")
        if wav.shape[0] == 0:
            raise ValueError("Audio must contain at least one sample.")
        return wav

    def generate(self, audio, *, max_tokens: int = 2048,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, min_p: float = 0.0,
                 repetition_penalty: float = 1.0,
                 repetition_context_size: int = 20,
                 min_tokens_to_keep: int = 1,
                 prompt: Optional[str] = None,
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
                                seed=seed)
        t0 = time.time()
        wav = self._load_audio(audio)
        feats, n_audio, duration = self.encode_audio(wav)
        ids = self._build_prompt(n_audio, prompt)
        gen = self._decode(ids, feats, max_tokens, sampling, seed)
        text = self._tokenizer.decode(gen, skip_special_tokens=True).strip()
        if verbose:
            print(text)
        wall = time.time() - t0
        return STTOutput(
            text=text, segments=self._parse_segments(text, duration),
            prompt_tokens=len(ids), generation_tokens=len(gen),
            total_tokens=len(ids) + len(gen), total_time=wall,
            generation_tps=len(gen) / wall if wall else 0.0)

    def _stream(self, audio, *, max_tokens, temperature, prompt, seed
                ) -> Generator[StreamingResult, None, None]:
        wav = self._load_audio(audio)
        feats, n_audio, _ = self.encode_audio(wav)
        ids = self._build_prompt(n_audio, prompt)
        emitted: List[str] = []

        def on_token(tok):
            emitted.append(self._tokenizer.decode(
                [tok], skip_special_tokens=True))

        gen = self._decode(ids, feats, max_tokens, temperature, seed,
                           on_token=on_token)
        for i, piece in enumerate(emitted):
            yield StreamingResult(text=piece, is_final=False, start_time=0.0,
                                  end_time=0.0, generation_tokens=i + 1)
        yield StreamingResult(text="", is_final=True, start_time=0.0,
                              end_time=0.0, generation_tokens=len(gen))


__all__ = ["Model", "ModelConfig", "AudioConfig", "StreamingResult",
           "init_whisper_encoder", "whisper_encoder_forward"]
