"""Voxtral Mini Realtime: causal audio encoder + lockstep LLM decoder.

Parity: reference stt/models/voxtral_realtime/ — voxtral mel (periodic hann,
reflect pad, drop-last frame, FIXED global_log_mel_max clamp, audio.py),
streaming left/right padding and 12.5 Hz token math (config.py:8-25,
voxtral_realtime.py:34-48), causal conv stem (k3 s1 + k3 s2, left pad) with
front-truncation to the 4x downsample (encoder.py:26-44, :169-186), 32-layer
causal transformer with GPT-J interleaved RoPE, sliding window 750, and
selective biases (wq/wv/wo yes, wk no, ffn w2 yes; encoder.py:46-140),
4x frame-stack + adapter MLP (:221-238), 26-layer GQA decoder with adaptive
RMSNorm time conditioning from the transcription delay (decoder.py:28-67),
tied embeddings, and the time-LOCKSTEP decode: one token per 80 ms audio
position, embedding = adapter[pos] + tok_embed(prev) (voxtral_realtime.py:
246-300).  Tekken tokenizer (decode-only, base64 vocab; tokenizer.py).

TPU design: the lockstep decode is a compiled `lax.scan` chunk stepper over
fixed-capacity caches — the position count IS the audio token count, so the
whole transcription runs in n_audio/CHUNK compiled steps with in-graph EOS
masking; ada-RMSNorm scales are precomputed per delay and passed as one
(L, D) array; the encoder is one bucketed program with a combined
causal+sliding-window+validity mask.
"""

from __future__ import annotations

import base64
import json
import math
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....dsp import mel_filters, spec_abs, stft
from ....model import FunctionalModel
from ....nn import (apply_embedding, apply_linear, apply_rms_norm,
                    init_embedding, init_linear, init_rms_norm)
from ....nn.layers import apply_conv1d, init_conv1d
from ....ops.attention import attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope_interleaved, rope_freqs
from ...models.base import STTOutput

Array = jax.Array

SAMPLE_RATE = 16000
FRAME_RATE = 12.5
HOP_LENGTH = 160
RAW_AUDIO_LENGTH_PER_TOK = int(SAMPLE_RATE // FRAME_RATE)      # 1280
AUDIO_LENGTH_PER_TOK = RAW_AUDIO_LENGTH_PER_TOK // HOP_LENGTH  # 8

DEC_CHUNK = 64
MEL_BUCKETS = (512, 1024, 2048, 4096, 8192)


def _num_audio_tokens(audio_len: int) -> int:
    if audio_len % HOP_LENGTH != 0:
        audio_len = math.ceil(audio_len / HOP_LENGTH - 1)
    else:
        audio_len = audio_len // HOP_LENGTH
    return math.ceil(audio_len / AUDIO_LENGTH_PER_TOK)


def _num_delay_tokens(delay_ms: float) -> int:
    return _num_audio_tokens(int(delay_ms / 1000.0 * SAMPLE_RATE))


def _pad_audio_streaming(audio: np.ndarray, n_left: int,
                         n_right: int) -> np.ndarray:
    mult = RAW_AUDIO_LENGTH_PER_TOK
    align = (mult - (len(audio) % mult)) % mult
    return np.pad(audio, (n_left * mult, align + n_right * mult))


# --------------------------------------------------------------- configs

@dataclass
class AudioEncodingConfig(BaseModelArgs):
    sampling_rate: int = 16000
    frame_rate: float = 12.5
    num_mel_bins: int = 128
    hop_length: int = 160
    window_size: int = 400
    global_log_mel_max: float = 1.5


@dataclass
class EncoderConfig(BaseModelArgs):
    dim: int = 1280
    n_layers: int = 32
    n_heads: int = 32
    head_dim: int = 64
    hidden_dim: int = 5120
    n_kv_heads: int = 32
    norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    sliding_window: int = 750
    causal: bool = True
    use_biases: bool = True
    downsample_factor: int = 4


@dataclass
class DecoderConfig(BaseModelArgs):
    dim: int = 3072
    n_layers: int = 26
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 128
    hidden_dim: int = 9216
    vocab_size: int = 131072
    norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    sliding_window: int = 8192
    tied_embeddings: bool = True
    ada_rms_norm_t_cond: bool = True
    ada_rms_norm_t_cond_dim: int = 32


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "voxtral_realtime"
    encoder_args: Optional[Dict] = None
    decoder: Optional[Dict] = None
    audio_encoding_args: Optional[Dict] = None
    transcription_delay_ms: int = 480
    bos_token_id: int = 1
    eos_token_id: int = 2
    streaming_pad_token_id: int = 32
    n_left_pad_tokens: int = 32
    model_path: str = ""

    def __post_init__(self):
        if isinstance(self.encoder_args, dict):
            aea = self.encoder_args.pop("audio_encoding_args", None)
            if aea and self.audio_encoding_args is None:
                self.audio_encoding_args = aea
        if not isinstance(self.encoder_args, EncoderConfig):
            self.encoder_args = EncoderConfig.from_dict(
                self.encoder_args or {})
        if not isinstance(self.decoder, DecoderConfig):
            self.decoder = DecoderConfig.from_dict(self.decoder or {})
        if not isinstance(self.audio_encoding_args, AudioEncodingConfig):
            self.audio_encoding_args = AudioEncodingConfig.from_dict(
                self.audio_encoding_args or {})


# ------------------------------------------------------------- tokenizer

class TekkenTokenizer:
    """Decode-only tekken.json tokenizer (reference tokenizer.py)."""

    def __init__(self, tekken_path: str):
        data = json.loads(Path(tekken_path).read_text(encoding="utf-8"))
        self.vocab = data["vocab"]
        self.n_special = int(data.get("config", {}).get(
            "default_num_special_tokens", 1000))
        self.special_ids = {int(st["rank"])
                            for st in data.get("special_tokens", [])
                            if "rank" in st}

    def decode(self, token_ids) -> str:
        out = bytearray()
        for tid in token_ids:
            tid = int(tid)
            if tid < self.n_special or tid in self.special_ids:
                continue
            vid = tid - self.n_special
            if 0 <= vid < len(self.vocab):
                out += base64.b64decode(self.vocab[vid]["token_bytes"])
        return out.decode("utf-8", errors="replace")

    @classmethod
    def from_model_path(cls, model_path) -> "TekkenTokenizer":
        p = Path(model_path) / "tekken.json"
        if not p.exists():
            raise FileNotFoundError(f"tekken.json not found at "
                                    f"{model_path}")
        return cls(str(p))


# ------------------------------------------------------------------ mel

def voxtral_mel(audio: Array, aec: AudioEncodingConfig) -> Array:
    """(T,) -> (frames, n_mels). vLLM/mistral_common-exact mel: periodic
    hann, reflect center pad, drop last frame, fixed-max log clamp."""
    n = np.arange(aec.window_size, dtype=np.float32)
    win = (0.5 * (1.0 - np.cos(2.0 * np.pi * n / aec.window_size))) \
        .astype(np.float32)
    spec = stft(jnp.asarray(audio, jnp.float32), n_fft=aec.window_size,
                hop_length=aec.hop_length, win_length=aec.window_size,
                window=jnp.asarray(win), center=True, pad_mode="reflect")
    power = spec_abs(spec[:-1]) ** 2
    fb = mel_filters(aec.sampling_rate, aec.window_size, aec.num_mel_bins,
                     f_min=0, f_max=8000, norm="slaney",
                     mel_scale="slaney")
    mel = power @ fb.T
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, aec.global_log_mel_max - 8.0)
    return (log_spec + 4.0) / 4.0


# ------------------------------------------------------------------ init

def init_voxtral(key, cfg: ModelConfig) -> dict:
    e, d = cfg.encoder_args, cfg.decoder
    ks = iter(jax.random.split(key, 16 + 8 * (e.n_layers + d.n_layers)))
    enc_layers = {}
    for i in range(e.n_layers):
        attn_dim = e.n_heads * e.head_dim
        enc_layers[str(i)] = {
            "attention_norm": init_rms_norm(e.dim),
            "attention": {
                "wq": init_linear(next(ks), e.dim, attn_dim, bias=True),
                "wk": init_linear(next(ks), e.dim, attn_dim, bias=False),
                "wv": init_linear(next(ks), e.dim, attn_dim, bias=True),
                "wo": init_linear(next(ks), attn_dim, e.dim, bias=True)},
            "ffn_norm": init_rms_norm(e.dim),
            "feed_forward_w1": init_linear(next(ks), e.dim, e.hidden_dim,
                                           bias=False),
            "feed_forward_w3": init_linear(next(ks), e.dim, e.hidden_dim,
                                           bias=False),
            "feed_forward_w2": init_linear(next(ks), e.hidden_dim, e.dim,
                                           bias=True)}
    dec_layers = {}
    for i in range(d.n_layers):
        q_dim = d.n_heads * d.head_dim
        kv_dim = d.n_kv_heads * d.head_dim
        layer = {
            "attention_norm": init_rms_norm(d.dim),
            "attention": {
                "wq": init_linear(next(ks), d.dim, q_dim, bias=False),
                "wk": init_linear(next(ks), d.dim, kv_dim, bias=False),
                "wv": init_linear(next(ks), d.dim, kv_dim, bias=False),
                "wo": init_linear(next(ks), q_dim, d.dim, bias=False)},
            "ffn_norm": init_rms_norm(d.dim),
            "feed_forward_w1": init_linear(next(ks), d.dim, d.hidden_dim,
                                           bias=False),
            "feed_forward_w3": init_linear(next(ks), d.dim, d.hidden_dim,
                                           bias=False),
            "feed_forward_w2": init_linear(next(ks), d.hidden_dim, d.dim,
                                           bias=False)}
        if d.ada_rms_norm_t_cond:
            layer["ada_rms_norm_t_cond"] = {
                "ada_down": init_linear(next(ks), d.dim,
                                        d.ada_rms_norm_t_cond_dim,
                                        bias=False),
                "ada_up": init_linear(next(ks), d.ada_rms_norm_t_cond_dim,
                                      d.dim, bias=False)}
        dec_layers[str(i)] = layer
    return {
        "encoder": {
            "conv_layers_0_conv": {"conv": init_conv1d(
                next(ks), cfg.audio_encoding_args.num_mel_bins, e.dim, 3)},
            "conv_layers_1_conv": {"conv": init_conv1d(next(ks), e.dim,
                                                       e.dim, 3)},
            "transformer_layers": enc_layers,
            "transformer_norm": init_rms_norm(e.dim),
            "audio_language_projection_0": init_linear(
                next(ks), e.dim * e.downsample_factor, d.dim, bias=False),
            "audio_language_projection_2": init_linear(
                next(ks), d.dim, d.dim, bias=False)},
        "decoder": {
            "tok_embeddings": init_embedding(next(ks), d.vocab_size,
                                             d.dim),
            "layers": dec_layers,
            "norm": init_rms_norm(d.dim)}}


# --------------------------------------------------------------- encoder

def conv_stem(p: dict, mel: Array) -> Array:
    """(1, T_mel, n_mels) -> (1, T_mel//2, dim) causal conv stem."""
    x = jnp.pad(mel, ((0, 0), (2, 0), (0, 0)))
    x = jax.nn.gelu(apply_conv1d(p["conv_layers_0_conv"]["conv"], x),
                    approximate=False)
    x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
    x = jax.nn.gelu(apply_conv1d(p["conv_layers_1_conv"]["conv"], x,
                                 stride=2), approximate=False)
    return x


def encoder_layers(p: dict, e: EncoderConfig, x: Array,
                   n_valid: Array) -> Array:
    """Causal sliding-window transformer over (1, T, dim)."""
    t = x.shape[1]
    inv_freq = rope_freqs(e.head_dim, e.rope_theta)
    positions = jnp.arange(t)[None]
    qi = jnp.arange(t)[:, None]
    kj = jnp.arange(t)[None, :]
    allow = (kj <= qi) & (qi - kj < e.sliding_window) \
        & (kj < n_valid)
    mask = jnp.where(allow, 0.0, -jnp.inf)[None, None]
    for i in range(e.n_layers):
        blk = p["transformer_layers"][str(i)]
        h = apply_rms_norm(blk["attention_norm"], x, e.norm_eps)
        a = blk["attention"]
        q = apply_linear(a["wq"], h).reshape(1, t, e.n_heads, e.head_dim)
        k = apply_linear(a["wk"], h).reshape(1, t, e.n_heads, e.head_dim)
        v = apply_linear(a["wv"], h).reshape(1, t, e.n_heads, e.head_dim)
        q = apply_rope_interleaved(q, positions, inv_freq)
        k = apply_rope_interleaved(k, positions, inv_freq)
        o = attention(q, k, v, mask=mask).reshape(1, t, -1)
        x = x + apply_linear(a["wo"], o)
        h = apply_rms_norm(blk["ffn_norm"], x, e.norm_eps)
        x = x + apply_linear(
            blk["feed_forward_w2"],
            jax.nn.silu(apply_linear(blk["feed_forward_w1"], h))
            * apply_linear(blk["feed_forward_w3"], h))
    return apply_rms_norm(p["transformer_norm"], x, e.norm_eps)


def downsample_project(p: dict, e: EncoderConfig, x: Array) -> Array:
    """(1, T, dim) -> (1, T//ds, decoder_dim)."""
    ds = e.downsample_factor
    t = (x.shape[1] // ds) * ds
    merged = x[:, :t].reshape(1, t // ds, e.dim * ds)
    h = jax.nn.gelu(apply_linear(p["audio_language_projection_0"],
                                 merged), approximate=False)
    return apply_linear(p["audio_language_projection_2"], h)


def encode_audio(p: dict, cfg: ModelConfig, mel: Array,
                 n_mel: Array) -> Array:
    """(1, T_mel_bucket, n_mels) -> (1, T//8, decoder_dim)."""
    x = conv_stem(p, mel)
    x = encoder_layers(p, cfg.encoder_args, x, (n_mel + 1) // 2)
    return downsample_project(p, cfg.encoder_args, x)


# --------------------------------------------------------------- decoder

def compute_time_embedding(t_value: float, dim: int,
                           theta: float = 10000.0) -> np.ndarray:
    half = dim // 2
    inv = np.exp(-np.log(theta) * np.arange(half, dtype=np.float32)
                 / half)
    emb = t_value * inv
    return np.concatenate([np.cos(emb), np.sin(emb)]).astype(np.float32)


def ada_scales(p: dict, d: DecoderConfig, t_cond: Array) -> Array:
    """(dim,) time cond -> (n_layers, dim) per-layer AdaRMSNorm scales."""
    out = []
    for i in range(d.n_layers):
        blk = p["layers"][str(i)]
        if "ada_rms_norm_t_cond" in blk:
            ada = blk["ada_rms_norm_t_cond"]
            h = jax.nn.gelu(apply_linear(ada["ada_down"], t_cond),
                            approximate=False)
            out.append(apply_linear(ada["ada_up"], h))
        else:
            out.append(jnp.zeros((d.dim,)))
    return jnp.stack(out)


def decoder_forward(p: dict, d: DecoderConfig, x: Array, scales: Array,
                    caches: Optional[List[KVCache]], offset,
                    mask=None) -> Tuple[Array, Optional[List[KVCache]]]:
    """(1, T, dim) embeds -> (1, T, dim) hidden (+ updated caches)."""
    b, t = x.shape[:2]
    inv_freq = rope_freqs(d.head_dim, d.rope_theta)
    positions = offset + jnp.arange(t)[None]
    new = [] if caches is not None else None
    for i in range(d.n_layers):
        blk = p["layers"][str(i)]
        h = apply_rms_norm(blk["attention_norm"], x, d.norm_eps)
        a = blk["attention"]
        q = apply_linear(a["wq"], h).reshape(b, t, d.n_heads, d.head_dim)
        k = apply_linear(a["wk"], h).reshape(b, t, d.n_kv_heads,
                                             d.head_dim)
        v = apply_linear(a["wv"], h).reshape(b, t, d.n_kv_heads,
                                             d.head_dim)
        q = apply_rope_interleaved(q, positions, inv_freq)
        k = apply_rope_interleaved(k, positions, inv_freq)
        if caches is not None:
            nc = kv_update(caches[i], k, v, offset)
            new.append(nc)
            s = nc.k.shape[1]
            pos_s = jnp.arange(s)[None, None, None, :]
            causal = pos_s <= (offset + jnp.arange(t))[None, None, :,
                                                       None]
            valid = pos_s < (offset + t)
            add = jnp.where(causal & valid, 0.0, -jnp.inf)
            if mask is not None:
                add = add + mask
            o = attention(q, nc.k, nc.v, mask=add)
        else:
            o = attention(q, k, v, causal=True)
        x = x + apply_linear(a["wo"], o.reshape(b, t, -1))
        h = apply_rms_norm(blk["ffn_norm"], x, d.norm_eps)
        h = h * (1.0 + scales[i])
        x = x + apply_linear(
            blk["feed_forward_w2"],
            jax.nn.silu(apply_linear(blk["feed_forward_w1"], h))
            * apply_linear(blk["feed_forward_w3"], h))
    return apply_rms_norm(p["norm"], x, d.norm_eps), new


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer: Optional[TekkenTokenizer] = None
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATE

    def init_params(self, key):
        return init_voxtral(key, self.config)

    # ----------------------------------------------------------- encode

    def encode(self, padded_audio: np.ndarray) -> Tuple[np.ndarray, int]:
        """Padded audio -> ((1, n_audio, dec_dim) adapter, n_audio)."""
        cfg = self.config
        mel = np.asarray(voxtral_mel(jnp.asarray(padded_audio),
                                     cfg.audio_encoding_args))
        if mel.shape[0] % 2:
            mel = mel[1:]
        n = mel.shape[0]
        b = next((x for x in MEL_BUCKETS if n <= x),
                 ((n + 2047) // 2048) * 2048)
        padded = np.zeros((1, b, mel.shape[1]), np.float32)
        padded[0, :n] = mel
        fn = self._jit_cache.get(("enc", b))
        if fn is None:
            fn = jax.jit(lambda p, m, nv: encode_audio(p["encoder"], cfg,
                                                       m, nv))
            self._jit_cache[("enc", b)] = fn
        out = np.asarray(fn(self.params, jnp.asarray(padded),
                            jnp.int32(n)))
        n_audio = (n // 2) // cfg.encoder_args.downsample_factor
        return out[:, :n_audio], n_audio

    # ------------------------------------------------------- decode fns

    def _dec_fns(self, cap: int, adapter_cap: int):
        key_ = ("dec", cap, adapter_cap)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        cfg = self.config
        d = cfg.decoder
        eos = cfg.eos_token_id

        def prefill(p, embeds, length, scales):
            caches = [KVCache.init(1, cap, d.n_kv_heads, d.head_dim,
                                   dtype=jnp.float32)
                      for _ in range(d.n_layers)]
            pad = jnp.where(jnp.arange(cap)[None, :] < length[:, None],
                            0.0, -jnp.inf)[:, None, None, :]
            h, caches = decoder_forward(p["decoder"], d, embeds, scales,
                                        caches, jnp.int32(0), mask=pad)
            last = jnp.take_along_axis(
                h, (length - 1)[:, None, None].repeat(h.shape[-1], 2),
                axis=1)
            logits = last[:, 0] @ p["decoder"]["tok_embeddings"][
                "weight"].T
            return logits, caches

        def chunk(p, lg, caches, pos0, adapter, n_audio, done, scales):
            emb_w = p["decoder"]["tok_embeddings"]["weight"]

            def body(carry, i):
                lg, caches, done = carry
                tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # (1,)
                pos = pos0 + i
                done2 = jnp.logical_or(done, tok[0] == eos)
                # the reference records one final pending token when the
                # position loop completes, i.e. tokens span
                # [prompt_len, n_audio] inclusive
                done2 = jnp.logical_or(done2, pos > n_audio)
                a_pos = jnp.clip(pos, 0, adapter.shape[1] - 1)
                emb = jax.lax.dynamic_slice_in_dim(adapter, a_pos, 1,
                                                   axis=1)[:, 0] \
                    + emb_w[tok[0]]
                h, caches = decoder_forward(p["decoder"], d, emb[:, None],
                                            scales, caches, pos)
                lg2 = h[:, 0] @ emb_w.T
                out = jnp.where(done2, -1, tok[0])
                return (lg2, caches, done2), out

            (lg, caches, done), toks = jax.lax.scan(
                body, (lg, caches, done), jnp.arange(DEC_CHUNK))
            return lg, caches, done, toks

        fns = (jax.jit(prefill), jax.jit(chunk))
        self._jit_cache[key_] = fns
        return fns

    # --------------------------------------------------------- generate

    def _run(self, audio_np: np.ndarray, max_tokens: int,
             delay_ms: Optional[int]):
        """Yield (new_tokens, n_audio, prompt_len) per compiled chunk."""
        cfg = self.config
        n_delay = _num_delay_tokens(delay_ms
                                    or cfg.transcription_delay_ms)
        padded = _pad_audio_streaming(audio_np, cfg.n_left_pad_tokens,
                                      (n_delay + 1) + 10)
        adapter, n_audio = self.encode(padded)
        prompt_len = 1 + cfg.n_left_pad_tokens + n_delay

        scales = np.asarray(ada_scales(
            self.params["decoder"], cfg.decoder,
            jnp.asarray(compute_time_embedding(float(n_delay),
                                               cfg.decoder.dim))))
        cap = ((n_audio + DEC_CHUNK + 63) // 64) * 64
        a_cap = ((adapter.shape[1] + 63) // 64) * 64
        adapter_pad = np.zeros((1, a_cap, adapter.shape[2]), np.float32)
        adapter_pad[:, :adapter.shape[1]] = adapter
        prefill, chunk = self._dec_fns(cap, a_cap)

        ids = [cfg.bos_token_id] + [cfg.streaming_pad_token_id] \
            * (prompt_len - 1)
        emb_w = np.asarray(
            self.params["decoder"]["tok_embeddings"]["weight"][
                np.asarray(ids)])
        prefix = adapter_pad[:, :prompt_len] + emb_w[None]
        embeds = np.zeros((1, cap, adapter.shape[2]), np.float32)
        embeds[:, :prompt_len] = prefix

        scales_j = jnp.asarray(scales)
        lg, caches = prefill(self.params, jnp.asarray(embeds),
                             jnp.asarray([prompt_len]), scales_j)
        done = jnp.bool_(False)
        pos = prompt_len
        emitted = 0
        adapter_j = jnp.asarray(adapter_pad)
        while pos <= n_audio and emitted < max_tokens:
            lg, caches, done, toks = chunk(
                self.params, lg, caches, jnp.int32(pos), adapter_j,
                jnp.int32(n_audio), done, scales_j)
            pos += DEC_CHUNK
            arr = np.asarray(toks)
            new = [int(x) for x in arr[arr >= 0]][:max_tokens - emitted]
            emitted += len(new)
            yield new, n_audio, prompt_len
            if bool(done):
                break

    def generate(self, audio, *, max_tokens: int = 4096,
                 temperature: float = 0.0, verbose: bool = False,
                 stream: bool = False,
                 transcription_delay_ms: Optional[int] = None,
                 **kwargs):
        if self._tokenizer is None:
            raise RuntimeError("voxtral_realtime needs tekken.json in the "
                               "model directory")
        audio_np = self._load(audio)
        if stream:
            return self._stream_deltas(audio_np, max_tokens,
                                       transcription_delay_ms)
        t0 = time.time()
        tokens: List[int] = []
        prompt_len = 0
        for new, n_audio, prompt_len in self._run(
                audio_np, max_tokens, transcription_delay_ms):
            tokens.extend(new)
        text = self._tokenizer.decode(
            [t for t in tokens if t != self.config.eos_token_id])
        dt = time.time() - t0
        return STTOutput(
            text=text.strip(), language="en",
            segments=[{"text": text.strip(), "start": 0.0,
                       "end": len(audio_np) / SAMPLE_RATE}],
            prompt_tokens=prompt_len, generation_tokens=len(tokens),
            total_tokens=prompt_len + len(tokens), total_time=dt,
            generation_tps=len(tokens) / dt if dt > 0 else 0)

    def _stream_deltas(self, audio_np, max_tokens, delay_ms):
        """Yield text deltas per compiled decode chunk."""
        tokens: List[int] = []
        prev = ""
        eos = self.config.eos_token_id
        for new, _, _ in self._run(audio_np, max_tokens, delay_ms):
            tokens.extend(t for t in new if t != eos)
            text = self._tokenizer.decode(tokens)
            if len(text) > len(prev):
                yield text[len(prev):]
                prev = text

    @staticmethod
    def _load(audio) -> np.ndarray:
        from ...utils import load_audio
        x = audio[0] if isinstance(audio, list) else audio
        if isinstance(x, str):
            x = load_audio(x)
        return np.asarray(x, np.float32).reshape(-1)

    # ---------------------------------------------------------- loading

    # published mistralai consolidated.safetensors prefixes
    # (reference voxtral_realtime.py:474-557 consumes exactly these)
    _ENC_PREFIX = "mm_streams_embeddings.embedding_module.whisper_encoder"
    _ADAPTER_PREFIX = "mm_streams_embeddings.embedding_module"

    @classmethod
    def _remap_consolidated(cls, weights: Dict) -> Dict:
        """mistral consolidated.safetensors keys -> our functional tree
        names (reference voxtral_realtime.py:474-557). No-op for already
        converted checkpoints (no mm_streams_embeddings keys)."""
        if not any(k.startswith(("mm_streams_embeddings.", "layers."))
                   for k in weights):
            return weights
        enc, ad = cls._ENC_PREFIX, cls._ADAPTER_PREFIX
        out = {}
        for k, v in weights.items():
            if k == f"{ad}.tok_embeddings.weight":
                out["decoder.tok_embeddings.weight"] = v
            elif k == "norm.weight":
                out["decoder.norm.weight"] = v
            elif k.startswith(f"{enc}.conv_layers."):
                idx, _, param = k[len(f"{enc}.conv_layers."):].split(".", 2)
                out[f"encoder.conv_layers_{idx}_conv.conv.{param}"] = v
            elif k.startswith(f"{enc}.transformer.layers."):
                idx, rest = k[len(f"{enc}.transformer.layers."):] \
                    .split(".", 1)
                rest = rest.replace("feed_forward.w", "feed_forward_w")
                out[f"encoder.transformer_layers.{idx}.{rest}"] = v
            elif k.startswith(f"{enc}.transformer.norm."):
                out["encoder.transformer_norm."
                    + k[len(f"{enc}.transformer.norm."):]] = v
            elif k.startswith(f"{ad}.audio_language_projection."):
                idx, param = k[len(f"{ad}.audio_language_projection."):] \
                    .split(".", 1)
                out[f"encoder.audio_language_projection_{idx}.{param}"] = v
            elif k.startswith("layers."):
                idx, rest = k[len("layers."):].split(".", 1)
                rest = rest.replace("feed_forward.w", "feed_forward_w")
                rest = rest.replace("ada_rms_norm_t_cond.0.",
                                    "ada_rms_norm_t_cond.ada_down.")
                rest = rest.replace("ada_rms_norm_t_cond.2.",
                                    "ada_rms_norm_t_cond.ada_up.")
                out[f"decoder.layers.{idx}.{rest}"] = v
            else:
                out[k] = v
        return out

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in self._remap_consolidated(weights).items():
            v = jnp.asarray(v)
            if "conv" in k and k.endswith("weight") and v.ndim == 3 \
                    and v.shape[0] != 3:
                # MLX (O, K, I) or torch (O, I, K) -> WIO (K=3 leads)
                if v.shape[1] == 3:
                    v = jnp.transpose(v, (1, 2, 0))
                else:
                    v = jnp.transpose(v, (2, 1, 0))
            out[k] = v
        return out

    def create_streaming_session(self, **kwargs):
        """Live feed()/close()/step() session (streaming.py)."""
        if self._tokenizer is None:
            raise RuntimeError("voxtral_realtime needs tekken.json in the "
                               "model directory")
        from .streaming import VoxtralStreamingSession
        return VoxtralStreamingSession(self, **kwargs)

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        try:
            model._tokenizer = TekkenTokenizer.from_model_path(model_path)
        except FileNotFoundError:
            model._tokenizer = None
        return model


__all__ = ["Model", "ModelConfig", "TekkenTokenizer", "voxtral_mel",
           "encode_audio", "decoder_forward", "ada_scales",
           "compute_time_embedding", "init_voxtral",
           "_num_audio_tokens", "_num_delay_tokens",
           "_pad_audio_streaming"]
