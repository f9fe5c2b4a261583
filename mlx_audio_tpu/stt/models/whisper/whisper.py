"""Whisper-style encoder-decoder STT (functional, compiled decode).

Parity: /root/reference/mlx_audio/stt/models/whisper/whisper.py (dims :270,
encoder :409, decoder :440, sanitize :539, generate :787 — the 30-s windowed
transcription loop with temperature fallback). TPU redesign:

* The AR decode loop is ONE `lax.while_loop` per (prompt-bucket, max-tokens)
  compiled with the logit filters (suppress/timestamp rules) inside —
  no per-token host round-trips (vs the reference's per-token mx.eval).
* Fixed-capacity KV caches; prompts are right-padded into static buckets with
  masked attention, so a handful of compilations serve all prompts.
* Param names follow the OpenAI/mlx checkpoint layout
  (encoder.blocks.N.attn.query...); HF transformers checkpoints are remapped
  in sanitize().
"""

from __future__ import annotations

import time
import zlib
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import (
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.kvcache import KVCache
from ..base import STTOutput
from .audio import (
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    pad_or_trim,
)
from .tokenizer import LANGUAGES, WhisperTokenizer, get_tokenizer

Array = jax.Array


@dataclass
class ModelDimensions:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4

    @classmethod
    def from_dict(cls, config: dict) -> "ModelDimensions":
        config = dict(config)
        if "d_model" in config or "encoder_layers" in config:
            return cls(
                n_mels=config.get("num_mel_bins", 128),
                n_audio_ctx=config.get("max_source_positions", 1500),
                n_audio_state=config.get("d_model", 1280),
                n_audio_head=config.get("encoder_attention_heads", 20),
                n_audio_layer=config.get("encoder_layers", 32),
                n_vocab=config.get("vocab_size", 51866),
                n_text_ctx=config.get("max_target_positions", 448),
                n_text_state=config.get("d_model", 1280),
                n_text_head=config.get("decoder_attention_heads", 20),
                n_text_layer=config.get("decoder_layers", 32),
            )
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in config.items() if k in known})


ModelConfig = ModelDimensions


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0):
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(
        np.concatenate([np.sin(t), np.cos(t)], axis=1), dtype=jnp.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_attn(ks, n_state: int) -> dict:
    return {
        "query": init_linear(next(ks), n_state, n_state),
        "key": init_linear(next(ks), n_state, n_state, bias=False),
        "value": init_linear(next(ks), n_state, n_state),
        "out": init_linear(next(ks), n_state, n_state),
    }


def _init_block(ks, n_state: int, cross: bool) -> dict:
    p = {
        "attn": _init_attn(ks, n_state),
        "attn_ln": init_layer_norm(n_state),
        "mlp1": init_linear(next(ks), n_state, 4 * n_state),
        "mlp2": init_linear(next(ks), 4 * n_state, n_state),
        "mlp_ln": init_layer_norm(n_state),
    }
    if cross:
        p["cross_attn"] = _init_attn(ks, n_state)
        p["cross_attn_ln"] = init_layer_norm(n_state)
    return p


def init_whisper(key, dims: ModelDimensions) -> dict:
    n_keys = 16 * (dims.n_audio_layer + dims.n_text_layer) + 16
    ks = iter(jax.random.split(key, n_keys))
    from ....nn import init_conv1d

    enc = {
        "conv1": init_conv1d(next(ks), dims.n_mels, dims.n_audio_state, 3),
        "conv2": init_conv1d(next(ks), dims.n_audio_state, dims.n_audio_state, 3),
        "blocks": {str(i): _init_block(ks, dims.n_audio_state, False)
                   for i in range(dims.n_audio_layer)},
        "ln_post": init_layer_norm(dims.n_audio_state),
    }
    dec = {
        "token_embedding": init_embedding(next(ks), dims.n_vocab,
                                          dims.n_text_state),
        "positional_embedding": jax.random.normal(
            next(ks), (dims.n_text_ctx, dims.n_text_state)) * 0.01,
        "blocks": {str(i): _init_block(ks, dims.n_text_state, True)
                   for i in range(dims.n_text_layer)},
        "ln": init_layer_norm(dims.n_text_state),
    }
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _mha(p, n_head: int, x, mem=None, mask=None, kv_override=None):
    """Whisper attention: q/k scaled by (d/h)^-0.25 each.

    kv_override: precomputed (k, v) for cross-attention.
    Returns (out, (k, v)).
    """
    b, t, d = x.shape
    hd = d // n_head
    q = apply_linear(p["query"], x)
    if kv_override is not None:
        k, v = kv_override
    else:
        src = x if mem is None else mem
        k = apply_linear(p["key"], src)
        v = apply_linear(p["value"], src)
    s = k.shape[1]
    qh = q.reshape(b, t, n_head, hd)
    kh = k.reshape(b, s, n_head, hd)
    vh = v.reshape(b, s, n_head, hd)
    scale = hd ** -0.25
    scores = jnp.einsum("bthd,bshd->bhts", qh * scale, kh * scale)
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", w, vh).reshape(b, t, d)
    return apply_linear(p["out"], out), (k, v)


def encoder_forward(params: dict, dims: ModelDimensions, mel: Array) -> Array:
    """mel (B, T_frames, n_mels) -> (B, n_audio_ctx, D)."""
    from ....nn import apply_conv1d, gelu

    p = params["encoder"]
    x = gelu(apply_conv1d(p["conv1"], mel, padding=1))
    x = gelu(apply_conv1d(p["conv2"], x, stride=2, padding=1))
    x = x + sinusoids(dims.n_audio_ctx, dims.n_audio_state).astype(x.dtype)
    for i in range(dims.n_audio_layer):
        blk = p["blocks"][str(i)]
        h = apply_layer_norm(blk["attn_ln"], x)
        attn, _ = _mha(blk["attn"], dims.n_audio_head, h)
        x = x + attn
        h = apply_layer_norm(blk["mlp_ln"], x)
        x = x + apply_linear(blk["mlp2"], jax.nn.gelu(
            apply_linear(blk["mlp1"], h), approximate=False))
    return apply_layer_norm(p["ln_post"], x)


def cross_kv(params: dict, dims: ModelDimensions, audio_features: Array):
    """Precompute per-layer cross-attention (k, v) once per window."""
    out = []
    for i in range(dims.n_text_layer):
        blk = params["decoder"]["blocks"][str(i)]
        k = apply_linear(blk["cross_attn"]["key"], audio_features)
        v = apply_linear(blk["cross_attn"]["value"], audio_features)
        out.append((k, v))
    return out


def decoder_forward(
    params: dict,
    dims: ModelDimensions,
    tokens: Array,
    positions: Array,
    cross_kvs,
    caches: Optional[List[KVCache]],
    offset,
    self_mask: Optional[Array],
):
    """tokens (B, T) + positions (B, T) -> (logits (B, T, V), new_caches).

    With caches: write k/v at offset, attend with self_mask (B?, T, max_len).
    """
    from ....ops.kvcache import kv_update

    p = params["decoder"]
    x = apply_embedding(p["token_embedding"], tokens)
    x = x + jnp.take(p["positional_embedding"], positions, axis=0)
    new_caches = [] if caches is not None else None
    b, t, d = x.shape
    for i in range(dims.n_text_layer):
        blk = p["blocks"][str(i)]
        h = apply_layer_norm(blk["attn_ln"], x)
        if caches is not None:
            k_new = apply_linear(blk["attn"]["key"], h)
            v_new = apply_linear(blk["attn"]["value"], h)
            nc = kv_update(caches[i], k_new.reshape(b, t, 1, d),
                           v_new.reshape(b, t, 1, d), offset)
            new_caches.append(nc)
            attn, _ = _mha(blk["attn"], dims.n_text_head, h,
                           kv_override=(nc.k[:, :, 0, :], nc.v[:, :, 0, :]),
                           mask=self_mask)
        else:
            causal = jnp.where(
                jnp.tril(jnp.ones((t, t), bool)), 0.0, -jnp.inf)
            attn, _ = _mha(blk["attn"], dims.n_text_head, h, mask=causal)
        x = x + attn
        h = apply_layer_norm(blk["cross_attn_ln"], x)
        cattn, _ = _mha(blk["cross_attn"], dims.n_text_head, h,
                        kv_override=cross_kvs[i])
        x = x + cattn
        h = apply_layer_norm(blk["mlp_ln"], x)
        x = x + apply_linear(blk["mlp2"], jax.nn.gelu(
            apply_linear(blk["mlp1"], h), approximate=False))
    x = apply_layer_norm(p["ln"], x)
    logits = jnp.einsum("btd,vd->btv", x,
                        p["token_embedding"]["weight"].astype(x.dtype))
    return logits, new_caches


def decoder_forward_with_cross_qk(params: dict, dims: ModelDimensions,
                                  tokens: Array, cross_kvs):
    """Cache-less decoder forward that also returns per-layer cross-attention
    scores (B, heads, T, S) for DTW word-timing (reference whisper.py
    forward_with_cross_qk)."""
    p = params["decoder"]
    b, t = tokens.shape
    x = apply_embedding(p["token_embedding"], tokens)
    x = x + p["positional_embedding"][:t]
    qks = []
    n_head = dims.n_text_head
    hd = dims.n_text_state // n_head
    causal = jnp.where(jnp.tril(jnp.ones((t, t), bool)), 0.0, -jnp.inf)
    for i in range(dims.n_text_layer):
        blk = p["blocks"][str(i)]
        h = apply_layer_norm(blk["attn_ln"], x)
        attn, _ = _mha(blk["attn"], n_head, h, mask=causal)
        x = x + attn
        h = apply_layer_norm(blk["cross_attn_ln"], x)
        # collect scaled pre-softmax scores
        q = apply_linear(blk["cross_attn"]["query"], h)
        k, v = cross_kvs[i]
        s = k.shape[1]
        qh = q.reshape(b, t, n_head, hd)
        kh = k.reshape(b, s, n_head, hd)
        vh = v.reshape(b, s, n_head, hd)
        scale = hd ** -0.25
        scores = jnp.einsum("bthd,bshd->bhts", qh * scale, kh * scale)
        qks.append(scores.astype(jnp.float32))
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", w, vh).reshape(b, t, -1)
        x = x + apply_linear(blk["cross_attn"]["out"], out)
        h = apply_layer_norm(blk["mlp_ln"], x)
        x = x + apply_linear(blk["mlp2"], jax.nn.gelu(
            apply_linear(blk["mlp1"], h), approximate=False))
    x = apply_layer_norm(p["ln"], x)
    logits = jnp.einsum("btd,vd->btv", x,
                        p["token_embedding"]["weight"].astype(x.dtype))
    return logits, qks


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def _format_timestamp(seconds: float) -> str:
    ms = round(seconds * 1000.0)
    hours, ms = divmod(ms, 3_600_000)
    minutes, ms = divmod(ms, 60_000)
    secs, ms = divmod(ms, 1000)
    hours_marker = f"{hours:02d}:" if hours > 0 else ""
    return f"{hours_marker}{minutes:02d}:{secs:02d}.{ms:03d}"


def compression_ratio(text: str) -> float:
    b = text.encode("utf-8")
    return len(b) / len(zlib.compress(b)) if b else 0.0


class Model(FunctionalModel):
    """Whisper STT with compiled windowed transcription."""

    def __init__(self, dims: Union[ModelDimensions, dict]):
        if isinstance(dims, dict):
            dims = ModelDimensions.from_dict(dims)
        super().__init__(dims)
        self.dims = dims
        # window geometry follows the model's audio context (3000 mel frames /
        # 30 s for published checkpoints; smaller for tiny test configs)
        self.window_frames = dims.n_audio_ctx * 2
        self.window_samples = self.window_frames * HOP_LENGTH
        self._decode_fns: Dict = {}

    # -- weights -----------------------------------------------------------

    def init_params(self, key):
        return init_whisper(key, self.dims)

    def sanitize(self, weights):
        """Remap HF transformers whisper keys -> OpenAI/mlx layout; convert
        conv weights to WIO (reference whisper.py:539-607 equivalent)."""
        out = {}
        hf = any(k.startswith(("model.encoder", "model.decoder"))
                 for k in weights)
        for k, w in weights.items():
            if hf:
                k = (k.replace("model.encoder.", "encoder.")
                      .replace("model.decoder.", "decoder.")
                      .replace(".layers.", ".blocks.")
                      .replace(".self_attn.", ".attn.")
                      .replace(".encoder_attn.", ".cross_attn.")
                      .replace(".self_attn_layer_norm.", ".attn_ln.")
                      .replace(".encoder_attn_layer_norm.", ".cross_attn_ln.")
                      .replace(".final_layer_norm.", ".mlp_ln.")
                      .replace(".fc1.", ".mlp1.")
                      .replace(".fc2.", ".mlp2.")
                      .replace(".q_proj.", ".query.")
                      .replace(".k_proj.", ".key.")
                      .replace(".v_proj.", ".value.")
                      .replace(".out_proj.", ".out.")
                      .replace("encoder.layer_norm.", "encoder.ln_post.")
                      .replace("decoder.layer_norm.", "decoder.ln.")
                      .replace("decoder.embed_tokens.", "decoder.token_embedding.")
                      .replace("decoder.embed_positions.weight",
                               "decoder.positional_embedding"))
                if k == "proj_out.weight" or k.startswith("model.proj_out"):
                    continue
            if k.endswith("embed_positions.weight") and k.startswith("encoder"):
                continue  # sinusoids are recomputed
            if ("conv1.weight" in k or "conv2.weight" in k) and w.ndim == 3:
                # stem convs have kernel 3; map torch (O, I, 3) or
                # mlx (O, 3, I) to WIO (3, I, O); keep if already WIO
                if w.shape[0] == 3:
                    pass  # already WIO
                elif w.shape[-1] == 3:
                    w = jnp.transpose(w, (2, 1, 0))
                else:
                    w = jnp.transpose(w, (1, 2, 0))
            out[k] = w
        return out

    @property
    def alignment_heads(self):
        """(layer, head) pairs used for word timing; defaults to every head
        of the last half of decoder layers (reference whisper.py:512-517)."""
        if getattr(self, "_alignment_heads", None) is not None:
            return self._alignment_heads
        return [(l, h) for l in range(self.dims.n_text_layer // 2,
                                      self.dims.n_text_layer)
                for h in range(self.dims.n_text_head)]

    def set_alignment_heads(self, pairs):
        self._alignment_heads = list(pairs)

    @property
    def is_multilingual(self) -> bool:
        return self.dims.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return 100 if self.dims.n_vocab >= 51866 else 99

    def get_tokenizer(self, language="en", task="transcribe") -> WhisperTokenizer:
        return get_tokenizer(self.dims.n_vocab,
                             getattr(self.config, "model_path", None)
                             if not isinstance(self.config, ModelDimensions)
                             else None,
                             language or "en", task)

    # -- compiled pieces ----------------------------------------------------

    def embed_audio(self, mel):
        fn = self._jit_cache.get("encode")
        if fn is None:
            fn = jax.jit(lambda p, m: encoder_forward(p, self.dims, m))
            self._jit_cache["encode"] = fn
        return fn(self.params, mel)

    def detect_language_probs(self, mel_segment):
        """(B, frames, mels) -> softmax over language tokens."""
        tok = self.get_tokenizer()
        lang_tokens = jnp.asarray(tok.all_language_tokens)

        fn = self._jit_cache.get("lang")
        if fn is None:
            def _lang(params, mel):
                feats = encoder_forward(params, self.dims, mel)
                ckv = cross_kv(params, self.dims, feats)
                toks = jnp.full((mel.shape[0], 1), tok.sot, jnp.int32)
                pos = jnp.zeros((mel.shape[0], 1), jnp.int32)
                logits, _ = decoder_forward(params, self.dims, toks, pos, ckv,
                                            None, 0, None)
                mask = jnp.full((self.dims.n_vocab,), -jnp.inf)
                mask = mask.at[lang_tokens].set(0.0)
                return jax.nn.softmax(logits[:, 0] + mask, axis=-1)

            fn = jax.jit(_lang)
            self._jit_cache["lang"] = fn
        probs = fn(self.params, mel_segment)
        return probs

    def detect_language(self, mel_segment, language: Optional[str] = None):
        tok = self.get_tokenizer()
        probs = np.asarray(self.detect_language_probs(mel_segment))
        codes = tok.all_language_codes
        lang_tokens = list(tok.all_language_tokens)
        p = {codes[i]: float(probs[0, lang_tokens[i]])
             for i in range(len(codes))}
        return max(p, key=p.get), p

    # -- public transcription ----------------------------------------------

    def _prepare_audio(self, audio, padding=None):
        if padding is None:
            padding = self.window_samples
        if isinstance(audio, str):
            from ...utils import load_audio

            audio = load_audio(audio, sample_rate=SAMPLE_RATE)
        audio = jnp.asarray(audio, dtype=jnp.float32)
        mel = log_mel_spectrogram(audio, n_mels=self.dims.n_mels,
                                  padding=padding)
        content_frames = mel.shape[-2] - (self.window_frames if padding else 0)
        return mel, content_frames

    def generate(
        self,
        audio,
        *,
        verbose: Optional[bool] = None,
        language: Optional[str] = None,
        task: str = "transcribe",
        temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        no_speech_threshold: Optional[float] = 0.6,
        condition_on_previous_text: bool = True,
        initial_prompt: Optional[str] = None,
        return_timestamps: bool = True,
        word_timestamps: bool = False,
        clip_timestamps="0",
        hallucination_silence_threshold: Optional[float] = None,
        stream: bool = False,
        **decode_options,
    ) -> STTOutput:
        """Windowed 30-s transcription (reference whisper.py:787-1290)."""
        from .decoding import DecodingOptions, DecodingTask

        t_start = time.time()
        mel, content_frames = self._prepare_audio(audio)
        language = language or (
            self._detect_language_cached(mel) if self.is_multilingual else "en")
        tokenizer = self.get_tokenizer(language=language, task=task)

        temperatures = ([temperature] if isinstance(temperature, (int, float))
                        else list(temperature))
        task_runner = DecodingTask(
            self, DecodingOptions(
                task=task, language=language,
                without_timestamps=not return_timestamps,
                # options.temperature is validation/metadata only; the
                # fallback ladder passes the actual value into run()
                temperature=max(temperatures),
                **{k: v for k, v in decode_options.items()
                   if k in DecodingOptions.__dataclass_fields__}))

        all_tokens: List[int] = []
        all_segments: List[dict] = []
        prompt_reset_since = 0
        if initial_prompt:
            initial_prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
            all_tokens.extend(initial_prompt_tokens)
        else:
            initial_prompt_tokens = []

        # clip_timestamps "start,end,start,end,..." -> seek windows
        # (reference whisper.py:915-931)
        if isinstance(clip_timestamps, str):
            clip_timestamps = [float(ts) for ts in
                               (clip_timestamps.split(",")
                                if clip_timestamps else [])]
        seek_points = [round(ts * FRAMES_PER_SECOND)
                       for ts in clip_timestamps]
        if not seek_points:
            seek_points.append(0)
        if len(seek_points) % 2 == 1:
            seek_points.append(content_frames)
        else:
            seek_points[-1] = min(content_frames, seek_points[-1])
        seek_clips = list(zip(seek_points[::2], seek_points[1::2]))

        clip_idx = 0
        seek = seek_clips[0][0]
        input_stride = 2  # mel frames per token position
        time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE  # 0.02
        prompt_tokens_count = 0
        gen_tokens_count = 0
        last_speech_timestamp = 0.0
        content_duration = content_frames * HOP_LENGTH / SAMPLE_RATE
        punctuation = "\"'\u201c\u00bf([{-\"'.\u3002,\uff0c!\uff01?\uff1f:\uff1a\u201d)]}\u3001"

        while clip_idx < len(seek_clips):
            seek_clip_start, seek_clip_end = seek_clips[clip_idx]
            if seek < seek_clip_start:
                seek = seek_clip_start
            if seek >= seek_clip_end or seek >= content_frames:
                clip_idx += 1
                if clip_idx < len(seek_clips):
                    seek = max(seek, seek_clips[clip_idx][0])
                continue
            time_offset = seek * HOP_LENGTH / SAMPLE_RATE
            window_end_time = (seek + self.window_frames) \
                * HOP_LENGTH / SAMPLE_RATE
            mel_segment = mel[seek: seek + self.window_frames]
            segment_size = min(self.window_frames, content_frames - seek,
                               seek_clip_end - seek)
            segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE
            mel_segment = pad_or_trim(mel_segment[:segment_size],
                                      self.window_frames)[None]
            previous_seek = seek

            prompt = all_tokens[prompt_reset_since:] \
                if condition_on_previous_text else initial_prompt_tokens

            result = None
            for t in temperatures:
                result = task_runner.run(mel_segment, prompt, temperature=t)
                needs_fallback = False
                if (compression_ratio_threshold is not None
                        and result.compression_ratio > compression_ratio_threshold):
                    needs_fallback = True
                if (logprob_threshold is not None
                        and result.avg_logprob < logprob_threshold):
                    needs_fallback = True
                if (no_speech_threshold is not None
                        and result.no_speech_prob > no_speech_threshold):
                    needs_fallback = False  # silence: accept
                if not needs_fallback:
                    break

            prompt_tokens_count += len(prompt) + len(tokenizer.sot_sequence)
            gen_tokens_count += len(result.tokens)
            window_seg_start = len(all_segments)

            if (no_speech_threshold is not None
                    and result.no_speech_prob > no_speech_threshold
                    and (logprob_threshold is None
                         or result.avg_logprob < logprob_threshold)):
                seek += segment_size  # silent segment
                continue

            tokens = np.asarray(result.tokens)
            ts_begin = tokenizer.timestamp_begin
            timestamp_tokens = tokens >= ts_begin
            single_ts_end = (len(tokens) >= 2 and timestamp_tokens[-1]
                             and not timestamp_tokens[-2])
            consecutive = np.where(
                np.logical_and(timestamp_tokens[:-1], timestamp_tokens[1:])
            )[0] + 1

            def new_segment(start, end, seg_tokens, res):
                seg_tokens = [int(t) for t in seg_tokens]
                text_tokens = [t for t in seg_tokens if t < tokenizer.eot]
                return {
                    "seek": seek,
                    "start": start,
                    "end": end,
                    "text": tokenizer.decode(text_tokens),
                    "tokens": seg_tokens,
                    "temperature": res.temperature,
                    "avg_logprob": res.avg_logprob,
                    "compression_ratio": res.compression_ratio,
                    "no_speech_prob": res.no_speech_prob,
                }

            if len(consecutive) > 0:
                slices = list(consecutive)
                if single_ts_end:
                    slices.append(len(tokens))
                last_slice = 0
                for cur_slice in slices:
                    seg = tokens[last_slice:cur_slice]
                    start_pos = int(seg[0]) - ts_begin
                    end_pos = int(seg[-1]) - ts_begin
                    all_segments.append(new_segment(
                        time_offset + start_pos * time_precision,
                        time_offset + end_pos * time_precision,
                        seg, result))
                    last_slice = cur_slice
                if single_ts_end:
                    seek += segment_size
                else:
                    last_ts_pos = int(tokens[last_slice - 1]) - ts_begin
                    seek += last_ts_pos * input_stride
            else:
                duration = segment_duration
                ts = tokens[timestamp_tokens.nonzero()[0]]
                if len(ts) > 0 and int(ts[-1]) != ts_begin:
                    duration = (int(ts[-1]) - ts_begin) * time_precision
                all_segments.append(new_segment(
                    time_offset, time_offset + duration, tokens, result))
                seek += segment_size

            if word_timestamps:
                from .timing import add_word_timestamps

                add_word_timestamps(
                    segments=all_segments[window_seg_start:],
                    model=self, tokenizer=tokenizer,
                    mel_segment=mel_segment, num_frames=segment_size,
                    time_offset=time_offset)

                def _get_end(segs):
                    return next((w["end"] for seg in reversed(segs)
                                 for w in reversed(seg.get("words") or [])),
                                None)

                current = all_segments[window_seg_start:]
                if not single_ts_end:
                    last_word_end = _get_end(current)
                    if last_word_end is not None \
                            and last_word_end > time_offset:
                        seek = round(last_word_end * FRAMES_PER_SECOND)

                # hallucination skipping (reference whisper.py:1171-1237):
                # anomalous word runs surrounded by silence are dropped and
                # the window re-seeks past the silence
                if hallucination_silence_threshold is not None:
                    threshold = hallucination_silence_threshold

                    def word_anomaly_score(word):
                        prob = word.get("probability", 0.0)
                        dur = word["end"] - word["start"]
                        score = 0.0
                        if prob < 0.15:
                            score += 1.0
                        if dur < 0.133:
                            score += (0.133 - dur) * 15
                        if dur > 2.0:
                            score += dur - 2.0
                        return score

                    def is_segment_anomaly(seg):
                        if seg is None or not seg.get("words"):
                            return False
                        words = [w for w in seg["words"]
                                 if w["word"] not in punctuation][:8]
                        score = sum(word_anomaly_score(w) for w in words)
                        return score >= 3 or score + 0.01 >= len(words)

                    def next_words_segment(segs):
                        return next((s for s in segs if s.get("words")),
                                    None)

                    if not single_ts_end:
                        last_word_end = _get_end(current)
                        if last_word_end is not None \
                                and last_word_end > time_offset:
                            remaining = window_end_time - last_word_end
                            if remaining > threshold:
                                seek = round(
                                    last_word_end * FRAMES_PER_SECOND)
                            else:
                                seek = previous_seek + segment_size

                    first_segment = next_words_segment(current)
                    if first_segment is not None \
                            and is_segment_anomaly(first_segment):
                        gap = first_segment["start"] - time_offset
                        if gap > threshold:
                            # drop this window and re-decode past the gap
                            del all_segments[window_seg_start:]
                            seek = previous_seek + round(
                                gap * FRAMES_PER_SECOND)
                            continue

                    hal_last_end = last_speech_timestamp
                    for si, seg in enumerate(current):
                        if not seg.get("words"):
                            continue
                        if is_segment_anomaly(seg):
                            nxt = next_words_segment(current[si + 1:])
                            hal_next_start = (nxt["words"][0]["start"]
                                              if nxt is not None else
                                              time_offset + segment_duration)
                            silence_before = (
                                seg["start"] - hal_last_end > threshold
                                or seg["start"] < threshold
                                or seg["start"] - time_offset < 2.0)
                            silence_after = (
                                hal_next_start - seg["end"] > threshold
                                or is_segment_anomaly(nxt)
                                or window_end_time - seg["end"] < 2.0)
                            if silence_before and silence_after:
                                seek = round(max(time_offset + 1,
                                                 seg["start"])
                                             * FRAMES_PER_SECOND)
                                if content_duration - seg["end"] < threshold:
                                    seek = content_frames
                                del all_segments[window_seg_start + si:]
                                break
                        hal_last_end = seg["end"]

                last_word_end = _get_end(all_segments[window_seg_start:])
                if last_word_end is not None:
                    last_speech_timestamp = last_word_end

            all_tokens.extend([int(t) for t in tokens])
            if not condition_on_previous_text or result.temperature > 0.5:
                prompt_reset_since = len(all_tokens)

            if verbose:
                for seg in all_segments[-4:]:
                    print(f"[{_format_timestamp(seg['start'])} --> "
                          f"{_format_timestamp(seg['end'])}] {seg['text']}")

        total_time = time.time() - t_start
        text = "".join(seg["text"] for seg in all_segments)
        return STTOutput(
            text=text,
            segments=all_segments,
            language=language,
            prompt_tokens=prompt_tokens_count,
            generation_tokens=gen_tokens_count,
            total_tokens=prompt_tokens_count + gen_tokens_count,
            prompt_tps=prompt_tokens_count / total_time if total_time else 0.0,
            generation_tps=gen_tokens_count / total_time if total_time else 0.0,
            total_time=total_time,
        )

    def _detect_language_cached(self, mel) -> str:
        seg = pad_or_trim(mel, self.window_frames)[None]
        lang, _ = self.detect_language(seg)
        return lang

    # -- streaming (server /v1/realtime session protocol) -------------------

    def create_streaming_session(self, language: str = "en", **kwargs):
        from .streaming import WhisperStreamingSession

        return WhisperStreamingSession(self, language=language, **kwargs)

    def generate_streaming(self, audio, chunk_duration: float = 1.0,
                           language: Optional[str] = None, **kwargs):
        """Offline-driven streaming: feed fixed chunks through a streaming
        session and yield STTOutput deltas (reference whisper.py:1304)."""
        from ...utils import load_audio

        if isinstance(audio, str):
            audio = np.asarray(load_audio(audio, sample_rate=SAMPLE_RATE))
        audio = np.asarray(audio, np.float32)
        session = self.create_streaming_session(language=language or "en")
        chunk = int(chunk_duration * SAMPLE_RATE)
        for off in range(0, len(audio), chunk):
            session.feed(audio[off: off + chunk])
            for ev in session.step():
                if ev.kind == "delta":
                    yield STTOutput(text=ev.text, language=session.language)
        session.close()
        while not session.done:
            for ev in session.step():
                if ev.kind == "final":
                    yield STTOutput(text=ev.text, language=session.language)
