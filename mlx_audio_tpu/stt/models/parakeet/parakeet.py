"""Parakeet STT: FastConformer encoder + TDT/RNNT/CTC decoders.

Parity: /root/reference/mlx_audio/stt/models/parakeet/parakeet.py
(ParakeetTDT :489 w/ _tdt_step :522, ParakeetRNNT :622, ParakeetCTC :723,
Model dispatch :131, generate :164 / stream_generate :290), rnnt.py
(LSTM predict network :88, joint :121), ctc.py (ConvASRDecoder :19).

TPU notes: the conformer encoder runs as one jitted program per length
bucket; the greedy TDT/RNNT label loop runs per frame with the LSTM predict
state threaded explicitly; CTC decode is a pure argmax + collapse on device.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_conv1d, apply_embedding, apply_linear, apply_lstm, \
    init_conv1d, init_embedding, init_linear, init_lstm
from ..base import STTOutput
from .conformer import ConformerArgs, conformer_forward, init_conformer

Array = jax.Array

SAMPLE_RATE = 16000
HOP = 160


def log_mel(audio: Array, n_mels: int = 80) -> Array:
    """NeMo-style preprocessor: 25 ms window / 10 ms hop, per-feature
    normalized natural-log mel."""
    from ....dsp import log_mel_spectrogram

    mel = log_mel_spectrogram(audio, n_fft=512, hop_length=HOP,
                              n_mels=n_mels, sample_rate=SAMPLE_RATE,
                              log_base="ln", log_floor_mode="add")
    mean = jnp.mean(mel, axis=-2, keepdims=True)
    std = jnp.std(mel, axis=-2, keepdims=True) + 1e-5
    return (mel - mean) / std


@dataclass
class PredictArgs:
    pred_hidden: int = 640
    pred_rnn_layers: int = 2
    vocab_size: int = 1024


@dataclass
class JointArgs:
    joint_hidden: int = 640
    encoder_hidden: int = 512
    pred_hidden: int = 640
    num_classes: int = 1030  # vocab + blank (+ durations for TDT)
    num_extra_outputs: int = 0  # TDT duration heads


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "parakeet"
    decoding: str = "tdt"  # tdt | rnnt | ctc
    encoder: dict = field(default_factory=dict)
    prediction: dict = field(default_factory=dict)
    joint: dict = field(default_factory=dict)
    vocab_size: int = 1024
    durations: List[int] = field(default_factory=lambda: [0, 1, 2, 3, 4])
    vocabulary: Optional[List[str]] = None
    model_path: str = ""

    @classmethod
    def from_dict(cls, config: dict):
        """Accept the HF transformers ParakeetCTC schema
        (model_type "parakeet_ctc": nested encoder_config with
        hidden_size/num_mel_bins names) alongside the native NeMo-style
        schema."""
        if isinstance(config, dict) and isinstance(
                config.get("encoder_config"), dict) and \
                "hidden_size" in config["encoder_config"]:
            e = config["encoder_config"]
            d_model = e.get("hidden_size", 1024)
            d_ff = e.get("intermediate_size", 4 * d_model)
            if d_ff % d_model:
                raise ValueError(
                    "parakeet: intermediate_size must be a multiple of "
                    f"hidden_size (got {d_ff} / {d_model})")
            # HF vocab_size includes the CTC blank (ref HF
            # ParakeetCTCConfig: vocab_size=1025 = 1024 tokens + blank).
            vocab = config.get("vocab_size", 1025) - 1
            return cls(
                model_type="parakeet",
                decoding="ctc",
                encoder=dict(
                    feat_in=e.get("num_mel_bins", 80),
                    n_layers=e.get("num_hidden_layers", 24),
                    d_model=d_model,
                    n_heads=e.get("num_attention_heads", 8),
                    ff_expansion_factor=d_ff // d_model,
                    subsampling_factor=e.get("subsampling_factor", 8),
                    conv_kernel_size=e.get("conv_kernel_size", 9),
                    subsampling_conv_channels=e.get(
                        "subsampling_conv_channels", 256),
                    use_bias=e.get("attention_bias", True),
                    xscaling=e.get("scale_input", True)),
                vocab_size=vocab)
        return super().from_dict(config)

    def __post_init__(self):
        enc = {k: v for k, v in (self.encoder or {}).items()
               if k in ConformerArgs.__dataclass_fields__}
        self.encoder_args = ConformerArgs(**enc)
        pred = {k: v for k, v in (self.prediction or {}).items()
                if k in PredictArgs.__dataclass_fields__}
        self.pred_args = PredictArgs(**{**pred,
                                        "vocab_size": self.vocab_size})
        joint = {k: v for k, v in (self.joint or {}).items()
                 if k in JointArgs.__dataclass_fields__}
        self.joint_args = JointArgs(**{
            "encoder_hidden": self.encoder_args.d_model,
            "pred_hidden": self.pred_args.pred_hidden, **joint})


class Model(FunctionalModel):
    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.enc_args = config.encoder_args

    # -- params --------------------------------------------------------------

    def init_params(self, key):
        c = self.config
        ks = iter(jax.random.split(key, 16))
        p = {"encoder": init_conformer(next(ks), self.enc_args)}
        if c.decoding in ("tdt", "rnnt"):
            pa, ja = c.pred_args, c.joint_args
            p["decoder"] = {
                "embed": init_embedding(next(ks), pa.vocab_size + 1,
                                        pa.pred_hidden),
                "lstm": {str(i): init_lstm(
                    next(ks), pa.pred_hidden, pa.pred_hidden)
                    for i in range(pa.pred_rnn_layers)},
            }
            p["joint"] = {
                "enc_proj": init_linear(next(ks), ja.encoder_hidden,
                                        ja.joint_hidden),
                "pred_proj": init_linear(next(ks), ja.pred_hidden,
                                         ja.joint_hidden),
                "out": init_linear(next(ks), ja.joint_hidden,
                                   ja.num_classes),
            }
        if c.decoding in ("ctc", "tdt_ctc"):
            p["ctc_decoder"] = {"conv": init_conv1d(
                next(ks), self.enc_args.d_model, c.vocab_size + 1, 1)}
        return p

    # -- loading -------------------------------------------------------------

    def sanitize(self, weights: dict) -> dict:
        """Convert HF transformers ParakeetForCTC / ParakeetEncoder
        checkpoints (nvidia/parakeet-ctc-* HF layout) into our
        functional tree; native-layout trees pass through unchanged."""
        if not any(".subsampling." in k or "ctc_head." in k
                   for k in weights):
            return weights
        import numpy as np

        a = self.enc_args
        # Feature-axis length after the strided conv stack (k=3, p=1).
        f_out = a.feat_in
        for _ in range(int(np.log2(a.subsampling_factor))):
            f_out = (f_out - 1) // 2 + 1
        ch = a.subsampling_conv_channels

        def conv2d_w(w):                 # torch OIHW -> HWIO
            return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))

        def conv1d_w(w):                 # torch (O, I, K) -> (K, I, O)
            return jnp.asarray(np.transpose(np.asarray(w), (2, 1, 0)))

        _ATTN = {"q_proj": "linear_q", "k_proj": "linear_k",
                 "v_proj": "linear_v", "o_proj": "linear_out",
                 "relative_k_proj": "linear_pos",
                 "bias_u": "pos_bias_u", "bias_v": "pos_bias_v"}

        out = {}
        for k, w in weights.items():
            if k.startswith("model."):
                k = k[len("model."):]
            if not k.startswith(("encoder.", "ctc_head.")):
                k = "encoder." + k       # bare ParakeetEncoder layout
            if k.endswith("num_batches_tracked"):
                continue
            if k.startswith("ctc_head."):
                nk = k.replace("ctc_head.", "ctc_decoder.conv.")
                out[nk] = conv1d_w(w) if k.endswith("weight") else w
                continue
            if ".subsampling.linear." in k:
                nk = "encoder.pre_encode.out." + k.rsplit(".", 1)[1]
                if k.endswith("weight"):
                    # HF flattens (B,C,T,F)->(B,T,C*F); ours is (..F,C)
                    w = np.asarray(w).reshape(-1, ch, f_out)
                    w = np.transpose(w, (0, 2, 1)).reshape(w.shape[0], -1)
                    out[nk] = jnp.asarray(w)
                else:
                    out[nk] = w
                continue
            m = re.match(r"encoder\.subsampling\.layers\.(\d+)\.(\w+)", k)
            if m:
                i, leaf = int(m.group(1)), m.group(2)
                if i == 0:
                    name = "00_conv"
                elif i % 3 == 2:         # depthwise of stage (i+1)/3
                    name = f"{2 * ((i + 1) // 3) - 1:02d}_dw"
                else:                    # pointwise of stage i/3
                    name = f"{2 * (i // 3):02d}_pw"
                out[f"encoder.pre_encode.layers.{name}.{leaf}"] = \
                    conv2d_w(w) if leaf == "weight" else w
                continue
            if ".self_attn." in k:
                head, _, tail = k.rpartition(".self_attn.")
                for hf, ours in _ATTN.items():
                    if tail.startswith(hf):
                        tail = tail.replace(hf, ours, 1)
                        break
                out[f"{head}.self_attn.{tail}"] = jnp.asarray(
                    np.asarray(w))
                continue
            if ".conv.norm." in k:
                out[k.replace(".conv.norm.", ".conv.batch_norm.")] = w
                continue
            if ".conv." in k and k.endswith("weight") and \
                    ("pointwise_conv" in k or "depthwise_conv" in k):
                out[k] = conv1d_w(w)
                continue
            out[k] = w
        return out

    # -- encoder -------------------------------------------------------------

    def encode(self, audio) -> Array:
        audio = jnp.asarray(audio, jnp.float32)
        if audio.ndim == 1:
            audio = audio[None]
        mel = log_mel(audio, self.enc_args.feat_in)
        fn = self._jit_cache.get(("enc", mel.shape[1]))
        if fn is None:
            fn = jax.jit(lambda p, m: conformer_forward(
                p["encoder"], self.enc_args, m))
            self._jit_cache[("enc", mel.shape[1])] = fn
        return fn(self.params, mel)

    # -- decoders ------------------------------------------------------------

    def _predict_step(self, token, lstm_states):
        """One predict-network step: token (B,) -> (pred (B, H), states)."""
        p = self.params["decoder"]
        x = apply_embedding(p["embed"], token)[:, None]  # (B, 1, H)
        new_states = []
        for i in range(self.config.pred_args.pred_rnn_layers):
            lp = p["lstm"][str(i)]
            # single-step LSTM with explicit state
            h_prev, c_prev = lstm_states[i]
            wih, whh = lp["weight_ih"], lp["weight_hh"]
            b = lp.get("bias_ih", 0) + lp.get("bias_hh", 0)
            gates = x[:, 0] @ wih.T + h_prev @ whh.T + b
            ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(fg) * c_prev + jax.nn.sigmoid(ig) * \
                jnp.tanh(gg)
            h_new = jax.nn.sigmoid(og) * jnp.tanh(c_new)
            new_states.append((h_new, c_new))
            x = h_new[:, None]
        return x[:, 0], new_states

    def _joint(self, enc_t, pred):
        j = self.params["joint"]
        h = jax.nn.relu(apply_linear(j["enc_proj"], enc_t)
                        + apply_linear(j["pred_proj"], pred))
        return apply_linear(j["out"], h)

    def decode_tdt(self, enc: Array, max_symbols_per_frame: int = 8):
        """Greedy token-and-duration-transducer decode
        (reference parakeet.py:522-620)."""
        c = self.config
        blank = c.vocab_size
        n_dur = len(c.durations)
        b, t_len, _ = enc.shape
        assert b == 1
        pa = c.pred_args
        states = [(jnp.zeros((1, pa.pred_hidden)),
                   jnp.zeros((1, pa.pred_hidden)))
                  for _ in range(pa.pred_rnn_layers)]
        pred, states = self._predict_step(
            jnp.full((1,), blank, jnp.int32), states)
        tokens: List[int] = []
        frames: List[int] = []
        t = 0
        sym = 0
        enc_np = enc
        while t < t_len:
            logits = np.asarray(self._joint(enc_np[:, t], pred))[0]
            if c.decoding == "tdt":
                tok_logits = logits[: blank + 1]
                dur_logits = logits[blank + 1: blank + 1 + n_dur]
                tok = int(np.argmax(tok_logits))
                dur = c.durations[int(np.argmax(dur_logits))]
            else:  # rnnt
                tok = int(np.argmax(logits[: blank + 1]))
                dur = 0
            if tok != blank:
                tokens.append(tok)
                frames.append(t)
                pred, states = self._predict_step(
                    jnp.full((1,), tok, jnp.int32), states)
                sym += 1
            if tok == blank or (c.decoding == "tdt" and dur > 0):
                t += max(dur, 1) if c.decoding == "tdt" else 1
                sym = 0
            elif sym >= max_symbols_per_frame:
                t += 1
                sym = 0
        return tokens, frames

    def decode_ctc(self, enc: Array):
        """Greedy CTC: argmax -> collapse repeats -> drop blanks."""
        logits = apply_conv1d(self.params["ctc_decoder"]["conv"], enc)
        ids = np.asarray(jnp.argmax(logits, axis=-1))[0]
        blank = self.config.vocab_size
        tokens, frames = [], []
        prev = -1
        for t, i in enumerate(ids):
            if i != blank and i != prev:
                tokens.append(int(i))
                frames.append(t)
            prev = int(i)
        return tokens, frames

    def _detokenize(self, tokens: List[int]) -> str:
        vocab = self.config.vocabulary
        if vocab:
            return "".join(vocab[t] for t in tokens
                           if 0 <= t < len(vocab)).replace("▁", " ").strip()
        return " ".join(str(t) for t in tokens)

    # -- public --------------------------------------------------------------

    def _seconds_per_frame(self) -> float:
        return HOP * self.enc_args.subsampling_factor / SAMPLE_RATE

    def _decode_window(self, audio: np.ndarray, t_offset: float):
        """Decode one audio window -> list[AlignedToken] at absolute time.

        Ref parakeet.py:147-162 (decode -> AlignedResult per window).
        """
        from ..nemo import AlignedToken

        enc = self.encode(audio)
        if self.config.decoding == "ctc":
            tokens, frames = self.decode_ctc(enc)
        else:
            tokens, frames = self.decode_tdt(enc)
        spf = self._seconds_per_frame()
        vocab = self.config.vocabulary
        out = []
        for tok, f in zip(tokens, frames):
            text = (vocab[tok].replace("▁", " ")
                    if vocab and 0 <= tok < len(vocab) else str(tok))
            out.append(AlignedToken(
                id=tok, text=text, start=t_offset + f * spf, duration=spf))
        return out

    def transcribe_chunked(self, audio: np.ndarray,
                           chunk_duration: float = 120.0,
                           overlap_duration: float = 15.0,
                           chunk_callback=None):
        """Long-audio transcription: overlapping windows merged by token
        alignment (ref parakeet.py:164-260 + nemo/alignment.py).

        Returns an :class:`~..nemo.AlignedResult`.
        """
        from ..nemo import (merge_longest_common_subsequence,
                            merge_longest_contiguous, sentences_to_result,
                            tokens_to_sentences)

        chunk = int(chunk_duration * SAMPLE_RATE)
        overlap = int(overlap_duration * SAMPLE_RATE)
        if overlap >= chunk:
            raise ValueError("overlap_duration must be < chunk_duration")
        merged = []
        for start in range(0, max(len(audio), 1), chunk - overlap):
            end = min(start + chunk, len(audio))
            piece = self._decode_window(audio[start:end], start / SAMPLE_RATE)
            if chunk_callback is not None:
                chunk_callback(end, len(audio))
            if not merged:
                merged = piece
            else:
                try:
                    merged = merge_longest_contiguous(
                        merged, piece, overlap_duration=overlap_duration)
                except RuntimeError:
                    merged = merge_longest_common_subsequence(
                        merged, piece, overlap_duration=overlap_duration)
            if end >= len(audio):
                break
        return sentences_to_result(tokens_to_sentences(merged))

    def generate(self, audio, chunk_duration=None, overlap_duration=15.0,
                 chunk_callback=None, **kwargs) -> STTOutput:
        import time as _t

        t0 = _t.time()
        if isinstance(audio, str):
            from ...utils import load_audio

            audio = np.asarray(load_audio(audio, sample_rate=SAMPLE_RATE))
        audio = np.asarray(audio)
        long_audio = (chunk_duration is not None
                      and len(audio) > chunk_duration * SAMPLE_RATE)
        if long_audio:
            result = self.transcribe_chunked(
                audio, chunk_duration=chunk_duration,
                overlap_duration=overlap_duration,
                chunk_callback=chunk_callback)
            segments = [{"start": round(s.start, 2), "end": round(s.end, 2),
                         "text": s.text.strip()} for s in result.sentences]
            n_tokens = sum(len(s.tokens) for s in result.sentences)
            wall = _t.time() - t0
            return STTOutput(
                text=result.text, segments=segments, language="en",
                generation_tokens=n_tokens, total_time=wall,
                generation_tps=n_tokens / wall if wall else 0.0)
        enc = self.encode(audio)
        if self.config.decoding == "ctc":
            tokens, frames = self.decode_ctc(enc)
        else:
            tokens, frames = self.decode_tdt(enc)
        spf = self._seconds_per_frame()
        segments = [{"start": round(f * spf, 2),
                     "end": round((f + 1) * spf, 2),
                     "text": self._detokenize([t])}
                    for t, f in zip(tokens, frames)]
        wall = _t.time() - t0
        return STTOutput(
            text=self._detokenize(tokens), segments=segments,
            language="en", generation_tokens=len(tokens),
            total_time=wall,
            generation_tps=len(tokens) / wall if wall else 0.0)
