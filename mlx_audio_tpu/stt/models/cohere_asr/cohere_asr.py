"""Cohere ASR (command-a-translate derived FastConformer encoder-decoder).

Parity target: /root/reference/mlx_audio/stt/models/cohere_asr/
(ConformerEncoder cohere_asr.py:271, TransformerDecoderWrapper :525,
batched greedy decode `_generate_batch_tokens` :858, energy chunking
`split_audio_chunks_energy` :607, optional silero-VAD segmentation vad.py,
slaney-mel frontend audio.py, Cohere prompt tokenizer.py:118-131). This is
the model behind the reference's only published STT wall-clock numbers
(cohere_asr/README.md:134-148 — 10-min meeting in 32 s on M1 Max).

TPU design:
* The encoder is the shared parakeet FastConformer (rel-pos attention,
  dw-striding 8x subsampling) run batched over bucketed mel lengths with
  validity masks.
* The whole batched greedy decode — prefill + AR loop with per-row EOS
  flags — is ONE compiled `lax.while_loop` over fixed-capacity KV caches
  (the canary decoder stack), early-exiting when every row is finished.
  The reference syncs to host every 16 tokens; here the device runs the
  entire batch to completion with zero host round-trips.
* Long audio is split on the host at low-energy boundaries (or by silero
  VAD), segments are sorted by length and packed into (mel_bucket,
  batch_bucket) shapes so a 30-min file reuses a handful of compilations.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_linear, init_linear
from ..base import STTOutput
from ..canary.canary import (
    CanaryTokenizer,
    DecoderConfig as _DecoderInnerConfig,
    _fixed_positions,
    cross_kv,
    decoder_forward,
    init_decoder,
)
from ..parakeet.conformer import (
    ConformerArgs,
    conformer_forward,
    init_conformer,
    subsampled_length,
)
from ....ops.kvcache import KVCache

Array = jax.Array

NO_SPACE_LANGS = {"ja", "zh"}
MEL_BUCKETS = (256, 512, 1024, 2048, 3584)
BATCH_BUCKETS = (1, 2, 4, 8, 16, 32)
LOG_GUARD = 2.0 ** -24


@dataclass
class PreprocessorConfig(BaseModelArgs):
    sample_rate: int = 16000
    normalize: str = "per_feature"
    features: int = 128
    n_fft: int = 512
    window_size: float = 0.025
    window_stride: float = 0.01
    window: str = "hann"
    preemph: float = 0.97
    pad_value: float = 0.0
    log: bool = True

    @property
    def win_length(self) -> int:
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.window_stride * self.sample_rate)


@dataclass
class HeadConfig(BaseModelArgs):
    hidden_size: int = 1024
    num_classes: int = 16384
    log_softmax: bool = True


@dataclass
class DecoderConfig(BaseModelArgs):
    config_dict: Optional[dict] = None

    def inner(self) -> _DecoderInnerConfig:
        d = dict(self.config_dict or {})
        d.setdefault("num_attention_heads", 8)
        return _DecoderInnerConfig.from_dict(d)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "cohere_asr"
    vocab_size: int = 16384
    encoder: dict = field(default_factory=dict)
    transf_decoder: Optional[DecoderConfig] = None
    head: Optional[HeadConfig] = None
    preprocessor: Optional[PreprocessorConfig] = None
    max_audio_clip_s: float = 35.0
    overlap_chunk_second: float = 5.0
    min_energy_window_samples: int = 1600
    batch_size: int = 8
    sample_rate: int = 16000
    supported_languages: List[str] = field(default_factory=lambda: [
        "en", "fr", "de", "es", "it", "pt", "nl", "pl", "el", "ar",
        "ja", "zh", "vi", "ko"])

    def __post_init__(self):
        if isinstance(self.transf_decoder, dict):
            self.transf_decoder = DecoderConfig.from_dict(self.transf_decoder)
        if self.transf_decoder is None:
            self.transf_decoder = DecoderConfig()
        if isinstance(self.head, dict):
            self.head = HeadConfig.from_dict(self.head)
        if self.head is None:
            self.head = HeadConfig(num_classes=self.vocab_size)
        if isinstance(self.preprocessor, dict):
            self.preprocessor = PreprocessorConfig.from_dict(self.preprocessor)
        if self.preprocessor is None:
            self.preprocessor = PreprocessorConfig()

    def conformer_args(self) -> ConformerArgs:
        valid = set(ConformerArgs.__dataclass_fields__)
        enc = {k: v for k, v in (self.encoder or {}).items() if k in valid}
        enc.setdefault("feat_in", self.preprocessor.features)
        return ConformerArgs(**enc)


# ---------------------------------------------------------------- chunking

def split_audio_chunks_energy(
    waveform: np.ndarray,
    sample_rate: int,
    max_audio_clip_s: float,
    overlap_chunk_second: float,
    min_energy_window_samples: int,
) -> List[Tuple[int, int]]:
    """Split at the quietest window near each max-length boundary (host-side
    numpy; reference cohere_asr.py:607-668)."""
    waveform = np.asarray(waveform, np.float32)
    chunk_size = max(1, int(round(max_audio_clip_s * sample_rate)))
    ctx = max(1, int(round(overlap_chunk_second * sample_rate)))
    total = waveform.shape[0]
    if total <= chunk_size:
        return [(0, total)]
    chunks = []
    start = 0
    while start < total:
        if start + chunk_size >= total:
            chunks.append((start, total))
            break
        s0 = max(start, start + chunk_size - ctx)
        s1 = min(start + chunk_size, total)
        split = _quietest_split(waveform, s0, s1, min_energy_window_samples)
        split = max(start + 1, min(split, total))
        chunks.append((start, split))
        start = split
    return chunks


def _quietest_split(waveform: np.ndarray, start: int, end: int,
                    window: int) -> int:
    seg = waveform[start:end]
    if seg.shape[0] <= window:
        return (start + end) // 2
    usable = (seg.shape[0] // window) * window
    if usable <= 0:
        return (start + end) // 2
    energies = np.mean(seg[:usable].reshape(-1, window) ** 2, axis=1)
    return start + int(np.argmin(energies)) * window


def join_chunk_texts(texts, language: str) -> str:
    parts = [t.strip() for t in texts if t and t.strip()]
    sep = "" if language in NO_SPACE_LANGS else " "
    return sep.join(parts)


def segment_with_silero(
    waveform: np.ndarray,
    vad_model,
    sample_rate: int = 16000,
    *,
    threshold: float = 0.5,
    merge_gap_s: float = 1.0,
    max_chunk_s: float = 30.0,
    min_speech_duration_ms: int = 250,
    min_silence_duration_ms: int = 100,
    speech_pad_ms: int = 30,
) -> List[Tuple[int, int]]:
    """Silero-probability speech runs pooled to 256 ms blocks, merged across
    small gaps and capped at max_chunk_s (reference vad.py:52-159)."""
    chunk = 512
    blocks_per = 8
    block = chunk * blocks_per
    block_s = block / sample_rate
    probs32 = np.asarray(
        vad_model.predict_proba(np.asarray(waveform, np.float32),
                                sample_rate)).reshape(-1)
    n = (probs32.shape[0] // blocks_per) * blocks_per
    if n == 0:
        return [(0, int(waveform.shape[0]))]
    probs = 1.0 - np.prod((1.0 - probs32[:n]).reshape(-1, blocks_per), axis=1)
    pad_b = max(0, int(speech_pad_ms / 1000 / block_s))
    min_speech_b = max(1, int(min_speech_duration_ms / 1000 / block_s))
    min_sil_b = max(1, int(min_silence_duration_ms / 1000 / block_s))
    total = int(waveform.shape[0])

    runs = []
    in_speech, seg_start, last_speech, silent = False, 0, -1, 0
    for idx, p in enumerate(probs):
        if p >= threshold:
            if not in_speech:
                seg_start, in_speech = max(0, idx - pad_b), True
            last_speech, silent = idx, 0
        elif in_speech:
            silent += 1
            if silent >= min_sil_b:
                seg_end = min(last_speech + 1 + pad_b, len(probs))
                if seg_end - seg_start >= min_speech_b:
                    s, e = seg_start * block, min(seg_end * block, total)
                    if s < e:
                        runs.append((s, e))
                in_speech, silent, last_speech = False, 0, -1
    if in_speech:
        seg_end = min(len(probs), last_speech + 1 + pad_b)
        if seg_end - seg_start >= min_speech_b:
            s, e = seg_start * block, min(seg_end * block, total)
            if s < e:
                runs.append((s, e))
    if not runs:
        return [(0, total)]
    # merge across gaps and cap chunk length
    max_chunk = int(max_chunk_s * sample_rate)
    max_gap = int(merge_gap_s * sample_rate)

    def split_long(s, e):
        out = []
        while s < e:
            out.append([s, min(s + max_chunk, e)])
            s = min(s + max_chunk, e)
        return out

    merged = split_long(*runs[0])
    for s, e in runs[1:]:
        prev = merged[-1]
        if s - prev[1] <= max_gap and e - prev[0] <= max_chunk:
            prev[1] = e
        else:
            merged.extend(split_long(s, e))
    return [(s, e) for s, e in merged]


# ------------------------------------------------------------------- model

def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class Model(FunctionalModel):
    def __init__(self, config: Union[ModelConfig, dict, None] = None,
                 **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer: Optional[CanaryTokenizer] = None
        self._jit_cache: Dict = {}
        self._mel_fb: Optional[np.ndarray] = None
        self._window: Optional[np.ndarray] = None
        self._vad_model = None

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def init_params(self, key):
        cfg = self.config
        k1, k2, k3 = jax.random.split(key, 3)
        args = cfg.conformer_args()
        dec = cfg.transf_decoder.inner()
        p = {"encoder": init_conformer(k1, args),
             "decoder": init_decoder(k2, dec, cfg.head.num_classes,
                                     dec.hidden_size)}
        if args.d_model != dec.hidden_size:
            p["encoder_proj"] = init_linear(k3, args.d_model, dec.hidden_size)
        return p

    # ------------------------------------------------------------ frontend

    def _fb(self) -> np.ndarray:
        if self._mel_fb is None:
            from ....dsp import mel_filters
            pp = self.config.preprocessor
            self._mel_fb = np.asarray(mel_filters(
                pp.sample_rate, pp.n_fft, pp.features,
                norm="slaney", mel_scale="slaney"), np.float32)
        return self._mel_fb

    def _stft_window(self) -> np.ndarray:
        if self._window is None:
            from ....dsp import hanning
            pp = self.config.preprocessor
            w = np.asarray(hanning(pp.win_length, periodic=False), np.float32)
            pad = pp.n_fft - w.shape[0]
            if pad > 0:
                self._window = np.concatenate([
                    np.zeros(pad // 2, np.float32), w,
                    np.zeros(pad - pad // 2, np.float32)])
            else:
                self._window = w
        return self._window

    def _log_mel(self, audio: np.ndarray) -> Tuple[np.ndarray, int]:
        """waveform -> (per-feature-normalized log mel (T, F), valid frames).

        Slaney-mel power spectrogram with preemphasis and ln(mel + 2^-24)
        guard; per-feature mean/std over valid frames with ddof=1
        (reference audio.py:95-150). Inference is deterministic: the
        reference's dither noise is omitted.
        """
        pp = self.config.preprocessor
        x = np.asarray(audio, np.float32).reshape(-1)
        if pp.preemph and x.shape[0] > 1:
            x = np.concatenate([x[:1], x[1:] - pp.preemph * x[:-1]])
        # host-side framed rfft (this front-end is host numpy anyway, and
        # eagerly materializing a complex device array is UNIMPLEMENTED on
        # some TPU runtimes — complex values must stay inside fused jits)
        pad = pp.n_fft // 2
        xp = np.pad(x, (pad, pad))
        n_frames = 1 + (len(xp) - pp.n_fft) // pp.hop_length
        idx = (np.arange(pp.n_fft)[None, :]
               + pp.hop_length * np.arange(n_frames)[:, None])
        frames = xp[idx] * self._stft_window()[None, :]
        power = np.square(np.abs(np.fft.rfft(frames, axis=-1)))  # (T', F)
        mel = power @ self._fb().T                              # (T', n_mels)
        if pp.log:
            mel = np.log(mel + LOG_GUARD)
        seq_len = min(max(x.shape[0] // pp.hop_length, 0), mel.shape[0])
        if pp.normalize == "per_feature" and seq_len > 0:
            valid = mel[:seq_len]
            mean = valid.mean(axis=0, keepdims=True)
            std = valid.std(axis=0, ddof=1, keepdims=True) if seq_len > 1 \
                else np.zeros_like(mean)
            mel = (mel - mean) / (std + 1e-5)
        mel = mel[:seq_len]
        return mel.astype(np.float32), seq_len

    # ------------------------------------------------------------ compiled

    def _fns(self, mel_bucket: int, batch_bucket: int, prompt_len: int,
             max_tokens: int):
        key_ = (mel_bucket, batch_bucket, prompt_len, max_tokens)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        cfg = self.config
        args = cfg.conformer_args()
        dec = cfg.transf_decoder.inner()
        pos_table = jnp.asarray(_fixed_positions(
            dec.max_sequence_length, dec.hidden_size))

        def encode(p, mel, n):
            enc = conformer_forward(p["encoder"], args, mel, lengths=n)
            if "encoder_proj" in p:
                enc = apply_linear(p["encoder_proj"], enc)
            enc_len = subsampled_length(args, n)
            mask = jnp.arange(enc.shape[1])[None, :] < enc_len[:, None]
            return enc, mask

        def decode(p, enc, enc_mask, prompt, eos_id):
            b = enc.shape[0]
            cap = prompt_len + max_tokens
            ckv = cross_kv(p["decoder"], dec, enc)
            caches = [KVCache.init(
                b, cap, dec.num_attention_heads,
                dec.hidden_size // dec.num_attention_heads,
                dtype=jnp.float32) for _ in range(dec.num_layers)]
            logits, caches = decoder_forward(
                p["decoder"], dec, prompt, enc_mask, caches, ckv,
                jnp.int32(0), pos_table)
            last = logits[:, -1]
            toks0 = jnp.full((b, max_tokens), eos_id, jnp.int32)

            def cond(st):
                i, _, _, _, done = st
                return jnp.logical_and(i < max_tokens,
                                       jnp.logical_not(jnp.all(done)))

            def body(st):
                i, lg, caches, toks, done = st
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, eos_id, nxt)
                done = jnp.logical_or(done, nxt == eos_id)
                toks = toks.at[:, i].set(nxt)
                lg2, caches = decoder_forward(
                    p["decoder"], dec, nxt[:, None], enc_mask, caches, ckv,
                    prompt_len + i, pos_table)
                return (i + 1, lg2[:, 0], caches, toks, done)

            _, _, _, toks, _ = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), last, caches, toks0,
                 jnp.zeros((b,), jnp.bool_)))
            return toks

        fns = (jax.jit(encode), jax.jit(decode))
        self._jit_cache[key_] = fns
        return fns

    # ----------------------------------------------------------- decoding

    def _transcribe_segments(
        self, segments: List[np.ndarray], language: str, punctuation: bool,
        batch_size: int, max_tokens: int,
    ) -> Tuple[List[str], List[int], int]:
        if self._tokenizer is None:
            raise RuntimeError(
                "tokenizer not loaded (place tokenizer.model / tokens.json "
                "beside the weights)")
        tok = self._tokenizer
        prompt = self._prompt_tokens(language, punctuation)
        eos_id = tok.eos_id
        order = sorted(range(len(segments)),
                       key=lambda i: segments[i].shape[0], reverse=True)
        texts = [""] * len(segments)
        counts = [0] * len(segments)
        dec_max = self.config.transf_decoder.inner().max_sequence_length
        max_tokens = max(0, min(int(max_tokens), dec_max - len(prompt)))

        for start in range(0, len(order), batch_size):
            idxs = order[start:start + batch_size]
            mels, lens = [], []
            for i in idxs:
                m, n = self._log_mel(segments[i])
                mels.append(m)
                lens.append(n)
            tb = _bucket(max(len(m) for m in mels), MEL_BUCKETS)
            # trailing partial batch reuses the full-batch program (padded
            # rows are masked): one compiled (tb, bb) pair per run, not two
            bb = _bucket(batch_size if len(order) > batch_size
                         else len(idxs), BATCH_BUCKETS)
            feats = np.zeros((bb, tb, self.config.preprocessor.features),
                             np.float32)
            n_arr = np.zeros((bb,), np.int32)
            for r, m in enumerate(mels):
                feats[r, :m.shape[0]] = m[:tb]
                n_arr[r] = min(lens[r], tb)
            encode, decode = self._fns(tb, bb, len(prompt), max_tokens)
            enc, enc_mask = encode(self.params, jnp.asarray(feats),
                                   jnp.asarray(n_arr))
            prompt_arr = np.tile(np.asarray(prompt, np.int32)[None], (bb, 1))
            toks = np.asarray(decode(self.params, enc, enc_mask,
                                     jnp.asarray(prompt_arr),
                                     jnp.int32(eos_id)))
            for r, i in enumerate(idxs):
                row = toks[r]
                stop = np.flatnonzero(row == eos_id)
                gen = row[: stop[0]] if stop.size else row
                texts[i] = tok.decode(gen.tolist()).strip()
                counts[i] = int(gen.shape[0])
        return texts, counts, len(prompt)

    def _prompt_tokens(self, language: str, punctuation: bool) -> List[int]:
        t = self._tokenizer.token2id
        names = ["<|startofcontext|>", "<|startoftranscript|>",
                 "<|emo:undefined|>", f"<|{language}|>", f"<|{language}|>",
                 "<|pnc|>" if punctuation else "<|nopnc|>",
                 "<|noitn|>", "<|notimestamp|>", "<|nodiarize|>"]
        return [t[n] for n in names]

    # ----------------------------------------------------------- generate

    def transcribe(self, *, language: str, audio_files=None,
                   audio_arrays=None, sample_rates=None,
                   punctuation: bool = True, batch_size: Optional[int] = None,
                   max_tokens: int = 256) -> List[str]:
        """Multi-file batch API (reference cohere_asr.py:1066-1126)."""
        if (audio_files is None) == (audio_arrays is None):
            raise ValueError("provide exactly one of audio_files/audio_arrays")
        self._validate_language(language)
        waves = []
        if audio_files is not None:
            from ...utils import load_audio
            waves = [np.asarray(load_audio(str(f), self.sample_rate))
                     for f in audio_files]
        else:
            if sample_rates is None or len(sample_rates) != len(audio_arrays):
                raise ValueError("sample_rates must match audio_arrays")
            for a, sr in zip(audio_arrays, sample_rates):
                waves.append(self._to_mono(a, sr))
        if not waves:
            return []
        seg_waves, seg_meta = self._prepare_segments(waves)
        texts, _, _ = self._transcribe_segments(
            seg_waves, language, punctuation,
            batch_size or self.config.batch_size, max_tokens)
        outputs = [""] * len(waves)
        grouped: Dict[int, List[Tuple[int, str]]] = {}
        for meta, text in zip(seg_meta, texts):
            if meta["chunk_idx"] is None:
                outputs[meta["sample_idx"]] = text
            else:
                grouped.setdefault(meta["sample_idx"], []).append(
                    (meta["chunk_idx"], text))
        for i, items in grouped.items():
            items.sort()
            outputs[i] = join_chunk_texts([t for _, t in items], language)
        return outputs

    def generate(self, audio, *, language: str = "en",
                 punctuation: bool = True, batch_size: Optional[int] = None,
                 max_tokens: int = 256, verbose: bool = False,
                 stream: bool = False, sample_rate: Optional[int] = None,
                 vad: Union[bool, str] = False, vad_merge_gap_s: float = 1.0,
                 vad_max_chunk_s: float = 30.0, **kwargs) -> STTOutput:
        if stream:
            raise NotImplementedError(
                "streaming generation is not implemented for Cohere ASR")
        t0 = time.time()
        self._validate_language(language)
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio
            wave = np.asarray(load_audio(str(audio), self.sample_rate))
        else:
            wave = self._to_mono(audio, sample_rate)
        if vad:
            spans = segment_with_silero(
                wave, self._get_vad(vad), self.sample_rate,
                merge_gap_s=vad_merge_gap_s, max_chunk_s=vad_max_chunk_s)
            seg_waves = [wave[s:e] for s, e in spans]
            seg_meta = [{"start": s / self.sample_rate,
                         "end": e / self.sample_rate} for s, e in spans]
        else:
            seg_waves, meta = self._prepare_segments([wave])
            seg_meta = [{"start": m["start"], "end": m["end"]} for m in meta]
        texts, counts, prompt_len = self._transcribe_segments(
            seg_waves, language, punctuation,
            batch_size or self.config.batch_size, max_tokens)
        segments = [{"text": t, "start": float(m["start"]),
                     "end": float(m["end"])}
                    for m, t in zip(seg_meta, texts)]
        text = join_chunk_texts(texts, language)
        dt = time.time() - t0
        gen_tokens = int(sum(counts))
        prompt_tokens = prompt_len * len(seg_waves)
        if verbose:
            print(text)
        return STTOutput(
            text=text, segments=segments, language=language,
            prompt_tokens=prompt_tokens, generation_tokens=gen_tokens,
            total_tokens=prompt_tokens + gen_tokens, total_time=dt,
            prompt_tps=prompt_tokens / dt if dt > 0 else 0.0,
            generation_tps=gen_tokens / dt if dt > 0 else 0.0)

    __call__ = generate

    # ------------------------------------------------------------ helpers

    def _validate_language(self, language: str):
        if language not in set(self.config.supported_languages):
            raise ValueError(
                f"Unsupported language '{language}'. Supported: "
                f"{sorted(self.config.supported_languages)}")

    def _to_mono(self, audio, sample_rate: Optional[int]) -> np.ndarray:
        arr = np.asarray(audio, np.float32)
        if arr.ndim == 2:
            arr = arr.mean(axis=0 if arr.shape[0] <= 8
                           and arr.shape[1] > arr.shape[0] else 1)
        if arr.ndim != 1:
            raise ValueError(f"expected mono waveform, got {arr.shape}")
        if sample_rate is not None and sample_rate != self.sample_rate:
            from ....utils import resample_audio
            arr = np.asarray(resample_audio(arr, sample_rate,
                                            self.sample_rate), np.float32)
        return arr

    def _prepare_segments(self, waves: List[np.ndarray]):
        cfg = self.config
        fast_path_s = max(0.0, cfg.max_audio_clip_s - cfg.overlap_chunk_second)
        seg_waves, seg_meta = [], []
        for si, w in enumerate(waves):
            dur = w.shape[0] / self.sample_rate
            if dur <= fast_path_s:
                seg_waves.append(w)
                seg_meta.append({"sample_idx": si, "chunk_idx": None,
                                 "start": 0.0, "end": dur})
                continue
            for ci, (s, e) in enumerate(split_audio_chunks_energy(
                    w, self.sample_rate, cfg.max_audio_clip_s,
                    cfg.overlap_chunk_second, cfg.min_energy_window_samples)):
                seg_waves.append(w[s:e])
                seg_meta.append({"sample_idx": si, "chunk_idx": ci,
                                 "start": s / self.sample_rate,
                                 "end": e / self.sample_rate})
        return seg_waves, seg_meta

    def _get_vad(self, selector):
        if selector is not True and selector != "silero-mlx":
            raise ValueError(
                f"unknown vad backend: {selector!r} "
                "(supported: True, 'silero-mlx')")
        if self._vad_model is None:
            from ....vad.utils import load_model as load_vad
            self._vad_model = load_vad("mlx-community/silero-vad")
        return self._vad_model

    def set_vad_model(self, model):
        """Inject a loaded silero VAD model (avoids a HF download)."""
        self._vad_model = model

    # ------------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """NeMo/Cohere checkpoint names -> our tree (reference sanitize
        cohere_asr.py:718-756); torch conv layouts to WIO/HWIO."""
        out = {}
        sub_map = {"conv.0.": "layers.00_conv.", "conv.2.": "layers.01_dw.",
                   "conv.3.": "layers.02_pw.", "conv.5.": "layers.03_dw.",
                   "conv.6.": "layers.04_pw."}
        for k, v in weights.items():
            if k.startswith("preprocessor.") or \
                    k.endswith("num_batches_tracked"):
                continue
            v = jnp.asarray(v)
            k = k.replace("transf_decoder._embedding.",
                          "transf_decoder.embedding.")
            k = k.replace("transf_decoder._decoder.",
                          "transf_decoder.decoder.")
            if k.startswith("encoder.pre_encode."):
                for old, new in sub_map.items():
                    k = k.replace("pre_encode." + old, "pre_encode." + new)
            k = k.replace("transf_decoder.decoder.layers.", "decoder.blocks.")
            k = k.replace("transf_decoder.decoder.final_layer_norm.",
                          "decoder.final_norm.")
            k = k.replace("transf_decoder.embedding.token_embedding.",
                          "decoder.embedding.")
            k = k.replace("transf_decoder.embedding.layer_norm.",
                          "decoder.embedding_layer_norm.")
            k = k.replace(".layer_norm_1.", ".self_attn_norm.")
            k = k.replace(".layer_norm_2.", ".cross_attn_norm.")
            k = k.replace(".layer_norm_3.", ".ff_norm.")
            k = k.replace(".first_sub_layer.", ".self_attn.")
            k = k.replace(".second_sub_layer.", ".cross_attn.")
            k = k.replace(".query_net.", ".q_proj.")
            k = k.replace(".key_net.", ".k_proj.")
            k = k.replace(".value_net.", ".v_proj.")
            k = k.replace(".out_projection.", ".out_proj.")
            k = k.replace(".third_sub_layer.dense_in.", ".ff1.")
            k = k.replace(".third_sub_layer.dense_out.", ".ff2.")
            k = k.replace("log_softmax.mlp.layer0.", "decoder.output_proj.")
            k = k.replace("encoder_decoder_proj.", "encoder_proj.")
            if k.endswith("weight") and v.ndim == 4:
                v = jnp.transpose(v, (2, 3, 1, 0))      # OIHW -> HWIO
            elif k.endswith("weight") and v.ndim == 3 and (
                    ".conv" in k or "_dw" in k or "_pw" in k
                    or "pre_encode" in k):
                v = jnp.transpose(v, (2, 1, 0))          # OIK -> WIO (KIO)
            out[k] = v
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        import json
        model_path = Path(model_path)
        f = model_path / "tokenizer.model"
        if f.exists():
            try:
                model._tokenizer = CanaryTokenizer(str(f))
            except Exception:
                pass
        tokens = model_path / "tokens.json"
        if model._tokenizer is None and tokens.exists():
            model._tokenizer = CanaryTokenizer(
                piece_list=json.loads(tokens.read_text()))
        # precomputed mel/window buffers override the analytic ones
        st = model_path / "model.safetensors"
        if st.exists():
            try:
                from safetensors.numpy import load_file
                buf = load_file(str(st))
                fb = buf.get("preprocessor.featurizer.fb")
                if fb is not None:
                    model._mel_fb = np.asarray(fb, np.float32).reshape(
                        -1, fb.shape[-1]) if fb.ndim == 3 else \
                        np.asarray(fb, np.float32)
                win = buf.get("preprocessor.featurizer.window")
                if win is not None:
                    w = np.asarray(win, np.float32)
                    pad = model.config.preprocessor.n_fft - w.shape[0]
                    if pad > 0:
                        w = np.concatenate([np.zeros(pad // 2, np.float32),
                                            w,
                                            np.zeros(pad - pad // 2,
                                                     np.float32)])
                    model._window = w
            except Exception:
                pass
        return model


__all__ = ["Model", "ModelConfig", "split_audio_chunks_energy",
           "segment_with_silero", "join_chunk_texts"]
