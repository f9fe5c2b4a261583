"""Sortformer speaker diarization (NVIDIA NeMo v1 + streaming cache).

Parity: reference vad/models/sortformer/sortformer.py — NeMo mel features
(preemphasis, 400/512 Hann window center-padded to n_fft, constant STFT
pad, slaney mels, natural log, Bessel per-feature normalization, :43-124),
dw-striding ConvSubsampling with the NCHW flatten order (:127-205),
FastConformer layers with Transformer-XL relative attention (:234-444),
BART-style post-LN transformer with learned positions (:517-637),
sigmoid speaker heads (:641-688), segments extraction with
threshold/min-duration/merge-gap (:1832-1900), energy silence trimming
(:1908-1967), the spkcache/fifo streaming state machine with the v1
highest-activity compression (:906-1500, :1801-1829), and the
layers_N / conv-layout sanitize (:2013-2065), and the v2.1 AOSC
(arrival-order speaker cache) compression: LLR frame scoring, overlap
masking, strong/weak top-k boosting, per-speaker silence padding, and the
running silence profile (reference :1505-1799).

TPU design: the whole features -> FastConformer -> transformer -> sigmoid
pipeline is one jitted program per mel-frame bucket with a validity mask;
streaming steps reuse the same compiled encoder over the assembled
[spkcache | fifo | chunk] sequence (bucketed), so the streaming path
shares programs with the offline one.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_conv2d, apply_embedding,
                    apply_layer_norm, apply_linear, init_conv1d,
                    init_conv2d, init_embedding, init_layer_norm,
                    init_linear)
from .config import (FCEncoderConfig, ModelConfig, ModulesConfig,
                     ProcessorConfig, TFEncoderConfig)

Array = jax.Array

_LOG_GUARD = 2.0 ** -24
_NORM_CONSTANT = 1e-5
FRAME_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _bucket(n: int) -> int:
    for b in FRAME_BUCKETS:
        if n <= b:
            return b
    return ((n + 511) // 512) * 512


# ------------------------------------------------------------ features

def extract_mel_features(waveform: np.ndarray, proc: ProcessorConfig,
                         normalize: bool = True) -> np.ndarray:
    """(samples,) -> (frames, n_mels), NeMo FilterbankFeatures semantics."""
    from ....dsp import mel_filters, stft

    x = np.asarray(waveform, np.float32).reshape(-1)
    x = np.concatenate([x[:1], x[1:] - proc.preemphasis * x[:-1]])

    # torch.hann_window (periodic) == np.hanning(N+1)[:-1]
    win = np.hanning(proc.win_length + 1)[:-1].astype(np.float32)
    if proc.win_length < proc.n_fft:
        left = (proc.n_fft - proc.win_length) // 2
        right = proc.n_fft - proc.win_length - left
        win = np.concatenate([np.zeros(left, np.float32), win,
                              np.zeros(right, np.float32)])

    spec = np.asarray(stft(jnp.asarray(x), n_fft=proc.n_fft,
                           hop_length=proc.hop_length,
                           win_length=proc.n_fft, window=jnp.asarray(win),
                           center=True, pad_mode="constant"))
    power = np.abs(spec) ** 2                         # (T, F)
    fb = np.asarray(mel_filters(sample_rate=proc.sampling_rate,
                                n_fft=proc.n_fft,
                                n_mels=proc.feature_size,
                                norm="slaney", mel_scale="slaney"))
    mel = np.log(power @ fb.T + _LOG_GUARD)           # (T, E)
    if normalize:
        mean = mel.mean(axis=0, keepdims=True)
        var = ((mel - mean) ** 2).sum(axis=0, keepdims=True) \
            / max(mel.shape[0] - 1, 1)
        mel = (mel - mean) / (np.sqrt(var) + _NORM_CONSTANT)
    return mel.astype(np.float32)


def trim_silence(waveform: np.ndarray, sample_rate: int,
                 frame_ms: int = 30, energy_ratio: float = 0.01,
                 min_speech_sec: float = 0.5) -> Tuple[np.ndarray, int]:
    """Energy-based leading/trailing silence trim (reference :1908-1967)."""
    frame_len = int(sample_rate * frame_ms / 1000)
    min_frames = max(3, int(min_speech_sec * 1000 / frame_ms))
    n = len(waveform) // frame_len
    if n < min_frames * 2:
        return waveform, 0
    frames = waveform[: n * frame_len].reshape(n, frame_len)
    energy = np.sqrt((frames ** 2).mean(axis=1))
    speech = energy > energy.max() * energy_ratio
    start = 0
    for i in range(n - min_frames + 1):
        if speech[i: i + min_frames].all():
            start = i
            break
    end = n
    for i in range(n - 1, min_frames - 2, -1):
        if speech[i - min_frames + 1: i + 1].all():
            end = i + 1
            break
    s, e = start * frame_len, min(end * frame_len, len(waveform))
    if s == 0 and e == len(waveform):
        return waveform, 0
    return waveform[s:e], s


# --------------------------------------------------------------- init

def init_sortformer(key, cfg: ModelConfig) -> dict:
    fc, tf, mc = (cfg.fc_encoder_config, cfg.tf_encoder_config,
                  cfg.modules_config)
    ks = iter(jax.random.split(
        key, 32 + 8 * fc.num_hidden_layers + 8 * tf.encoder_layers))
    cc = fc.subsampling_conv_channels
    ksz = fc.subsampling_conv_kernel_size
    sub = {
        "layers_0": init_conv2d(next(ks), 1, cc, ksz),
        "layers_2": init_conv2d(next(ks), cc, cc, ksz, groups=cc),
        "layers_3": init_conv2d(next(ks), cc, cc, 1),
        "layers_5": init_conv2d(next(ks), cc, cc, ksz, groups=cc),
        "layers_6": init_conv2d(next(ks), cc, cc, 1),
        "linear": init_linear(next(ks), cc * math.ceil(
            fc.num_mel_bins / 8), fc.hidden_size),
    }
    d = fc.hidden_size
    fcl = {}
    for i in range(fc.num_hidden_layers):
        fcl[str(i)] = {
            "norm_feed_forward1": init_layer_norm(d),
            "feed_forward1": {"linear1": init_linear(
                                  next(ks), d, fc.intermediate_size),
                              "linear2": init_linear(
                                  next(ks), fc.intermediate_size, d)},
            "norm_self_att": init_layer_norm(d),
            "self_attn": {
                "q_proj": init_linear(next(ks), d, d,
                                      bias=fc.attention_bias),
                "k_proj": init_linear(next(ks), d, d,
                                      bias=fc.attention_bias),
                "v_proj": init_linear(next(ks), d, d,
                                      bias=fc.attention_bias),
                "o_proj": init_linear(next(ks), d, d,
                                      bias=fc.attention_bias),
                "relative_k_proj": init_linear(next(ks), d, d,
                                               bias=False),
                "bias_u": jnp.zeros((fc.num_attention_heads,
                                     d // fc.num_attention_heads)),
                "bias_v": jnp.zeros((fc.num_attention_heads,
                                     d // fc.num_attention_heads)),
            },
            "norm_conv": init_layer_norm(d),
            "conv": {
                "pointwise_conv1": init_conv1d(next(ks), d, 2 * d, 1),
                "depthwise_conv": init_conv1d(next(ks), d, d,
                                              fc.conv_kernel_size,
                                              groups=d),
                "norm": {"weight": jnp.ones(d), "bias": jnp.zeros(d),
                         "running_mean": jnp.zeros(d),
                         "running_var": jnp.ones(d)},
                "pointwise_conv2": init_conv1d(next(ks), d, d, 1),
            },
            "norm_feed_forward2": init_layer_norm(d),
            "feed_forward2": {"linear1": init_linear(
                                  next(ks), d, fc.intermediate_size),
                              "linear2": init_linear(
                                  next(ks), fc.intermediate_size, d)},
            "norm_out": init_layer_norm(d),
        }
    td = tf.d_model
    tfl = {}
    for i in range(tf.encoder_layers):
        tfl[str(i)] = {
            "self_attn": {"q_proj": init_linear(next(ks), td, td),
                          "k_proj": init_linear(next(ks), td, td,
                                                bias=tf.k_proj_bias),
                          "v_proj": init_linear(next(ks), td, td),
                          "out_proj": init_linear(next(ks), td, td)},
            "self_attn_layer_norm": init_layer_norm(td),
            "fc1": init_linear(next(ks), td, tf.encoder_ffn_dim),
            "fc2": init_linear(next(ks), tf.encoder_ffn_dim, td),
            "final_layer_norm": init_layer_norm(td),
        }
    return {
        "fc_encoder": {"subsampling": sub, "layers": fcl},
        "tf_encoder": {"embed_positions": init_embedding(
                           next(ks), tf.max_source_positions, td),
                       "layers": tfl},
        "sortformer_modules": {
            "encoder_proj": init_linear(next(ks), mc.fc_d_model,
                                        mc.tf_d_model),
            "first_hidden_to_hidden": init_linear(next(ks), mc.tf_d_model,
                                                  mc.tf_d_model),
            "single_hidden_to_spks": init_linear(next(ks), mc.tf_d_model,
                                                 mc.num_speakers),
            "hidden_to_spks": init_linear(next(ks), 2 * mc.tf_d_model,
                                          mc.num_speakers),
        },
    }


# -------------------------------------------------------------- forward

def pre_encode(p: dict, fc: FCEncoderConfig, mel: Array,
               lengths: Array) -> Tuple[Array, Array]:
    """(B, T, E) mel -> ((B, T//8, hidden), lengths//8)."""
    sub = p["subsampling"]
    pad = (fc.subsampling_conv_kernel_size - 1) // 2
    x = mel[..., None]                                # NHWC, H=T, W=mels
    x = jax.nn.relu(apply_conv2d(sub["layers_0"], x, stride=2,
                                 padding=pad))
    x = apply_conv2d(sub["layers_2"], x, stride=2, padding=pad,
                     groups=x.shape[-1])
    x = jax.nn.relu(apply_conv2d(sub["layers_3"], x))
    x = apply_conv2d(sub["layers_5"], x, stride=2, padding=pad,
                     groups=x.shape[-1])
    x = jax.nn.relu(apply_conv2d(sub["layers_6"], x))
    b, t, f, c = x.shape
    # flatten in NCHW order: (b, t, c, f) -> c*f (reference :192-195)
    x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
    x = apply_linear(sub["linear"], x)
    n = lengths
    for _ in range(3):
        n = jnp.maximum((n - 1) // 2 + 1, 0)
    return x, n


def _rel_pos_emb(t: int, d: int) -> np.ndarray:
    """(2T-1, d) Transformer-XL positions T-1 .. -(T-1)."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float32)
    div = np.exp(np.arange(0, d, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d))
    ang = pos[:, None] * div[None, :]
    pe = np.zeros((len(pos), d), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def _rel_shift(x: Array) -> Array:
    b, h, q, p = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, p + 1, q)
    return x[:, :, 1:, :].reshape(b, h, q, p)


def _fc_attention(p: dict, fc: FCEncoderConfig, x: Array, pos_emb: Array,
                  bias: Array) -> Array:
    b, t, d = x.shape
    h = fc.num_attention_heads
    hd = d // h
    q = apply_linear(p["q_proj"], x).reshape(b, t, h, hd)
    k = apply_linear(p["k_proj"], x).reshape(b, t, h, hd)
    v = apply_linear(p["v_proj"], x).reshape(b, t, h, hd)
    pe = apply_linear(p["relative_k_proj"], pos_emb).reshape(
        1, -1, h, hd)
    ac = jnp.einsum("bthd,bshd->bhts", q + p["bias_u"][None, None], k)
    bd = jnp.einsum("bthd,bshd->bhts", q + p["bias_v"][None, None],
                    jnp.broadcast_to(pe, (b,) + pe.shape[1:]))
    bd = _rel_shift(bd)[..., :t]
    scores = (ac + bd) / math.sqrt(hd) + bias
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, d)
    return apply_linear(p["o_proj"], out)


def fc_encode(p: dict, fc: FCEncoderConfig, x: Array,
              lengths: Array) -> Array:
    """Conformer layers over pre-encoded (B, T, hidden)."""
    if fc.scale_input:
        x = x * (fc.hidden_size ** 0.5)
    b, t, d = x.shape
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    mask = valid.astype(x.dtype)[..., None]
    bias = jnp.where(valid, 0.0, -1e4)[:, None, None, :]
    pos_emb = jnp.asarray(_rel_pos_emb(t, d))
    for i in range(fc.num_hidden_layers):
        lp = p["layers"][str(i)]
        x = x + 0.5 * _conf_ff(lp["feed_forward1"],
                               apply_layer_norm(lp["norm_feed_forward1"],
                                                x))
        h = apply_layer_norm(lp["norm_self_att"], x)
        x = x + _fc_attention(lp["self_attn"], fc, h, pos_emb, bias)
        c = lp["conv"]
        h = apply_layer_norm(lp["norm_conv"], x)
        h = apply_conv1d(c["pointwise_conv1"], h)
        h1, h2 = jnp.split(h, 2, axis=-1)
        h = h1 * jax.nn.sigmoid(h2)
        h = apply_conv1d(c["depthwise_conv"], h * mask,
                         padding=(fc.conv_kernel_size - 1) // 2,
                         groups=d)
        bn = c["norm"]
        h = (h - bn["running_mean"]) * jax.lax.rsqrt(
            bn["running_var"] + 1e-5) * bn["weight"] + bn["bias"]
        h = jax.nn.silu(h)
        x = x + apply_conv1d(c["pointwise_conv2"], h)
        x = x + 0.5 * _conf_ff(lp["feed_forward2"],
                               apply_layer_norm(lp["norm_feed_forward2"],
                                                x))
        x = apply_layer_norm(lp["norm_out"], x) * mask
    return x


def _conf_ff(p: dict, x: Array) -> Array:
    return apply_linear(p["linear2"],
                        jax.nn.silu(apply_linear(p["linear1"], x)))


def tf_encode(p: dict, tf: TFEncoderConfig, x: Array,
              lengths: Array) -> Array:
    """BART-style post-LN transformer with learned positions."""
    b, t, d = x.shape
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    bias = jnp.where(valid, 0.0, -1e4)[:, None, None, :]
    pos = jnp.minimum(jnp.arange(t), tf.max_source_positions - 1)
    x = x + apply_embedding(p["embed_positions"], pos)[None]
    h_count = tf.encoder_attention_heads
    hd = d // h_count
    for i in range(tf.encoder_layers):
        lp = p["layers"][str(i)]
        a = lp["self_attn"]
        q = apply_linear(a["q_proj"], x).reshape(b, t, h_count, hd)
        k = apply_linear(a["k_proj"], x).reshape(b, t, h_count, hd)
        v = apply_linear(a["v_proj"], x).reshape(b, t, h_count, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) * (hd ** -0.5) + bias
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, d)
        x = apply_layer_norm(lp["self_attn_layer_norm"],
                             x + apply_linear(a["out_proj"], o),
                             eps=tf.layer_norm_eps)
        h = apply_linear(lp["fc2"],
                         jax.nn.relu(apply_linear(lp["fc1"], x)))
        x = apply_layer_norm(lp["final_layer_norm"], x + h,
                             eps=tf.layer_norm_eps)
    return x


def sortformer_forward(params: dict, cfg: ModelConfig, mel: Array,
                       lengths: Array) -> Tuple[Array, Array]:
    """(B, T_mel, E) -> ((B, T_diar, n_spk) sigmoid preds, frame counts)."""
    emb, n = pre_encode(params["fc_encoder"], cfg.fc_encoder_config, mel,
                        lengths)
    x = fc_encode(params["fc_encoder"], cfg.fc_encoder_config, emb, n)
    sm = params["sortformer_modules"]
    x = apply_linear(sm["encoder_proj"], x)
    x = tf_encode(params["tf_encoder"], cfg.tf_encoder_config, x, n)
    x = jax.nn.relu(x)
    x = jax.nn.relu(apply_linear(sm["first_hidden_to_hidden"], x))
    preds = jax.nn.sigmoid(apply_linear(sm["single_hidden_to_spks"], x))
    valid = (jnp.arange(preds.shape[1])[None, :] < n[:, None])
    return preds * valid[..., None], n


# ---------------------------------------------------------------- output

@dataclass
class DiarizationSegment:
    start: float
    end: float
    speaker: int


@dataclass
class DiarizationOutput:
    segments: List[DiarizationSegment]
    speaker_probs: Optional[np.ndarray] = None
    num_speakers: int = 0
    total_time: float = 0.0

    @property
    def text(self) -> str:
        return "\n".join(
            f"SPEAKER audio 1 {s.start:.3f} {s.end - s.start:.3f} <NA> "
            f"<NA> speaker_{s.speaker} <NA> <NA>" for s in self.segments)


def preds_to_segments(preds: np.ndarray, frame_duration: float,
                      threshold: float = 0.5, min_duration: float = 0.0,
                      merge_gap: float = 0.0) -> List[DiarizationSegment]:
    segments = []
    for spk in range(preds.shape[1]):
        activity = preds[:, spk] > threshold
        if not activity.any():
            continue
        padded = np.concatenate([[False], activity, [False]])
        changes = padded[1:].astype(int) - padded[:-1].astype(int)
        starts = np.where(changes == 1)[0]
        ends = np.where(changes == -1)[0]
        segs = [DiarizationSegment(s * frame_duration, e * frame_duration,
                                   spk)
                for s, e in zip(starts, ends)
                if (e - s) * frame_duration >= min_duration]
        if merge_gap > 0 and len(segs) > 1:
            merged = [segs[0]]
            for seg in segs[1:]:
                if seg.start - merged[-1].end <= merge_gap:
                    merged[-1] = DiarizationSegment(
                        merged[-1].start, seg.end, spk)
                else:
                    merged.append(seg)
            segs = merged
        segments.extend(segs)
    return sorted(segments, key=lambda s: (s.start, s.speaker))


# --------------------------------------------------------------- model

@dataclass
class StreamingState:
    spkcache: np.ndarray          # (1, n, emb)
    spkcache_preds: np.ndarray    # (1, n, spk)
    fifo: np.ndarray
    fifo_preds: np.ndarray
    frames_processed: int = 0
    # AOSC silence profile (v2.1)
    mean_sil_emb: Optional[np.ndarray] = None   # (1, emb)
    n_sil_frames: float = 0.0


# ---------------------------------------------------------------------------
# AOSC (Arrival-Order Speaker Cache) compression — v2.1
# (reference sortformer.py:1505-1799; pure numpy host logic between
# compiled steps — the arrays are tiny (<=400 frames))
# ---------------------------------------------------------------------------

def _log_pred_scores(preds: np.ndarray, threshold: float) -> np.ndarray:
    """Per-frame per-speaker LLR scores: high when speaker k is
    confidently active alone."""
    lp = np.log(np.clip(preds, threshold, None))
    l1p = np.log(np.clip(1.0 - preds, threshold, None))
    return lp - l1p + l1p.sum(axis=2, keepdims=True) - math.log(0.5)


def _disable_low_scores(preds: np.ndarray, scores: np.ndarray,
                        min_pos: int) -> np.ndarray:
    scores = np.where(preds > 0.5, scores, -np.inf)
    is_pos = scores > 0
    has_enough = is_pos.sum(axis=1, keepdims=True) >= min_pos
    kill = (~is_pos) & (preds > 0.5) & has_enough
    return np.where(kill, -np.inf, scores)


def _boost_topk_scores(scores: np.ndarray, n_boost: int,
                       scale: float = 1.0) -> np.ndarray:
    if n_boost <= 0:
        return scores
    b, n, s = scores.shape
    k = min(n_boost, n)
    boost = -scale * math.log(0.5)
    out = scores.copy()
    for spk in range(s):
        flat = scores[:, :, spk]
        idx = np.argpartition(-flat, k - 1, axis=1)[:, :k]
        finite = np.isfinite(np.take_along_axis(flat, idx, axis=1))
        for bi in range(b):
            out[bi, idx[bi][finite[bi]], spk] += boost
    return out


def _aosc_topk_indices(scores: np.ndarray, spkcache_len: int,
                       sil_per_spk: int, max_index: int):
    b, n, s = scores.shape
    n_no_sil = n - sil_per_spk
    flat = np.transpose(scores, (0, 2, 1)).reshape(b, -1)
    k = min(spkcache_len, flat.shape[1])
    idx = np.argpartition(-flat, k - 1, axis=1)[:, :k]
    vals = np.take_along_axis(flat, idx, axis=1)
    idx = np.where(vals > -np.inf, idx, max_index)
    idx = np.sort(idx, axis=1)
    disabled = idx == max_index
    idx = idx % n
    disabled = disabled | (idx >= n_no_sil)
    idx = np.where(disabled, 0, idx)
    return idx, disabled


def _silence_profile(mean_sil: np.ndarray, n_sil: float, embs: np.ndarray,
                     preds: np.ndarray, thr: float):
    is_sil = preds.sum(axis=2) < thr                   # (1, n)
    count = float(is_sil.sum())
    sil_sum = (embs * is_sil[..., None]).sum(axis=1)   # (1, emb)
    total = mean_sil * n_sil + sil_sum
    n2 = n_sil + count
    return total / max(n2, 1.0), n2


def compress_spkcache_aosc(embs: np.ndarray, preds: np.ndarray,
                           mean_sil_emb: np.ndarray, mc) -> tuple:
    """Keep the most informative frames per speaker (v2.1 AOSC)."""
    n_spk = mc.num_speakers
    sil_per_spk = mc.spkcache_sil_frames_per_spk
    per_spk = mc.spkcache_len // n_spk - sil_per_spk
    scores = _log_pred_scores(preds, mc.pred_score_threshold)
    scores = _disable_low_scores(
        preds, scores, math.floor(per_spk * mc.min_pos_scores_rate))
    if mc.scores_boost_latest > 0 and scores.shape[1] > mc.spkcache_len:
        scores[:, mc.spkcache_len:, :] = np.where(
            np.isfinite(scores[:, mc.spkcache_len:, :]),
            scores[:, mc.spkcache_len:, :] + mc.scores_boost_latest,
            scores[:, mc.spkcache_len:, :])
    scores = _boost_topk_scores(
        scores, math.floor(per_spk * mc.strong_boost_rate), 2.0)
    scores = _boost_topk_scores(
        scores, math.floor(per_spk * mc.weak_boost_rate), 1.0)
    if sil_per_spk > 0:
        pad = np.full((scores.shape[0], sil_per_spk, n_spk), np.inf)
        scores = np.concatenate([scores, pad], axis=1)
    idx, disabled = _aosc_topk_indices(scores, mc.spkcache_len,
                                       sil_per_spk, mc.max_index)
    g_embs = np.take_along_axis(
        embs, idx[..., None].repeat(embs.shape[2], -1), axis=1)
    g_embs = np.where(disabled[..., None], mean_sil_emb[:, None, :],
                      g_embs)
    g_preds = np.take_along_axis(
        preds, idx[..., None].repeat(preds.shape[2], -1), axis=1)
    g_preds = np.where(disabled[..., None], 0.0, g_preds)
    return g_embs, g_preds


class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._jit_cache: Dict = {}

    def init_params(self, key):
        return init_sortformer(key, self.config)

    # ------------------------------------------------- compiled paths

    def _fwd(self, bucket: int):
        fn = self._jit_cache.get(("fwd", bucket))
        if fn is None:
            cfg = self.config
            fn = jax.jit(lambda p, mel, n: sortformer_forward(p, cfg, mel,
                                                              n))
            self._jit_cache[("fwd", bucket)] = fn
        return fn

    def _encode_embs(self, bucket: int):
        """Conformer+TF over pre-encoded embeddings (streaming path)."""
        fn = self._jit_cache.get(("enc", bucket))
        if fn is None:
            cfg = self.config

            def run(p, embs, n):
                x = fc_encode(p["fc_encoder"], cfg.fc_encoder_config,
                              embs, n)
                sm = p["sortformer_modules"]
                x = apply_linear(sm["encoder_proj"], x)
                x = tf_encode(p["tf_encoder"], cfg.tf_encoder_config, x,
                              n)
                x = jax.nn.relu(x)
                x = jax.nn.relu(apply_linear(sm["first_hidden_to_hidden"],
                                             x))
                preds = jax.nn.sigmoid(apply_linear(
                    sm["single_hidden_to_spks"], x))
                valid = (jnp.arange(preds.shape[1])[None, :]
                         < n[:, None])
                return preds * valid[..., None]
            fn = jax.jit(run)
            self._jit_cache[("enc", bucket)] = fn
        return fn

    def _pre_encode_fn(self, bucket: int):
        fn = self._jit_cache.get(("pre", bucket))
        if fn is None:
            fc = self.config.fc_encoder_config
            fn = jax.jit(lambda p, mel, n: pre_encode(p["fc_encoder"], fc,
                                                      mel, n))
            self._jit_cache[("pre", bucket)] = fn
        return fn

    # --------------------------------------------------------- offline

    def generate(self, audio, *, sample_rate: int = 16000,
                 threshold: float = 0.5, min_duration: float = 0.0,
                 merge_gap: float = 0.0, verbose: bool = False
                 ) -> DiarizationOutput:
        t0 = time.time()
        proc = self.config.processor_config
        wav = self._load_audio(audio, sample_rate)
        wav, trim_off = trim_silence(wav, proc.sampling_rate)
        trim_sec = trim_off / proc.sampling_rate
        wav = wav / (np.abs(wav).max() + 1e-3)

        mel = extract_mel_features(wav, proc)
        t = mel.shape[0]
        tb = _bucket(t)
        mel_pad = np.zeros((1, tb, proc.feature_size), np.float32)
        mel_pad[0, :t] = mel
        preds, n = self._fwd(tb)(self.params, jnp.asarray(mel_pad),
                                 jnp.asarray([t]))
        n = int(n[0])
        preds = np.asarray(preds)[0, :n]

        fdur = (proc.hop_length
                * self.config.fc_encoder_config.subsampling_factor) \
            / proc.sampling_rate
        segments = preds_to_segments(preds, fdur, threshold, min_duration,
                                     merge_gap)
        if trim_off:
            segments = [DiarizationSegment(s.start + trim_sec,
                                           s.end + trim_sec, s.speaker)
                        for s in segments]
        speakers = {s.speaker for s in segments}
        return DiarizationOutput(segments=segments, speaker_probs=preds,
                                 num_speakers=len(speakers),
                                 total_time=time.time() - t0)

    __call__ = generate

    # -------------------------------------------------------- streaming

    def init_streaming_state(self) -> StreamingState:
        emb = self.config.fc_encoder_config.hidden_size
        spk = self.config.modules_config.num_speakers
        z = np.zeros((1, 0, emb), np.float32)
        zp = np.zeros((1, 0, spk), np.float32)
        return StreamingState(z.copy(), zp.copy(), z.copy(), zp.copy())

    def streaming_step(self, chunk_mel: np.ndarray,
                       state: StreamingState
                       ) -> Tuple[np.ndarray, StreamingState]:
        """(T_mel, E) chunk features -> (chunk preds, new state)."""
        mc = self.config.modules_config
        t = chunk_mel.shape[0]
        tb = _bucket(t)
        mel_pad = np.zeros((1, tb, chunk_mel.shape[1]), np.float32)
        mel_pad[0, :t] = chunk_mel
        embs, n = self._pre_encode_fn(tb)(self.params,
                                          jnp.asarray(mel_pad),
                                          jnp.asarray([t]))
        cn = int(n[0])
        chunk_embs = np.asarray(embs)[:, :cn]

        allb = np.concatenate([state.spkcache, state.fifo, chunk_embs],
                              axis=1)
        total = allb.shape[1]
        eb = _bucket(total)
        pad = np.zeros((1, eb, allb.shape[2]), np.float32)
        pad[:, :total] = allb
        all_preds = np.asarray(self._encode_embs(eb)(
            self.params, jnp.asarray(pad), jnp.asarray([total])))[:,
                                                                  :total]
        c0 = state.spkcache.shape[1]
        f0 = state.fifo.shape[1]
        chunk_preds = all_preds[:, c0 + f0:]
        new = StreamingState(
            spkcache=state.spkcache,
            spkcache_preds=all_preds[:, :c0]
            if c0 else state.spkcache_preds,
            fifo=np.concatenate([state.fifo, chunk_embs], axis=1),
            fifo_preds=np.concatenate(
                [all_preds[:, c0: c0 + f0] if f0 else state.fifo_preds,
                 chunk_preds], axis=1),
            frames_processed=state.frames_processed
            + chunk_preds.shape[1])
        new = self._maybe_compress(new)
        return chunk_preds[0], new

    def _maybe_compress(self, state: StreamingState) -> StreamingState:
        mc = self.config.modules_config
        fifo_max = max(mc.fifo_len, mc.chunk_len)
        if state.fifo.shape[1] <= fifo_max:
            return state
        pop = state.fifo.shape[1] - fifo_max
        if mc.use_aosc:
            # v2.1 transfers FIFO overflow in update-period batches and
            # maintains the running silence profile (reference :1429-1503)
            pop = min(pop, mc.spkcache_update_period)
        popped = state.fifo[:, :pop]
        popped_preds = state.fifo_preds[:, :pop]
        mean_sil = state.mean_sil_emb
        n_sil = state.n_sil_frames
        if mc.use_aosc:
            if mean_sil is None:
                mean_sil = np.zeros((1, state.fifo.shape[2]), np.float32)
            mean_sil, n_sil = _silence_profile(
                mean_sil, n_sil, popped, popped_preds, mc.sil_threshold)
        cache = np.concatenate([state.spkcache, popped], 1)
        cache_preds = np.concatenate([state.spkcache_preds, popped_preds],
                                     1)
        if cache.shape[1] > mc.spkcache_len:
            if mc.use_aosc:
                cache, cache_preds = compress_spkcache_aosc(
                    cache, cache_preds,
                    mean_sil if mean_sil is not None else
                    np.zeros((1, cache.shape[2]), np.float32), mc)
            else:
                # v1: keep frames with the highest total speaker activity
                scores = np.log(np.clip(cache_preds[0], 1e-7, 1.0)).sum(-1)
                top = np.sort(np.argsort(-scores)[: mc.spkcache_len])
                cache = cache[:, top]
                cache_preds = cache_preds[:, top]
        return StreamingState(cache, cache_preds, state.fifo[:, pop:],
                              state.fifo_preds[:, pop:],
                              state.frames_processed,
                              mean_sil_emb=mean_sil, n_sil_frames=n_sil)

    def generate_stream(self, audio, *, sample_rate: int = 16000,
                        threshold: float = 0.5,
                        chunk_seconds: float = 15.0):
        """Yield (chunk_preds, frame_offset) per chunk; final yield is the
        assembled DiarizationOutput."""
        proc = self.config.processor_config
        wav = self._load_audio(audio, sample_rate)
        if self.config.modules_config.use_aosc:
            # v2.1 skips silence trimming + peak norm (reference :1117-1131)
            trim_off = 0
            mel = extract_mel_features(wav, proc, normalize=False)
        else:
            wav, trim_off = trim_silence(wav, proc.sampling_rate)
            wav = wav / (np.abs(wav).max() + 1e-3)
            mel = extract_mel_features(wav, proc)

        mc = self.config.modules_config
        chunk_frames = mc.chunk_len * mc.subsampling_factor
        state = self.init_streaming_state()
        all_preds = []
        for i in range(0, mel.shape[0], chunk_frames):
            chunk = mel[i: i + chunk_frames]
            if chunk.shape[0] < mc.subsampling_factor:
                break
            preds, state = self.streaming_step(chunk, state)
            all_preds.append(preds)
            yield preds, state.frames_processed - preds.shape[0]
        preds = np.concatenate(all_preds, axis=0) if all_preds else \
            np.zeros((0, mc.num_speakers))
        fdur = (proc.hop_length * mc.subsampling_factor) \
            / proc.sampling_rate
        segs = preds_to_segments(preds, fdur, threshold)
        yield DiarizationOutput(
            segments=segs, speaker_probs=preds,
            num_speakers=len({s.speaker for s in segs}))

    # ---------------------------------------------------------- loading

    @staticmethod
    def _load_audio(audio, sample_rate: int) -> np.ndarray:
        if isinstance(audio, str):
            from ....audio_io import read
            wav, sr = read(audio)
            if wav.ndim > 1:
                wav = wav.mean(axis=1)
            sample_rate = sr
        else:
            wav = np.asarray(audio, np.float32).reshape(-1)
        if sample_rate != 16000:
            from ....utils import resample_audio
            wav = np.asarray(resample_audio(wav, sample_rate, 16000))
        return wav.astype(np.float32)

    def sanitize(self, weights: Dict) -> Dict:
        """torch NeMo checkpoint -> our layouts. Conv2d (O, I/g, kh, kw)
        -> HWIO (torch detected by square trailing kernel dims with a
        large leading dim); Conv1d (O, I/g, K) -> WIO (torch detected by
        out-channels leading); subsampling.layers.N -> layers_N."""
        out = {}
        for k, v in weights.items():
            if "num_batches_tracked" in k:
                continue
            k = k.replace("subsampling.layers.", "subsampling.layers_")
            v = jnp.asarray(v)
            if k.endswith("weight") and v.ndim == 4 and "linear" not in k:
                if v.shape[-1] == v.shape[-2] and v.shape[0] > v.shape[-1]:
                    v = jnp.transpose(v, (2, 3, 1, 0))
            elif k.endswith("weight") and v.ndim == 3 and any(
                    c in k for c in ("pointwise_conv", "depthwise_conv")):
                if v.shape[0] > v.shape[-1]:
                    v = jnp.transpose(v, (2, 1, 0))
            out[k] = v
        return out


__all__ = ["Model", "ModelConfig", "DiarizationOutput",
           "DiarizationSegment", "StreamingState", "sortformer_forward",
           "extract_mel_features", "preds_to_segments", "trim_silence"]
