"""Nemotron 3.5 ASR: cache-aware streaming FastConformer-RNNT with prompts.

Parity: reference stt/models/nemotron_asr/ — NeMo mel (preemph 0.97, hann
padded to n_fft, slaney filters, log(x+2^-24), normalize NA; audio.py),
causal dw-striding subsampling (asymmetric pad left=k-1/right=s-1,
conformer.py:130-204), conformer blocks with layer-norm conv module and a
causal depthwise conv (:49-127), chunked_limited attention mask (frames
attend to their chunk of right+1 frames and left//chunk previous chunks,
:21-36), language-ID one-hot prompt -> prompt_kernel MLP
(nemotron_asr.py:113-131), greedy RNN-T with max_symbols-per-frame cap and
blank-as-pad zero embedding (:135-215, rnnt.py), SentencePiece piece-list
vocabulary with language-tag stripping (tokenizer.py), and the converted
checkpoint layout (convert.py:131-166: MLX convs, LSTM Wx/Wh/summed bias).

TPU design: the ENTIRE greedy RNN-T loop — joint evals, LSTM state, the
max-symbols cap, frame advance — is one `lax.while_loop` (the reference
re-enters Python per joint eval); run offline, the chunked-limited mask
reproduces the streaming look-ahead exactly, so one full-utterance compiled
pass gives streaming-identical tokens.  Long audio is chunked with the RNNT
decoder state carried across chunks (encoder caches are not carried — seams
only matter past chunk_duration).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Dict, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....dsp import mel_filters, spec_abs, stft
from ....model import FunctionalModel
from ....nn import (apply_embedding, apply_layer_norm, apply_linear,
                    init_conv1d, init_embedding, init_layer_norm,
                    init_linear)
from ....nn.layers import apply_conv1d, apply_conv2d, init_conv2d
from ...models.base import STTOutput
from ..parakeet.conformer import (_ff, _rel_pos_attention, rel_pos_encoding)
from ..parakeet.conformer import ConformerArgs as _PkArgs

Array = jax.Array

MEL_BUCKETS = (256, 512, 1024, 2048, 3072)

_LANG_TAG_RE = re.compile(r"^<[a-z]{2,3}-[A-Za-z]{2,4}>$")
_OTHER_SPECIAL = {"<unk>", "<pad>", "<s>", "</s>"}


# --------------------------------------------------------------- configs

@dataclass
class PreprocessArgs(BaseModelArgs):
    sample_rate: int = 16000
    features: int = 128
    n_fft: int = 512
    window_size: float = 0.025
    window_stride: float = 0.01
    window: str = "hann"
    preemph: float = 0.97
    normalize: str = "NA"
    log_zero_guard_value: float = 2.0 ** -24

    @property
    def win_length(self) -> int:
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.window_stride * self.sample_rate)


@dataclass
class ConformerArgs(BaseModelArgs):
    feat_in: int = 128
    n_layers: int = 24
    d_model: int = 1024
    n_heads: int = 8
    ff_expansion_factor: int = 4
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    conv_kernel_size: int = 9
    causal_downsampling: bool = True
    conv_context_size: object = "causal"
    conv_norm_type: str = "layer_norm"
    att_context_style: str = "chunked_limited"
    att_context_size: List[List[int]] = field(
        default_factory=lambda: [[56, 13]])
    pos_emb_max_len: int = 5000
    use_bias: bool = False
    xscaling: bool = False


@dataclass
class PromptArgs(BaseModelArgs):
    num_prompts: int = 128
    prompt_hidden: int = 2048
    prompt_dictionary: Dict[str, int] = field(default_factory=dict)


@dataclass
class PredictArgs(BaseModelArgs):
    pred_hidden: int = 640
    pred_rnn_layers: int = 2
    vocab_size: int = 13087
    blank_as_pad: bool = True


@dataclass
class JointArgs(BaseModelArgs):
    joint_hidden: int = 640
    activation: str = "relu"
    encoder_hidden: int = 1024
    pred_hidden: int = 640
    num_classes: int = 13087


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "nemotron_asr"
    preprocessor: Optional[Dict] = None
    encoder: Optional[Dict] = None
    prompt: Optional[Dict] = None
    decoder: Optional[Dict] = None
    joint: Optional[Dict] = None
    vocabulary: List[str] = field(default_factory=list)
    default_language: str = "auto"
    default_att_context_size: List[int] = field(
        default_factory=lambda: [56, 13])
    max_symbols: int = 10
    model_path: str = ""

    def __post_init__(self):
        for name, cls in (("preprocessor", PreprocessArgs),
                          ("encoder", ConformerArgs),
                          ("prompt", PromptArgs),
                          ("decoder", PredictArgs),
                          ("joint", JointArgs)):
            v = getattr(self, name)
            if not isinstance(v, cls):
                setattr(self, name, cls.from_dict(v or {}))


# ------------------------------------------------------------- tokenizer

def is_lang_tag(piece: str) -> bool:
    return bool(_LANG_TAG_RE.match(piece))


def is_special_piece(piece: str) -> bool:
    return piece in _OTHER_SPECIAL or is_lang_tag(piece)


def decode_pieces(tokens: List[int], vocabulary: List[str],
                  strip_lang_tags: bool = True) -> str:
    parts = []
    for t in tokens:
        if t < 0 or t >= len(vocabulary):
            continue
        piece = vocabulary[t]
        if piece in _OTHER_SPECIAL or (strip_lang_tags
                                       and is_lang_tag(piece)):
            continue
        parts.append(piece.replace("▁", " "))
    return "".join(parts)


def detected_language(tokens: List[int],
                      vocabulary: List[str]) -> Optional[str]:
    for t in tokens:
        if 0 <= t < len(vocabulary) and is_lang_tag(vocabulary[t]):
            return vocabulary[t][1:-1]
    return None


# ------------------------------------------------------------------ mel

def nemo_log_mel(audio: Array, pp: PreprocessArgs) -> Array:
    """(T,) -> (frames, features). NeMo AudioToMelSpectrogramPreprocessor
    at inference (no dither, normalize NA)."""
    x = jnp.asarray(audio, jnp.float32)
    if pp.preemph:
        x = jnp.concatenate([x[:1], x[1:] - pp.preemph * x[:-1]])
    win = np.hanning(pp.win_length).astype(np.float32)
    left = (pp.n_fft - pp.win_length) // 2
    win = np.pad(win, (left, pp.n_fft - pp.win_length - left))
    spec = stft(x, n_fft=pp.n_fft, hop_length=pp.hop_length,
                win_length=pp.n_fft, window=jnp.asarray(win),
                center=True, pad_mode="constant")
    power = spec_abs(spec) ** 2
    fb = mel_filters(pp.sample_rate, pp.n_fft, pp.features, norm="slaney",
                     mel_scale="slaney")
    return jnp.log(power @ fb.T + pp.log_zero_guard_value)


# ------------------------------------------------------------------ init

def _init_block(key, a: ConformerArgs) -> dict:
    ks = iter(jax.random.split(key, 24))
    ffd = a.d_model * a.ff_expansion_factor
    hd = a.d_model // a.n_heads
    return {
        "norm_feed_forward1": init_layer_norm(a.d_model),
        "feed_forward1": {
            "linear1": init_linear(next(ks), a.d_model, ffd,
                                   bias=a.use_bias),
            "linear2": init_linear(next(ks), ffd, a.d_model,
                                   bias=a.use_bias)},
        "norm_self_att": init_layer_norm(a.d_model),
        "self_attn": {
            "linear_q": init_linear(next(ks), a.d_model, a.d_model,
                                    bias=a.use_bias),
            "linear_k": init_linear(next(ks), a.d_model, a.d_model,
                                    bias=a.use_bias),
            "linear_v": init_linear(next(ks), a.d_model, a.d_model,
                                    bias=a.use_bias),
            "linear_out": init_linear(next(ks), a.d_model, a.d_model,
                                      bias=a.use_bias),
            "linear_pos": init_linear(next(ks), a.d_model, a.d_model,
                                      bias=False),
            "pos_bias_u": jnp.zeros((a.n_heads, hd)),
            "pos_bias_v": jnp.zeros((a.n_heads, hd))},
        "norm_conv": init_layer_norm(a.d_model),
        "conv": {
            "pointwise_conv1": init_conv1d(next(ks), a.d_model,
                                           2 * a.d_model, 1,
                                           bias=a.use_bias),
            "depthwise_conv": init_conv1d(next(ks), a.d_model, a.d_model,
                                          a.conv_kernel_size,
                                          groups=a.d_model,
                                          bias=a.use_bias),
            "batch_norm": init_layer_norm(a.d_model),   # NeMo naming
            "pointwise_conv2": init_conv1d(next(ks), a.d_model, a.d_model,
                                           1, bias=a.use_bias)},
        "norm_feed_forward2": init_layer_norm(a.d_model),
        "feed_forward2": {
            "linear1": init_linear(next(ks), a.d_model, ffd,
                                   bias=a.use_bias),
            "linear2": init_linear(next(ks), ffd, a.d_model,
                                   bias=a.use_bias)},
        "norm_out": init_layer_norm(a.d_model)}


def init_nemotron(key, cfg: ModelConfig) -> dict:
    import math
    a = cfg.encoder
    ks = iter(jax.random.split(key, 16 + a.n_layers))
    n_stages = int(math.log2(a.subsampling_factor))
    ch = a.subsampling_conv_channels
    conv = {"0": init_conv2d(next(ks), 1, ch, 3)}
    idx = 2
    for _ in range(n_stages - 1):
        conv[str(idx)] = init_conv2d(next(ks), ch, ch, 3, groups=ch)
        conv[str(idx + 1)] = init_conv2d(next(ks), ch, ch, 1)
        idx += 3
    freq = a.feat_in
    for _ in range(n_stages):
        freq = (freq + 3 - 3) // 2 + 1      # pad L=2/R=1, k=3, s=2
    pd = cfg.decoder
    vocab = pd.vocab_size + (1 if pd.blank_as_pad else 0)
    lstm = {}
    for i in range(pd.pred_rnn_layers):
        s = 1.0 / np.sqrt(pd.pred_hidden)
        k1, k2 = jax.random.split(next(ks))
        lstm[str(i)] = {
            "weight_ih": jax.random.uniform(
                k1, (4 * pd.pred_hidden, pd.pred_hidden), minval=-s,
                maxval=s),
            "weight_hh": jax.random.uniform(
                k2, (4 * pd.pred_hidden, pd.pred_hidden), minval=-s,
                maxval=s),
            "bias_ih": jnp.zeros((4 * pd.pred_hidden,))}
    j = cfg.joint
    return {
        "encoder": {
            "pre_encode": {"conv": conv,
                           "out": init_linear(next(ks), ch * freq,
                                              a.d_model)},
            "layers": {str(i): _init_block(next(ks), a)
                       for i in range(a.n_layers)}},
        "prompt_kernel": {
            "0": init_linear(next(ks),
                             a.d_model + cfg.prompt.num_prompts,
                             cfg.prompt.prompt_hidden),
            "2": init_linear(next(ks), cfg.prompt.prompt_hidden,
                             a.d_model)},
        "decoder": {"prediction": {
            "embed": init_embedding(next(ks), vocab, pd.pred_hidden),
            "dec_rnn": {"lstm": lstm}}},
        "joint": {
            "enc": init_linear(next(ks), j.encoder_hidden,
                               j.joint_hidden),
            "pred": init_linear(next(ks), j.pred_hidden, j.joint_hidden),
            "joint_net": {"2": init_linear(next(ks), j.joint_hidden,
                                           j.num_classes + 1)}}}


# --------------------------------------------------------------- encoder

def chunked_limited_mask(t: int, left: int, right: int) -> np.ndarray:
    """Boolean (T, T) visibility for NeMo chunked_limited attention."""
    chunk = right + 1
    left_chunks = left // chunk if left >= 0 else 10 ** 8
    ci = np.arange(t) // chunk
    diff = ci[:, None] - ci[None, :]
    return (diff >= 0) & (diff <= left_chunks)


def subsampled_length(n, n_stages: int = 3):
    out = jnp.asarray(n)
    for _ in range(n_stages):
        out = (out + 3 - 3) // 2 + 1        # causal pad 2+1, k3 s2
    return out


def encode(p: dict, cfg: ModelConfig, mel: Array, n_valid: Array,
           att_context: Tuple[int, int], prompt_idx: Array) -> Array:
    """(1, T_bucket, F) mel -> (1, T', d_model) prompted encoder output."""
    import math
    a = cfg.encoder
    n_stages = int(math.log2(a.subsampling_factor))
    x = mel[..., None]
    enc = p["encoder"]["pre_encode"]
    for k in sorted(enc["conv"], key=int):
        cp = enc["conv"][k]
        if cp["weight"].shape[0] == 3:       # strided 3x3, causal pad
            x = jnp.pad(x, ((0, 0), (2, 1), (2, 1), (0, 0)))
            groups = x.shape[-1] // cp["weight"].shape[2]
            x = apply_conv2d(cp, x, stride=2, padding=0, groups=groups)
            if k == "0":                     # ReLU follows 0 and each pw
                x = jax.nn.relu(x)
        else:                                # 1x1 pointwise + ReLU
            x = jax.nn.relu(apply_conv2d(cp, x, stride=1, padding=0))
    b, t, f, c = x.shape
    x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
    x = apply_linear(enc["out"], x)
    if a.xscaling:
        x = x * (a.d_model ** 0.5)

    pos_emb = jnp.asarray(rel_pos_encoding(t, a.d_model))
    valid = jnp.arange(t)[None, :] < subsampled_length(n_valid, n_stages)
    mask = valid[:, None, None, :]
    if a.att_context_style == "chunked_limited":
        cm = jnp.asarray(chunked_limited_mask(t, att_context[0],
                                              att_context[1]))
        mask = mask & cm[None, None]
    # where (not multiply): chunked masking makes pad-row attention all
    # -inf -> NaN, and NaN * 0 would keep the NaN
    vmask = valid[..., None]
    x = jnp.where(vmask, x, 0.0)

    pa = _PkArgs(d_model=a.d_model, n_heads=a.n_heads)
    kcs = a.conv_kernel_size
    pad_l, pad_r = (kcs - 1, 0) if a.conv_context_size == "causal" else \
        (int(a.conv_context_size[0]), int(a.conv_context_size[1]))
    for i in range(a.n_layers):
        blk = p["encoder"]["layers"][str(i)]
        x = x + 0.5 * _ff(blk["feed_forward1"],
                          apply_layer_norm(blk["norm_feed_forward1"], x))
        xn = apply_layer_norm(blk["norm_self_att"], x)
        x = x + _rel_pos_attention(blk["self_attn"], pa, xn, pos_emb,
                                   mask)
        c = blk["conv"]
        h = apply_layer_norm(blk["norm_conv"], x)
        h = apply_conv1d(c["pointwise_conv1"], h)
        ha, hb = jnp.split(h, 2, axis=-1)
        h = ha * jax.nn.sigmoid(hb)
        h = jnp.pad(h, ((0, 0), (pad_l, pad_r), (0, 0)))
        h = apply_conv1d(c["depthwise_conv"], h, groups=a.d_model)
        h = apply_layer_norm(c["batch_norm"], h)
        h = jax.nn.silu(h)
        x = x + apply_conv1d(c["pointwise_conv2"], h)
        x = x + 0.5 * _ff(blk["feed_forward2"],
                          apply_layer_norm(blk["norm_feed_forward2"], x))
        x = jnp.where(vmask, apply_layer_norm(blk["norm_out"], x), 0.0)

    one_hot = jax.nn.one_hot(prompt_idx, cfg.prompt.num_prompts,
                             dtype=x.dtype)
    oh = jnp.broadcast_to(one_hot[None, None],
                          (x.shape[0], x.shape[1], one_hot.shape[-1]))
    h = jnp.concatenate([x, oh], axis=-1)
    h = jax.nn.relu(apply_linear(p["prompt_kernel"]["0"], h))
    return apply_linear(p["prompt_kernel"]["2"], h)


# --------------------------------------------------------- greedy RNN-T

def _lstm_step(lstm: dict, n_layers: int, x: Array, h: Array, c: Array
               ) -> Tuple[Array, Array, Array]:
    """x (B, H), states (L, B, H) -> (out, h', c')."""
    hs, cs = [], []
    for i in range(n_layers):
        lp = lstm[str(i)]
        b = lp.get("bias_ih", 0)
        if "bias_hh" in lp:
            b = b + lp["bias_hh"]
        gates = x @ lp["weight_ih"].T + h[i] @ lp["weight_hh"].T + b
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(fg) * c[i] + jax.nn.sigmoid(ig) \
            * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(og) * jnp.tanh(c_new)
        hs.append(h_new)
        cs.append(c_new)
        x = h_new
    return x, jnp.stack(hs), jnp.stack(cs)


def greedy_rnnt(p: dict, cfg: ModelConfig, feats: Array, n_frames: Array,
                h0: Array, c0: Array, last0: Array
                ) -> Tuple[Array, Array, Array, Array, Array]:
    """Whole greedy RNN-T as one while_loop.

    feats (1, T, d); returns (tokens (cap,), times (cap,), h, c, last) with
    -1 padding. Decoder state in/out so chunks chain losslessly.
    """
    pd = cfg.decoder
    blank = pd.vocab_size
    t_max = feats.shape[1]
    cap = t_max * cfg.max_symbols + 8    # true emission bound
    tokens0 = jnp.full((cap,), -1, jnp.int32)
    times0 = jnp.full((cap,), -1, jnp.int32)

    def cond(s):
        t, last, h, c, toks, tms, n_out, new_sym = s
        return (t < n_frames) & (n_out < cap)

    def body(s):
        t, last, h, c, toks, tms, n_out, new_sym = s
        emb = jnp.where(last == blank, 0.0,
                        apply_embedding(p["decoder"]["prediction"]["embed"],
                                        last[None]))
        out, h2, c2 = _lstm_step(
            p["decoder"]["prediction"]["dec_rnn"]["lstm"],
            pd.pred_rnn_layers, emb.reshape(1, -1), h, c)
        enc_t = jax.lax.dynamic_slice_in_dim(feats, t, 1, axis=1)[:, 0]
        jl = p["joint"]
        logits = apply_linear(
            jl["joint_net"]["2"],
            jax.nn.relu(apply_linear(jl["enc"], enc_t)
                        + apply_linear(jl["pred"], out)))[0]
        pred = jnp.argmax(logits).astype(jnp.int32)
        is_blank = pred == blank
        h = jnp.where(is_blank, h, h2)
        c = jnp.where(is_blank, c, c2)
        last = jnp.where(is_blank, last, pred)
        toks = jnp.where(is_blank, toks,
                         toks.at[n_out].set(pred))
        tms = jnp.where(is_blank, tms, tms.at[n_out].set(t))
        n_out = n_out + jnp.where(is_blank, 0, 1)
        hit_cap = (~is_blank) & (new_sym + 1 >= cfg.max_symbols)
        adv = is_blank | hit_cap
        t = t + adv.astype(jnp.int32)
        new_sym = jnp.where(adv, 0, new_sym + 1)
        return (t, last, h, c, toks, tms, n_out, new_sym)

    s = (jnp.int32(0), last0, h0, c0, tokens0, times0, jnp.int32(0),
         jnp.int32(0))
    t, last, h, c, toks, tms, n_out, _ = jax.lax.while_loop(cond, body, s)
    return toks, tms, h, c, last


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._jit_cache: Dict = {}

    @property
    def sample_rate(self) -> int:
        return self.config.preprocessor.sample_rate

    def init_params(self, key):
        return init_nemotron(key, self.config)

    def _prompt_index(self, language: Optional[str]) -> int:
        d = self.config.prompt.prompt_dictionary
        lang = language or self.config.default_language
        if lang in d:
            return d[lang]
        if self.config.default_language in d:
            return d[self.config.default_language]
        return 0

    def _fns(self, bucket: int, att: Tuple[int, int]):
        key_ = (bucket, att)
        fns = self._jit_cache.get(key_)
        if fns is None:
            cfg = self.config
            enc_fn = jax.jit(lambda p, m, n, pi: encode(p, cfg, m, n, att,
                                                        pi))
            dec_fn = jax.jit(lambda p, f, n, h, c, l: greedy_rnnt(
                p, cfg, f, n, h, c, l))
            fns = (enc_fn, dec_fn)
            self._jit_cache[key_] = fns
        return fns

    def _decode_audio(self, audio: np.ndarray, language: Optional[str],
                      att_context, chunk_duration: Optional[float]
                      ) -> Tuple[List[int], List[int]]:
        """-> (tokens, frame_times)."""
        cfg = self.config
        pp = cfg.preprocessor
        att = tuple(att_context or cfg.default_att_context_size)
        mel = np.asarray(nemo_log_mel(jnp.asarray(audio), pp))
        chunk_frames = (int(chunk_duration * pp.sample_rate
                            / pp.hop_length)
                        if chunk_duration else mel.shape[0])
        pd = cfg.decoder
        h = jnp.zeros((pd.pred_rnn_layers, 1, pd.pred_hidden))
        c = jnp.zeros_like(h)
        last = jnp.int32(pd.vocab_size)
        tokens: List[int] = []
        times: List[int] = []
        base_frame = 0
        for s0 in range(0, mel.shape[0], chunk_frames):
            seg = mel[s0:s0 + chunk_frames]
            n = seg.shape[0]
            b = next((x for x in MEL_BUCKETS if n <= x),
                     ((n + 511) // 512) * 512)
            padded = np.zeros((1, b, seg.shape[1]), np.float32)
            padded[0, :n] = seg
            enc_fn, dec_fn = self._fns(b, att)
            feats = enc_fn(self.params, jnp.asarray(padded),
                           jnp.int32(n),
                           jnp.int32(self._prompt_index(language)))
            n_frames = int(np.asarray(subsampled_length(n)))
            toks, tms, h, c, last = dec_fn(self.params, feats,
                                           jnp.int32(n_frames), h, c,
                                           last)
            arr_t = np.asarray(toks)
            arr_m = np.asarray(tms)
            keep = arr_t >= 0
            tokens.extend(int(x) for x in arr_t[keep])
            times.extend(int(x) + base_frame for x in arr_m[keep])
            base_frame += n_frames
        return tokens, times

    def generate(self, audio, *, language: Optional[str] = None,
                 att_context_size=None, chunk_duration: float = 30.0,
                 verbose: bool = False, **kwargs) -> STTOutput:
        t0 = time.time()
        audio_np = self._load(audio)
        tokens, times = self._decode_audio(audio_np, language,
                                           att_context_size,
                                           chunk_duration)
        cfg = self.config
        frame_sec = (cfg.encoder.subsampling_factor
                     * cfg.preprocessor.hop_length
                     / cfg.preprocessor.sample_rate)
        text = decode_pieces(tokens, cfg.vocabulary)
        lang = detected_language(tokens, cfg.vocabulary) or language
        segments = self._sentences(tokens, times, frame_sec)
        dt = time.time() - t0
        return STTOutput(text=text.strip(), segments=segments,
                         language=lang, generation_tokens=len(tokens),
                         total_tokens=len(tokens), total_time=dt,
                         generation_tps=len(tokens) / dt if dt else 0)

    def stream_generate(self, audio, *, language: Optional[str] = None,
                        chunk_duration: float = 30.0,
                        att_context_size=None, **kwargs
                        ) -> Generator[STTOutput, None, None]:
        """Yield a cumulative STTOutput per audio chunk; decoder state is
        carried across chunks (reference stream_generate)."""
        cfg = self.config
        pp = cfg.preprocessor
        audio_np = self._load(audio)
        step = int(chunk_duration * pp.sample_rate)
        frame_sec = (cfg.encoder.subsampling_factor * pp.hop_length
                     / pp.sample_rate)
        tokens: List[int] = []
        times: List[int] = []
        # reuse _decode_audio chunk loop but yield per chunk
        mel = np.asarray(nemo_log_mel(jnp.asarray(audio_np), pp))
        chunk_frames = int(chunk_duration * pp.sample_rate
                           / pp.hop_length)
        pd = cfg.decoder
        att = tuple(att_context_size or cfg.default_att_context_size)
        h = jnp.zeros((pd.pred_rnn_layers, 1, pd.pred_hidden))
        c = jnp.zeros_like(h)
        last = jnp.int32(pd.vocab_size)
        base = 0
        for s0 in range(0, mel.shape[0], chunk_frames):
            seg = mel[s0:s0 + chunk_frames]
            n = seg.shape[0]
            b = next((x for x in MEL_BUCKETS if n <= x),
                     ((n + 511) // 512) * 512)
            padded = np.zeros((1, b, seg.shape[1]), np.float32)
            padded[0, :n] = seg
            enc_fn, dec_fn = self._fns(b, att)
            feats = enc_fn(self.params, jnp.asarray(padded), jnp.int32(n),
                           jnp.int32(self._prompt_index(language)))
            n_frames = int(np.asarray(subsampled_length(n)))
            toks, tms, h, c, last = dec_fn(self.params, feats,
                                           jnp.int32(n_frames), h, c,
                                           last)
            arr_t, arr_m = np.asarray(toks), np.asarray(tms)
            keep = arr_t >= 0
            tokens.extend(int(x) for x in arr_t[keep])
            times.extend(int(x) + base for x in arr_m[keep])
            base += n_frames
            yield STTOutput(
                text=decode_pieces(tokens, cfg.vocabulary).strip(),
                segments=self._sentences(tokens, times, frame_sec),
                language=detected_language(tokens, cfg.vocabulary)
                or language)

    def _sentences(self, tokens: List[int], times: List[int],
                   frame_sec: float) -> List[dict]:
        vocab = self.config.vocabulary
        segs, cur, start = [], [], None
        for t, tm in zip(tokens, times):
            if t < 0 or t >= len(vocab) or is_special_piece(vocab[t]):
                continue
            piece = vocab[t].replace("▁", " ")
            if start is None:
                start = tm * frame_sec
            cur.append(piece)
            if piece.strip().endswith((".", "!", "?")):
                segs.append({"text": "".join(cur).strip(), "start": start,
                             "end": (tm + 1) * frame_sec})
                cur, start = [], None
        if cur:
            segs.append({"text": "".join(cur).strip(), "start": start,
                         "end": (times[-1] + 1) * frame_sec
                         if times else 0.0})
        return segs

    @staticmethod
    def _load(audio) -> np.ndarray:
        from ...utils import load_audio
        x = audio[0] if isinstance(audio, list) else audio
        if isinstance(x, str):
            x = load_audio(x)
        return np.asarray(x, np.float32).reshape(-1)

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """Converted layout (convert.py): MLX conv2d (O,H,W,I) -> HWIO,
        conv1d (O,K,I) -> WIO, LSTM Wx/Wh/bias -> weight_ih/hh/bias_ih."""
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            if ".dec_rnn.lstm." in k:
                k = k.replace(".Wx", ".weight_ih") \
                     .replace(".Wh", ".weight_hh")
                if k.endswith(".bias"):
                    k = k[:-5] + ".bias_ih"
            if k.endswith(".weight") and v.ndim == 4 \
                    and v.shape[1] in (1, 3) and v.shape[0] not in (1, 3):
                v = jnp.transpose(v, (1, 2, 3, 0))   # (O,H,W,I) -> HWIO
            elif k.endswith(".weight") and v.ndim == 3 and "conv" in k \
                    and v.shape[0] not in (1,
                                           self.config.encoder
                                           .conv_kernel_size):
                v = jnp.transpose(v, (1, 2, 0))      # (O,K,I) -> WIO
            out[k] = v
        return out


__all__ = ["Model", "ModelConfig", "PreprocessArgs", "ConformerArgs",
           "PromptArgs", "PredictArgs", "JointArgs", "nemo_log_mel",
           "greedy_rnnt", "encode", "decode_pieces", "detected_language",
           "chunked_limited_mask"]
