"""FireRedASR2: AED conformer encoder + transformer decoder w/ beam search.

Parity: /root/reference/mlx_audio/stt/models/fireredasr2/fireredasr2.py
(Conv2dSubsampling w/ right-context pad :17-41 + :212-234, ESPnet
RelPositionalEncoding :42-67, macaron conformer blocks with per-input
layer-normed rel-pos attention :69-210, transformer decoder :252-330,
beam_search with softmax smoothing / EOS penalty / GNMT length penalty
:369-464, Kaldi fbank + CMVN features :540-558, dict.txt detokenizer).

TPU design: the encoder is one bucketed jitted forward; the WHOLE beam
search (prefill + per-step candidate scoring + beam reindexing over fixed
self-KV caches + precomputed cross K/V + EOS freezing) runs inside one
lax.while_loop — the reference concatenates and re-runs the decoder per
step.
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (
    apply_conv1d,
    apply_conv2d,
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    init_conv1d,
    init_conv2d,
    init_embedding,
    init_layer_norm,
    init_linear,
)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update
from ...models.base import STTOutput

Array = jax.Array

MEL_BUCKETS = (128, 256, 512, 1024, 2048)


def _bucket(n, buckets=MEL_BUCKETS):
    for b in buckets:
        if n <= b:
            return b
    return ((n + 511) // 512) * 512


@dataclass
class EncoderConfig(BaseModelArgs):
    n_layers: int = 16
    n_head: int = 20
    d_model: int = 1280
    kernel_size: int = 33
    pe_maxlen: int = 5000


@dataclass
class DecoderConfig(BaseModelArgs):
    n_layers: int = 16
    n_head: int = 20
    d_model: int = 1280
    pe_maxlen: int = 5000


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "fireredasr2"
    idim: int = 80
    odim: int = 8667
    d_model: int = 1280
    sos_id: int = 3
    eos_id: int = 4
    pad_id: int = 2
    blank_id: int = 0
    encoder: Optional[dict] = None
    decoder: Optional[dict] = None
    model_path: str = ""

    def __post_init__(self):
        self.enc = EncoderConfig.from_dict(self.encoder or {})
        self.dec = DecoderConfig.from_dict(self.decoder or {})


# ------------------------------------------------------------------- init

def init_fireredasr2(key, cfg: ModelConfig) -> dict:
    e, d = cfg.enc, cfg.dec
    ks = iter(jax.random.split(key, 32 + 16 * (e.n_layers + d.n_layers)))
    dm = e.d_model
    sub_dim = ((cfg.idim - 1) // 2 - 1) // 2
    enc_layers = {}
    for i in range(e.n_layers):
        enc_layers[str(i)] = {
            "ffn1": _init_ffn(ks, dm),
            "mhsa": {
                "w_qs": init_linear(next(ks), dm, dm, bias=False),
                "w_ks": init_linear(next(ks), dm, dm, bias=False),
                "w_vs": init_linear(next(ks), dm, dm, bias=False),
                "layer_norm_q": init_layer_norm(dm),
                "layer_norm_k": init_layer_norm(dm),
                "layer_norm_v": init_layer_norm(dm),
                "fc": init_linear(next(ks), dm, dm, bias=False),
                "linear_pos": init_linear(next(ks), dm, dm, bias=False),
                "pos_bias_u": jnp.zeros((e.n_head, dm // e.n_head)),
                "pos_bias_v": jnp.zeros((e.n_head, dm // e.n_head))},
            "conv": {
                "pre_layer_norm": init_layer_norm(dm),
                "pointwise_conv1": init_conv1d(next(ks), dm, 4 * dm, 1,
                                               bias=False),
                "depthwise_conv": init_conv1d(next(ks), 2 * dm, 2 * dm,
                                              e.kernel_size,
                                              groups=2 * dm, bias=False),
                "batch_norm": init_layer_norm(2 * dm),
                "pointwise_conv2": init_conv1d(next(ks), 2 * dm, dm, 1,
                                               bias=False)},
            "ffn2": _init_ffn(ks, dm),
            "layer_norm": init_layer_norm(dm),
        }
    dec_layers = {}
    for i in range(d.n_layers):
        dec_layers[str(i)] = {
            "self_attn_norm": init_layer_norm(d.d_model),
            "self_attn": _init_dec_attn(ks, d.d_model),
            "cross_attn_norm": init_layer_norm(d.d_model),
            "cross_attn": _init_dec_attn(ks, d.d_model),
            "mlp_norm": init_layer_norm(d.d_model),
            "mlp": {"w_1": init_linear(next(ks), d.d_model,
                                       4 * d.d_model),
                    "w_2": init_linear(next(ks), 4 * d.d_model,
                                       d.d_model)},
        }
    return {
        "encoder": {
            "input_preprocessor": {
                "conv1": init_conv2d(next(ks), 1, 32, 3),
                "conv2": init_conv2d(next(ks), 32, 32, 3),
                "out": init_linear(next(ks), 32 * sub_dim, dm)},
            "layer_stack": enc_layers,
        },
        "decoder": {
            "tgt_word_emb": init_embedding(next(ks), cfg.odim, d.d_model),
            "layer_stack": dec_layers,
            "layer_norm_out": init_layer_norm(d.d_model),
            "tgt_word_prj": init_linear(next(ks), d.d_model, cfg.odim,
                                        bias=False),
        },
    }


def _init_ffn(ks, dm):
    return {"net_0": init_layer_norm(dm),
            "net_1": init_linear(next(ks), dm, 4 * dm),
            "net_4": init_linear(next(ks), 4 * dm, dm)}


def _init_dec_attn(ks, dm):
    return {"w_qs": init_linear(next(ks), dm, dm),
            "w_ks": init_linear(next(ks), dm, dm, bias=False),
            "w_vs": init_linear(next(ks), dm, dm),
            "fc": init_linear(next(ks), dm, dm)}


# ----------------------------------------------------------------- encoder

def _rel_pe(t: int, dm: int) -> np.ndarray:
    pos = np.arange(t, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dm, 2, dtype=np.float32)
                 * -(math.log(10000.0) / dm))
    pe_pos = np.zeros((t, dm), np.float32)
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((t, dm), np.float32)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)[None]


def _ffn(p, x):
    h = apply_layer_norm(p["net_0"], x)
    h = apply_linear(p["net_1"], h)
    h = h * jax.nn.sigmoid(h)
    return apply_linear(p["net_4"], h) + x


def _rel_shift(x: Array) -> Array:
    n, h, t1, t2 = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(n, h, t2 + 1, t1)[:, :, 1:].reshape(n, h, t1, t2)
    return x[..., : t2 // 2 + 1]


def _mhsa(p, x, pos_emb, n_head, key_mask=None):
    n, t, dm = x.shape
    dk = dm // n_head
    q = apply_linear(p["w_qs"], apply_layer_norm(p["layer_norm_q"], x))
    k = apply_linear(p["w_ks"], apply_layer_norm(p["layer_norm_k"], x))
    v = apply_linear(p["w_vs"], apply_layer_norm(p["layer_norm_v"], x))
    q = q.reshape(n, t, n_head, dk)
    k = k.reshape(n, -1, n_head, dk).transpose(0, 2, 1, 3)
    v = v.reshape(n, -1, n_head, dk).transpose(0, 2, 1, 3)
    pp = apply_linear(p["linear_pos"], pos_emb).reshape(
        1, -1, n_head, dk).transpose(0, 2, 1, 3)
    qu = (q + p["pos_bias_u"]).transpose(0, 2, 1, 3)
    qv = (q + p["pos_bias_v"]).transpose(0, 2, 1, 3)
    ac = qu @ k.transpose(0, 1, 3, 2)
    bd = _rel_shift(qv @ pp.transpose(0, 1, 3, 2))
    scores = ((ac + bd) / math.sqrt(dk)).astype(jnp.float32)
    if key_mask is not None:                   # (n, 1, 1, T) additive
        scores = scores + key_mask
    w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = (w @ v).transpose(0, 2, 1, 3).reshape(n, t, dm)
    return apply_linear(p["fc"], o) + x


def _conv_mod(p, x, kernel, pos_mask=None):
    h = apply_layer_norm(p["pre_layer_norm"], x)
    h = apply_conv1d(p["pointwise_conv1"], h)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)
    if pos_mask is not None:
        # zero bucket-pad positions so the depthwise conv sees exactly the
        # implicit zero padding the reference's unpadded run would
        h = h * pos_mask
    h = apply_conv1d(p["depthwise_conv"], h, padding=(kernel - 1) // 2,
                     groups=h.shape[-1])
    h = apply_layer_norm(p["batch_norm"], h)
    h = h * jax.nn.sigmoid(h)
    return apply_conv1d(p["pointwise_conv2"], h) + x


def encoder_forward(params: dict, cfg: ModelConfig, feats: Array,
                    valid_frames: Optional[Array] = None) -> Array:
    """(B, T, idim) fbank -> (B, T', d_model).

    valid_frames: optional (B,) int32 — number of real (non-bucket-pad) mel
    frames per row; padded keys are masked out of self-attention (the
    reference runs unpadded, so this keeps bucketed results faithful).
    """
    e = cfg.enc
    p = params["encoder"]
    # right-context pad (context 7 -> 6 frames)
    x = jnp.pad(feats, ((0, 0), (0, 6), (0, 0)))[..., None]
    x = jax.nn.relu(apply_conv2d(p["input_preprocessor"]["conv1"], x,
                                 stride=2))
    x = jax.nn.relu(apply_conv2d(p["input_preprocessor"]["conv2"], x,
                                 stride=2))
    n, t, dsub, c = x.shape
    x = x.transpose(0, 1, 3, 2).reshape(n, t, c * dsub)
    x = apply_linear(p["input_preprocessor"]["out"], x)
    pos = jnp.asarray(_rel_pe(t, e.d_model))
    key_mask = pos_mask = None
    if valid_frames is not None:
        sub_valid = sub_lengths(valid_frames)
        valid = jnp.arange(t)[None] < sub_valid[:, None]      # (B, T')
        key_mask = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
        pos_mask = valid[..., None].astype(x.dtype)
    for i in range(e.n_layers):
        lp = p["layer_stack"][str(i)]
        h = 0.5 * x + 0.5 * _ffn(lp["ffn1"], x)
        # note _ffn adds its own residual; reference block is
        # out = 0.5*x + 0.5*ffn1(x) where ffn1 already includes +x
        h = _mhsa(lp["mhsa"], h, pos, e.n_head, key_mask)
        h = _conv_mod(lp["conv"], h, e.kernel_size, pos_mask)
        h = 0.5 * h + 0.5 * _ffn(lp["ffn2"], h)
        x = apply_layer_norm(lp["layer_norm"], h)
    return x


def sub_lengths(t):
    """Mel frames -> conformer frames (pad 6, two valid k3/s2 convs)."""
    t = t + 6
    for _ in range(2):
        t = (t - 3) // 2 + 1
    return t


# ----------------------------------------------------------------- decoder

def _dec_pe(maxlen: int, dm: int) -> np.ndarray:
    pos = np.arange(maxlen, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dm, 2, dtype=np.float32)
                 * -(math.log(10000.0) / dm))
    pe = np.zeros((maxlen, dm), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class Model(FunctionalModel):
    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self._tokenizer: Optional[List[str]] = None
        self._cmvn = None

    @property
    def sample_rate(self) -> int:
        return 16000

    def init_params(self, key):
        return init_fireredasr2(key, self.config)

    # ----------------------------------------------------------- features

    def _extract_fbank(self, audio: np.ndarray) -> np.ndarray:
        from ....dsp import compute_fbank_kaldi

        wav = np.asarray(audio, np.float32).reshape(-1)
        if np.abs(wav).max() <= 1.0:
            wav = wav * 32768.0
        feats = np.asarray(compute_fbank_kaldi(
            jnp.asarray(wav), sample_rate=16000, win_len=400, win_inc=160,
            num_mels=self.config.idim, snip_edges=True, dither=0.0))
        if self._cmvn is not None:
            means, istd = self._cmvn
            feats = (feats - means) * istd
        return feats.astype(np.float32)

    # -------------------------------------------------------- compiled beam

    def _beam_fns(self, tb: int, beam: int, max_decode: int,
                  smoothing: float, eos_penalty: float):
        key_ = ("beam", tb, beam, max_decode, smoothing, eos_penalty)
        fns = self._jit_cache.get(key_)
        if fns is not None:
            return fns
        cfg = self.config
        d = cfg.dec
        dm = d.d_model
        h = d.n_head
        dk = dm // h
        eos = cfg.eos_id
        pe = jnp.asarray(_dec_pe(d.pe_maxlen, dm))
        scale = math.sqrt(dm)
        INF = 1e10

        def enc(p, feats, valid):
            return encoder_forward(p, cfg, feats, valid)

        def dec_step(p, tokens, caches, ckv, offset):
            """tokens (B, 1) -> logits (B, V), new caches."""
            b = tokens.shape[0]
            x = apply_embedding(p["decoder"]["tgt_word_emb"], tokens) \
                * scale + pe[offset][None, None]
            for i in range(d.n_layers):
                lp = p["decoder"]["layer_stack"][str(i)]
                hn = apply_layer_norm(lp["self_attn_norm"], x)
                a = lp["self_attn"]
                q = apply_linear(a["w_qs"], hn).reshape(b, 1, h, dk)
                k = apply_linear(a["w_ks"], hn).reshape(b, 1, h, dk)
                v = apply_linear(a["w_vs"], hn).reshape(b, 1, h, dk)
                nc = kv_update(caches[i], k, v, offset)
                caches[i] = nc
                o = decode_attention(q, nc.k, nc.v, offset + 1)
                x = x + apply_linear(a["fc"], o.reshape(b, 1, dm))
                hn = apply_layer_norm(lp["cross_attn_norm"], x)
                ca = lp["cross_attn"]
                q = apply_linear(ca["w_qs"], hn).reshape(b, 1, h, dk)
                ck, cv, cmask = ckv[i]
                o = attention(q, ck, cv, mask=cmask).reshape(b, 1, dm)
                x = x + apply_linear(ca["fc"], o)
                hn = apply_layer_norm(lp["mlp_norm"], x)
                x = x + apply_linear(
                    lp["mlp"]["w_2"],
                    jax.nn.gelu(apply_linear(lp["mlp"]["w_1"], hn),
                                approximate=False))
            x = apply_layer_norm(p["decoder"]["layer_norm_out"], x)
            return apply_linear(p["decoder"]["tgt_word_prj"], x[:, 0]), \
                caches

        def beam_search(p, enc_out, enc_valid):
            ckv = []
            enc_b = jnp.broadcast_to(enc_out,
                                     (beam,) + enc_out.shape[1:])
            cmask = jnp.where(jnp.arange(enc_out.shape[1]) < enc_valid,
                              0.0, -1e9)[None, None, None, :]
            for i in range(d.n_layers):
                ca = p["decoder"]["layer_stack"][str(i)]["cross_attn"]
                ck = apply_linear(ca["w_ks"], enc_b).reshape(
                    beam, -1, h, dk)
                cv = apply_linear(ca["w_vs"], enc_b).reshape(
                    beam, -1, h, dk)
                ckv.append((ck, cv, cmask))
            caches = [KVCache.init(beam, max_decode + 1, h, dk,
                                   jnp.float32) for _ in range(d.n_layers)]
            ys = jnp.full((beam, max_decode + 1), eos, jnp.int32)
            ys = ys.at[:, 0].set(cfg.sos_id)
            scores = jnp.asarray([0.0] + [-INF] * (beam - 1))
            finished = jnp.zeros((beam,), bool)
            conf = jnp.zeros((beam, max_decode))

            def cond(st):
                t, _, _, _, finished, _ = st
                return (t < max_decode) & ~jnp.all(finished)

            def body(st):
                t, ys, caches, scores, finished, conf = st
                logits, caches = dec_step(p, ys[:, t][:, None], caches,
                                          ckv, t)
                lp_tok = jnp.log(jax.nn.softmax(
                    logits.astype(jnp.float32) / smoothing, axis=-1)
                    + 1e-10)
                if eos_penalty != 1.0:
                    lp_tok = lp_tok.at[:, eos].multiply(eos_penalty)
                topv, topi = jax.lax.top_k(lp_tok, beam)      # (B, B)
                # finished beams contribute one frozen EOS candidate
                frozen_v = jnp.concatenate(
                    [jnp.zeros((beam, 1)),
                     jnp.full((beam, beam - 1), -INF)], axis=1)
                topv = jnp.where(finished[:, None], frozen_v, topv)
                topi = jnp.where(finished[:, None], eos, topi)
                cand = (scores[:, None] + topv).reshape(-1)
                best_v, best_i = jax.lax.top_k(cand, beam)
                src = (best_i // beam).astype(jnp.int32)
                tok = jnp.take(topi.reshape(-1), best_i)
                ys = jnp.take(ys, src, axis=0).at[:, t + 1].set(tok)
                caches = [KVCache(jnp.take(c.k, src, axis=0),
                                  jnp.take(c.v, src, axis=0))
                          for c in caches]
                conf = jnp.take(conf, src, axis=0).at[:, t].set(
                    jnp.exp(jnp.take(topv.reshape(-1), best_i)))
                finished = jnp.take(finished, src, axis=0) | (tok == eos)
                return (t + 1, ys, caches, best_v, finished, conf)

            t, ys, _, scores, finished, conf = jax.lax.while_loop(
                cond, body, (jnp.int32(0), ys, caches, scores, finished,
                             conf))
            return ys, scores, conf, t

        fns = (jax.jit(enc), jax.jit(beam_search))
        self._jit_cache[key_] = fns
        return fns

    # ------------------------------------------------------------ generate

    def generate(self, audio, *, beam_size: int = 3,
                 softmax_smoothing: float = 1.25,
                 length_penalty: float = 0.6, eos_penalty: float = 1.0,
                 max_len: int = 0, verbose: bool = False, **kwargs
                 ) -> STTOutput:
        t0 = time.time()
        if isinstance(audio, (str, Path)):
            from ...utils import load_audio

            audio = np.asarray(load_audio(str(audio), 16000))
        feats = self._extract_fbank(audio)
        t = feats.shape[0]
        tb = _bucket(t)
        pad = np.zeros((1, tb, feats.shape[1]), np.float32)
        pad[0, :t] = feats
        # max_decode depends only on the mel bucket so the compiled beam
        # search is reused across utterances of similar length
        max_decode = max_len if max_len > 0 else min(self._sub_len(tb), 448)
        enc_fn, beam_fn = self._beam_fns(tb, beam_size, max_decode,
                                         softmax_smoothing, eos_penalty)
        enc_out = enc_fn(self.params, jnp.asarray(pad),
                         jnp.asarray([t], jnp.int32))
        ys, scores, conf, steps = beam_fn(self.params, enc_out,
                                          jnp.int32(self._sub_len(t)))
        ys = np.asarray(ys)
        scores = np.asarray(scores)
        conf = np.asarray(conf)

        # GNMT length penalty ranking (reference counts the SOS token too)
        lens = 1.0 + (ys[:, 1:] != self.config.eos_id).sum(axis=1).astype(
            np.float32)
        if length_penalty > 0:
            penalty = ((5.0 + lens) / 6.0) ** length_penalty
            final = scores / np.maximum(penalty, 1e-6)
        else:
            final = scores
        best = int(np.argmax(final))
        seq = ys[best, 1:]
        eos_pos = np.where(seq == self.config.eos_id)[0]
        seq = seq[: eos_pos[0]] if len(eos_pos) else seq
        text = self._detokenize(seq.tolist())
        confidence = float(conf[best, : len(seq)].mean()) if len(seq) \
            else 0.0
        dt = time.time() - t0
        if verbose:
            print(text)
        return STTOutput(
            text=text, language="zh",
            segments=[{"text": text, "confidence": round(confidence, 3)}],
            prompt_tokens=0, generation_tokens=int(len(seq)),
            total_tokens=int(len(seq)), total_time=round(dt, 3),
            prompt_tps=0.0, generation_tps=len(seq) / dt if dt else 0.0)

    __call__ = generate

    def _sub_len(self, t: int) -> int:
        return max(int(sub_lengths(t)), 1)

    def _detokenize(self, ids: List[int]) -> str:
        if self._tokenizer is None:
            return " ".join(map(str, ids))
        toks = [self._tokenizer[i] for i in ids
                if 0 <= i < len(self._tokenizer)]
        text = "".join(toks).replace("▁", " ").strip()
        return re.sub(r"(<blank>)|(<sil>)", "", text).lower()

    # ------------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        out = {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            k = k.replace("input_preprocessor.conv.0.",
                          "input_preprocessor.conv1.")
            k = k.replace("input_preprocessor.conv.2.",
                          "input_preprocessor.conv2.")
            k = re.sub(r"\.net\.(\d+)\.", r".net_\1.", k)
            if ("pointwise_conv" in k or "depthwise_conv" in k) \
                    and k.endswith("weight") and v.ndim == 3:
                v = jnp.transpose(v, (2, 1, 0))        # torch OIK -> KIO
            elif "input_preprocessor.conv" in k and k.endswith("weight") \
                    and v.ndim == 4:
                v = jnp.transpose(v, (2, 3, 1, 0))     # OIHW -> HWIO
            out[k] = v
        if "decoder.tgt_word_prj.weight" not in out \
                and "decoder.tgt_word_emb.weight" in out:
            out["decoder.tgt_word_prj.weight"] = \
                out["decoder.tgt_word_emb.weight"]
        return out

    @staticmethod
    def post_load_hook(model: "Model", model_path) -> "Model":
        import json

        model_path = Path(model_path)
        cmvn = model_path / "cmvn.json"
        if cmvn.exists():
            data = json.loads(cmvn.read_text())
            model._cmvn = (np.asarray(data["means"], np.float32),
                           np.asarray(data["istd"], np.float32))
        dict_path = model_path / "dict.txt"
        if dict_path.exists():
            id2word = []
            for line in dict_path.read_text(encoding="utf8").splitlines():
                toks = line.strip().split()
                word = toks[0] if toks else " "
                id2word.append(" " if word == "<space>" else word)
            model._tokenizer = id2word
        return model


__all__ = ["Model", "ModelConfig", "encoder_forward", "init_fireredasr2"]
