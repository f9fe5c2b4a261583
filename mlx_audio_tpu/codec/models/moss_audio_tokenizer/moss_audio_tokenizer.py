"""MOSS audio tokenizer: patched causal transformers + residual LFQ.

Parity: reference codec/models/moss_audio_tokenizer/moss_audio_tokenizer.py
— encoder/decoder are config-driven stacks of PatchedPretransform (channel
stacking by patch_size, :561-587) and ProjectedTransformer modules (causal
attention with a context window derived from context_duration x frame rate,
GPT-J pair RoPE or sin positions, exact-gelu FFN, LayerScale, no-bias
linears, :230-558), a residual LFQ quantizer (L2-normalized codebook
nearest-neighbour per stage with weight-normed 1x1 in/out projections,
:590-689), stereo channel interleave (:906-933), and a streaming decoder
with per-layer attention caches trimmed to the context window (:1073-1117).
Sanitize: ffn/in_projs key renames (:114-124) and weight-norm folding of
the k=1 convs into plain linears (WNConv1d :142-181).

TPU design: activations are channel-last everywhere (the reference
transposes (B,C,T)<->(B,T,C) around every module); offline encode/decode
are single jitted programs per length bucket with validity masks; the
streaming decoder reuses the RingKVCache (ops/kvcache) so the per-chunk
step is one compiled program with O(1) cache writes, and context-window
attention makes streamed == offline exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import apply_layer_norm, apply_linear, init_layer_norm, \
    init_linear
from ....ops.attention import attention
from ....ops.kvcache import KVCache, ring_mask, ring_update
from ....ops.rope import apply_rope_interleaved, rope_freqs

Array = jax.Array

DEC_CHUNK = 32
TIME_BUCKETS = (64, 128, 256, 512, 1024, 2048)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "moss_audio_tokenizer"
    sample_rate: int = 48000
    sampling_rate: int = 48000
    downsample_rate: int = 3840
    causal_transformer_context_duration: float = 10.0
    number_channels: int = 2
    enable_channel_interleave: bool = True
    encoder_kwargs: List[Dict[str, Any]] = field(default_factory=list)
    decoder_kwargs: List[Dict[str, Any]] = field(default_factory=list)
    quantizer_type: str = "rlfq"
    quantizer_kwargs: Dict[str, Any] = field(default_factory=dict)
    model_path: str = ""


def _l2n(x: Array, eps: float = 1e-12) -> Array:
    return x / jnp.maximum(
        jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)), eps)


def _module_specs(cfg: ModelConfig, kwargs_list: List[Dict],
                  is_encoder: bool) -> List[Dict]:
    """Resolve module specs + per-module context (frames) like the
    reference constructor (:708-781)."""
    channel_factor = cfg.number_channels \
        if cfg.enable_channel_interleave and cfg.number_channels > 1 else 1
    rate = float(cfg.sampling_rate * channel_factor)
    if not is_encoder:
        # the decoder starts at the encoder's final (code) frame rate
        for mk in cfg.encoder_kwargs:
            if mk.get("module_type") == "PatchedPretransform":
                rate /= int(mk["patch_size"])
    specs = []
    for mk in kwargs_list:
        spec = dict(mk)
        t = spec.get("module_type")
        if t == "Transformer":
            dur = float(spec.pop("context_duration",
                                 cfg.causal_transformer_context_duration))
            spec.pop("attention_implementation", None)
            spec["context"] = int(round(rate * dur))
        elif t == "PatchedPretransform":
            p = int(spec["patch_size"])
            rate = rate / p if is_encoder else rate * p
        specs.append(spec)
    return specs


# ------------------------------------------------------------------ init

def _init_transformer(key, spec: Dict) -> dict:
    d = int(spec["d_model"])
    nl = int(spec["num_layers"])
    ff = int(spec["dim_feedforward"])
    ls = spec.get("layer_scale")
    ks = iter(jax.random.split(key, 8 * nl + 4))
    layers = {}
    for i in range(nl):
        layer = {
            "self_attn": {
                "in_proj": init_linear(next(ks), d, 3 * d, bias=False),
                "out_proj": init_linear(next(ks), d, d, bias=False)},
            "norm1": init_layer_norm(d),
            "norm2": init_layer_norm(d),
            "ffn": {"0": init_linear(next(ks), d, ff, bias=False),
                    "2": init_linear(next(ks), ff, d, bias=False)}}
        if ls is not None:
            layer["layer_scale_1"] = {"scale": jnp.full((d,), float(ls))}
            layer["layer_scale_2"] = {"scale": jnp.full((d,), float(ls))}
        layers[str(i)] = layer
    p = {"transformer": {"layers": layers}}
    in_dim = int(spec["input_dimension"])
    out_dim = int(spec["output_dimension"])
    if in_dim != d or spec.get("force_input_projection"):
        p["input_proj"] = init_linear(next(ks), in_dim, d, bias=False)
    if out_dim != d or spec.get("force_output_projection"):
        p["output_proj"] = init_linear(next(ks), d, out_dim, bias=False)
    return p


def init_moss_tokenizer(key, cfg: ModelConfig) -> dict:
    q = dict(cfg.quantizer_kwargs or {})
    input_dim = int(q.get("input_dim", 1024))
    rvq_dim = int(q.get("rvq_dim") or input_dim)
    output_dim = int(q.get("output_dim") or input_dim)
    nq = int(q.get("num_quantizers", 32))
    ck = int(q.get("codebook_size", 1024))
    cd = int(q.get("codebook_dim", 8))
    ks = iter(jax.random.split(key, 8 + 4 * nq + 4 * (
        len(cfg.encoder_kwargs) + len(cfg.decoder_kwargs))))

    def wn_linear(k, i, o):
        p = init_linear(k, i, o, bias=True)
        return p

    quantizers = {}
    for i in range(nq):
        k1, k2, k3 = jax.random.split(next(ks), 3)
        quantizers[str(i)] = {
            "in_proj": wn_linear(k1, rvq_dim, cd),
            "out_proj": wn_linear(k2, cd, rvq_dim),
            "codebook": {"weight": jax.random.normal(k3, (ck, cd)) * 0.1}}

    enc_specs = _module_specs(cfg, cfg.encoder_kwargs, True)
    dec_specs = _module_specs(cfg, cfg.decoder_kwargs, False)
    enc, dec = {}, {}
    for i, spec in enumerate(enc_specs):
        if spec.get("module_type") == "Transformer":
            enc[str(i)] = _init_transformer(next(ks), spec)
    for i, spec in enumerate(dec_specs):
        if spec.get("module_type") == "Transformer":
            dec[str(i)] = _init_transformer(next(ks), spec)
    return {"encoder": enc, "decoder": dec,
            "quantizer": {
                "input_proj": wn_linear(next(ks), input_dim, rvq_dim),
                "output_proj": wn_linear(next(ks), rvq_dim, output_dim),
                "quantizers": quantizers}}


# ------------------------------------------------------------ transformer

def _sin_pos(offset, t: int, d: int, max_period: float) -> Array:
    half = d // 2
    scale = max_period ** (jnp.arange(half, dtype=jnp.float32)
                           / max(half - 1, 1))
    pos = (offset + jnp.arange(t, dtype=jnp.float32))
    phase = pos[:, None] / scale[None]
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def transformer_forward(p: dict, spec: Dict, x: Array,
                        n_valid: Array) -> Array:
    """(B, T, in_dim) -> (B, T, out_dim) with causal+context+valid mask."""
    if "input_proj" in p:
        x = apply_linear(p["input_proj"], x)
    d = int(spec["d_model"])
    nh = int(spec["num_heads"])
    hd = d // nh
    mp = float(spec.get("max_period", 10000.0))
    pe = str(spec.get("positional_embedding", "rope"))
    causal = bool(spec.get("causal", True))
    ctx = spec.get("context")
    t = x.shape[1]
    if pe in ("sin", "sin_rope"):
        x = x + float(spec.get("positional_scale", 1.0)) \
            * _sin_pos(0, t, d, mp)[None]
    inv_freq = rope_freqs(hd, mp) if pe in ("rope", "sin_rope") else None
    positions = jnp.arange(t)[None]
    qi = jnp.arange(t)[:, None]
    kj = jnp.arange(t)[None, :]
    allow = kj < n_valid
    if causal:
        allow = allow & (qi - kj >= 0)
    if ctx is not None:
        allow = allow & (qi - kj < int(ctx))
    mask = jnp.where(allow, 0.0, -jnp.inf)[None, None]
    for i in range(int(spec["num_layers"])):
        blk = p["transformer"]["layers"][str(i)]
        h = apply_layer_norm(blk["norm1"], x)
        qkv = apply_linear(blk["self_attn"]["in_proj"], h) \
            .reshape(x.shape[0], t, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if inv_freq is not None:
            q = apply_rope_interleaved(q, positions, inv_freq)
            k = apply_rope_interleaved(k, positions, inv_freq)
        o = attention(q, k, v, mask=mask)
        # zero pad-query rows (context windows can fully mask them -> NaN)
        o = jnp.where((jnp.arange(t) < n_valid)[None, :, None, None],
                      o, 0.0)
        o = o.reshape(x.shape[0], t, d)
        o = apply_linear(blk["self_attn"]["out_proj"], o)
        if "layer_scale_1" in blk:
            o = o * blk["layer_scale_1"]["scale"]
        x = x + o
        h = apply_layer_norm(blk["norm2"], x)
        h = apply_linear(blk["ffn"]["2"],
                         jax.nn.gelu(apply_linear(blk["ffn"]["0"], h),
                                     approximate=False))
        if "layer_scale_2" in blk:
            h = h * blk["layer_scale_2"]["scale"]
        x = x + h
    if "output_proj" in p:
        x = apply_linear(p["output_proj"], x)
    return x


def patch_encode(x: Array, p: int) -> Array:
    """(B, T, C) -> (B, T//p, C*p), feature order channel-major."""
    b, t, c = x.shape
    x = x.reshape(b, t // p, p, c)
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t // p, c * p)


def patch_decode(x: Array, p: int) -> Array:
    b, t, cp = x.shape
    c = cp // p
    x = x.reshape(b, t, c, p)
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t * p, c)


# --------------------------------------------------------------- LFQ/RVQ

def rvq_encode(p: dict, z: Array, n_valid: Array, nq: int) -> Array:
    """(B, T, input_dim) -> codes (nq, B, T) via residual LFQ."""
    z = apply_linear(p["input_proj"], z.astype(jnp.float32))
    mask = (jnp.arange(z.shape[1]) < n_valid)[None, :, None]
    residual = z * mask
    codes = []
    for i in range(nq):
        qp = p["quantizers"][str(i)]
        lat = apply_linear(qp["in_proj"], residual)      # (B, T, cd)
        enc = _l2n(lat)
        cb = _l2n(qp["codebook"]["weight"].astype(jnp.float32))
        dist = (jnp.sum(enc * enc, -1, keepdims=True)
                - 2.0 * (enc @ cb.T)
                + jnp.sum(cb * cb, -1)[None, None])
        idx = jnp.argmax(-dist, axis=-1)
        zq = apply_linear(qp["out_proj"],
                          qp["codebook"]["weight"][idx]
                          .astype(jnp.float32)) * mask
        residual = residual - zq
        codes.append(idx)
    return jnp.stack(codes, axis=0)


def rvq_decode(p: dict, codes: Array) -> Array:
    """codes (nq, B, T) -> (B, T, output_dim)."""
    nq = codes.shape[0]
    emb = None
    for i in range(nq):
        qp = p["quantizers"][str(i)]
        e = apply_linear(qp["out_proj"],
                         qp["codebook"]["weight"][codes[i]]
                         .astype(jnp.float32))
        emb = e if emb is None else emb + e
    return apply_linear(p["output_proj"], emb)


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
        self._enc_specs = _module_specs(config, config.encoder_kwargs,
                                        True)
        self._dec_specs = _module_specs(config, config.decoder_kwargs,
                                        False)
        q = dict(config.quantizer_kwargs or {})
        self.num_quantizers = int(q.get("num_quantizers", 32))

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def channels(self) -> int:
        return self.config.number_channels

    def init_params(self, key):
        return init_moss_tokenizer(key, self.config)

    # ------------------------------------------------------------ paths

    def _encode_graph(self, p, x: Array, n_valid: Array,
                      nq: int) -> Array:
        """(1, T, 1) interleaved -> codes (nq, 1, frames)."""
        h, n = x, n_valid
        for i, spec in enumerate(self._enc_specs):
            if spec.get("module_type") == "PatchedPretransform":
                h = patch_encode(h, int(spec["patch_size"]))
                n = n // int(spec["patch_size"])
            else:
                h = transformer_forward(p["encoder"][str(i)], spec, h, n)
        return rvq_encode(p["quantizer"], h, n, nq)

    def _decode_graph(self, p, codes: Array) -> Array:
        h = rvq_decode(p["quantizer"], codes)
        n = jnp.int32(h.shape[1])
        for i, spec in enumerate(self._dec_specs):
            if spec.get("module_type") == "PatchedPretransform":
                h = patch_decode(h, int(spec["patch_size"]))
                n = n * int(spec["patch_size"])
            else:
                h = transformer_forward(p["decoder"][str(i)], spec, h, n)
        return h

    # ------------------------------------------------------------- API

    def encode(self, audio: np.ndarray, num_quantizers: int = None
               ) -> np.ndarray:
        """(T,) or (T, C) audio -> (frames, nq) int codes."""
        cfg = self.config
        nq = int(num_quantizers or self.num_quantizers)
        a = np.asarray(audio, np.float32)
        if a.ndim == 1:
            a = a[:, None]
        if a.shape[1] != cfg.number_channels:
            if a.shape[1] == 1:
                a = np.repeat(a, cfg.number_channels, axis=1)
            else:
                a = a.mean(axis=1, keepdims=True)
        dsr = cfg.downsample_rate
        t = a.shape[0]
        t_pad = ((t + dsr - 1) // dsr) * dsr
        a = np.pad(a, ((0, t_pad - t), (0, 0)))
        if cfg.number_channels > 1 and cfg.enable_channel_interleave:
            flat = a.reshape(-1)[:, None]          # (T*C, 1) interleaved
            n_valid = t_pad * cfg.number_channels
        else:
            flat = a
            n_valid = t_pad
        total_patch = 1
        for s in self._enc_specs:
            if s.get("module_type") == "PatchedPretransform":
                total_patch *= int(s["patch_size"])
        n_frames = flat.shape[0] // total_patch
        b = next((x for x in TIME_BUCKETS if n_frames <= x),
                 ((n_frames + 511) // 512) * 512)
        padded = np.zeros((1, b * total_patch, flat.shape[1]), np.float32)
        padded[0, :flat.shape[0]] = flat
        key_ = ("enc", b, nq)
        fn = self._jit_cache.get(key_)
        if fn is None:
            fn = jax.jit(lambda p, x, nv: self._encode_graph(p, x, nv,
                                                             nq))
            self._jit_cache[key_] = fn
        codes = np.asarray(fn(self.params, jnp.asarray(padded),
                              jnp.int32(n_valid)))
        return codes[:, 0, :n_frames].T.astype(np.int32)

    def decode(self, codes: np.ndarray, num_quantizers: int = None
               ) -> np.ndarray:
        """(frames, nq) codes -> (samples, channels) audio."""
        cfg = self.config
        codes = np.asarray(codes, np.int32)
        nq = int(num_quantizers or codes.shape[1])
        n_frames = codes.shape[0]
        if n_frames == 0:
            return np.zeros((0, cfg.number_channels), np.float32)
        b = next((x for x in TIME_BUCKETS if n_frames <= x),
                 ((n_frames + 511) // 512) * 512)
        padded = np.zeros((nq, 1, b), np.int32)
        padded[:, 0, :n_frames] = codes[:, :nq].T
        key_ = ("dec", b, nq)
        fn = self._jit_cache.get(key_)
        if fn is None:
            fn = jax.jit(lambda p, c: self._decode_graph(p, c))
            self._jit_cache[key_] = fn
        out = np.asarray(fn(self.params, jnp.asarray(padded)))[0]
        total_patch = 1
        for s in self._dec_specs:
            if s.get("module_type") == "PatchedPretransform":
                total_patch *= int(s["patch_size"])
        out = out[: n_frames * total_patch]
        if cfg.number_channels > 1 and cfg.enable_channel_interleave:
            out = out[:, 0].reshape(-1, cfg.number_channels)
        return out.astype(np.float32)

    def make_streaming_decoder(self, num_quantizers: int = None
                               ) -> "StreamingDecoder":
        return StreamingDecoder(self, int(num_quantizers
                                          or self.num_quantizers))

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """Key renames + weight-norm folds (reference :114-124,
        :142-181). k=1 WN convs become plain linears (O, I)."""
        out = {}
        pend_g, pend_v = {}, {}
        for k, v in weights.items():
            v = jnp.asarray(v)
            k = k.replace(".linear1.weight", ".ffn.0.weight")
            k = k.replace(".linear2.weight", ".ffn.2.weight")
            k = k.replace(".self_attn.in_projs.0.weight",
                          ".self_attn.in_proj.weight")
            k = k.replace(".self_attn.out_projs.0.weight",
                          ".self_attn.out_proj.weight")
            if k.endswith(".parametrizations.weight.original0"):
                pend_g[k[:-len(".parametrizations.weight.original0")]] = v
                continue
            if k.endswith(".parametrizations.weight.original1"):
                pend_v[k[:-len(".parametrizations.weight.original1")]] = v
                continue
            out[k] = v
        for base, v in pend_v.items():
            g = pend_g[base]
            norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True))
            w = (g * v / norm)[..., 0]          # k=1: (O, I, 1) -> (O, I)
            out[base + ".weight"] = w
        return out


MossAudioTokenizer = Model


# ------------------------------------------------------------- streaming

class StreamingDecoder:
    """Chunked causal decode with ring caches; streamed == offline
    because every decoder transformer is causal with a context window
    (reference MossAudioTokenizerStreamingDecoder)."""

    def __init__(self, model: Model, num_quantizers: int):
        self.model = model
        self.nq = num_quantizers
        self._offsets: List[int] = []
        self._caches: List[Optional[List[KVCache]]] = []
        self._specs = model._dec_specs
        local = DEC_CHUNK          # frames per step at this module depth
        for spec in self._specs:
            if spec.get("module_type") == "Transformer":
                d = int(spec["d_model"])
                nh = int(spec["num_heads"])
                ctx = int(spec.get("context") or 4096)
                # ring invariant: cap >= context + per-step chunk length
                cap = 1 << max(6, (ctx + local).bit_length())
                nl = int(spec["num_layers"])
                self._caches.append([
                    KVCache.init(1, cap, nh, d // nh, dtype=jnp.float32)
                    for _ in range(nl)])
                self._offsets.append(0)
            else:
                self._caches.append(None)
                self._offsets.append(0)
                local *= int(spec["patch_size"])
        self._fn = None

    def reset(self) -> None:
        self.__init__(self.model, self.nq)

    def _step_graph(self, p, codes, caches_flat, offsets):
        h = rvq_decode(p["quantizer"], codes)
        new_flat = []
        ci = 0
        for i, spec in enumerate(self._specs):
            if spec.get("module_type") == "PatchedPretransform":
                h = patch_decode(h, int(spec["patch_size"]))
            else:
                d = int(spec["d_model"])
                nh = int(spec["num_heads"])
                hd = d // nh
                mp = float(spec.get("max_period", 10000.0))
                pe = str(spec.get("positional_embedding", "rope"))
                ctx = int(spec.get("context") or 4096)
                off = offsets[ci]
                caches = caches_flat[ci]
                x = h
                if "input_proj" in p["decoder"][str(i)]:
                    x = apply_linear(p["decoder"][str(i)]["input_proj"],
                                     x)
                t = x.shape[1]
                if pe in ("sin", "sin_rope"):
                    x = x + float(spec.get("positional_scale", 1.0)) \
                        * _sin_pos(off, t, d, mp)[None]
                inv_freq = rope_freqs(hd, mp) \
                    if pe in ("rope", "sin_rope") else None
                positions = (off + jnp.arange(t))[None]
                cap = caches[0].k.shape[1]
                mask = ring_mask(cap, ctx, off, jnp.int32(t), t)
                new_caches = []
                for li in range(int(spec["num_layers"])):
                    blk = p["decoder"][str(i)]["transformer"]["layers"][
                        str(li)]
                    hh = apply_layer_norm(blk["norm1"], x)
                    qkv = apply_linear(blk["self_attn"]["in_proj"], hh) \
                        .reshape(1, t, 3, nh, hd)
                    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                    if inv_freq is not None:
                        q = apply_rope_interleaved(q, positions, inv_freq)
                        k = apply_rope_interleaved(k, positions, inv_freq)
                    nc = ring_update(caches[li], k, v, off)
                    new_caches.append(nc)
                    o = attention(q, nc.k, nc.v, mask=mask) \
                        .reshape(1, t, d)
                    o = apply_linear(blk["self_attn"]["out_proj"], o)
                    if "layer_scale_1" in blk:
                        o = o * blk["layer_scale_1"]["scale"]
                    x = x + o
                    hh = apply_layer_norm(blk["norm2"], x)
                    hh = apply_linear(
                        blk["ffn"]["2"],
                        jax.nn.gelu(apply_linear(blk["ffn"]["0"], hh),
                                    approximate=False))
                    if "layer_scale_2" in blk:
                        hh = hh * blk["layer_scale_2"]["scale"]
                    x = x + hh
                if "output_proj" in p["decoder"][str(i)]:
                    x = apply_linear(p["decoder"][str(i)]["output_proj"],
                                     x)
                h = x
                new_flat.append(new_caches)
                ci += 1
        return h, new_flat

    def decode_frames(self, codes: np.ndarray) -> np.ndarray:
        """(frames, nq) new codes -> (new_samples, channels) audio."""
        cfg = self.model.config
        codes = np.asarray(codes, np.int32)
        if codes.shape[0] == 0:
            return np.zeros((0, cfg.number_channels), np.float32)
        out = []
        for s0 in range(0, codes.shape[0], DEC_CHUNK):
            seg = codes[s0:s0 + DEC_CHUNK]
            n = seg.shape[0]
            padded = np.zeros((self.nq, 1, DEC_CHUNK), np.int32)
            padded[:, 0, :n] = seg[:, :self.nq].T
            if self._fn is None:
                self._fn = jax.jit(lambda p, c, cf, of:
                                   self._step_graph(p, c, cf, of))
            tcaches = [c for c in self._caches if c is not None]
            offs = [jnp.int32(o) for o, c in
                    zip(self._offsets, self._caches) if c is not None]
            h, new_flat = self._fn(self.model.params, jnp.asarray(padded),
                                   tcaches, offs)
            # write back caches/offsets; advance offsets by n (valid)
            ci = 0
            for i, c in enumerate(self._caches):
                if c is not None:
                    self._caches[i] = new_flat[ci]
                    ci += 1
            # per-module time scale: offsets advance in module-local frames
            scale = 1
            ci = 0
            local = n
            for spec in self._specs:
                if spec.get("module_type") == "PatchedPretransform":
                    local *= int(spec["patch_size"])
                else:
                    idx = [j for j, cc in enumerate(self._caches)
                           if cc is not None][ci]
                    self._offsets[idx] += local
                    ci += 1
            total_patch = 1
            for s in self._specs:
                if s.get("module_type") == "PatchedPretransform":
                    total_patch *= int(s["patch_size"])
            audio = np.asarray(h)[0][: n * total_patch]
            out.append(audio)
        audio = np.concatenate(out, axis=0)
        if cfg.number_channels > 1 and cfg.enable_channel_interleave:
            audio = audio[:, 0].reshape(-1, cfg.number_channels)
        return audio.astype(np.float32)


__all__ = ["Model", "ModelConfig", "MossAudioTokenizer",
           "StreamingDecoder", "rvq_encode", "rvq_decode",
           "transformer_forward", "patch_encode", "patch_decode"]
