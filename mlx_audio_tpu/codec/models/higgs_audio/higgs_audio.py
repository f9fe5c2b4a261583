"""HiggsAudio v2 acoustic tokenizer (DAC + HuBERT semantic fusion RVQ).

Parity: reference codec/models/higgs_audio/ — DAC-style acoustic encoder/
decoder (snake residual units, strides 8*5*4*2*3 = hop 960, dac.py),
8-book residual VQ with per-book project_in/codebook/project_out
(dac.py:178-251), decode = quantizer.decode -> fc2 (1024->256) ->
acoustic_decoder (higgs_audio.py:108-124), encode = HuBERT mean over ALL
hidden states, stride-2 slice, SemanticEncoder CNN, concat with the
acoustic encoder output, fc fusion, residual quantize (:126-180), the
sinc 24k->16k resample with hop/2 padding, and the keep/drop/layout
sanitize (:182-250).

TPU design: decode compiles per exact token length (the decoder is
non-causal, so padding would leak into the interior); channel-last
throughout; the HuBERT backbone is the shared wav2vec2 module with an
all-layer mean accumulated in-graph.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ....nn import (apply_conv1d, apply_conv_transpose1d, apply_layer_norm,
                    apply_linear, init_conv1d, init_conv_transpose1d,
                    init_linear)
from ....stt.models.wav2vec.wav2vec import (ModelConfig as W2VConfig,
                                            _attention, _feature_encoder,
                                            _ffn, _pos_conv,
                                            init_wav2vec2,
                                            sanitize_wav2vec2)
from ..blocks import apply_snake, init_snake

Array = jax.Array

TOKEN_BUCKETS = (32, 64, 128, 256, 512)


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "higgs_audio_v2_tokenizer"
    sample_rate: int = 24000
    codebook_size: int = 1024
    codebook_dim: int = 64
    downsample_factor: int = 320
    dac_num_codebooks: int = 8
    dac_encoder_ratios: List[int] = field(
        default_factory=lambda: [8, 5, 4, 2, 3])
    dac_encoder_hidden: int = 64
    dac_decoder_hidden: int = 1024
    latent_dim: int = 1024
    fusion_dim: int = 256
    semantic_sample_rate: int = 16000
    semantic_model_config: Optional[Dict[str, Any]] = None
    strides: List[int] = field(default_factory=lambda: [1, 1])
    block_dilations: List[int] = field(default_factory=lambda: [1, 1])
    channel_ratios: List[int] = field(default_factory=lambda: [1, 1])
    kernel_size: int = 3
    unit_kernel_size: int = 3
    model_path: str = ""

    @property
    def acoustic_hop(self) -> int:
        return math.prod(self.dac_encoder_ratios)

    @property
    def semantic_downsample_factor(self) -> int:
        hubert_fps = self.semantic_sample_rate / self.downsample_factor
        acoustic_fps = self.sample_rate / self.acoustic_hop
        return max(1, round(hubert_fps / acoustic_fps))


# ------------------------------------------------------------------ init

def _init_resunit(ks, dim: int) -> dict:
    return {"snake1": init_snake(dim),
            "conv1": init_conv1d(next(ks), dim, dim, 7),
            "snake2": init_snake(dim),
            "conv2": init_conv1d(next(ks), dim, dim, 1)}


def _resunit(p: dict, x: Array, dilation: int) -> Array:
    # WNConv1d pad_mode="none" is CENTERED padding (k-1)*d//2, so the
    # residual path preserves length (dacvae/codec.py:98-102)
    y = apply_snake(p["snake1"], x)
    y = apply_conv1d(p["conv1"], y, padding=3 * dilation,
                     dilation=dilation)
    y = apply_snake(p["snake2"], y)
    y = apply_conv1d(p["conv2"], y)
    return x + y


def init_higgs(key, cfg: ModelConfig) -> dict:
    ks = iter(jax.random.split(key, 512))
    eh = cfg.dac_encoder_hidden
    enc_ch = [eh * 2 ** i for i in range(len(cfg.dac_encoder_ratios) + 1)]
    enc = {"conv1": init_conv1d(next(ks), 1, enc_ch[0], 7)}
    for i, s in enumerate(cfg.dac_encoder_ratios):
        enc.setdefault("block", {})[str(i)] = {
            "res_unit1": _init_resunit(ks, enc_ch[i]),
            "res_unit2": _init_resunit(ks, enc_ch[i]),
            "res_unit3": _init_resunit(ks, enc_ch[i]),
            "snake1": init_snake(enc_ch[i]),
            "conv1": init_conv1d(next(ks), enc_ch[i], enc_ch[i + 1],
                                 2 * s)}
    enc["snake1"] = init_snake(enc_ch[-1])
    enc["conv2"] = init_conv1d(next(ks), enc_ch[-1], cfg.fusion_dim, 3)

    dh = cfg.dac_decoder_hidden
    dec_in = [dh // 2 ** i for i in range(len(cfg.dac_encoder_ratios))]
    dec_out = [c // 2 for c in dec_in]
    dec = {"conv1": init_conv1d(next(ks), cfg.fusion_dim, dh, 7)}
    for i, s in enumerate(cfg.dac_encoder_ratios):
        dec.setdefault("block", {})[str(i)] = {
            "snake1": init_snake(dec_in[i]),
            "conv_t1": init_conv_transpose1d(next(ks), dec_in[i],
                                             dec_out[i], 2 * s),
            "res_unit1": _init_resunit(ks, dec_out[i]),
            "res_unit2": _init_resunit(ks, dec_out[i]),
            "res_unit3": _init_resunit(ks, dec_out[i])}
    dec["snake1"] = init_snake(dec_out[-1])
    dec["conv2"] = init_conv1d(next(ks), dec_out[-1], 1, 7)

    quant = {"quantizers": {str(i): {
        "project_in": init_linear(next(ks), cfg.latent_dim,
                                  cfg.codebook_dim),
        "codebook": {"weight": jax.random.normal(
            next(ks), (cfg.codebook_size, cfg.codebook_dim)) * 0.1},
        "project_out": init_linear(next(ks), cfg.codebook_dim,
                                   cfg.latent_dim)}
        for i in range(cfg.dac_num_codebooks)}}
    p = {"acoustic_encoder": enc, "acoustic_decoder": dec,
         "quantizer": quant,
         "fc2": init_linear(next(ks), cfg.latent_dim, cfg.fusion_dim)}
    if cfg.semantic_model_config is not None:
        w2v = W2VConfig.from_dict(cfg.semantic_model_config)
        hs = w2v.hidden_size
        sem = {"conv": init_conv1d(next(ks), hs, hs, cfg.kernel_size,
                                   bias=False)}
        for i, (s, d, r) in enumerate(zip(cfg.strides,
                                          cfg.block_dilations,
                                          cfg.channel_ratios)):
            dim = hs * r
            sem.setdefault("conv_blocks", {})[str(i)] = {
                "res_units": {"0": {
                    "conv1": init_conv1d(next(ks), dim, dim,
                                         cfg.unit_kernel_size,
                                         bias=False),
                    "conv2": init_conv1d(next(ks), dim, dim, 1,
                                         bias=False)},
                    "1": {
                        "conv1": init_conv1d(next(ks), dim, dim,
                                             cfg.unit_kernel_size,
                                             bias=False),
                        "conv2": init_conv1d(next(ks), dim, dim, 1,
                                             bias=False)}},
                "conv": init_conv1d(next(ks), dim, dim, cfg.kernel_size)}
        p["semantic_model"] = init_wav2vec2(next(ks), w2v)
        p["encoder_semantic"] = sem
        p["fc"] = init_linear(next(ks), hs + cfg.fusion_dim,
                              hs + cfg.fusion_dim)
    return p


# ------------------------------------------------------------------ paths

def rvq_decode(p: dict, codes: Array, n_books: int) -> Array:
    """codes (B, T, n_books) -> (B, T, latent_dim)."""
    out = None
    for i in range(n_books):
        q = p["quantizers"][str(i)]
        e = apply_linear(q["project_out"],
                         q["codebook"]["weight"][codes[..., i]])
        out = e if out is None else out + e
    return out


def rvq_encode(p: dict, z: Array, n_books: int) -> Array:
    residual = z
    codes = []
    for i in range(n_books):
        q = p["quantizers"][str(i)]
        zq = apply_linear(q["project_in"], residual)
        cb = q["codebook"]["weight"]
        d = (jnp.sum(zq * zq, -1, keepdims=True)
             - 2 * (zq @ cb.T) + jnp.sum(cb * cb, -1)[None, None])
        idx = jnp.argmin(d, axis=-1)
        codes.append(idx)
        residual = residual - apply_linear(q["project_out"], cb[idx])
    return jnp.stack(codes, axis=-1).astype(jnp.int32)


def acoustic_decode(p: dict, cfg: ModelConfig, z: Array) -> Array:
    """(B, T, fusion_dim) -> (B, T*hop, 1)."""
    x = apply_conv1d(p["conv1"], z, padding=3)
    for i, s in enumerate(cfg.dac_encoder_ratios):
        blk = p["block"][str(i)]
        t_in = x.shape[1]
        x = apply_snake(blk["snake1"], x)
        x = apply_conv_transpose1d(blk["conv_t1"], x, stride=s,
                                   padding=s // 2)
        x = x[:, : t_in * s]
        for j, dil in enumerate((1, 3, 9)):
            x = _resunit(blk[f"res_unit{j + 1}"], x, dil)
    x = apply_snake(p["snake1"], x)
    return apply_conv1d(p["conv2"], x, padding=3)


def acoustic_encode(p: dict, cfg: ModelConfig, wav: Array) -> Array:
    """(B, T, 1) -> (B, T//hop, fusion_dim)."""
    x = apply_conv1d(p["conv1"], wav, padding=3)
    for i, s in enumerate(cfg.dac_encoder_ratios):
        blk = p["block"][str(i)]
        for j, dil in enumerate((1, 3, 9)):
            x = _resunit(blk[f"res_unit{j + 1}"], x, dil)
        x = apply_snake(blk["snake1"], x)
        x = apply_conv1d(blk["conv1"], x, stride=s,
                         padding=math.ceil(s / 2))
    x = apply_snake(p["snake1"], x)
    return apply_conv1d(p["conv2"], x, padding=1)


def hubert_hidden_mean(p: dict, cfg: W2VConfig, wave: Array,
                       num_samples: Array) -> Array:
    """Mean over ALL encoder hidden states (HF output_hidden_states)."""
    feats, n = _feature_encoder(p, cfg, wave, num_samples)
    valid = jnp.arange(feats.shape[1])[None, :] < n[:, None]
    mask = valid.astype(feats.dtype)[..., None]
    fp = p["feature_projection"]
    x = apply_layer_norm(fp["layer_norm"], feats, eps=cfg.layer_norm_eps)
    x = apply_linear(fp["projection"], x) * mask
    enc = p["encoder"]
    x = (x + _pos_conv(enc["pos_conv_embed"], cfg, x)) * mask
    if not cfg.do_stable_layer_norm:
        x = apply_layer_norm(enc["layer_norm"], x, eps=cfg.layer_norm_eps)
    bias_mask = jnp.where(valid, 0.0, jnp.finfo(x.dtype).min)
    acc = x
    for i in range(cfg.num_hidden_layers):
        lp = enc["layers"][str(i)]
        if cfg.do_stable_layer_norm:
            h = apply_layer_norm(lp["layer_norm"], x,
                                 eps=cfg.layer_norm_eps)
            x = x + _attention(lp["attention"], h,
                               cfg.num_attention_heads, bias_mask)
            x = x + _ffn(lp["feed_forward"],
                         apply_layer_norm(lp["final_layer_norm"], x,
                                          eps=cfg.layer_norm_eps))
        else:
            x = x + _attention(lp["attention"], x,
                               cfg.num_attention_heads, bias_mask)
            x = apply_layer_norm(lp["layer_norm"], x,
                                 eps=cfg.layer_norm_eps)
            x = x + _ffn(lp["feed_forward"], x)
            x = apply_layer_norm(lp["final_layer_norm"], x,
                                 eps=cfg.layer_norm_eps)
        x = x * mask
        acc = acc + x
    return acc / (cfg.num_hidden_layers + 1)


def semantic_encode(p: dict, cfg: ModelConfig, feats: Array) -> Array:
    """(B, T, H) HuBERT features -> (B, T, H) (SemanticEncoder CNN)."""
    pad = (cfg.kernel_size - 1) // 2
    x = apply_conv1d(p["conv"], feats, padding=pad)
    for i, (s, d, r) in enumerate(zip(cfg.strides, cfg.block_dilations,
                                      cfg.channel_ratios)):
        blk = p["conv_blocks"][str(i)]
        for j in range(2):
            ru = blk["res_units"][str(j)]
            upad = (cfg.unit_kernel_size - 1) * d // 2
            y = jax.nn.elu(x)
            y = apply_conv1d(ru["conv1"], y, padding=upad, dilation=d)
            y = jax.nn.elu(y)
            y = apply_conv1d(ru["conv2"], y)
            x = x + y
        x = apply_conv1d(blk["conv"], x, stride=s, padding=pad)
    return x


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
        return self.config.sample_rate

    def init_params(self, key):
        return init_higgs(key, self.config)

    def decode(self, tokens: np.ndarray) -> np.ndarray:
        """(T, n_books) int codes -> (T*hop,) waveform."""
        cfg = self.config
        tokens = np.asarray(tokens, np.int32)
        if tokens.ndim == 2:
            tokens = tokens[None]
        n = tokens.shape[1]
        # exact-shape compile: the decoder is non-causal, so zero-token
        # bucket padding would leak into the interior (reference decodes
        # exact lengths too)
        fn = self._jit_cache.get(("dec", n))
        if fn is None:
            def run(p, c):
                z = rvq_decode(p["quantizer"], c, cfg.dac_num_codebooks)
                z = apply_linear(p["fc2"], z)
                return acoustic_decode(p["acoustic_decoder"], cfg, z)
            fn = jax.jit(run)
            self._jit_cache[("dec", n)] = fn
        wav = np.asarray(fn(self.params, jnp.asarray(tokens)))
        return wav[0, : n * cfg.acoustic_hop, 0]

    def encode(self, waveform: np.ndarray) -> np.ndarray:
        """(T,) 24 kHz waveform -> (T', n_books) int codes."""
        cfg = self.config
        if "semantic_model" not in self.params:
            raise RuntimeError("encode requires semantic_model_config "
                               "(HuBERT weights) in the checkpoint")
        from ....utils import resample_audio
        wav = np.asarray(waveform, np.float32).reshape(-1)
        wav16 = np.asarray(resample_audio(wav, cfg.sample_rate,
                                          cfg.semantic_sample_rate),
                           np.float32)
        pad = cfg.downsample_factor // 2
        wav16 = np.pad(wav16, (pad, pad))
        w2v = W2VConfig.from_dict(cfg.semantic_model_config)
        fn = self._jit_cache.get(("enc", len(wav), len(wav16)))
        if fn is None:
            def run(p, w24, w16, n16):
                sem = hubert_hidden_mean(p["semantic_model"], w2v, w16,
                                         n16)
                sem = sem[:, ::cfg.semantic_downsample_factor]
                sem = semantic_encode(p["encoder_semantic"], cfg, sem)
                ac = acoustic_encode(p["acoustic_encoder"], cfg, w24)
                t = min(sem.shape[1], ac.shape[1])
                emb = jnp.concatenate([ac[:, :t], sem[:, :t]], axis=-1)
                emb = apply_linear(p["fc"], emb)
                return rvq_encode(p["quantizer"], emb,
                                  cfg.dac_num_codebooks)
            fn = jax.jit(run)
            self._jit_cache[("enc", len(wav), len(wav16))] = fn
        codes = fn(self.params, jnp.asarray(wav[None, :, None]),
                   jnp.asarray(wav16[None]), jnp.asarray([len(wav16)]))
        return np.asarray(codes)[0]

    # ---------------------------------------------------------- loading

    def sanitize(self, weights: Dict) -> Dict:
        """Reference keep/drop/transform rules (:182-250), mapped to the
        functional channel-last layouts."""
        keep = ("acoustic_encoder.", "acoustic_decoder.", "quantizer.",
                "fc2.", "semantic_model.", "encoder_semantic.")
        out = {}
        sem_raw = {}
        for k, v in weights.items():
            if k in ("semantic_model.masked_spec_embed",):
                continue
            if k.startswith(("decoder_semantic.", "fc1.")):
                continue
            if not (any(k.startswith(p) for p in keep)
                    or k in ("fc.weight", "fc.bias")):
                continue
            if k.endswith((".embed_avg", ".cluster_size", ".inited")):
                continue
            v = jnp.asarray(v)
            if k.startswith("semantic_model."):
                sem_raw[k[len("semantic_model."):]] = v
                continue
            if k.endswith(".codebook.embed"):
                k = k[: -len("embed")] + "weight"
            if k.endswith(".weight") and v.ndim == 3:
                kern = self._expected_kernel(k)
                if kern is not None and v.shape[0] != kern:
                    if ".conv_t" in k:        # torch (I, O, K)
                        from ....nn.layers import \
                            convert_torch_conv_transpose_weight
                        v = convert_torch_conv_transpose_weight(v)
                    else:                     # torch (O, I, K) -> WIO
                        v = jnp.transpose(v, (2, 1, 0))
            if k.endswith(".alpha"):
                v = v.reshape(-1)
            out[k] = v
        if sem_raw:
            for k, v in sanitize_wav2vec2(sem_raw,
                                          strip_prefix=False).items():
                out[f"semantic_model.{k}"] = v
        return out

    def _expected_kernel(self, k: str):
        """WIO kernel size expected at this key. Key-aware because tiny
        configs make shape heuristics ambiguous (e.g. 4-channel k7)."""
        import re
        cfg = self.config
        if ".res_unit" in k and ".res_units." not in k:
            return 7 if k.endswith("conv1.weight") else 1
        if ".res_units." in k:
            return cfg.unit_kernel_size if k.endswith("conv1.weight") \
                else 1
        m = re.search(r"\.block\.(\d+)\.conv_t1\.weight$", k)
        if m:
            return 2 * cfg.dac_encoder_ratios[int(m.group(1))]
        m = re.search(r"\.block\.(\d+)\.conv1\.weight$", k)
        if m:
            return 2 * cfg.dac_encoder_ratios[int(m.group(1))]
        if k in ("acoustic_encoder.conv1.weight",
                 "acoustic_decoder.conv1.weight",
                 "acoustic_decoder.conv2.weight"):
            return 7
        if k == "acoustic_encoder.conv2.weight":
            return 3
        if k.startswith("encoder_semantic.") and k.endswith(".weight"):
            return cfg.kernel_size
        return None



HiggsAudioTokenizer = Model


__all__ = ["Model", "ModelConfig", "HiggsAudioTokenizer", "rvq_decode",
           "rvq_encode", "acoustic_decode", "acoustic_encode",
           "hubert_hidden_mean", "semantic_encode", "init_higgs"]
