"""Confucius4 (o4-TTS): w2v-BERT cond -> GPT-2 semantic -> S2A flow -> BigVGAN.

Parity: /root/reference/mlx_audio/tts/models/confucius4/
(w2vbert.py conformer hidden-17 extractor, prefix.py ECAPA speaker encoder +
text projector, t2s.py GPT-2 semantic decoder with rep-penalty sampling,
s2a.py U-Net DiT + WaveNet flow estimator with CFG Euler solve, vocoder.py
anti-aliased SnakeBeta BigVGAN, features.py SeamlessM4T fbank-160,
confucius4.py end-to-end generate with CAMPPlus style vector).

Components self-load from split safetensors in the model dir (the upstream
release format); each stage is one jitted program over its flat param dict.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Generator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....model import FunctionalModel
from ..base import GenerationResult, format_duration, peak_memory_gb
from ..chatterbox.s3gen.xvector import (
    CAMPPlusConfig,
    campplus_forward,
    init_campplus,
    kaldi_fbank,
)

Array = jax.Array

LANGUAGE_TOKEN = {
    "zh": "请用中文朗读接下来的文字",
    "en": "请用英文朗读接下来的文字",
    "vi": "请用越南语朗读接下来的文字",
    "ja": "请用日语朗读接下来的文字",
    "ko": "请用韩语朗读接下来的文字",
    "th": "请用泰语朗读接下来的文字",
}

BOS, EOS = 8192, 8193


@dataclass
class ModelConfig(BaseModelArgs):
    model_path: str = ""
    sample_rate: int = 22050
    model_type: str = "confucius4"
    # dims (upstream release values; overridable for tiny tests)
    w2v_hidden: int = 1024
    w2v_heads: int = 16
    w2v_layers: int = 17
    t2s_layers: int = 24
    t2s_heads: int = 20
    t2s_dim: int = 1280
    s2a_depth: int = 22
    s2a_hidden: int = 512
    s2a_heads: int = 8
    voc_ups: tuple = (4, 4, 2, 2, 2, 2)
    voc_up_kernels: tuple = (8, 8, 4, 4, 4, 4)
    voc_channels: int = 1536


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rms(x, w, eps=1e-5):
    return x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + eps) * w


def _lin(x, w, b=None):
    y = x @ w.T
    return y + b if b is not None else y


def _conv1d(x, w_oik, b=None, pad=0, dilation=1, stride=1, groups=1):
    """x (B, T, C); torch weight (O, I/g, K)."""
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    w = jnp.transpose(w_oik, (2, 1, 0))  # (K, I/g, O)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)
    return y + b if b is not None else y


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


# ------------------------------------------------------------- w2v-BERT

def w2v_hidden17(W: Dict[str, Array], cfg: ModelConfig, feats: Array
                 ) -> Array:
    """(1, T, 160) fbank -> hidden_states[w2v_layers] (1, T, H)."""
    H = cfg.w2v_hidden
    NH = cfg.w2v_heads
    HD = H // NH
    x = _ln(feats, W["feature_projection.layer_norm.weight"],
            W["feature_projection.layer_norm.bias"])
    x = _lin(x, W["feature_projection.projection.weight"],
             W["feature_projection.projection.bias"])
    for i in range(cfg.w2v_layers):
        p = f"encoder.layers.{i}."
        h = _ln(x, W[p + "ffn1_layer_norm.weight"],
                W[p + "ffn1_layer_norm.bias"])
        h = _swish(_lin(h, W[p + "ffn1.intermediate_dense.weight"],
                        W[p + "ffn1.intermediate_dense.bias"]))
        x = x + 0.5 * _lin(h, W[p + "ffn1.output_dense.weight"],
                           W[p + "ffn1.output_dense.bias"])
        # relative-key self attention
        b_, t_, _ = x.shape
        hn = _ln(x, W[p + "self_attn_layer_norm.weight"],
                 W[p + "self_attn_layer_norm.bias"])
        q = _lin(hn, W[p + "self_attn.linear_q.weight"],
                 W[p + "self_attn.linear_q.bias"]).reshape(b_, t_, NH, HD) \
            .transpose(0, 2, 1, 3)
        k = _lin(hn, W[p + "self_attn.linear_k.weight"],
                 W[p + "self_attn.linear_k.bias"]).reshape(b_, t_, NH, HD) \
            .transpose(0, 2, 1, 3)
        v = _lin(hn, W[p + "self_attn.linear_v.weight"],
                 W[p + "self_attn.linear_v.bias"]).reshape(b_, t_, NH, HD) \
            .transpose(0, 2, 1, 3)
        scores = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(HD)
        li = jnp.arange(t_)[:, None]
        ri = jnp.arange(t_)[None, :]
        dist = jnp.clip(ri - li, -64, 8) + 64
        pe = W[p + "self_attn.distance_embedding.weight"][dist]
        scores = scores + jnp.einsum("bhld,lrd->bhlr", q, pe) / math.sqrt(HD)
        a = (jax.nn.softmax(scores, axis=-1) @ v).transpose(0, 2, 1, 3) \
            .reshape(b_, t_, H)
        x = x + _lin(a, W[p + "self_attn.linear_out.weight"],
                     W[p + "self_attn.linear_out.bias"])
        # causal depthwise conv module
        h = _ln(x, W[p + "conv_module.layer_norm.weight"],
                W[p + "conv_module.layer_norm.bias"])
        h = h @ W[p + "conv_module.pointwise_conv1.weight"][:, :, 0].T
        a1, a2 = jnp.split(h, 2, axis=-1)
        h = a1 * jax.nn.sigmoid(a2)
        dw = W[p + "conv_module.depthwise_conv.weight"]        # (H, 1, 31)
        kk = dw.shape[-1]
        hp = jnp.pad(h, ((0, 0), (kk - 1, 0), (0, 0)))
        h = _conv1d(hp, dw, groups=H)
        h = _ln(h, W[p + "conv_module.depthwise_layer_norm.weight"],
                W[p + "conv_module.depthwise_layer_norm.bias"])
        h = _swish(h)
        h = h @ W[p + "conv_module.pointwise_conv2.weight"][:, :, 0].T
        x = x + h
        h = _ln(x, W[p + "ffn2_layer_norm.weight"],
                W[p + "ffn2_layer_norm.bias"])
        h = _swish(_lin(h, W[p + "ffn2.intermediate_dense.weight"],
                        W[p + "ffn2.intermediate_dense.bias"]))
        x = x + 0.5 * _lin(h, W[p + "ffn2.output_dense.weight"],
                           W[p + "ffn2.output_dense.bias"])
        x = _ln(x, W[p + "final_layer_norm.weight"],
                W[p + "final_layer_norm.bias"])
    return x


# ----------------------------------------------------------- T2S prefix

def _reflect_pad_t(x, p):
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode="reflect")


def _conv_same(x, w, b, dilation=1, groups=1):
    k = w.shape[2]
    p = dilation * (k - 1) // 2
    return _conv1d(_reflect_pad_t(x, p), w, b, dilation=dilation,
                   groups=groups)


def prefix_text_emb(W: Dict[str, Array], token_ids: Array) -> Array:
    e = W["text_projector.embed.weight"][token_ids]
    e = jax.nn.silu(_lin(e, W["text_projector.text_projection_fc1.weight"],
                         W["text_projector.text_projection_fc1.bias"]))
    e = _lin(e, W["text_projector.text_projection_fc2.weight"],
             W["text_projector.text_projection_fc2.bias"])
    t = token_ids.shape[1]
    return e + W["text_position_embedding.embedding.weight"][:t][None]


def prefix_cond_emb(W: Dict[str, Array], cond_vec: Array) -> Array:
    """ECAPA speaker encoder over w2v features -> (1, 1, t2s_dim)."""
    def tdnn(x, p, dilation=1):
        return jax.nn.relu(_conv_same(x, W[p + ".conv.weight"],
                                      W[p + ".conv.bias"],
                                      dilation=dilation))

    def res2net(x, p, dilation, scale=8):
        chunks = jnp.split(x, scale, axis=2)
        outs, prev = [], None
        for i in range(scale):
            if i == 0:
                o = chunks[0]
            elif i == 1:
                o = tdnn(chunks[1], f"{p}.blocks.0", dilation)
            else:
                o = tdnn(chunks[i] + prev, f"{p}.blocks.{i - 1}", dilation)
            outs.append(o)
            prev = o
        return jnp.concatenate(outs, axis=2)

    def se(x, p):
        s = x.mean(axis=1, keepdims=True)
        s = jax.nn.relu(_conv_same(s, W[p + ".conv1.weight"],
                                   W[p + ".conv1.bias"]))
        s = jax.nn.sigmoid(_conv_same(s, W[p + ".conv2.weight"],
                                      W[p + ".conv2.bias"]))
        return x * s

    x = tdnn(cond_vec, "speaker_encoder.blocks.0", 1)
    feats = []
    for i in range(1, 4):
        p = f"speaker_encoder.blocks.{i}"
        r = x
        h = tdnn(x, p + ".tdnn1")
        h = res2net(h, p + ".res2net_block", i + 1)
        h = tdnn(h, p + ".tdnn2")
        x = se(h, p + ".se_block") + r
        feats.append(x)
    x = jnp.concatenate(feats, axis=2)
    x = tdnn(x, "speaker_encoder.mfa")
    b_, t_, c_ = x.shape
    m = jnp.full((b_, t_, 1), 1.0 / t_)
    mean = (m * x).sum(axis=1)
    std = jnp.sqrt(jnp.maximum(
        (m * (x - mean[:, None]) ** 2).sum(axis=1), 1e-12))
    att_in = jnp.concatenate(
        [x, jnp.broadcast_to(mean[:, None], (b_, t_, c_)),
         jnp.broadcast_to(std[:, None], (b_, t_, c_))], axis=2)
    h = jnp.tanh(tdnn(att_in, "speaker_encoder.asp.tdnn"))
    h = _conv_same(h, W["speaker_encoder.asp.conv.weight"],
                   W["speaker_encoder.asp.conv.bias"])
    att = jax.nn.softmax(h, axis=1)
    mean = (att * x).sum(axis=1)
    std = jnp.sqrt(jnp.maximum(
        (att * (x - mean[:, None]) ** 2).sum(axis=1), 1e-12))
    pooled = jnp.concatenate([mean, std], axis=1)[:, None]
    return _conv_same(pooled, W["speaker_encoder.fc.weight"],
                      W["speaker_encoder.fc.bias"])


# ------------------------------------------------------------- T2S GPT2

def _gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def t2s_transformer(W: Dict[str, Array], cfg: ModelConfig, x: Array,
                    caches=None, mask=None):
    """GPT-2 stack over embeds; caches = list[(k, v)] grow-by-concat
    (host loop is numpy-driven; sequences are short semantic streams)."""
    NH = cfg.t2s_heads
    D = cfg.t2s_dim
    HD = D // NH
    out_caches = []
    for i in range(cfg.t2s_layers):
        p = f"transformer.h.{i}."
        h = _ln(x, W[p + "ln_1.weight"], W[p + "ln_1.bias"])
        qkv = h @ W[p + "attn.c_attn.weight"] + W[p + "attn.c_attn.bias"]
        b_, t_, _ = qkv.shape
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b_, t_, NH, HD).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if caches is not None and caches[i][0] is not None:
            k = jnp.concatenate([caches[i][0], k], axis=2)
            v = jnp.concatenate([caches[i][1], v], axis=2)
        out_caches.append((k, v))
        scores = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(HD)
        if mask is not None:
            scores = scores + mask
        o = (jax.nn.softmax(scores, axis=-1) @ v).transpose(0, 2, 1, 3) \
            .reshape(b_, t_, D)
        x = x + (o @ W[p + "attn.c_proj.weight"] + W[p + "attn.c_proj.bias"])
        h = _ln(x, W[p + "ln_2.weight"], W[p + "ln_2.bias"])
        h = _gelu_new(h @ W[p + "mlp.c_fc.weight"] + W[p + "mlp.c_fc.bias"])
        x = x + (h @ W[p + "mlp.c_proj.weight"] + W[p + "mlp.c_proj.bias"])
    h = _ln(x, W["transformer.ln_f.weight"], W["transformer.ln_f.bias"])
    return h, out_caches


def t2s_head(W: Dict[str, Array], h: Array) -> Array:
    h = _ln(h, W["final_norm.weight"], W["final_norm.bias"])
    return h @ W["semantic_head.weight"].T + W["semantic_head.bias"]


# ---------------------------------------------------------------- model

class Model(FunctionalModel):
    """Confucius4 multilingual voice-cloning TTS (22.05 kHz)."""

    def __init__(self, config: ModelConfig = None, **kwargs):
        if config is None:
            config = ModelConfig.from_dict(kwargs) if kwargs else \
                ModelConfig()
        elif isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        super().__init__(config)
        self.camp_cfg = CAMPPlusConfig(feat_dim=80, embedding_size=192)
        self._tok = None
        self.w2v_stats = None
        self._fbank_aux = None       # (mel matrix, povey window)

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    # ------------------------------------------------------------ params

    def init_params(self, key):
        """Random tiny-init of the flat component dicts (tests/bench).
        Real checkpoints load via post_load_hook from split safetensors."""
        cfg = self.config
        rng = np.random.RandomState(0)

        def rnd(*shape):
            return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.02)

        H = cfg.w2v_hidden
        w2v = {"feature_projection.layer_norm.weight": jnp.ones(160),
               "feature_projection.layer_norm.bias": jnp.zeros(160),
               "feature_projection.projection.weight": rnd(H, 160),
               "feature_projection.projection.bias": jnp.zeros(H)}
        for i in range(cfg.w2v_layers):
            p = f"encoder.layers.{i}."
            w2v.update({
                p + "ffn1_layer_norm.weight": jnp.ones(H),
                p + "ffn1_layer_norm.bias": jnp.zeros(H),
                p + "ffn1.intermediate_dense.weight": rnd(2 * H, H),
                p + "ffn1.intermediate_dense.bias": jnp.zeros(2 * H),
                p + "ffn1.output_dense.weight": rnd(H, 2 * H),
                p + "ffn1.output_dense.bias": jnp.zeros(H),
                p + "self_attn_layer_norm.weight": jnp.ones(H),
                p + "self_attn_layer_norm.bias": jnp.zeros(H),
                p + "self_attn.linear_q.weight": rnd(H, H),
                p + "self_attn.linear_q.bias": jnp.zeros(H),
                p + "self_attn.linear_k.weight": rnd(H, H),
                p + "self_attn.linear_k.bias": jnp.zeros(H),
                p + "self_attn.linear_v.weight": rnd(H, H),
                p + "self_attn.linear_v.bias": jnp.zeros(H),
                p + "self_attn.linear_out.weight": rnd(H, H),
                p + "self_attn.linear_out.bias": jnp.zeros(H),
                p + "self_attn.distance_embedding.weight": rnd(
                    73, H // cfg.w2v_heads),
                p + "conv_module.layer_norm.weight": jnp.ones(H),
                p + "conv_module.layer_norm.bias": jnp.zeros(H),
                p + "conv_module.pointwise_conv1.weight": rnd(2 * H, H, 1),
                p + "conv_module.depthwise_conv.weight": rnd(H, 1, 31),
                p + "conv_module.depthwise_layer_norm.weight": jnp.ones(H),
                p + "conv_module.depthwise_layer_norm.bias": jnp.zeros(H),
                p + "conv_module.pointwise_conv2.weight": rnd(H, H, 1),
                p + "ffn2_layer_norm.weight": jnp.ones(H),
                p + "ffn2_layer_norm.bias": jnp.zeros(H),
                p + "ffn2.intermediate_dense.weight": rnd(2 * H, H),
                p + "ffn2.intermediate_dense.bias": jnp.zeros(2 * H),
                p + "ffn2.output_dense.weight": rnd(H, 2 * H),
                p + "ffn2.output_dense.bias": jnp.zeros(H),
                p + "final_layer_norm.weight": jnp.ones(H),
                p + "final_layer_norm.bias": jnp.zeros(H)})

        D = cfg.t2s_dim
        t2s = {"semantic_embedding.weight": rnd(8194, D),
               "semantic_position_embedding.embedding.weight": rnd(4096, D),
               "transformer.ln_f.weight": jnp.ones(D),
               "transformer.ln_f.bias": jnp.zeros(D),
               "final_norm.weight": jnp.ones(D),
               "final_norm.bias": jnp.zeros(D),
               "semantic_head.weight": rnd(8194, D),
               "semantic_head.bias": jnp.zeros(8194),
               "text_projector.embed.weight": rnd(1000, 64),
               "text_projector.text_projection_fc1.weight": rnd(64, 64),
               "text_projector.text_projection_fc1.bias": jnp.zeros(64),
               "text_projector.text_projection_fc2.weight": rnd(D, 64),
               "text_projector.text_projection_fc2.bias": jnp.zeros(D),
               "text_position_embedding.embedding.weight": rnd(4096, D)}
        for i in range(cfg.t2s_layers):
            p = f"transformer.h.{i}."
            t2s.update({
                p + "ln_1.weight": jnp.ones(D), p + "ln_1.bias": jnp.zeros(D),
                p + "attn.c_attn.weight": rnd(D, 3 * D),
                p + "attn.c_attn.bias": jnp.zeros(3 * D),
                p + "attn.c_proj.weight": rnd(D, D),
                p + "attn.c_proj.bias": jnp.zeros(D),
                p + "ln_2.weight": jnp.ones(D), p + "ln_2.bias": jnp.zeros(D),
                p + "mlp.c_fc.weight": rnd(D, 4 * D),
                p + "mlp.c_fc.bias": jnp.zeros(4 * D),
                p + "mlp.c_proj.weight": rnd(4 * D, D),
                p + "mlp.c_proj.bias": jnp.zeros(D)})
        # ECAPA speaker encoder (channels tied to H for tests)
        C = min(cfg.w2v_hidden, 512)
        t2s.update({
            "speaker_encoder.blocks.0.conv.weight": rnd(C, H, 5),
            "speaker_encoder.blocks.0.conv.bias": jnp.zeros(C)})
        for i in range(1, 4):
            p = f"speaker_encoder.blocks.{i}"
            t2s.update({
                p + ".tdnn1.conv.weight": rnd(C, C, 1),
                p + ".tdnn1.conv.bias": jnp.zeros(C),
                p + ".tdnn2.conv.weight": rnd(C, C, 1),
                p + ".tdnn2.conv.bias": jnp.zeros(C),
                p + ".se_block.conv1.weight": rnd(C // 4, C, 1),
                p + ".se_block.conv1.bias": jnp.zeros(C // 4),
                p + ".se_block.conv2.weight": rnd(C, C // 4, 1),
                p + ".se_block.conv2.bias": jnp.zeros(C)})
            for j in range(7):
                t2s.update({
                    p + f".res2net_block.blocks.{j}.conv.weight": rnd(
                        C // 8, C // 8, 3),
                    p + f".res2net_block.blocks.{j}.conv.bias": jnp.zeros(
                        C // 8)})
        t2s.update({
            "speaker_encoder.mfa.conv.weight": rnd(C * 3, C * 3, 1),
            "speaker_encoder.mfa.conv.bias": jnp.zeros(C * 3),
            "speaker_encoder.asp.tdnn.conv.weight": rnd(128, C * 9, 1),
            "speaker_encoder.asp.tdnn.conv.bias": jnp.zeros(128),
            "speaker_encoder.asp.conv.weight": rnd(C * 3, 128, 1),
            "speaker_encoder.asp.conv.bias": jnp.zeros(C * 3),
            "speaker_encoder.fc.weight": rnd(D, C * 6, 1),
            "speaker_encoder.fc.bias": jnp.zeros(D)})

        s2a = self._init_s2a(rng)
        voc = self._init_voc(rng)
        camp = init_campplus(key, self.camp_cfg)
        return {"w2v": w2v, "t2s": t2s, "s2a": s2a, "voc": voc,
                "camp": camp}

    def _init_s2a(self, rng):
        cfg = self.config

        def rnd(*shape):
            return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.02)

        HID = cfg.s2a_hidden
        pos = np.arange(4096)[:, None] * (
            1.0 / 10000 ** (np.arange(HID // cfg.s2a_heads // 2)
                            / (HID // cfg.s2a_heads // 2)))
        s2a = {
            "decoder.estimator.freqs_cis": jnp.asarray(
                np.stack([np.cos(pos), np.sin(pos)], -1).astype(np.float32)),
            "input_embedding.embedding.weight": rnd(8194, 8),
            "input_embedding.out_project.weight": rnd(1024, 8, 1),
            "input_embedding.out_project.bias": jnp.zeros(1024),
            "encoder_proj.weight": rnd(1024, cfg.t2s_dim + 1024),
            "encoder_proj.bias": jnp.zeros(1024),
            "length_regulator.content_in_proj.weight": rnd(HID, 1024),
            "length_regulator.content_in_proj.bias": jnp.zeros(HID),
            "length_regulator.model.12.weight": rnd(HID, HID, 1),
            "length_regulator.model.12.bias": jnp.zeros(HID),
            "prompt_cond": rnd(1, 1, HID),
            "decoder.estimator.t_embedder.time_mlp.0.weight": rnd(HID, 256),
            "decoder.estimator.t_embedder.time_mlp.0.bias": jnp.zeros(HID),
            "decoder.estimator.t_embedder.time_mlp.2.weight": rnd(HID, HID),
            "decoder.estimator.t_embedder.time_mlp.2.bias": jnp.zeros(HID),
            "decoder.estimator.t_embedder2.time_mlp.0.weight": rnd(HID, 256),
            "decoder.estimator.t_embedder2.time_mlp.0.bias": jnp.zeros(HID),
            "decoder.estimator.t_embedder2.time_mlp.2.weight": rnd(HID,
                                                                   HID),
            "decoder.estimator.t_embedder2.time_mlp.2.bias": jnp.zeros(HID),
            "decoder.estimator.input_embed.mu_projection.weight": rnd(
                HID, HID),
            "decoder.estimator.input_embed.mu_projection.bias": jnp.zeros(
                HID),
            "decoder.estimator.input_embed.proj.weight": rnd(
                HID, 80 + 80 + HID + 192),
            "decoder.estimator.input_embed.proj.bias": jnp.zeros(HID),
            "decoder.estimator.transformer_norm.norm.weight": jnp.ones(HID),
            "decoder.estimator.transformer_norm.modulation.weight": rnd(
                2 * HID, HID),
            "decoder.estimator.transformer_norm.modulation.bias": jnp.zeros(
                2 * HID),
            "decoder.estimator.skip_linear.weight": rnd(HID, HID + 80),
            "decoder.estimator.skip_linear.bias": jnp.zeros(HID),
            "decoder.estimator.conv1.weight": rnd(HID, HID),
            "decoder.estimator.conv1.bias": jnp.zeros(HID),
            "decoder.estimator.res_projection.weight": rnd(HID, HID),
            "decoder.estimator.res_projection.bias": jnp.zeros(HID),
            "decoder.estimator.final_layer.linear.weight": rnd(HID, HID),
            "decoder.estimator.final_layer.linear.bias": jnp.zeros(HID),
            "decoder.estimator.final_layer.adaLN_modulation.1.weight": rnd(
                2 * HID, HID),
            "decoder.estimator.final_layer.adaLN_modulation.1.bias":
                jnp.zeros(2 * HID),
            "decoder.estimator.conv2.weight": rnd(80, HID, 1),
            "decoder.estimator.conv2.bias": jnp.zeros(80),
            "decoder.estimator.wavenet.cond_layer.conv.weight": rnd(
                16 * HID, HID, 1),
            "decoder.estimator.wavenet.cond_layer.conv.bias": jnp.zeros(
                16 * HID),
        }
        for gi, ci in [(1, 0), (4, 3), (7, 6), (10, 9)]:
            s2a[f"length_regulator.model.{ci}.weight"] = rnd(HID, HID, 3)
            s2a[f"length_regulator.model.{ci}.bias"] = jnp.zeros(HID)
            s2a[f"length_regulator.model.{gi}.weight"] = jnp.ones(HID)
            s2a[f"length_regulator.model.{gi}.bias"] = jnp.zeros(HID)
        for i in range(8):
            s2a[f"decoder.estimator.wavenet.in_layers.{i}.conv.weight"] = \
                rnd(2 * HID, HID, 5)
            s2a[f"decoder.estimator.wavenet.in_layers.{i}.conv.bias"] = \
                jnp.zeros(2 * HID)
            out_ch = 2 * HID if i < 7 else HID
            s2a[f"decoder.estimator.wavenet.res_skip_layers.{i}.conv"
                ".weight"] = rnd(out_ch, HID, 1)
            s2a[f"decoder.estimator.wavenet.res_skip_layers.{i}.conv"
                ".bias"] = jnp.zeros(out_ch)
        for idx in range(cfg.s2a_depth):
            p = f"decoder.estimator.transformer_blocks.{idx}."
            s2a.update({
                p + "attention_norm.norm.weight": jnp.ones(HID),
                p + "attention_norm.modulation.weight": rnd(2 * HID, HID),
                p + "attention_norm.modulation.bias": jnp.zeros(2 * HID),
                p + "attention.wqkv.weight": rnd(3 * HID, HID),
                p + "attention.wo.weight": rnd(HID, HID),
                p + "ffn_norm.norm.weight": jnp.ones(HID),
                p + "ffn_norm.modulation.weight": rnd(2 * HID, HID),
                p + "ffn_norm.modulation.bias": jnp.zeros(2 * HID),
                p + "feed_forward.w1.weight": rnd(2 * HID, HID),
                p + "feed_forward.w2.weight": rnd(HID, 2 * HID),
                p + "feed_forward.w3.weight": rnd(2 * HID, HID)})
            if idx > cfg.s2a_depth // 2:
                s2a[p + "skip_in_linear.weight"] = rnd(HID, 2 * HID)
                s2a[p + "skip_in_linear.bias"] = jnp.zeros(HID)
        return s2a

    def _init_voc(self, rng):
        cfg = self.config

        def rnd(*shape):
            return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.02)

        ch = cfg.voc_channels
        voc = {"conv_pre.weight": rnd(ch, 80, 7),
               "conv_pre.bias": jnp.zeros(ch)}
        cur = ch
        filt = jnp.asarray(np.hamming(12).astype(np.float32) / 6.0)
        res_k = (3, 7, 11)
        res_d = (1, 3, 5)
        for i, (u, k) in enumerate(zip(cfg.voc_ups, cfg.voc_up_kernels)):
            voc[f"ups.{i}.0.weight"] = rnd(cur, cur // 2, k)
            voc[f"ups.{i}.0.bias"] = jnp.zeros(cur // 2)
            cur //= 2
            for j, rk in enumerate(res_k):
                p = f"resblocks.{i * 3 + j}."
                for jj, d in enumerate(res_d):
                    voc[p + f"convs1.{jj}.weight"] = rnd(cur, cur, rk)
                    voc[p + f"convs1.{jj}.bias"] = jnp.zeros(cur)
                    voc[p + f"convs2.{jj}.weight"] = rnd(cur, cur, rk)
                    voc[p + f"convs2.{jj}.bias"] = jnp.zeros(cur)
                    for a in (2 * jj, 2 * jj + 1):
                        ap = p + f"activations.{a}"
                        voc[ap + ".act.alpha"] = jnp.zeros(cur)
                        voc[ap + ".act.beta"] = jnp.zeros(cur)
                        voc[ap + ".upsample.filter"] = filt
                        voc[ap + ".downsample.lowpass.filter"] = filt
        voc["activation_post.act.alpha"] = jnp.zeros(cur)
        voc["activation_post.act.beta"] = jnp.zeros(cur)
        voc["activation_post.upsample.filter"] = filt
        voc["activation_post.downsample.lowpass.filter"] = filt
        voc["conv_post.weight"] = rnd(1, cur, 7)
        return voc

    def sanitize(self, weights):
        # components self-load from the model dir (split safetensors)
        return {}

    @classmethod
    def post_load_hook(cls, model, model_path):
        d = Path(model_path)
        import safetensors.numpy as stnp

        def load(name):
            return {k: jnp.asarray(v)
                    for k, v in stnp.load_file(str(d / name)).items()}

        try:
            t2s = load("t2s_model.safetensors")
            params = {
                "w2v": load("w2vbert_mlx.safetensors"),
                "t2s": t2s,
                "s2a": load("s2a_mlx.safetensors"),
                "voc": load("bigvgan_mlx.safetensors"),
                "camp": None,
            }
            camp_flat = load("campplus.safetensors")
            from ....utils import unflatten

            params["camp"] = unflatten(camp_flat)
            model.bind(params)
            model.w2v_stats = np.load(str(d / "w2v_stats.npz"))
            ff = np.load(str(d / "fbank_filters.npz"))
            model._fbank_aux = (np.asarray(ff["mel"]),
                                np.asarray(ff["window"]))
            from tokenizers import Tokenizer

            model._tok = Tokenizer.from_file(
                str(d / "checkpoints" / "tokenizer.json"))
        except Exception:
            pass
        return model

    # ---------------------------------------------------------- pipeline

    def fbank_160(self, audio: np.ndarray) -> np.ndarray:
        """SeamlessM4T fbank (ref features.py) — numpy, host-side."""
        if self._fbank_aux is None:
            # analytic povey window + kaldi mel as fallback
            n = 400
            win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) \
                ** 0.85
            from ....dsp import mel_filters

            mel = np.asarray(mel_filters(16000, 512, 80, mel_scale="htk")).T
            self._fbank_aux = (mel[:257], win.astype(np.float32))
        mel, window = self._fbank_aux
        wav = np.asarray(audio, np.float32) * (2 ** 15)
        frame, hop, nfft = 400, 160, 512
        nfr = 1 + (len(wav) - frame) // hop
        idx = np.arange(nfr)[:, None] * hop + np.arange(frame)
        frames = wav[idx]
        frames = frames - frames.mean(axis=1, keepdims=True)
        emph = np.concatenate(
            [frames[:, :1] * 0.03, frames[:, 1:] - 0.97 * frames[:, :-1]],
            axis=1) * window
        buf = np.concatenate([emph, np.zeros((nfr, nfft - frame))], axis=1)
        spec = np.abs(np.fft.rfft(buf, nfft, axis=1)) ** 2
        out = np.log(np.maximum(1.192092955078125e-07, spec @ mel))
        mean = out.mean(axis=0, keepdims=True)
        var = ((out - mean) ** 2).sum(axis=0, keepdims=True) / max(nfr - 1,
                                                                   1)
        out = (out - mean) / np.sqrt(var + 1e-7)
        n = nfr - (nfr % 2)
        return out[:n].reshape(1, n // 2, 160).astype(np.float32)

    def t2s_generate(self, cond_emb, text_emb, max_new=512,
                     temperature=0.8, top_k=30, top_p=0.8, rep_pen=10.0,
                     seed=0):
        """AR semantic decode (ref t2s.py:generate). Host sampler in numpy
        with full-history repetition penalty."""
        W = self.params["t2s"]
        cfg = self.config
        rng = np.random.default_rng(seed)
        prefix = jnp.concatenate([cond_emb, text_emb], axis=1)
        tt = text_emb.shape[1]

        def sem_embed(tok, pos):
            e = W["semantic_embedding.weight"][tok] + \
                W["semantic_position_embedding.embedding.weight"][pos]
            return e[None, None]

        x = jnp.concatenate([prefix, sem_embed(BOS, 0)], axis=1)
        t_ = x.shape[1]
        mask = jnp.triu(jnp.full((t_, t_), -1e9), k=1)[None, None]
        caches = [(None, None)] * cfg.t2s_layers
        h, caches = t2s_transformer(W, cfg, x, caches, mask)
        logits = np.asarray(t2s_head(W, h[:, -1:]))[0, -1]

        def sample(logits, gen):
            lg = np.asarray(logits, np.float64).copy()
            if gen and rep_pen != 1.0:
                g = np.asarray(sorted(set(gen)))
                lg[g] = np.where(lg[g] > 0, lg[g] / rep_pen, lg[g] * rep_pen)
            lg = lg / temperature
            if top_k and top_k < len(lg):
                kth = np.partition(lg, -top_k)[-top_k]
                lg[lg < kth] = -np.inf
            order = np.argsort(lg)[::-1]
            sp = lg[order]
            probs = np.exp(sp - sp.max())
            probs /= probs.sum()
            keep = np.cumsum(probs) <= top_p
            keep[0] = True
            sp[~keep] = -np.inf
            full = np.full_like(lg, -np.inf)
            full[order] = sp
            p = np.exp(full - np.nanmax(full))
            p /= p.sum()
            return int(rng.choice(len(p), p=p))

        cur = [BOS]
        pos = 1
        for _ in range(max_new):
            tok = sample(logits, cur[1:])
            cur.append(tok)
            if tok == EOS:
                break
            h, caches = t2s_transformer(W, cfg, sem_embed(tok, pos), caches)
            logits = np.asarray(t2s_head(W, h))[0, -1]
            pos += 1
        scodes = cur
        full_emb = W["semantic_embedding.weight"][jnp.asarray([scodes])] + \
            W["semantic_position_embedding.embedding.weight"][
                :len(scodes)][None]
        hful, _ = t2s_transformer(
            W, cfg, jnp.concatenate([prefix, full_emb], axis=1), None,
            jnp.triu(jnp.full((prefix.shape[1] + len(scodes),) * 2, -1e9),
                     k=1)[None, None])
        latent = hful[:, 1 + tt:-2]
        return np.asarray(scodes[1:-1], np.int64), np.asarray(latent)

    # (S2A + vocoder forwards live in s2a_forward/vocoder_forward below)

    def generate(self, text: str, ref_audio=None, lang: str = "vi",
                 temperature: float = 0.8, top_k: int = 30,
                 top_p: float = 0.8, repetition_penalty: float = 10.0,
                 seed: int = 0, **kwargs
                 ) -> Generator[GenerationResult, None, None]:
        from .s2a_voc import ref_mel_22k, s2a_build_mu, s2a_solve_euler, \
            vocoder_forward

        if ref_audio is None:
            raise ValueError("confucius4 requires ref_audio (voice clone)")
        t0 = time.time()
        cfg = self.config
        if isinstance(ref_audio, str):
            from ....utils import load_audio

            ref_audio = np.asarray(load_audio(ref_audio, sample_rate=16000))
        audio = np.asarray(ref_audio, np.float32).reshape(-1)

        feats = self.fbank_160(audio)
        h17 = np.asarray(w2v_hidden17(self.params["w2v"], cfg,
                                      jnp.asarray(feats)))
        if self.w2v_stats is not None:
            h17 = (h17 - self.w2v_stats["mean"]) / self.w2v_stats["std"]
        cond_vec = jnp.asarray(h17)
        fb = kaldi_fbank(audio, num_mel_bins=80)
        fb = fb - fb.mean(axis=0, keepdims=True)
        style = campplus_forward(self.params["camp"], self.camp_cfg,
                                 jnp.asarray(fb[None])).reshape(1, 192)
        ref_mel = ref_mel_22k(audio)

        lt = LANGUAGE_TOKEN.get(lang, LANGUAGE_TOKEN["en"])
        if self._tok is not None:
            ids = self._tok.encode(
                f"You are a helpful assistant. {lt}:{text}").ids
        else:
            ids = [10 + (ord(c) % 500) for c in text][:64]
        cond_emb = prefix_cond_emb(self.params["t2s"], cond_vec)
        text_emb = prefix_text_emb(self.params["t2s"],
                                   jnp.asarray([ids]))
        codes, latent = self.t2s_generate(
            cond_emb, text_emb, temperature=temperature, top_k=top_k,
            top_p=top_p, rep_pen=repetition_penalty, seed=seed,
            max_new=int(kwargs.get("max_tokens", 512)))
        if len(codes) == 0:
            codes = np.zeros((1,), np.int64)
            latent = np.zeros((1, 1, cfg.t2s_dim), np.float32)

        t_ref = ref_mel.shape[1]
        mu = s2a_build_mu(self.params["s2a"], cfg, jnp.asarray(codes[None]),
                          jnp.asarray(latent), t_ref)
        key = jax.random.PRNGKey(seed)
        z = jax.random.normal(key, (1, 80, mu.shape[1]))
        mel = s2a_solve_euler(
            self.params["s2a"], cfg, z,
            jnp.transpose(jnp.asarray(ref_mel), (0, 2, 1)), mu,
            jnp.asarray(style), np.linspace(0, 1, 26), cfg_scale=0.7
        )[:, :, t_ref:]
        wav = np.asarray(vocoder_forward(self.params["voc"], cfg,
                                         mel)).reshape(-1)

        dt = max(time.time() - t0, 1e-6)
        dur = len(wav) / cfg.sample_rate
        yield GenerationResult(
            audio=wav, samples=len(wav), sample_rate=cfg.sample_rate,
            segment_idx=0, token_count=len(codes),
            audio_duration=format_duration(dur),
            real_time_factor=round(dt / max(dur, 1e-6), 2),
            prompt={"tokens": len(codes),
                    "tokens-per-sec": round(len(codes) / dt, 2)},
            audio_samples={"samples": len(wav),
                           "samples-per-sec": round(len(wav) / dt, 2)},
            processing_time_seconds=round(dt, 2),
            peak_memory_usage=peak_memory_gb(), is_final_chunk=True)


__all__ = ["Model", "ModelConfig", "LANGUAGE_TOKEN", "w2v_hidden17",
           "prefix_cond_emb", "prefix_text_emb", "t2s_transformer",
           "t2s_head"]
