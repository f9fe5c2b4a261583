"""Irodori-TTS functional DiT (rectified-flow, Japanese).

Parity: /root/reference/mlx_audio/tts/models/irodori_tts/model.py — text /
reference-latent / caption encoders feeding per-layer joint-attention KV,
LowRankAdaLN DiT blocks, v3 duration predictor (token-sum AdaRN-Zero);
sampling.py — Euler CFG with independent/joint/alternating guidance,
sway schedule, speaker-KV scaling, temporal score rescale.

Shares the low-level math with the Echo-TTS module (same LowRankAdaLN /
half-head rope / gated attention family). The full Euler integration is
traced as one jitted program per (shape, sampler-config) key.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import apply_embedding, apply_linear, init_embedding, init_linear
from ....ops.attention import attention
from ..echo_tts.echo_tts import (
    _adaln_apply,
    _enc_block,
    _enc_block_init,
    _mlp,
    _mlp_init,
    _rms,
    _rope_tables,
    _rotary_half,
    _timestep_embed,
)

Array = jax.Array


@dataclass
class IrodoriDiTConfig(BaseModelArgs):
    latent_dim: int = 32
    latent_patch_size: int = 1
    model_dim: int = 1280
    num_layers: int = 12
    num_heads: int = 20
    mlp_ratio: float = 2.875
    text_mlp_ratio: Optional[float] = 2.6
    speaker_mlp_ratio: Optional[float] = 2.6
    text_vocab_size: int = 99574
    text_tokenizer_repo: str = "llm-jp/llm-jp-3-150m"
    text_add_bos: bool = True
    text_dim: int = 512
    text_layers: int = 10
    text_heads: int = 8
    speaker_dim: int = 768
    speaker_layers: int = 8
    speaker_heads: int = 12
    speaker_patch_size: int = 1
    timestep_embed_dim: int = 512
    adaln_rank: int = 192
    norm_eps: float = 1e-5
    use_caption_condition: bool = False
    use_speaker_condition: Optional[bool] = None
    caption_vocab_size: Optional[int] = None
    caption_tokenizer_repo: Optional[str] = None
    caption_add_bos: Optional[bool] = None
    caption_dim: Optional[int] = None
    caption_layers: Optional[int] = None
    caption_heads: Optional[int] = None
    caption_mlp_ratio: Optional[float] = None
    use_duration_predictor: bool = False
    duration_aux_dim: int = 14
    duration_hidden_dim: int = 1024
    duration_layers: int = 3
    duration_dropout: float = 0.1
    duration_attention_heads: int = 8
    duration_architecture: str = "token_sum_adarn_zero_no_aux"
    duration_token_init_frames: float = 9.0
    duration_speaker_fusion: str = "adarn_zero"
    duration_caption_fusion: str = "adarn_zero"
    duration_caption_pooling: str = "masked_mean"

    @property
    def use_speaker(self) -> bool:
        if self.use_speaker_condition is None:
            return not self.use_caption_condition
        return bool(self.use_speaker_condition)

    @property
    def cap_vocab(self) -> int:
        return self.caption_vocab_size or self.text_vocab_size

    @property
    def cap_dim(self) -> int:
        return self.caption_dim or self.text_dim

    @property
    def cap_layers(self) -> int:
        return self.caption_layers or self.text_layers

    @property
    def cap_heads(self) -> int:
        return self.caption_heads or self.text_heads

    @property
    def cap_mlp_ratio(self) -> float:
        if self.caption_mlp_ratio is not None:
            return float(self.caption_mlp_ratio)
        return self.text_mlp_ratio_r

    @property
    def text_mlp_ratio_r(self) -> float:
        return self.mlp_ratio if self.text_mlp_ratio is None \
            else float(self.text_mlp_ratio)

    @property
    def speaker_mlp_ratio_r(self) -> float:
        return self.mlp_ratio if self.speaker_mlp_ratio is None \
            else float(self.speaker_mlp_ratio)

    @property
    def patched_latent_dim(self) -> int:
        return self.latent_dim * self.latent_patch_size

    @property
    def speaker_patched_latent_dim(self) -> int:
        return self.patched_latent_dim * self.speaker_patch_size

    @property
    def head_dim(self) -> int:
        return self.model_dim // self.num_heads


@dataclass
class SamplerConfig(BaseModelArgs):
    num_steps: int = 40
    cfg_scale_text: float = 3.0
    cfg_scale_speaker: float = 5.0
    cfg_scale_caption: float = 3.0
    cfg_guidance_mode: str = "independent"
    cfg_min_t: float = 0.5
    cfg_max_t: float = 1.0
    truncation_factor: Optional[float] = None
    rescale_k: Optional[float] = None
    rescale_sigma: Optional[float] = None
    context_kv_cache: bool = True
    speaker_kv_scale: Optional[float] = None
    speaker_kv_min_t: Optional[float] = 0.9
    speaker_kv_max_layers: Optional[int] = None
    sequence_length: int = 750
    t_schedule_mode: str = "linear"
    sway_coeff: float = -1.0
    duration_scale: float = 1.0
    min_seconds: float = 0.5
    max_seconds: float = 30.0


def patch_sequence_with_mask(seq: Array, mask: Array,
                             patch: int) -> Tuple[Array, Array]:
    if patch <= 1:
        return seq, mask
    b, s, d = seq.shape
    usable = (s // patch) * patch
    seq = seq[:, :usable].reshape(b, usable // patch, d * patch)
    mask = mask[:, :usable].reshape(b, usable // patch, patch)
    return seq, jnp.all(mask, axis=-1)


# --------------------------------------------------------------------- init

def init_irodori(key, c: IrodoriDiTConfig) -> dict:
    total = 32 * (c.num_layers + c.text_layers + c.speaker_layers
                  + c.cap_layers + c.duration_layers) + 64
    ks = iter(jax.random.split(key, total))
    d = c.model_dim
    hd = c.head_dim

    p: dict = {
        "text_encoder": {
            "text_embedding": init_embedding(next(ks), c.text_vocab_size,
                                             c.text_dim),
            "blocks": {str(i): _enc_block_init(
                ks, c.text_dim, c.text_heads,
                int(c.text_dim * c.text_mlp_ratio_r))
                for i in range(c.text_layers)}},
        "text_norm": {"weight": jnp.ones(c.text_dim)},
        "cond_module": {"layers": {
            "0": init_linear(next(ks), c.timestep_embed_dim, d,
                             bias=False),
            "2": init_linear(next(ks), d, d, bias=False),
            "4": init_linear(next(ks), d, 3 * d, bias=False)}},
        "in_proj": init_linear(next(ks), c.patched_latent_dim, d),
        "out_norm": {"weight": jnp.ones(d)},
        "out_proj": init_linear(next(ks), d, c.patched_latent_dim),
    }
    if c.use_speaker:
        p["speaker_encoder"] = {
            "in_proj": init_linear(next(ks), c.speaker_patched_latent_dim,
                                   c.speaker_dim),
            "blocks": {str(i): _enc_block_init(
                ks, c.speaker_dim, c.speaker_heads,
                int(c.speaker_dim * c.speaker_mlp_ratio_r))
                for i in range(c.speaker_layers)}}
        p["speaker_norm"] = {"weight": jnp.ones(c.speaker_dim)}
    if c.use_caption_condition:
        p["caption_encoder"] = {
            "text_embedding": init_embedding(next(ks), c.cap_vocab,
                                             c.cap_dim),
            "blocks": {str(i): _enc_block_init(
                ks, c.cap_dim, c.cap_heads,
                int(c.cap_dim * c.cap_mlp_ratio))
                for i in range(c.cap_layers)}}
        p["caption_norm"] = {"weight": jnp.ones(c.cap_dim)}

    blocks = {}
    for i in range(c.num_layers):
        att = {
            "wq": init_linear(next(ks), d, d, bias=False),
            "wk": init_linear(next(ks), d, d, bias=False),
            "wv": init_linear(next(ks), d, d, bias=False),
            "wk_text": init_linear(next(ks), c.text_dim, d, bias=False),
            "wv_text": init_linear(next(ks), c.text_dim, d, bias=False),
            "gate": init_linear(next(ks), d, d, bias=False),
            "wo": init_linear(next(ks), d, d, bias=False),
            "q_norm": {"weight": jnp.ones((c.num_heads, hd))},
            "k_norm": {"weight": jnp.ones((c.num_heads, hd))}}
        if c.use_speaker:
            att["wk_speaker"] = init_linear(next(ks), c.speaker_dim, d,
                                            bias=False)
            att["wv_speaker"] = init_linear(next(ks), c.speaker_dim, d,
                                            bias=False)
        if c.use_caption_condition:
            att["wk_caption"] = init_linear(next(ks), c.cap_dim, d,
                                            bias=False)
            att["wv_caption"] = init_linear(next(ks), c.cap_dim, d,
                                            bias=False)

        def adaln():
            return {"shift_down": init_linear(next(ks), d, c.adaln_rank,
                                              bias=False),
                    "scale_down": init_linear(next(ks), d, c.adaln_rank,
                                              bias=False),
                    "gate_down": init_linear(next(ks), d, c.adaln_rank,
                                             bias=False),
                    "shift_up": init_linear(next(ks), c.adaln_rank, d),
                    "scale_up": init_linear(next(ks), c.adaln_rank, d),
                    "gate_up": init_linear(next(ks), c.adaln_rank, d)}

        blocks[str(i)] = {"attention": att,
                          "mlp": _mlp_init(ks, d,
                                           int(d * c.mlp_ratio)),
                          "attention_adaln": adaln(),
                          "mlp_adaln": adaln()}
    p["blocks"] = blocks

    if c.use_duration_predictor:
        arch = c.duration_architecture
        if arch not in ("token_sum_adarn_zero_no_aux",
                        "token_sum_dual_adarn_zero_no_aux"):
            raise NotImplementedError(
                f"duration architecture {arch!r} not supported")
        hdim = c.duration_hidden_dim
        dp: dict = {
            "null_speaker": jnp.zeros((c.speaker_dim,)),
            "token_input_proj": init_linear(next(ks), c.text_dim, hdim),
            "token_blocks": {},
            "token_out_norm": {"weight": jnp.ones(hdim)},
            "token_out_proj": {
                "weight": jnp.zeros((1, hdim)),
                "bias": jnp.full((1,), math.log(math.expm1(
                    c.duration_token_init_frames)))},
        }
        for i in range(c.duration_layers):
            blk = {"norm": {"weight": jnp.ones(hdim)},
                   "mlp": _mlp_init(ks, hdim, hdim),
                   "modulation": {"weight": jnp.zeros((hdim * 3,
                                                       c.speaker_dim)),
                                  "bias": jnp.zeros((hdim * 3,))}}
            if arch == "token_sum_dual_adarn_zero_no_aux":
                blk["caption_modulation"] = {
                    "weight": jnp.zeros((hdim * 3, c.cap_dim)),
                    "bias": jnp.zeros((hdim * 3,))}
            dp["token_blocks"][str(i)] = blk
        if arch == "token_sum_dual_adarn_zero_no_aux":
            dp["null_caption"] = jnp.zeros((c.cap_dim,))
        p["duration_predictor"] = dp
    return p


# ----------------------------------------------------------------- encoders

def _run_encoder(enc: dict, blocks_n: int, heads: int, eps: float,
                 x: Array, mask: Optional[Array]) -> Array:
    if mask is not None:
        mask_f = mask[..., None].astype(x.dtype)
        x = x * mask_f
        for i in range(blocks_n):
            x = _enc_block(enc["blocks"][str(i)], x, heads, eps,
                           causal=False, key_mask=mask)
            x = x * mask_f
        return x
    for i in range(blocks_n):
        x = _enc_block(enc["blocks"][str(i)], x, heads, eps, causal=False)
    return x


def encode_text_state(p, c: IrodoriDiTConfig, ids: Array,
                      mask: Array) -> Array:
    x = apply_embedding(p["text_encoder"]["text_embedding"], ids)
    x = _run_encoder(p["text_encoder"], c.text_layers, c.text_heads,
                     c.norm_eps, x, mask)
    return _rms(x, p["text_norm"]["weight"], c.norm_eps)


def encode_speaker_state(p, c: IrodoriDiTConfig, latent: Array,
                         mask: Array) -> Tuple[Array, Array]:
    lat_p, mask_p = patch_sequence_with_mask(latent, mask,
                                             c.speaker_patch_size)
    x = apply_linear(p["speaker_encoder"]["in_proj"], lat_p) / 6.0
    x = _run_encoder(p["speaker_encoder"], c.speaker_layers,
                     c.speaker_heads, c.norm_eps, x, mask_p)
    return _rms(x, p["speaker_norm"]["weight"], c.norm_eps), mask_p


def encode_caption_state(p, c: IrodoriDiTConfig, ids: Array,
                         mask: Array) -> Array:
    x = apply_embedding(p["caption_encoder"]["text_embedding"], ids)
    x = _run_encoder(p["caption_encoder"], c.cap_layers, c.cap_heads,
                     c.norm_eps, x, mask)
    return _rms(x, p["caption_norm"]["weight"], c.norm_eps)


# --------------------------------------------------------------- DiT fwd

def _ctx_kv(att: dict, prefix: str, state: Array, heads: int, hd: int,
            eps: float) -> Tuple[Array, Array]:
    b, s, _ = state.shape
    k = apply_linear(att["wk_" + prefix], state).reshape(b, s, heads, hd)
    v = apply_linear(att["wv_" + prefix], state).reshape(b, s, heads, hd)
    return _rms(k, att["k_norm"]["weight"], eps), v


def build_kv_caches(p, c: IrodoriDiTConfig, text_state,
                    speaker_state=None, caption_state=None) -> dict:
    hd = c.head_dim
    out = {"text": [], "speaker": [], "caption": []}
    for i in range(c.num_layers):
        att = p["blocks"][str(i)]["attention"]
        out["text"].append(_ctx_kv(att, "text", text_state, c.num_heads,
                                   hd, c.norm_eps))
        if speaker_state is not None and c.use_speaker:
            out["speaker"].append(_ctx_kv(att, "speaker", speaker_state,
                                          c.num_heads, hd, c.norm_eps))
        if caption_state is not None and c.use_caption_condition:
            out["caption"].append(_ctx_kv(att, "caption", caption_state,
                                          c.num_heads, hd, c.norm_eps))
    return out


def dit_forward(p, c: IrodoriDiTConfig, x_t: Array, t: Array,
                text_mask: Array, kvs: dict,
                speaker_mask: Optional[Array] = None,
                caption_mask: Optional[Array] = None) -> Array:
    b, s, _ = x_t.shape
    hd = c.head_dim
    te = _timestep_embed(t, c.timestep_embed_dim)
    cm = p["cond_module"]["layers"]
    cond = apply_linear(cm["4"], jax.nn.silu(apply_linear(
        cm["2"], jax.nn.silu(apply_linear(cm["0"], te)))))[:, None]

    x = apply_linear(p["in_proj"], x_t)
    cos, sin = _rope_tables(hd, s)
    for i in range(c.num_layers):
        blk = p["blocks"][str(i)]
        att = blk["attention"]
        xn, gate_a = _adaln_apply(blk["attention_adaln"], x, cond,
                                  c.norm_eps)
        q = apply_linear(att["wq"], xn).reshape(b, s, c.num_heads, hd)
        k = apply_linear(att["wk"], xn).reshape(b, s, c.num_heads, hd)
        v = apply_linear(att["wv"], xn).reshape(b, s, c.num_heads, hd)
        gate = apply_linear(att["gate"], xn)
        q = _rms(q, att["q_norm"]["weight"], c.norm_eps)
        k = _rms(k, att["k_norm"]["weight"], c.norm_eps)
        q = _rotary_half(q, cos, sin)
        k = _rotary_half(k, cos, sin)
        parts_k, parts_v = [k], [v]
        parts_m = [jnp.ones((b, s), bool)]
        kt, vt = kvs["text"][i]
        parts_k.append(kt)
        parts_v.append(vt)
        parts_m.append(text_mask)
        if kvs["speaker"]:
            ks_, vs_ = kvs["speaker"][i]
            parts_k.append(ks_)
            parts_v.append(vs_)
            parts_m.append(speaker_mask)
        if kvs["caption"]:
            kc, vc = kvs["caption"][i]
            parts_k.append(kc)
            parts_v.append(vc)
            parts_m.append(caption_mask)
        kk = jnp.concatenate(parts_k, axis=1)
        vv = jnp.concatenate(parts_v, axis=1)
        mm = jnp.concatenate(parts_m, axis=1)
        add = jnp.where(mm[:, None, None, :], 0.0, -1e9)
        o = attention(q, kk, vv, mask=add).reshape(b, s, c.model_dim)
        x = x + gate_a * apply_linear(att["wo"],
                                      o * jax.nn.sigmoid(gate))
        xn, gate_m = _adaln_apply(blk["mlp_adaln"], x, cond, c.norm_eps)
        x = x + gate_m * _mlp(blk["mlp"], xn)
    x = _rms(x, p["out_norm"]["weight"], c.norm_eps)
    return apply_linear(p["out_proj"], x).astype(jnp.float32)


# ------------------------------------------------------ duration predictor

def predict_duration_log_frames(p, c: IrodoriDiTConfig, text_state: Array,
                                text_mask: Array,
                                speaker_state: Optional[Array],
                                has_speaker: bool,
                                caption_state: Optional[Array] = None,
                                caption_mask: Optional[Array] = None,
                                has_caption: bool = False) -> Array:
    """Token-sum AdaRN-Zero duration head (reference model.py:929-1010)."""
    dp = p["duration_predictor"]
    b = text_state.shape[0]
    dual = c.duration_architecture == "token_sum_dual_adarn_zero_no_aux"
    if has_speaker and speaker_state is not None:
        spk_vec = speaker_state[:, 0]
    else:
        spk_vec = jnp.broadcast_to(dp["null_speaker"][None],
                                   (b, c.speaker_dim))
    cap_vec = None
    if dual:
        if has_caption and caption_state is not None:
            mf = caption_mask[..., None].astype(caption_state.dtype)
            denom = jnp.maximum(mf.sum(axis=1), 1.0)
            cap_vec = (caption_state * mf).sum(axis=1) / denom
        else:
            cap_vec = jnp.broadcast_to(dp["null_caption"][None],
                                       (b, c.cap_dim))
    h = apply_linear(dp["token_input_proj"], text_state)
    for i in range(c.duration_layers):
        blk = dp["token_blocks"][str(i)]
        hn = _rms(h, blk["norm"]["weight"], c.norm_eps)
        mod = apply_linear(blk["modulation"], jax.nn.silu(spk_vec))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        if dual:
            cmod = apply_linear(blk["caption_modulation"],
                                jax.nn.silu(cap_vec))
            cs, csc, cg = jnp.split(cmod, 3, axis=-1)
            shift, scale, gate = shift + cs, scale + csc, gate + cg
        hn = hn * (1.0 + scale[:, None]) + shift[:, None]
        h = h + jnp.tanh(gate)[:, None] * _mlp(blk["mlp"], hn)
    logits = apply_linear(dp["token_out_proj"],
                          _rms(h, dp["token_out_norm"]["weight"],
                               c.norm_eps))[..., 0]
    frames = jax.nn.softplus(logits.astype(jnp.float32))
    total = jnp.sum(frames * text_mask.astype(frames.dtype), axis=1)
    return jnp.log1p(jnp.maximum(total, 0.0))
