"""Dramabox audio-only LTX DiT + Gemma text conditioner + guidance.

Parity: /root/reference/mlx_audio/tts/models/dramabox/
(transformer.py — PixArt AdaLN-single with 9-way scale/shift table when
cross_attention_adaln, gated attention with 2*sigmoid head gates, x0
parameterization; rope.py — LTX "split" rope over fractional positions
with per-head padding; text_conditioning.py — per-token RMS over 49
Gemma layers, 8-layer connector that swaps padding for learnable
registers; guidance.py — CFG + STG (skip self-attention in chosen
blocks) + std rescale; scheduler.py — LTX2 shifted/stretched sigmas).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import apply_layer_norm, apply_linear, init_linear
from ....ops.attention import attention

Array = jax.Array


@dataclass
class TransformerConfig(BaseModelArgs):
    num_layers: int = 48
    audio_num_attention_heads: int = 32
    audio_attention_head_dim: int = 64
    audio_in_channels: int = 128
    audio_out_channels: int = 128
    audio_cross_attention_dim: int = 2048
    norm_eps: float = 1e-6
    positional_embedding_theta: float = 10000.0
    audio_positional_embedding_max_pos: List[float] = field(
        default_factory=lambda: [20.0])
    timestep_scale_multiplier: int = 1000
    use_middle_indices_grid: bool = True
    rope_type: str = "split"
    apply_gated_attention: bool = True
    cross_attention_adaln: bool = True
    audio_connector_attention_head_dim: int = 64
    audio_connector_num_attention_heads: int = 32
    connector_num_layers: int = 8
    connector_positional_embedding_max_pos: List[int] = field(
        default_factory=lambda: [4096])
    connector_num_learnable_registers: int = 128

    @property
    def inner_dim(self) -> int:
        return self.audio_num_attention_heads * self.audio_attention_head_dim


def _rms(x: Array, w: Optional[Array] = None, eps: float = 1e-6) -> Array:
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    if w is not None:
        x32 = x32 * w
    return x32.astype(x.dtype)


# ------------------------------------------------------------- LTX rope

def ltx_split_rope(positions: Array, dim: int, max_pos: Sequence[float],
                   heads: int, theta: float = 10000.0,
                   use_middle: bool = True) -> Tuple[Array, Array]:
    """positions bounds (B, D, T, 2) -> per-head (cos, sin) tables shaped
    (B, H, T, dim//heads//2) (reference rope.py:105-166, SPLIT type)."""
    if use_middle:
        grid = (positions[..., 0] + positions[..., 1]) / 2.0  # (B, D, T)
    else:
        grid = positions[..., 0]
    num_elements = 2 * grid.shape[1]
    n_ind = dim // num_elements
    indices = np.power(theta, np.linspace(
        math.log(1.0, theta) if theta != 1 else 0.0,
        1.0, n_ind, dtype=np.float64)) * math.pi / 2
    indices = jnp.asarray(indices, jnp.float32)
    frac = jnp.stack([grid[:, i] / max_pos[i]
                      for i in range(grid.shape[1])], axis=-1)  # (B,T,D)
    freqs = indices * (frac[..., None] * 2 - 1)      # (B, T, D, n_ind)
    freqs = jnp.transpose(freqs, (0, 1, 3, 2)).reshape(
        freqs.shape[0], freqs.shape[1], -1)          # (B, T, n_ind*D)
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    pad = dim // 2 - freqs.shape[-1]
    if pad:
        cos = jnp.concatenate([jnp.ones_like(cos[..., :pad]), cos], -1)
        sin = jnp.concatenate([jnp.zeros_like(sin[..., :pad]), sin], -1)
    b, t, _ = cos.shape
    cos = jnp.transpose(cos.reshape(b, t, heads, -1), (0, 2, 1, 3))
    sin = jnp.transpose(sin.reshape(b, t, heads, -1), (0, 2, 1, 3))
    return cos, sin


def apply_split_rope(x: Array, cos: Array, sin: Array,
                     heads: int) -> Array:
    """x (B, T, H*D) with per-head tables (B, H, T, D/2)."""
    b, t, _ = x.shape
    xh = jnp.transpose(x.reshape(b, t, heads, -1), (0, 2, 1, 3))
    half = xh.shape[-1] // 2
    x1, x2 = xh[..., :half], xh[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          axis=-1)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, -1)


# -------------------------------------------------------------- timestep

def _sinus_timestep(t: Array, dim: int = 256) -> Array:
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half,
                                               dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    # flip_sin_to_cos=True -> [cos, sin]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def init_adaln_single(ks, dim: int, coefficient: int) -> dict:
    return {"emb": {"timestep_embedder": {
        "linear_1": init_linear(next(ks), 256, dim),
        "linear_2": init_linear(next(ks), dim, dim)}},
        "linear": init_linear(next(ks), dim, coefficient * dim)}


def adaln_single(p: dict, timestep: Array) -> Tuple[Array, Array]:
    te = _sinus_timestep(timestep)
    e = p["emb"]["timestep_embedder"]
    emb = apply_linear(e["linear_2"],
                       jax.nn.silu(apply_linear(e["linear_1"], te)))
    return apply_linear(p["linear"], jax.nn.silu(emb)), emb


# ------------------------------------------------------------- attention

def _attn_init(ks, q_dim, ctx_dim, heads, head_dim, gated):
    inner = heads * head_dim
    p = {"to_q": init_linear(next(ks), q_dim, inner),
         "to_k": init_linear(next(ks), ctx_dim, inner),
         "to_v": init_linear(next(ks), ctx_dim, inner),
         "to_out": {"0": init_linear(next(ks), inner, q_dim)},
         "q_norm": {"weight": jnp.ones(inner)},
         "k_norm": {"weight": jnp.ones(inner)}}
    if gated:
        p["to_gate_logits"] = init_linear(next(ks), q_dim, heads)
    return p


def _attn(p: dict, x: Array, heads: int, head_dim: int,
          context: Optional[Array] = None,
          mask: Optional[Array] = None,
          pe: Optional[Tuple[Array, Array]] = None,
          all_perturbed: bool = False) -> Array:
    ctx = x if context is None else context
    b = x.shape[0]
    value = apply_linear(p["to_v"], ctx)
    if all_perturbed:
        out = value
    else:
        q = _rms(apply_linear(p["to_q"], x), p["q_norm"]["weight"])
        k = _rms(apply_linear(p["to_k"], ctx), p["k_norm"]["weight"])
        if pe is not None:
            q = apply_split_rope(q, *pe, heads)
            k = apply_split_rope(k, *pe, heads)
        qh = q.reshape(b, -1, heads, head_dim)
        kh = k.reshape(b, -1, heads, head_dim)
        vh = value.reshape(b, -1, heads, head_dim)
        out = attention(qh, kh, vh, mask=mask).reshape(b, -1,
                                                       heads * head_dim)
    if "to_gate_logits" in p:
        gates = 2.0 * jax.nn.sigmoid(apply_linear(p["to_gate_logits"], x))
        out = (out.reshape(b, -1, heads, head_dim)
               * gates[..., None]).reshape(b, -1, heads * head_dim)
    return apply_linear(p["to_out"]["0"], out)


def _ff_init(ks, dim, dim_out, mult=4):
    inner = int(dim * mult)
    return {"net": {"0": {"proj": init_linear(next(ks), dim, inner)},
                    "2": init_linear(next(ks), inner, dim_out)}}


def _ff(p, x):
    h = apply_linear(p["net"]["0"]["proj"], x)
    h = 0.5 * h * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                                  * (h + 0.044715 * jnp.power(h, 3))))
    return apply_linear(p["net"]["2"], h)


# ----------------------------------------------------------- DiT blocks

def init_ltx_transformer(key, c: TransformerConfig) -> dict:
    ks = iter(jax.random.split(key, 24 * c.num_layers + 32))
    dim = c.inner_dim
    coeff = 9 if c.cross_attention_adaln else 6
    blocks = {}
    for i in range(c.num_layers):
        blk = {
            "audio_attn1": _attn_init(ks, dim, dim,
                                      c.audio_num_attention_heads,
                                      c.audio_attention_head_dim,
                                      c.apply_gated_attention),
            "audio_attn2": _attn_init(ks, dim, c.audio_cross_attention_dim,
                                      c.audio_num_attention_heads,
                                      c.audio_attention_head_dim,
                                      c.apply_gated_attention),
            "audio_ff": _ff_init(ks, dim, dim),
            "audio_scale_shift_table": jnp.zeros((coeff, dim)),
        }
        if c.cross_attention_adaln:
            blk["audio_prompt_scale_shift_table"] = jnp.zeros((2, dim))
        blocks[str(i)] = blk
    p = {"audio_patchify_proj": init_linear(next(ks), c.audio_in_channels,
                                            dim),
         "audio_adaln_single": init_adaln_single(ks, dim, coeff),
         "audio_scale_shift_table": jnp.zeros((2, dim)),
         "audio_proj_out": init_linear(next(ks), dim,
                                       c.audio_out_channels),
         "transformer_blocks": blocks}
    if c.cross_attention_adaln:
        p["audio_prompt_adaln_single"] = init_adaln_single(ks, dim, 2)
    return p


def ltx_forward(p: dict, c: TransformerConfig, latent: Array,
                sigma: Array, timesteps: Array, positions: Array,
                context: Array, self_mask: Optional[Array] = None,
                stg_blocks: Sequence[int] = ()) -> Array:
    """Velocity prediction (reference AudioOnlyLTXModel.__call__)."""
    dim = c.inner_dim
    heads = c.audio_num_attention_heads
    hd = c.audio_attention_head_dim
    b = latent.shape[0]
    x = apply_linear(p["audio_patchify_proj"], latent)
    ts_scaled = timesteps * c.timestep_scale_multiplier
    timestep, embedded_timestep = adaln_single(
        p["audio_adaln_single"], ts_scaled.reshape(-1))
    timestep = timestep.reshape(b, -1, timestep.shape[-1])
    embedded_timestep = embedded_timestep.reshape(
        b, -1, embedded_timestep.shape[-1])
    prompt_timestep = None
    if c.cross_attention_adaln:
        pt, _ = adaln_single(p["audio_prompt_adaln_single"],
                             (sigma * c.timestep_scale_multiplier
                              ).reshape(-1))
        prompt_timestep = pt.reshape(b, -1, pt.shape[-1])

    pe = ltx_split_rope(positions, dim,
                        c.audio_positional_embedding_max_pos, heads,
                        theta=c.positional_embedding_theta,
                        use_middle=c.use_middle_indices_grid)
    add_mask = None
    if self_mask is not None:
        add_mask = jnp.where(self_mask > 0, 0.0, -1e9)[:, None, :, :]

    coeff = 9 if c.cross_attention_adaln else 6

    def ada(table, tvec, start, stop):
        vals = table[start:stop][None, None] + tvec.reshape(
            b, tvec.shape[1], coeff, -1)[:, :, start:stop]
        return [vals[:, :, i] for i in range(stop - start)]

    stg = set(int(s) for s in stg_blocks)
    for i in range(c.num_layers):
        blk = p["transformer_blocks"][str(i)]
        table = blk["audio_scale_shift_table"]
        shift_msa, scale_msa, gate_msa = ada(table, timestep, 0, 3)
        norm_x = _rms(x, eps=c.norm_eps) * (1 + scale_msa) + shift_msa
        x = x + _attn(blk["audio_attn1"], norm_x, heads, hd, pe=pe,
                      mask=add_mask, all_perturbed=i in stg) * gate_msa
        if c.cross_attention_adaln:
            shift_q, scale_q, gate = ada(table, timestep, 6, 9)
            pv = blk["audio_prompt_scale_shift_table"][None, None] + \
                prompt_timestep.reshape(b, prompt_timestep.shape[1], 2, -1)
            shift_kv, scale_kv = pv[:, :, 0], pv[:, :, 1]
            attn_in = _rms(x, eps=c.norm_eps) * (1 + scale_q) + shift_q
            ctx = context * (1 + scale_kv) + shift_kv
            x = x + _attn(blk["audio_attn2"], attn_in, heads, hd,
                          context=ctx) * gate
        else:
            x = x + _attn(blk["audio_attn2"], _rms(x, eps=c.norm_eps),
                          heads, hd, context=context)
        shift_mlp, scale_mlp, gate_mlp = ada(table, timestep, 3, 6)
        x = x + _ff(blk["audio_ff"],
                    _rms(x, eps=c.norm_eps) * (1 + scale_mlp)
                    + shift_mlp) * gate_mlp

    vals = p["audio_scale_shift_table"][None, None] + \
        embedded_timestep[:, :, None]
    shift, scale = vals[:, :, 0], vals[:, :, 1]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    x = ((x32 - mean) * jax.lax.rsqrt(var + c.norm_eps)).astype(x.dtype)
    return apply_linear(p["audio_proj_out"], x * (1 + scale) + shift)


def x0_from_velocity(latent: Array, velocity: Array,
                     timesteps: Array) -> Array:
    return (latent.astype(jnp.float32)
            - velocity.astype(jnp.float32)
            * timesteps[..., None]).astype(jnp.float32)


# ---------------------------------------------------------- conditioner

def init_text_conditioner(key, c: TransformerConfig,
                          embedding_dim: int = 3840,
                          num_gemma_layers: int = 49) -> dict:
    ks = iter(jax.random.split(key, 16 * c.connector_num_layers + 16))
    inner = (c.audio_connector_num_attention_heads
             * c.audio_connector_attention_head_dim)
    blocks = {}
    for i in range(c.connector_num_layers):
        blocks[str(i)] = {
            "attn1": _attn_init(ks, inner, inner,
                                c.audio_connector_num_attention_heads,
                                c.audio_connector_attention_head_dim,
                                c.apply_gated_attention),
            "ff": _ff_init(ks, inner, inner)}
    p = {"feature_extractor": {"audio_aggregate_embed": init_linear(
        next(ks), embedding_dim * num_gemma_layers, inner)},
        "audio_connector": {"transformer_1d_blocks": blocks}}
    if c.connector_num_learnable_registers:
        p["audio_connector"]["learnable_registers"] = jax.random.uniform(
            next(ks), (c.connector_num_learnable_registers, inner),
            minval=-1.0, maxval=1.0)
    return p


def text_conditioner_forward(p: dict, c: TransformerConfig,
                             hidden_states: Array, attention_mask: Array,
                             embedding_dim: int = 3840) -> Array:
    """Gemma hiddens (B, T, D, L) + mask (B, T) -> context (B, T, inner)
    with padded slots replaced by learnable registers."""
    inner = (c.audio_connector_num_attention_heads
             * c.audio_connector_attention_head_dim)
    b, t, d, num_layers = hidden_states.shape
    var = jnp.mean(jnp.square(hidden_states), axis=2, keepdims=True)
    normed = hidden_states * jax.lax.rsqrt(var + 1e-6)
    normed = normed.reshape(b, t, d * num_layers)
    normed = jnp.where(attention_mask[..., None] > 0, normed, 0.0)
    scaled = normed * math.sqrt(inner / embedding_dim)
    feats = apply_linear(
        p["feature_extractor"]["audio_aggregate_embed"], scaled)

    conn = p["audio_connector"]
    if "learnable_registers" in conn:
        n_reg = conn["learnable_registers"].shape[0]
        binary = attention_mask.astype(feats.dtype)
        positions = jnp.arange(t, dtype=feats.dtype)[None]
        order = jnp.argsort(jnp.where(binary > 0, positions - t,
                                      positions), axis=1)
        feats = jnp.take_along_axis(feats, order[..., None], axis=1)
        valid = jnp.sum(binary, axis=1, keepdims=True)
        front = (positions < valid).astype(feats.dtype)
        regs = jnp.tile(conn["learnable_registers"], (t // n_reg, 1))
        feats = feats * front[..., None] + regs[None] * \
            (1.0 - front[..., None])

    pos = jnp.arange(t, dtype=jnp.float32)[None, None, :]
    bounds = jnp.stack([pos, pos], axis=-1)
    pe = ltx_split_rope(bounds, inner,
                        [float(x) for x in
                         c.connector_positional_embedding_max_pos],
                        c.audio_connector_num_attention_heads,
                        theta=c.positional_embedding_theta,
                        use_middle=False)
    x = feats
    for i in range(c.connector_num_layers):
        blk = conn["transformer_1d_blocks"][str(i)]
        x = x + _attn(blk["attn1"], _rms(x),
                      c.audio_connector_num_attention_heads,
                      c.audio_connector_attention_head_dim, pe=pe)
        x = x + _ff(blk["ff"], _rms(x))
    return _rms(x)


# -------------------------------------------------------------- guidance

def auto_rescale_for_cfg(cfg: float) -> float:
    if cfg <= 2.0:
        return 0.0
    if cfg <= 3.0:
        return 0.6 * (cfg - 2.0)
    if cfg <= 4.0:
        return 0.6 + 0.2 * (cfg - 3.0)
    if cfg <= 8.0:
        return 0.8
    return min(1.0, 0.8 + 0.1 * (cfg - 8.0))


def guided_prediction(cond: Array, uncond_text: Array,
                      uncond_perturbed: Array, cfg_scale: float,
                      stg_scale: float, rescale_scale: float,
                      modality_scale: float = 1.0) -> Array:
    pred = (cond + (cfg_scale - 1) * (cond - uncond_text)
            + stg_scale * (cond - uncond_perturbed))
    if rescale_scale != 0:
        factor = jnp.std(cond) / jnp.maximum(jnp.std(pred), 1e-8)
        factor = rescale_scale * factor + (1 - rescale_scale)
        pred = pred * factor
    return pred


# -------------------------------------------------------------- schedule

def ltx2_sigmas(steps: int, token_count: int, max_shift: float = 2.05,
                base_shift: float = 0.95, stretch: bool = True,
                terminal: float = 0.1) -> np.ndarray:
    sigmas = np.linspace(1.0, 0.0, steps + 1, dtype=np.float64)
    slope = (max_shift - base_shift) / (4096 - 1024)
    intercept = base_shift - slope * 1024
    exp_shift = math.exp(token_count * slope + intercept)
    with np.errstate(divide="ignore"):
        shifted = exp_shift / (exp_shift + (1 / sigmas - 1))
    sigmas = np.where(sigmas != 0, shifted, 0.0)
    if stretch:
        non_zero = sigmas[:-1]
        one_minus = 1.0 - non_zero
        scale = one_minus[-1] / (1.0 - terminal)
        sigmas = np.concatenate([1.0 - one_minus / scale, sigmas[-1:]])
    return sigmas.astype(np.float32)
