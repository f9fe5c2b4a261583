"""VoxCPM local encoder, local DiT and CFM flow sampler (functional).

Parity: /root/reference/mlx_audio/tts/models/voxcpm/{encoder,dit}.py and the
voxcpm2 variants (multi-token mu, mean_mode dt embedding).

TPU design: the entire Euler integration (all timesteps, CFG-zero-star
correction included) traces into ONE program — the t_span and the
zero-init-step mask are static Python, so the loop unrolls branch-free.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import apply_linear, init_linear
from .minicpm import LMConfig, init_minicpm, minicpm_forward

Array = jax.Array


# ------------------------------------------------------------- local enc

def init_loc_enc(key, cfg: LMConfig, input_dim: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "special_token": 0.02 * jax.random.normal(
            k1, (1, 1, 1, cfg.hidden_size)),
        "in_proj": init_linear(k2, input_dim, cfg.hidden_size),
        "encoder": init_minicpm(k3, cfg),
    }


def loc_enc_forward(p: dict, cfg: LMConfig, x: Array) -> Array:
    """(B, T, P, D) latent patches -> (B, T, H) cls summaries."""
    b, t, patch, _ = x.shape
    h = apply_linear(p["in_proj"], x)
    cls = jnp.broadcast_to(p["special_token"], (b, t, 1, cfg.hidden_size))
    h = jnp.concatenate([cls, h], axis=2).reshape(b * t, patch + 1, -1)
    out, _ = minicpm_forward(p["encoder"], cfg, h, is_causal=False)
    return out[:, 0].reshape(b, t, -1)


# ------------------------------------------------------------------ DiT

def _sinusoidal(t: Array, dim: int, scale: float = 1000.0) -> Array:
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = scale * t[:, None].astype(jnp.float32) * emb[None]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def init_loc_dit(key, cfg: LMConfig, in_channels: int) -> dict:
    ks = iter(jax.random.split(key, 8))
    h = cfg.hidden_size
    return {
        "in_proj": init_linear(next(ks), in_channels, h),
        "cond_proj": init_linear(next(ks), in_channels, h),
        "out_proj": init_linear(next(ks), h, in_channels),
        "time_mlp": {"linear_1": init_linear(next(ks), h, h),
                     "linear_2": init_linear(next(ks), h, h)},
        "delta_time_mlp": {"linear_1": init_linear(next(ks), h, h),
                           "linear_2": init_linear(next(ks), h, h)},
        "decoder": init_minicpm(next(ks), cfg),
    }


def _time_embed(p: dict, t: Array, dim: int) -> Array:
    e = _sinusoidal(t, dim)
    h = jax.nn.silu(apply_linear(p["linear_1"], e))
    return apply_linear(p["linear_2"], h)


def loc_dit_forward(p: dict, cfg: LMConfig, x: Array, mu: Array, t: Array,
                    cond: Array, dt: Array, v2: bool = False) -> Array:
    """x/cond (B, T, C) channel-last; mu (B, H) or (B, k*H) (v2);
    t/dt (B,). Returns v-field (B, T, C)."""
    x_proj = apply_linear(p["in_proj"], x)
    cond_proj = apply_linear(p["cond_proj"], cond)
    h = cfg.hidden_size
    t_comb = _time_embed(p["time_mlp"], t, h) + \
        _time_embed(p["delta_time_mlp"], dt, h)
    prefix = cond.shape[1]
    if v2:
        mu_tokens = mu.reshape(x.shape[0], -1, h)
        n_mu = mu_tokens.shape[1]
        hidden = jnp.concatenate(
            [mu_tokens, t_comb[:, None], cond_proj, x_proj], axis=1)
        skip = n_mu + 1 + prefix
    else:
        start = (mu + t_comb)[:, None]
        hidden = jnp.concatenate([start, cond_proj, x_proj], axis=1)
        skip = prefix + 1
    hidden, _ = minicpm_forward(p["decoder"], cfg, hidden, is_causal=False)
    return apply_linear(p["out_proj"], hidden[:, skip:])


def cfm_sample(p: dict, cfg: LMConfig, mu: Array, cond: Array, key,
               *, in_channels: int, patch_size: int, n_timesteps: int,
               cfg_value: float = 1.0, temperature: float = 1.0,
               use_cfg_zero_star: bool = True, v2: bool = False) -> Array:
    """Flow-matching sample -> (B, P, C) latent patch.

    mu (B, H[*k]); cond (B, P, C) channel-last prefix patch.
    """
    b = mu.shape[0]
    t_span = np.linspace(1.0, 0.0, n_timesteps + 1)
    t_span = t_span + 1.0 * (np.cos(np.pi / 2 * t_span) - 1 + t_span)
    zero_steps = max(1, int(len(t_span) * 0.04))

    key, sub = jax.random.split(key)
    x = jax.random.normal(sub, (b, patch_size, in_channels),
                          jnp.float32) * temperature
    t = t_span[0]
    dt = t_span[0] - t_span[1]
    for step in range(1, len(t_span)):
        if step <= zero_steps and use_cfg_zero_star:
            dphi = jnp.zeros_like(x)
        else:
            x_in = jnp.concatenate([x, x], axis=0)
            mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
            cond_in = jnp.concatenate([cond, cond], axis=0)
            t_val = jnp.full((2 * b,), t, jnp.float32)
            dt_val = jnp.zeros((2 * b,), jnp.float32)
            out = loc_dit_forward(p, cfg, x_in, mu_in, t_val, cond_in,
                                  dt_val, v2=v2)
            pos, neg = out[:b], out[b:]
            if use_cfg_zero_star:
                pf = pos.reshape(b, -1)
                nf = neg.reshape(b, -1)
                st = (jnp.sum(pf * nf, axis=1, keepdims=True)
                      / (jnp.sum(nf * nf, axis=1, keepdims=True) + 1e-8))
                st = st.reshape(b, 1, 1)
            else:
                st = 1.0
            dphi = neg * st + cfg_value * (pos - neg * st)
        x = x - dt * dphi
        t = t - dt
        if step < len(t_span) - 1:
            dt = t - t_span[step + 1]
    return x


__all__ = ["init_loc_enc", "loc_enc_forward", "init_loc_dit",
           "loc_dit_forward", "cfm_sample"]
