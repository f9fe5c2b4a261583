"""Recurrent layers (LSTM/GRU) as lax.scan loops.

Needed by Kokoro's prosody predictor (reference
/root/reference/mlx_audio/tts/models/kokoro/kokoro.py:139-169 duration LSTM)
and several codec/SE models. Weight layout matches torch's
`weight_ih_l0 (4H, I)` / `weight_hh_l0 (4H, H)` gate order (i, f, g, o) for
LSTM and (r, z, n) for GRU so checkpoints load without re-packing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def init_lstm(key, input_size: int, hidden_size: int, bias: bool = True,
              dtype=jnp.float32) -> dict:
    k = jax.random.split(key, 4)
    s = 1.0 / (hidden_size ** 0.5)
    p = {
        "weight_ih": jax.random.uniform(k[0], (4 * hidden_size, input_size), dtype, -s, s),
        "weight_hh": jax.random.uniform(k[1], (4 * hidden_size, hidden_size), dtype, -s, s),
    }
    if bias:
        p["bias_ih"] = jax.random.uniform(k[2], (4 * hidden_size,), dtype, -s, s)
        p["bias_hh"] = jax.random.uniform(k[3], (4 * hidden_size,), dtype, -s, s)
    return p


def _lstm_scan(params: dict, x: Array, h0: Array, c0: Array, reverse: bool,
               mask: Optional[Array] = None):
    """x: (T, B, I) -> (T, B, H). Input projection is hoisted out of the scan
    so the big matmul runs batched on the MXU; only the (B,H)x(H,4H) recurrent
    matmul stays sequential.

    mask (T, B) gates state updates: on masked (padded) steps the carry passes
    through unchanged, which makes bucket-padded runs bit-match tight runs —
    critical for the backward direction, where padding precedes valid data.
    """
    wih = params["weight_ih"]
    whh = params["weight_hh"]
    b = params.get("bias_ih", 0)
    if "bias_hh" in params:
        b = b + params["bias_hh"]
    x_proj = jnp.einsum("tbi,gi->tbg", x, wih) + b  # (T, B, 4H)

    def step(carry, inp):
        h, c = carry
        if mask is None:
            xp = inp
        else:
            xp, m = inp
        gates = xp + h @ whh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        if mask is not None:
            mm = m[:, None]
            h_new = jnp.where(mm, h_new, h)
            c_new = jnp.where(mm, c_new, c)
        return (h_new, c_new), h_new

    xs = x_proj if mask is None else (x_proj, mask)
    (_, _), ys = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return ys


def apply_lstm(
    params: dict,
    x: Array,
    hidden: Optional[Tuple[Array, Array]] = None,
    bidirectional: bool = False,
    mask: Optional[Array] = None,
) -> Array:
    """LSTM over (B, T, I) or (T, I) -> (B, T, H[*2 if bidirectional]).

    For bidirectional, params holds 'forward' and 'backward' sub-dicts.
    mask: optional (B, T) bool, True = valid step (see _lstm_scan).
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    xt = jnp.swapaxes(x, 0, 1)  # (T, B, I)
    bsz = xt.shape[1]
    mt = None if mask is None else jnp.swapaxes(mask, 0, 1)

    def run(p, reverse):
        hdim = p["weight_hh"].shape[1]
        h0 = jnp.zeros((bsz, hdim), x.dtype)
        c0 = jnp.zeros((bsz, hdim), x.dtype)
        if hidden is not None and not reverse:
            h0, c0 = hidden
        return _lstm_scan(p, xt, h0, c0, reverse, mt)

    if bidirectional:
        fwd = run(params["forward"], False)
        bwd = run(params["backward"], True)
        ys = jnp.concatenate([fwd, bwd], axis=-1)
    else:
        p = params.get("forward", params)
        ys = run(p, False)
    out = jnp.swapaxes(ys, 0, 1)
    return out[0] if squeeze else out


def init_gru(key, input_size: int, hidden_size: int, bias: bool = True,
             dtype=jnp.float32) -> dict:
    k = jax.random.split(key, 4)
    s = 1.0 / (hidden_size ** 0.5)
    p = {
        "weight_ih": jax.random.uniform(k[0], (3 * hidden_size, input_size), dtype, -s, s),
        "weight_hh": jax.random.uniform(k[1], (3 * hidden_size, hidden_size), dtype, -s, s),
    }
    if bias:
        p["bias_ih"] = jax.random.uniform(k[2], (3 * hidden_size,), dtype, -s, s)
        p["bias_hh"] = jax.random.uniform(k[3], (3 * hidden_size,), dtype, -s, s)
    return p


def apply_gru(params: dict, x: Array, h0: Optional[Array] = None) -> Array:
    """GRU over (B, T, I) -> (B, T, H); torch gate order (r, z, n)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    xt = jnp.swapaxes(x, 0, 1)
    bsz = xt.shape[1]
    hdim = params["weight_hh"].shape[1]
    if h0 is None:
        h0 = jnp.zeros((bsz, hdim), x.dtype)
    x_proj = jnp.einsum("tbi,gi->tbg", xt, params["weight_ih"])
    if "bias_ih" in params:
        x_proj = x_proj + params["bias_ih"]
    whh = params["weight_hh"]
    bhh = params.get("bias_hh", jnp.zeros((3 * hdim,), x.dtype))

    def step(h, xp):
        hp = h @ whh.T + bhh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, x_proj)
    out = jnp.swapaxes(ys, 0, 1)
    return out[0] if squeeze else out
