"""DeepFilterNet2/3 network, channel-last functional form.

Parity: reference sts/models/deepfilternet/network.py — grouped-linear
einsum (:20-34), SqueezedGRU (grouped linear in/out + torch-semantics GRU,
:158-193), separable causal ConvBlocks with inference BatchNorm
(:196-317, :485-560), ErbDecoder pathway/transposed stack (:321-424),
DfDecoder (:427-483), ERB mask application (:652-663) and the order-k
deep-filtering op (:666-720).

Layout is (B, T, F, C) NHWC throughout: time-causal convs left-pad the T
axis, frequency convs pad/stride the F axis — the exact shape XLA's conv
lowering wants, no transposes anywhere. All time recurrences (feature EMA
norms and GRUs) are lax.scan, so the whole enhancement is one compiled
program; `*_step` variants thread explicit state pytrees for the
hop-by-hop streamer and are numerically identical to the offline path.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn import init_conv2d, init_linear, apply_linear
from ....nn.recurrent import init_gru
from .config import DeepFilterNetConfig

Array = jax.Array


# ------------------------------------------------------------ helpers

def init_grouped_linear(key, input_size: int, hidden_size: int,
                        groups: int) -> dict:
    ws, hs = input_size // groups, hidden_size // groups
    s = 1.0 / math.sqrt(ws)
    return {"weight": jax.random.uniform(key, (groups, ws, hs),
                                         jnp.float32, -s, s)}


def apply_grouped_linear(p: dict, x: Array) -> Array:
    """(B, T, I) -> (B, T, groups*hs)."""
    g, ws, hs = p["weight"].shape
    b, t, _ = x.shape
    x = x.reshape(b, t, g, ws)
    return jnp.einsum("btgi,gih->btgh", x, p["weight"]).reshape(b, t,
                                                                g * hs)


def init_batch_norm(ch: int) -> dict:
    return {"weight": jnp.ones(ch), "bias": jnp.zeros(ch),
            "running_mean": jnp.zeros(ch), "running_var": jnp.ones(ch)}


def apply_batch_norm(p: dict, x: Array, eps: float = 1e-5) -> Array:
    return (x - p["running_mean"]) * jax.lax.rsqrt(
        p["running_var"] + eps) * p["weight"] + p["bias"]


def _gru_cell(p: dict, x: Array, h: Array) -> Array:
    """One torch-semantics GRU step: x (B, I), h (B, H) -> (B, H)."""
    xp = x @ p["weight_ih"].T + p.get("bias_ih", 0.0)
    hp = h @ p["weight_hh"].T + p.get("bias_hh", 0.0)
    xr, xz, xn = jnp.split(xp, 3, axis=-1)
    hr, hz, hn = jnp.split(hp, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1 - z) * n + z * h


def _gru_seq(p: dict, x: Array, h0: Array) -> Tuple[Array, Array]:
    """(B, T, I), h0 (B, H) -> ((B, T, H), h_final)."""
    def step(h, xt):
        h2 = _gru_cell(p, xt, h)
        return h2, h2
    hT, ys = jax.lax.scan(step, h0, jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(ys, 0, 1), hT


# ------------------------------------------------------ squeezed GRU

def init_squeezed_gru(key, input_size, hidden_size, output_size,
                      num_layers, linear_groups) -> dict:
    ks = iter(jax.random.split(key, 2 + num_layers))
    p = {"linear_in": {"0": init_grouped_linear(next(ks), input_size,
                                                hidden_size,
                                                linear_groups)},
         "gru_layers": {str(i): init_gru(next(ks), hidden_size,
                                         hidden_size)
                        for i in range(num_layers)}}
    if output_size is not None:
        p["linear_out"] = {"0": init_grouped_linear(
            next(ks), hidden_size, output_size, linear_groups)}
    return p


def apply_squeezed_gru(p: dict, x: Array,
                       states: Optional[List[Array]] = None
                       ) -> Tuple[Array, List[Array]]:
    """(B, T, I) -> (B, T, out); threads per-layer GRU hiddens."""
    x = jax.nn.relu(apply_grouped_linear(p["linear_in"]["0"], x))
    hdim = p["gru_layers"]["0"]["weight_hh"].shape[1]
    n = len(p["gru_layers"])
    if states is None:
        states = [jnp.zeros((x.shape[0], hdim), x.dtype)
                  for _ in range(n)]
    new_states = []
    for i in range(n):
        x, hT = _gru_seq(p["gru_layers"][str(i)], x, states[i])
        new_states.append(hT)
    if "linear_out" in p:
        x = jax.nn.relu(apply_grouped_linear(p["linear_out"]["0"], x))
    return x, new_states


# ---------------------------------------------------------- conv block

def _separable(in_ch: int, out_ch: int, kernel) -> int:
    groups = math.gcd(in_ch, out_ch)
    if groups == 1 or max(kernel) == 1:
        return groups if max(kernel) == 1 and groups > 1 else groups
    return groups


def init_conv_block(key, in_ch, out_ch, kernel, separable: bool,
                    fstride: int = 1) -> dict:
    """Matches reference Encoder._make_conv Sequential indices."""
    groups = math.gcd(in_ch, out_ch) if separable else 1
    sep = separable and groups > 1 and max(kernel) > 1
    k1, k2 = jax.random.split(key)
    p = {"1": init_conv2d(k1, in_ch, out_ch, tuple(kernel), bias=False,
                          groups=groups)}
    if sep:
        p["2"] = init_conv2d(k2, out_ch, out_ch, (1, 1), bias=False)
        p["3"] = init_batch_norm(out_ch)
    else:
        p["2"] = init_batch_norm(out_ch)
    return p


def apply_conv_block(p: dict, x: Array, fstride: int = 1,
                     relu: bool = True) -> Array:
    """x (B, T, F, C); causal T pad (kt-1 left), same F pad, F stride.
    Kernel/groups are derived from the weight shape (static under jit)."""
    w = p["1"]["weight"]
    kt, kf = w.shape[0], w.shape[1]
    fs = fstride
    g = x.shape[-1] // w.shape[2]
    pad = [(kt - 1, 0), (kf // 2, kf // 2)]
    y = jax.lax.conv_general_dilated(
        x, p["1"]["weight"].astype(x.dtype), window_strides=(1, fs),
        padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g)
    if "3" in p:
        y = jax.lax.conv_general_dilated(
            y, p["2"]["weight"].astype(y.dtype), window_strides=(1, 1),
            padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = apply_batch_norm(p["3"], y)
    else:
        y = apply_batch_norm(p["2"], y)
    return jax.nn.relu(y) if relu else y


def init_conv_transpose_block(key, ch, kernel, fstride) -> dict:
    """torch ConvTranspose2d(ch, ch, kernel, stride=(1,fstride),
    padding=(kt-1, kf//2), output_padding=(0, kf//2)), depthwise."""
    k1, k2 = jax.random.split(key)
    kt, kf = kernel
    # stored as HWIO for the equivalent forward conv (pre-flipped)
    s = 1.0 / math.sqrt(kt * kf)
    return {"0": {"weight": jax.random.uniform(
                k1, (kt, kf, 1, ch), jnp.float32, -s, s)},
            "1": init_conv2d(k2, ch, ch, (1, 1), bias=False),
            "2": init_batch_norm(ch)}


def apply_conv_transpose_block(p: dict, x: Array,
                               fstride: int = 2) -> Array:
    w = p["0"]["weight"]
    kt, kf = w.shape[0], w.shape[1]
    fs = fstride
    g = x.shape[-1] // w.shape[2]
    # torch convT padding=(kt-1, kf//2), output_padding=(0, kf//2):
    # equivalent forward conv on lhs-dilated input with
    # pad_lo = k-1-pad, pad_hi = k-1-pad+output_padding
    pad_t = (kt - 1 - (kt - 1), kt - 1 - (kt - 1) + 0)          # (0, 0)
    pad_f = (kf - 1 - kf // 2, kf - 1 - kf // 2 + kf // 2)
    y = jax.lax.conv_general_dilated(
        x, p["0"]["weight"].astype(x.dtype), window_strides=(1, 1),
        padding=[pad_t, pad_f], lhs_dilation=(1, fs),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g)
    y = jax.lax.conv_general_dilated(
        y, p["1"]["weight"].astype(y.dtype), window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return apply_batch_norm(p["2"], y)


# -------------------------------------------------------------- encoder

def init_encoder(key, p: DeepFilterNetConfig) -> dict:
    ks = iter(jax.random.split(key, 16))
    emb_in = p.conv_ch * p.nb_erb // 4
    emb_out = p.emb_hidden_dim if p.enc_concat else emb_in
    enc = {
        "erb_conv0": init_conv_block(next(ks), 1, p.conv_ch,
                                     p.conv_kernel_inp, False),
        "erb_conv1": init_conv_block(next(ks), p.conv_ch, p.conv_ch,
                                     p.conv_kernel, True, fstride=2),
        "erb_conv2": init_conv_block(next(ks), p.conv_ch, p.conv_ch,
                                     p.conv_kernel, True, fstride=2),
        "erb_conv3": init_conv_block(next(ks), p.conv_ch, p.conv_ch,
                                     p.conv_kernel, True, fstride=1),
        "df_conv0": init_conv_block(next(ks), 2, p.conv_ch,
                                    p.conv_kernel_inp, True),
        "df_conv1": init_conv_block(next(ks), p.conv_ch, p.conv_ch,
                                    p.conv_kernel, True, fstride=2),
        "df_fc_emb": {"0": init_grouped_linear(
            next(ks), p.conv_ch * p.nb_df // 2, emb_in,
            p.enc_linear_groups)},
        "emb_gru": init_squeezed_gru(
            next(ks), emb_in * 2 if p.enc_concat else emb_in,
            p.emb_hidden_dim, None if p.enc_concat else emb_out, 1,
            p.linear_groups),
        "lsnr_fc": {"0": init_linear(next(ks), emb_out, 1)},
    }
    return enc


def encoder_forward(enc: dict, p: DeepFilterNetConfig, feat_erb: Array,
                    feat_spec: Array,
                    gru_states: Optional[List[Array]] = None):
    """feat_erb (B, T, E, 1), feat_spec (B, T, D, 2) -> skips + emb."""
    e0 = apply_conv_block(enc["erb_conv0"], feat_erb)
    e1 = apply_conv_block(enc["erb_conv1"], e0, fstride=2)
    e2 = apply_conv_block(enc["erb_conv2"], e1, fstride=2)
    e3 = apply_conv_block(enc["erb_conv3"], e2)
    c0 = apply_conv_block(enc["df_conv0"], feat_spec)
    c1 = apply_conv_block(enc["df_conv1"], c0, fstride=2)

    b, t = c1.shape[:2]
    cemb = jax.nn.relu(apply_grouped_linear(
        enc["df_fc_emb"]["0"], c1.reshape(b, t, -1)))
    emb = e3.reshape(b, t, -1)
    emb = jnp.concatenate([emb, cemb], -1) if p.enc_concat else emb + cemb
    emb, new_states = apply_squeezed_gru(enc["emb_gru"], emb, gru_states)
    lsnr = jax.nn.sigmoid(apply_linear(enc["lsnr_fc"]["0"], emb)) \
        * (p.lsnr_max - p.lsnr_min) + p.lsnr_min
    return e0, e1, e2, e3, emb, c0, lsnr, new_states


# ---------------------------------------------------------- erb decoder

def init_erb_decoder(key, p: DeepFilterNetConfig) -> dict:
    ks = iter(jax.random.split(key, 16))
    emb_in = p.emb_hidden_dim if p.enc_concat else p.conv_ch * p.nb_erb // 4
    c = p.conv_ch

    def pathway(k):
        k1, _ = jax.random.split(k)
        return {"0": init_conv2d(k1, c, c, (1, 1), bias=False, groups=c),
                "1": init_batch_norm(c)}

    return {
        "emb_gru": init_squeezed_gru(next(ks), emb_in, p.emb_hidden_dim,
                                     p.conv_ch * p.nb_erb // 4,
                                     max(1, p.emb_num_layers - 1),
                                     p.linear_groups),
        "conv3p": pathway(next(ks)), "conv2p": pathway(next(ks)),
        "conv1p": pathway(next(ks)), "conv0p": pathway(next(ks)),
        "convt3": {"0": init_conv2d(next(ks), c, c,
                                    tuple(p.convt_kernel), bias=False,
                                    groups=c),
                   "1": init_conv2d(next(ks), c, c, (1, 1), bias=False),
                   "2": init_batch_norm(c)},
        "convt2": init_conv_transpose_block(next(ks), c, p.convt_kernel,
                                            2),
        "convt1": init_conv_transpose_block(next(ks), c, p.convt_kernel,
                                            2),
        "conv0_out": {"0": init_conv2d(next(ks), c, 1,
                                       tuple(p.convt_kernel), bias=False),
                      "1": init_batch_norm(1)},
    }


def _apply_pathway(lp: dict, x: Array) -> Array:
    g = lp["0"]["weight"].shape[-1]
    y = jax.lax.conv_general_dilated(
        x, lp["0"]["weight"].astype(x.dtype), window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    return jax.nn.relu(apply_batch_norm(lp["1"], y))


def _apply_regular_convt3(lp: dict, x: Array) -> Array:
    w = lp["0"]["weight"]
    kt, kf = w.shape[0], w.shape[1]
    y = jax.lax.conv_general_dilated(
        x, lp["0"]["weight"].astype(x.dtype), window_strides=(1, 1),
        padding=[(kt - 1, 0), (kf // 2, kf // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    y = jax.lax.conv_general_dilated(
        y, lp["1"]["weight"].astype(y.dtype), window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return apply_batch_norm(lp["2"], y)


def _apply_out_conv(lp: dict, x: Array) -> Array:
    w = lp["0"]["weight"]
    kt, kf = w.shape[0], w.shape[1]
    y = jax.lax.conv_general_dilated(
        x, lp["0"]["weight"].astype(x.dtype), window_strides=(1, 1),
        padding=[(kt - 1, 0), (kf // 2, kf // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return apply_batch_norm(lp["1"], y)


def erb_decoder_forward(dec: dict, p: DeepFilterNetConfig, emb: Array,
                        e3: Array, e2: Array, e1: Array, e0: Array,
                        gru_states: Optional[List[Array]] = None):
    b, t = emb.shape[:2]
    f8 = e3.shape[2]
    emb, new_states = apply_squeezed_gru(dec["emb_gru"], emb, gru_states)
    emb = emb.reshape(b, t, f8, -1)

    d3 = _apply_pathway(dec["conv3p"], e3) + emb
    d3 = jax.nn.relu(_apply_regular_convt3(dec["convt3"], d3))
    d2 = _apply_pathway(dec["conv2p"], e2) + d3
    d2 = jax.nn.relu(apply_conv_transpose_block(dec["convt2"], d2))
    d1 = _apply_pathway(dec["conv1p"], e1) + d2
    d1 = jax.nn.relu(apply_conv_transpose_block(dec["convt1"], d1))
    d0 = _apply_pathway(dec["conv0p"], e0) + d1
    m = jax.nn.sigmoid(_apply_out_conv(dec["conv0_out"], d0))
    return m[..., 0], new_states          # (B, T, E)


# ----------------------------------------------------------- df decoder

def init_df_decoder(key, p: DeepFilterNetConfig) -> dict:
    ks = iter(jax.random.split(key, 8))
    emb_in = p.emb_hidden_dim if p.enc_concat else p.conv_ch * p.nb_erb // 4
    out_ch = p.df_order * 2
    d = {
        "df_convp": {"1": init_conv2d(
                         next(ks), p.conv_ch, out_ch,
                         (p.df_pathway_kernel_size_t, 1), bias=False,
                         groups=math.gcd(p.conv_ch, out_ch)),
                     "2": init_conv2d(next(ks), out_ch, out_ch, (1, 1),
                                      bias=False),
                     "3": init_batch_norm(out_ch)},
        "df_gru": init_squeezed_gru(next(ks), emb_in, p.df_hidden_dim,
                                    None, p.df_num_layers, 8),
        "df_out": {"0": init_grouped_linear(
            next(ks), p.df_hidden_dim, p.nb_df * out_ch,
            p.linear_groups)},
        "df_fc_a": {"0": init_linear(next(ks), p.df_hidden_dim, 1)},
    }
    if p.df_gru_skip == "groupedlinear":
        d["df_skip"] = init_grouped_linear(next(ks), emb_in,
                                           p.df_hidden_dim,
                                           p.linear_groups)
    return d


def df_decoder_forward(dec: dict, p: DeepFilterNetConfig, emb: Array,
                       c0: Array,
                       gru_states: Optional[List[Array]] = None):
    b, t = emb.shape[:2]
    c, new_states = apply_squeezed_gru(dec["df_gru"], emb, gru_states)
    if "df_skip" in dec:
        c = c + apply_grouped_linear(dec["df_skip"], emb)

    cp = dec["df_convp"]
    kt = cp["1"]["weight"].shape[0]
    y = jax.lax.conv_general_dilated(
        c0, cp["1"]["weight"].astype(c0.dtype), window_strides=(1, 1),
        padding=[(kt - 1, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c0.shape[-1] // cp["1"]["weight"].shape[2])
    y = jax.lax.conv_general_dilated(
        y, cp["2"]["weight"].astype(y.dtype), window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    c0p = jax.nn.relu(apply_batch_norm(cp["3"], y))   # (B, T, D, O*2)

    c_out = jnp.tanh(apply_grouped_linear(dec["df_out"]["0"], c))
    c_out = c_out.reshape(b, t, p.nb_df, p.df_order * 2) + c0p
    return c_out, new_states


# ---------------------------------------------------------------- DfNet

def init_dfnet(key, p: DeepFilterNetConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    f = p.fft_size // 2 + 1
    return {"enc": init_encoder(k1, p),
            "erb_dec": init_erb_decoder(k2, p),
            "df_dec": init_df_decoder(k3, p),
            "erb_fb": jnp.zeros((f, p.nb_erb)),
            "mask": {"erb_inv_fb": jnp.zeros((p.nb_erb, f))}}


def deep_filter(spec_ri: Array, coefs: Array, nb_df: int,
                df_order: int) -> Array:
    """spec_ri (B, T, F, 2); coefs (B, T, D, O*2) -> filtered (B, T, F, 2)
    over the first nb_df bins (reference DeepFilterOp)."""
    b, t = spec_ri.shape[:2]
    low = spec_ri[:, :, :nb_df, :]
    padded = jnp.pad(low, ((0, 0), (df_order - 1, 0), (0, 0), (0, 0)))
    co = coefs.reshape(b, t, nb_df, df_order, 2)
    out_r = jnp.zeros((b, t, nb_df))
    out_i = jnp.zeros((b, t, nb_df))
    for k in range(df_order):
        win = padded[:, k: k + t]
        sr, si = win[..., 0], win[..., 1]
        cr, ci = co[..., k, 0], co[..., k, 1]
        out_r = out_r + sr * cr - si * ci
        out_i = out_i + sr * ci + si * cr
    low_f = jnp.stack([out_r, out_i], -1)
    return jnp.concatenate([low_f, spec_ri[:, :, nb_df:, :]], axis=2)


def dfnet_forward(params: dict, p: DeepFilterNetConfig, spec_ri: Array,
                  feat_erb: Array, feat_spec: Array,
                  states: Optional[dict] = None):
    """spec_ri (B, T, F, 2); feat_erb (B, T, E); feat_spec (B, T, D, 2).
    Returns (enhanced spec_ri, mask, lsnr, new_states)."""
    st = states or {}
    e0, e1, e2, e3, emb, c0, lsnr, enc_st = encoder_forward(
        params["enc"], p, feat_erb[..., None], feat_spec,
        st.get("enc"))
    m, erb_st = erb_decoder_forward(params["erb_dec"], p, emb, e3, e2,
                                    e1, e0, st.get("erb_dec"))
    mask_full = m @ params["mask"]["erb_inv_fb"]      # (B, T, F)
    spec_m = spec_ri * mask_full[..., None]

    coefs, df_st = df_decoder_forward(params["df_dec"], p, emb, c0,
                                      st.get("df_dec"))
    if p.enc_concat:        # DeepFilterNet2 path
        spec_e = deep_filter(spec_m, coefs, p.nb_df, p.df_order)
    else:                   # DeepFilterNet3 path
        spec_df = deep_filter(spec_ri, coefs, p.nb_df, p.df_order)
        spec_e = jnp.concatenate(
            [spec_df[:, :, :p.nb_df, :], spec_m[:, :, p.nb_df:, :]],
            axis=2)
    new_states = {"enc": enc_st, "erb_dec": erb_st, "df_dec": df_st}
    return spec_e, mask_full, lsnr, new_states
