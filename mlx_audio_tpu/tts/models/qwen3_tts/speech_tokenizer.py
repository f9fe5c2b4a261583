"""Qwen3-TTS 12.5 Hz RVQ speech-tokenizer decoder with compiled streaming.

Parity: /root/reference/mlx_audio/tts/models/qwen3_tts/speech_tokenizer.py
(CausalConv1d :32, CausalTransposeConv1d :86, SnakeBeta :110, ConvNeXtBlock
:129, DecoderTransformer :363 w/ sliding-window 72 + LayerScale, Split-RVQ
:544, DecoderBlock :663, full decoder + streaming_step :786-956).

TPU redesign: streaming state is an **explicit pytree** (conv ring buffers,
transpose-conv overlap tails, fixed-capacity transformer KV cache, time
offset) threaded through a pure `streaming_step(params, state, codes)` that
jit-compiles once per chunk size — no Python-side mutable module buffers, no
host syncs inside the chunk.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn import (
    apply_conv1d,
    apply_conv_transpose1d,
    apply_embedding,
    apply_layer_norm,
    apply_linear,
    apply_rms_norm,
    init_conv1d,
    init_conv_transpose1d,
    init_embedding,
    init_layer_norm,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update, kv_update_rows
from ....ops.rope import apply_rope, rope_freqs
from .config import Qwen3TTSTokenizerDecoderConfig

Array = jax.Array

STREAM_CACHE_LEN = 4096  # max decode length for the streaming transformer


# ---------------------------------------------------------------------------
# Primitive helpers
# ---------------------------------------------------------------------------


def snake_beta(p: dict, x: Array) -> Array:
    """x + (1/e^beta) sin^2(e^alpha x) (reference :110-127)."""
    alpha = jnp.exp(p["alpha"])
    beta = jnp.exp(p["beta"])
    return x + (1.0 / (beta + 1e-9)) * jnp.sin(x * alpha) ** 2


def _causal_pad(x: Array, pad: int) -> Array:
    return jnp.pad(x, ((0, 0), (pad, 0), (0, 0))) if pad > 0 else x


def causal_conv(p: dict, x: Array, kernel: int, dilation: int = 1,
                groups: int = 1, stride: int = 1) -> Array:
    pad = (kernel - 1) * dilation + 1 - stride
    return apply_conv1d(p["conv"], _causal_pad(x, pad), stride=stride,
                        dilation=dilation, groups=groups)


def causal_conv_step(p: dict, x: Array, buf: Array, dilation: int = 1,
                     groups: int = 1) -> Tuple[Array, Array]:
    """Streaming causal conv: buf holds the last `pad` inputs."""
    ctx = jnp.concatenate([buf, x], axis=1)
    y = apply_conv1d(p["conv"], ctx, dilation=dilation, groups=groups)
    pad = buf.shape[1]
    return y, ctx[:, ctx.shape[1] - pad:, :]


def causal_tconv(p: dict, x: Array, kernel: int, stride: int) -> Array:
    y = apply_conv_transpose1d(p["conv"], x, stride=stride, padding=0)
    trim = kernel - stride
    return y[:, : y.shape[1] - trim, :] if trim > 0 else y


def causal_tconv_step(p: dict, x: Array, overflow: Array, kernel: int,
                      stride: int) -> Tuple[Array, Array]:
    """Streaming transposed conv: overlap-add the carried tail (reference
    DecoderBlockUpsample.step / CausalTransposeConv1d streaming)."""
    y = apply_conv_transpose1d(p["conv"], x, stride=stride, padding=0)
    trim = kernel - stride
    if trim > 0:
        ov_len = overflow.shape[1]
        y = y.at[:, :ov_len, :].add(overflow)
        new_overflow = y[:, y.shape[1] - trim:, :]
        y = y[:, : y.shape[1] - trim, :]
        return y, new_overflow
    return y, overflow


# ---------------------------------------------------------------------------
# RVQ decode
# ---------------------------------------------------------------------------


def init_split_rvq(key, cfg: Qwen3TTSTokenizerDecoderConfig) -> dict:
    ks = iter(jax.random.split(key, 4 * cfg.num_quantizers + 8))
    dim = cfg.codebook_dim // 2

    def rvq(n_q):
        return {
            "output_proj": {"weight": jax.random.normal(
                next(ks), (1, dim, cfg.codebook_dim)) * 0.02},
            "vq": {"layers": {
                str(i): {"codebook": {"embed": init_embedding(
                    next(ks), cfg.codebook_size, dim)}}
                for i in range(n_q)
            }},
        }

    return {
        "rvq_first": rvq(cfg.num_semantic_quantizers),
        "rvq_rest": rvq(cfg.num_quantizers - cfg.num_semantic_quantizers),
    }


def split_rvq_decode(p: dict, cfg: Qwen3TTSTokenizerDecoderConfig,
                     codes: Array) -> Array:
    """codes (B, n_q, T) -> latent (B, T, codebook_dim).

    Sum of per-level codebook lookups, projected per split (semantic level 0
    vs acoustic rest), matching SplitResidualVectorQuantizer.decode
    (reference :544-604). The lookup is a gather + 1x1 conv — pure MXU work.
    """
    n_sem = cfg.num_semantic_quantizers

    def decode_rvq(rp, c):
        # c (B, nq, T)
        acc = None
        for i in range(c.shape[1]):
            q = apply_embedding(rp["vq"]["layers"][str(i)]["codebook"]["embed"],
                                c[:, i])  # (B, T, dim)
            acc = q if acc is None else acc + q
        return apply_conv1d(rp["output_proj"], acc)  # 1x1 conv WIO (1,dim,out)

    out = decode_rvq(p["rvq_first"], codes[:, :n_sem])
    if codes.shape[1] > n_sem:
        out = out + decode_rvq(p["rvq_rest"], codes[:, n_sem:])
    return out


# ---------------------------------------------------------------------------
# Pre-transformer (sliding-window attention + LayerScale)
# ---------------------------------------------------------------------------


def init_pre_transformer(key, cfg: Qwen3TTSTokenizerDecoderConfig) -> dict:
    ks = iter(jax.random.split(key, 16 * cfg.num_hidden_layers + 8))
    layers = {}
    for i in range(cfg.num_hidden_layers):
        layers[str(i)] = {
            "self_attn": {
                "q_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_attention_heads * cfg.head_dim,
                                      bias=cfg.attention_bias),
                "k_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_key_value_heads * cfg.head_dim,
                                      bias=cfg.attention_bias),
                "v_proj": init_linear(next(ks), cfg.hidden_size,
                                      cfg.num_key_value_heads * cfg.head_dim,
                                      bias=cfg.attention_bias),
                "o_proj": init_linear(next(ks),
                                      cfg.num_attention_heads * cfg.head_dim,
                                      cfg.hidden_size,
                                      bias=cfg.attention_bias),
            },
            "mlp": {
                "gate_proj": init_linear(next(ks), cfg.hidden_size,
                                         cfg.intermediate_size, bias=False),
                "up_proj": init_linear(next(ks), cfg.hidden_size,
                                       cfg.intermediate_size, bias=False),
                "down_proj": init_linear(next(ks), cfg.intermediate_size,
                                         cfg.hidden_size, bias=False),
            },
            "input_layernorm": init_rms_norm(cfg.hidden_size),
            "post_attention_layernorm": init_rms_norm(cfg.hidden_size),
            "self_attn_layer_scale": {
                "scale": jnp.full((cfg.hidden_size,),
                                  cfg.layer_scale_initial_scale)},
            "mlp_layer_scale": {
                "scale": jnp.full((cfg.hidden_size,),
                                  cfg.layer_scale_initial_scale)},
        }
    return {
        "input_proj": init_linear(next(ks), cfg.latent_dim, cfg.hidden_size),
        "output_proj": init_linear(next(ks), cfg.hidden_size, cfg.latent_dim),
        "layers": layers,
        "norm": init_rms_norm(cfg.hidden_size),
    }


def pre_transformer_forward(
    p: dict,
    cfg: Qwen3TTSTokenizerDecoderConfig,
    x: Array,
    caches: Optional[List[KVCache]] = None,
    offset=0,
) -> Tuple[Array, Optional[List[KVCache]]]:
    b, t, _ = x.shape
    x = apply_linear(p["input_proj"], x)
    # offset: scalar (single stream) or (B,) per-row stream ages — the
    # batched continuous-batching decoder runs rows admitted at different
    # steps through ONE program, so each row carries its own position
    per_row = getattr(offset, "ndim", 0) == 1
    if per_row:
        positions = offset[:, None] + jnp.arange(t)[None, :]   # (B, t)
    else:
        positions = offset + jnp.arange(t)[None, :]
    inv_freq = rope_freqs(cfg.head_dim, cfg.rope_theta)
    win = cfg.sliding_window
    new_caches = [] if caches is not None else None
    for i in range(cfg.num_hidden_layers):
        lp = p["layers"][str(i)]
        h = apply_rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
        a = lp["self_attn"]
        q = apply_linear(a["q_proj"], h).reshape(b, t, cfg.num_attention_heads,
                                                 cfg.head_dim)
        k = apply_linear(a["k_proj"], h).reshape(b, t, cfg.num_key_value_heads,
                                                 cfg.head_dim)
        v = apply_linear(a["v_proj"], h).reshape(b, t, cfg.num_key_value_heads,
                                                 cfg.head_dim)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
        if caches is not None:
            nc = (kv_update_rows(caches[i], k, v, offset) if per_row
                  else kv_update(caches[i], k, v, offset))
            new_caches.append(nc)
            s = nc.k.shape[1]
            pos_s = jnp.arange(s)[None, None, None, :]
            q_pos = positions[:, None, :, None]            # (B, 1, t, 1)
            ok = (pos_s <= q_pos) & (pos_s > q_pos - win)
            mask = jnp.where(ok, 0.0, -jnp.inf)
            out = attention(q, nc.k, nc.v, mask=mask)
        else:
            q_pos = jnp.arange(t)[:, None]
            k_pos = jnp.arange(t)[None, :]
            ok = (k_pos <= q_pos) & (k_pos > q_pos - win)
            mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
            out = attention(q, k, v, mask=mask)
        out = out.reshape(b, t, cfg.num_attention_heads * cfg.head_dim)
        x = x + apply_linear(a["o_proj"], out) * lp["self_attn_layer_scale"]["scale"]
        h = apply_rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        m = lp["mlp"]
        mlp_out = apply_linear(m["down_proj"],
                               jax.nn.silu(apply_linear(m["gate_proj"], h))
                               * apply_linear(m["up_proj"], h))
        x = x + mlp_out * lp["mlp_layer_scale"]["scale"]
    x = apply_rms_norm(p["norm"], x, cfg.rms_norm_eps)
    return apply_linear(p["output_proj"], x), new_caches


# ---------------------------------------------------------------------------
# Decoder conv stack
# ---------------------------------------------------------------------------


def _init_convnext(key, dim: int) -> dict:
    ks = iter(jax.random.split(key, 4))
    return {
        "dwconv": {"conv": init_conv1d(next(ks), dim, dim, 7, groups=dim)},
        "norm": init_layer_norm(dim),
        "pwconv1": init_linear(next(ks), dim, 4 * dim),
        "pwconv2": init_linear(next(ks), 4 * dim, dim),
        "gamma": jnp.full((dim,), 1e-6),
    }


def _convnext_apply(p: dict, x: Array, step_buf: Optional[Array] = None):
    res = x
    if step_buf is None:
        h = causal_conv(p["dwconv"], x, 7, groups=x.shape[-1])
        new_buf = None
    else:
        h, new_buf = causal_conv_step(p["dwconv"], x, step_buf,
                                      groups=x.shape[-1])
    h = apply_layer_norm(p["norm"], h, eps=1e-6)
    h = apply_linear(p["pwconv1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = apply_linear(p["pwconv2"], h)
    return res + p["gamma"] * h, new_buf


def _init_res_unit(key, dim: int, dilation: int) -> dict:
    ks = iter(jax.random.split(key, 4))
    return {
        "act1": {"alpha": jnp.zeros((dim,)), "beta": jnp.zeros((dim,))},
        "conv1": {"conv": init_conv1d(next(ks), dim, dim, 7)},
        "act2": {"alpha": jnp.zeros((dim,)), "beta": jnp.zeros((dim,))},
        "conv2": {"conv": init_conv1d(next(ks), dim, dim, 1)},
    }


def _res_unit_apply(p: dict, x: Array, dilation: int,
                    step_buf: Optional[Array] = None):
    res = x
    h = snake_beta(p["act1"], x)
    if step_buf is None:
        h = causal_conv(p["conv1"], h, 7, dilation=dilation)
        new_buf = None
    else:
        h, new_buf = causal_conv_step(p["conv1"], h, step_buf,
                                      dilation=dilation)
    h = snake_beta(p["act2"], h)
    h = causal_conv(p["conv2"], h, 1)
    return h + res, new_buf


def init_decoder(key, cfg: Qwen3TTSTokenizerDecoderConfig) -> dict:
    ks = iter(jax.random.split(key, 64))
    upsample = {}
    for i, factor in enumerate(cfg.upsampling_ratios):
        upsample[str(i)] = {
            "0": {"conv": init_conv_transpose1d(next(ks), cfg.latent_dim,
                                                cfg.latent_dim, factor * 2)},
            "1": _init_convnext(next(ks), cfg.latent_dim),
        }
    blocks = {"0": {"conv": init_conv1d(next(ks), cfg.latent_dim,
                                        cfg.decoder_dim, 7)}}
    for li, rate in enumerate(cfg.upsample_rates):
        in_dim = cfg.decoder_dim // (2 ** li)
        out_dim = cfg.decoder_dim // (2 ** (li + 1))
        blocks[str(li + 1)] = {"block": {
            "0": {"alpha": jnp.zeros((in_dim,)), "beta": jnp.zeros((in_dim,))},
            "1": {"conv": init_conv_transpose1d(next(ks), in_dim, out_dim,
                                                rate * 2)},
            "2": _init_res_unit(next(ks), out_dim, 1),
            "3": _init_res_unit(next(ks), out_dim, 3),
            "4": _init_res_unit(next(ks), out_dim, 9),
        }}
    out_dim = cfg.decoder_dim // (2 ** len(cfg.upsample_rates))
    blocks[str(len(cfg.upsample_rates) + 1)] = {
        "alpha": jnp.zeros((out_dim,)), "beta": jnp.zeros((out_dim,))}
    blocks[str(len(cfg.upsample_rates) + 2)] = {
        "conv": init_conv1d(next(ks), out_dim, 1, 7)}
    return {
        "pre_transformer": init_pre_transformer(next(ks), cfg),
        "quantizer": init_split_rvq(next(ks), cfg),
        "pre_conv": {"conv": init_conv1d(next(ks), cfg.codebook_dim,
                                         cfg.latent_dim, 3)},
        "upsample": upsample,
        "decoder": blocks,
    }


def total_upsample(cfg: Qwen3TTSTokenizerDecoderConfig) -> int:
    return int(math.prod(cfg.upsample_rates) * math.prod(cfg.upsampling_ratios))


def decode_full(p: dict, cfg: Qwen3TTSTokenizerDecoderConfig,
                codes: Array) -> Array:
    """codes (B, n_q, T) -> audio (B, T * total_upsample). Non-streaming."""
    h = split_rvq_decode(p["quantizer"], cfg, codes)
    h = causal_conv(p["pre_conv"], h, 3)
    h, _ = pre_transformer_forward(p["pre_transformer"], cfg, h)
    for i in range(len(cfg.upsampling_ratios)):
        up = p["upsample"][str(i)]
        factor = cfg.upsampling_ratios[i]
        h = causal_tconv(up["0"], h, factor * 2, factor)
        h, _ = _convnext_apply(up["1"], h)
    d = p["decoder"]
    h = causal_conv(d["0"], h, 7)
    for li, rate in enumerate(cfg.upsample_rates):
        blk = d[str(li + 1)]["block"]
        h = snake_beta(blk["0"], h)
        h = causal_tconv(blk["1"], h, rate * 2, rate)
        for j, dil in zip(("2", "3", "4"), (1, 3, 9)):
            h, _ = _res_unit_apply(blk[j], h, dil)
    h = snake_beta(d[str(len(cfg.upsample_rates) + 1)], h)
    h = causal_conv(d[str(len(cfg.upsample_rates) + 2)], h, 7)
    return jnp.clip(h[..., 0], -1.0, 1.0)


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------


_INIT_STATE_JIT: dict = {}


def init_stream_state(cfg: Qwen3TTSTokenizerDecoderConfig, batch: int = 1,
                      dtype=jnp.float32, per_row_offset: bool = False,
                      cache_len: Optional[int] = None) -> dict:
    """Explicit streaming-state pytree (all fixed shapes).

    Jitted as ONE nullary program per (cfg-shape, batch, dtype): built
    eagerly this is ~50 separate jnp.zeros dispatches, and on a tunneled
    backend those tiny launches dominate a continuous-batching session's
    first-step drain (8 submits x ~50 programs measured as the largest
    slice of a 1.5 s step-0 wall).

    per_row_offset=True makes "offset" a (batch,) vector so rows admitted
    at different times can decode through one batched program.

    cache_len right-sizes the streaming transformer's KV buffer: the
    default 4096-frame buffer is 2 GB+ at b=8/f32 and attention reads ALL
    of it every step, so a session that caps streams at ~100 frames pays
    30x the KV bandwidth it needs (continuous batching passes its own
    bound)."""
    cache_len = cache_len or STREAM_CACHE_LEN
    fp = (cfg.codebook_dim, cfg.num_hidden_layers, cfg.num_key_value_heads,
          cfg.head_dim, tuple(cfg.upsampling_ratios), cfg.latent_dim,
          tuple(cfg.upsample_rates), cfg.decoder_dim, batch,
          jnp.dtype(dtype).name, per_row_offset, cache_len)
    fn = _INIT_STATE_JIT.get(fp)
    if fn is None:
        fn = jax.jit(lambda: _init_stream_state_eager(cfg, batch, dtype,
                                                      per_row_offset,
                                                      cache_len))
        _INIT_STATE_JIT[fp] = fn
    return fn()


def _init_stream_state_eager(cfg: Qwen3TTSTokenizerDecoderConfig,
                             batch: int = 1, dtype=jnp.float32,
                             per_row_offset: bool = False,
                             cache_len: int = STREAM_CACHE_LEN) -> dict:
    z = lambda t, c: jnp.zeros((batch, t, c), dtype)
    state: dict = {
        "offset": (jnp.zeros((batch,), jnp.int32) if per_row_offset
                   else jnp.int32(0)),
        "pre_conv_buf": z(2, cfg.codebook_dim),
        "tf_caches": [
            KVCache.init(batch, cache_len, cfg.num_key_value_heads,
                         cfg.head_dim, dtype)
            for _ in range(cfg.num_hidden_layers)
        ],
        "upsample": {},
        "decoder": {},
    }
    for i, factor in enumerate(cfg.upsampling_ratios):
        state["upsample"][str(i)] = {
            "overflow": z(factor * 2 - factor, cfg.latent_dim),
            "convnext_buf": z(6, cfg.latent_dim),
        }
    state["decoder"]["init_buf"] = z(6, cfg.latent_dim)
    for li, rate in enumerate(cfg.upsample_rates):
        out_dim = cfg.decoder_dim // (2 ** (li + 1))
        state["decoder"][str(li + 1)] = {
            "overflow": z(rate * 2 - rate, out_dim),
            "res2_buf": z(6 * 1, out_dim),
            "res3_buf": z(6 * 3, out_dim),
            "res4_buf": z(6 * 9, out_dim),
        }
    out_dim = cfg.decoder_dim // (2 ** len(cfg.upsample_rates))
    state["decoder"]["out_buf"] = z(6, out_dim)
    return state


def streaming_step(p: dict, cfg: Qwen3TTSTokenizerDecoderConfig, state: dict,
                   codes: Array) -> Tuple[dict, Array]:
    """Decode ONLY the new codes (B, n_q, T_new) -> (new_state, audio).

    Pure function of (params, state, codes): jit once per chunk length.
    """
    ns = {"upsample": {}, "decoder": {}}
    h = split_rvq_decode(p["quantizer"], cfg, codes)
    h, ns["pre_conv_buf"] = causal_conv_step(p["pre_conv"], h,
                                             state["pre_conv_buf"])
    h, ns["tf_caches"] = pre_transformer_forward(
        p["pre_transformer"], cfg, h, caches=state["tf_caches"],
        offset=state["offset"])
    ns["offset"] = state["offset"] + codes.shape[-1]
    for i in range(len(cfg.upsampling_ratios)):
        up = p["upsample"][str(i)]
        st = state["upsample"][str(i)]
        factor = cfg.upsampling_ratios[i]
        h, ov = causal_tconv_step(up["0"], h, st["overflow"], factor * 2,
                                  factor)
        h, cb = _convnext_apply(up["1"], h, st["convnext_buf"])
        ns["upsample"][str(i)] = {"overflow": ov, "convnext_buf": cb}
    d = p["decoder"]
    h, ns["decoder"]["init_buf"] = causal_conv_step(
        d["0"], h, state["decoder"]["init_buf"])
    for li, rate in enumerate(cfg.upsample_rates):
        blk = d[str(li + 1)]["block"]
        st = state["decoder"][str(li + 1)]
        h = snake_beta(blk["0"], h)
        h, ov = causal_tconv_step(blk["1"], h, st["overflow"], rate * 2, rate)
        h, b2 = _res_unit_apply(blk["2"], h, 1, st["res2_buf"])
        h, b3 = _res_unit_apply(blk["3"], h, 3, st["res3_buf"])
        h, b4 = _res_unit_apply(blk["4"], h, 9, st["res4_buf"])
        ns["decoder"][str(li + 1)] = {"overflow": ov, "res2_buf": b2,
                                      "res3_buf": b3, "res4_buf": b4}
    h = snake_beta(d[str(len(cfg.upsample_rates) + 1)], h)
    h, ns["decoder"]["out_buf"] = causal_conv_step(
        d[str(len(cfg.upsample_rates) + 2)], h, state["decoder"]["out_buf"])
    return ns, jnp.clip(h[..., 0], -1.0, 1.0)


# ---------------------------------------------------------------------------
# encoder (ICL voice cloning) — reuses the shared Mimi stack
# ---------------------------------------------------------------------------

def encoder_mimi_config(enc_cfg: Optional[dict]):
    """Build a MimiConfig from the qwen3 tokenizer encoder_config dict.

    The qwen3 speech-tokenizer encoder (reference speech_tokenizer.py:957 —
    SeanetEncoder -> ProjectedTransformer -> ConvDownsample1d -> SplitRVQ) is
    architecturally the Mimi encoder, so the repo's codec/models/mimi encode
    path is reused with remapped config fields.
    """
    from ....codec.models.mimi.mimi import MimiConfig

    e = dict(enc_cfg or {})
    return MimiConfig(
        channels=e.get("audio_channels", 1),
        sample_rate=e.get("sampling_rate", 24000),
        frame_rate=e.get("frame_rate", 12.5),
        seanet=dict(
            dimension=e.get("hidden_size", 512),
            channels=e.get("audio_channels", 1),
            nfilters=e.get("num_filters", 64),
            nresidual_layers=e.get("num_residual_layers", 1),
            ratios=e.get("upsampling_ratios", [8, 6, 5, 4]),
            ksize=e.get("kernel_size", 7),
            residual_ksize=e.get("residual_kernel_size", 3),
            last_ksize=e.get("last_kernel_size", 3),
            dilation_base=e.get("dilation_growth_rate", 2),
            pad_mode="constant",
            true_skip=not e.get("use_conv_shortcut", False),
            compress=e.get("compress", 2),
        ),
        transformer=dict(
            d_model=e.get("hidden_size", 512),
            num_heads=e.get("num_attention_heads", 8),
            num_layers=e.get("num_hidden_layers", 8),
            layer_scale=e.get("layer_scale_initial_scale", 0.01),
            context=e.get("sliding_window", 250),
            max_period=float(e.get("rope_theta", 10000.0)),
            dim_feedforward=e.get("intermediate_size", 2048),
        ),
        quantizer_nq=e.get("num_quantizers", 32),
        quantizer_bins=e.get("codebook_size", 2048),
        quantizer_dim=e.get("codebook_dim", 256),
    )
