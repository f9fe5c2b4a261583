"""Qwen3-TTS talker + code-predictor transformers (functional).

Parity: /root/reference/mlx_audio/tts/models/qwen3_tts/talker.py
(TalkerRotaryEmbedding/interleaved MRoPE :115-200, TalkerAttention with
QK-norm :228, Qwen3TTSTalkerModel :402, CodePredictor :705,
ForConditionalGeneration :810+).

MRoPE note: for TTS all three position streams are identical
(reference talker.py:450-461 stacks [pos, pos, pos]), so interleaved MRoPE is
numerically identical to plain RoPE over the same inv_freq — we use plain
RoPE and keep the interleave helper for any future mixed-position path.

Caches are fixed-capacity (ops/kvcache.py) so the whole token loop compiles
into a single XLA program.

Compile-cost design: layer params are STACKED (leading L axis on every
leaf) and the depth loop is a `lax.scan`, so the HLO contains ONE layer
body instead of 28 (+5 per code-predictor sub-step) — this is what keeps
the flagship's cold compile tractable. The G-1 code-predictor sub-steps
are likewise a scan over stacked per-group embedding/head tables
(`code_predictor_sample`). Caches are a single stacked KVCache
(L, B, T, H, D) scanned alongside the params.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn import (
    apply_embedding,
    apply_linear,
    apply_rms_norm,
    init_embedding,
    init_linear,
    init_rms_norm,
)
from ....ops.attention import attention, decode_attention
from ....ops.kvcache import KVCache, kv_update
from ....ops.rope import apply_rope, rope_freqs
from .config import Qwen3TTSTalkerCodePredictorConfig, Qwen3TTSTalkerConfig

Array = jax.Array


# ---------------------------------------------------------------------------
# Shared qwen3-style block (QK-norm GQA attention + silu MLP)
# ---------------------------------------------------------------------------


def init_qwen3_layer(ks, hidden: int, n_heads: int, n_kv: int, head_dim: int,
                     inter: int, bias: bool) -> dict:
    return {
        "self_attn": {
            "q_proj": init_linear(next(ks), hidden, n_heads * head_dim, bias=bias),
            "k_proj": init_linear(next(ks), hidden, n_kv * head_dim, bias=bias),
            "v_proj": init_linear(next(ks), hidden, n_kv * head_dim, bias=bias),
            "o_proj": init_linear(next(ks), n_heads * head_dim, hidden, bias=bias),
            "q_norm": init_rms_norm(head_dim),
            "k_norm": init_rms_norm(head_dim),
        },
        "mlp": {
            "gate_proj": init_linear(next(ks), hidden, inter, bias=False),
            "up_proj": init_linear(next(ks), hidden, inter, bias=False),
            "down_proj": init_linear(next(ks), inter, hidden, bias=False),
        },
        "input_layernorm": init_rms_norm(hidden),
        "post_attention_layernorm": init_rms_norm(hidden),
    }


def _concat_linear_params(parts: List[dict], axis_out: int = -2) -> dict:
    """Concatenate linear param dicts along the output dim — exact fusion.

    Works for dense ({'weight' (…, out, in), 'bias' (…, out)}), affine-
    quantized ({'w_q' (…, out, in), 'scales'/'biases' (…, out, ng)}) and
    per-channel int8 ({'w_i8' (…, out, in), 'scale' (…, out)}) leaves,
    with or without a leading stacked-layer axis.
    """
    keys = parts[0].keys()
    fused = {}
    for k in keys:
        if k in ("bias", "scale"):
            # 1-D-per-output leaves concatenate along the output dim = -1
            fused[k] = jnp.concatenate([p[k] for p in parts], axis=-1)
        else:
            fused[k] = jnp.concatenate([p[k] for p in parts], axis=axis_out)
    return fused


def fuse_layer_projections(layers: dict) -> dict:
    """Fuse q/k/v -> qkv_proj and gate/up -> gateup_proj (exact, out-dim
    concat). One matmul instead of three/two per site halves the per-layer
    dispatch overhead of tiny B=1 decode matvecs; `scan_layers` /
    `qwen3_layer_forward` detect the fused keys. Accepts the stacked-layer
    tree (leaves carry a leading L axis) or a single layer's tree."""
    def fuse_one(lp: dict) -> dict:
        lp = dict(lp)
        a = dict(lp["self_attn"])
        if "q_proj" in a:
            a["qkv_proj"] = _concat_linear_params(
                [a.pop("q_proj"), a.pop("k_proj"), a.pop("v_proj")])
        lp["self_attn"] = a
        m = dict(lp.get("mlp", {}))
        if "gate_proj" in m:
            m["gateup_proj"] = _concat_linear_params(
                [m.pop("gate_proj"), m.pop("up_proj")])
            lp["mlp"] = m
        return lp

    return fuse_one(layers)


def _qkv(a: dict, hn: Array, n_heads: int, n_kv: int, head_dim: int):
    """Project hidden -> (q, k, v), via the fused weight when present."""
    b, t, _ = hn.shape
    if "qkv_proj" in a:
        qkv = apply_linear(a["qkv_proj"], hn)
        nq = n_heads * head_dim
        nk = n_kv * head_dim
        q, k, v = (qkv[..., :nq], qkv[..., nq:nq + nk], qkv[..., nq + nk:])
    else:
        q = apply_linear(a["q_proj"], hn)
        k = apply_linear(a["k_proj"], hn)
        v = apply_linear(a["v_proj"], hn)
    return (q.reshape(b, t, n_heads, head_dim),
            k.reshape(b, t, n_kv, head_dim),
            v.reshape(b, t, n_kv, head_dim))


def _mlp(m: dict, hn: Array) -> Array:
    if "gateup_proj" in m:
        gu = apply_linear(m["gateup_proj"], hn)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = apply_linear(m["gate_proj"], hn)
        u = apply_linear(m["up_proj"], hn)
    return apply_linear(m["down_proj"], jax.nn.silu(g) * u)


def qwen3_layer_forward(
    p: dict,
    x: Array,
    positions: Array,
    inv_freq: Array,
    n_heads: int,
    n_kv: int,
    head_dim: int,
    eps: float,
    cache: Optional[KVCache],
    offset,
    mask: Optional[Array],
    causal: bool,
) -> Tuple[Array, Optional[KVCache]]:
    b, t, _ = x.shape
    h = apply_rms_norm(p["input_layernorm"], x, eps)
    a = p["self_attn"]
    q, k, v = _qkv(a, h, n_heads, n_kv, head_dim)
    q = apply_rms_norm(a["q_norm"], q, eps)
    k = apply_rms_norm(a["k_norm"], k, eps)
    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)
    new_cache = None
    if cache is not None:
        new_cache = kv_update(cache, k, v, offset)
        if t == 1:
            out = decode_attention(q, new_cache.k, new_cache.v, offset + 1,
                                   lengths_mask=mask)
        else:
            s = new_cache.k.shape[1]
            pos_s = jnp.arange(s)[None, None, None, :]
            causal_m = pos_s <= (offset + jnp.arange(t))[None, None, :, None]
            valid = pos_s < (offset + t)
            add = jnp.where(causal_m & valid, 0.0, -jnp.inf)
            if mask is not None:
                add = add + mask
            out = attention(q, new_cache.k, new_cache.v, mask=add)
    else:
        out = attention(q, k, v, mask=mask, causal=causal)
    out = out.reshape(b, t, n_heads * head_dim)
    x = x + apply_linear(a["o_proj"], out)
    h = apply_rms_norm(p["post_attention_layernorm"], x, eps)
    x = x + _mlp(p["mlp"], h)
    return x, new_cache


# ---------------------------------------------------------------------------
# Layer stacking (scan-over-depth)
# ---------------------------------------------------------------------------


def stack_layer_trees(per_layer: List[dict]) -> dict:
    """[{...}, {...}] -> one tree whose leaves gained a leading L axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def init_stacked_layers(ks, n_layers: int, hidden: int, n_heads: int,
                        n_kv: int, head_dim: int, inter: int,
                        bias: bool) -> dict:
    return stack_layer_trees([
        init_qwen3_layer(ks, hidden, n_heads, n_kv, head_dim, inter, bias)
        for _ in range(n_layers)])


def make_stacked_caches(n_layers: int, batch: int, max_len: int,
                        n_kv: int, head_dim: int, dtype) -> KVCache:
    """One KVCache with leading layer axis: k/v (L, B, T, Hkv, D)."""
    shape = (n_layers, batch, max_len, n_kv, head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def scan_layers(layers: dict, x: Array, positions, inv_freq, n_heads: int,
                n_kv: int, head_dim: int, eps: float,
                caches: Optional[KVCache], offset, mask,
                causal: bool) -> Tuple[Array, Optional[KVCache]]:
    """Run the stacked layers as one lax.scan (ONE layer body in HLO).

    The stacked cache travels in the scan CARRY and each layer writes only
    its new token column via a 5-D dynamic_update_slice — XLA keeps the
    carry buffer in place, exactly like the unrolled per-layer
    `kv_update`. (Routing the caches through scan xs/ys instead would
    materialize a full per-layer cache copy every step — measured 24%
    decode slowdown on TPU.)
    """
    if caches is None:
        def body(h, lp):
            h, _ = qwen3_layer_forward(lp, h, positions, inv_freq, n_heads,
                                       n_kv, head_dim, eps, None, offset,
                                       mask, causal)
            return h, None

        x, _ = jax.lax.scan(body, x, layers)
        return x, None

    b, t, _ = x.shape

    def body(carry, xs):
        h, ck, cv = carry
        lp, i = xs
        hn = apply_rms_norm(lp["input_layernorm"], h, eps)
        a = lp["self_attn"]
        q, k, v = _qkv(a, hn, n_heads, n_kv, head_dim)
        q = apply_rms_norm(a["q_norm"], q, eps)
        k = apply_rms_norm(a["k_norm"], k, eps)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
        ck = jax.lax.dynamic_update_slice(
            ck, k[None].astype(ck.dtype), (i, 0, offset, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, v[None].astype(cv.dtype), (i, 0, offset, 0, 0))
        k_all = jax.lax.dynamic_index_in_dim(ck, i, 0, keepdims=False)
        v_all = jax.lax.dynamic_index_in_dim(cv, i, 0, keepdims=False)
        if t == 1:
            out = decode_attention(q, k_all, v_all, offset + 1,
                                   lengths_mask=mask)
        else:
            s = ck.shape[2]
            pos_s = jnp.arange(s)[None, None, None, :]
            causal_m = pos_s <= (offset + jnp.arange(t))[None, None, :,
                                                         None]
            valid = pos_s < (offset + t)
            add = jnp.where(causal_m & valid, 0.0, -jnp.inf)
            if mask is not None:
                add = add + mask
            out = attention(q, k_all, v_all, mask=add)
        h = h + apply_linear(a["o_proj"],
                             out.reshape(b, t, n_heads * head_dim))
        hn = apply_rms_norm(lp["post_attention_layernorm"], h, eps)
        h = h + _mlp(lp["mlp"], hn)
        return (h, ck, cv), None

    n_layers = caches.k.shape[0]
    (x, ck, cv), _ = jax.lax.scan(
        body, (x, caches.k, caches.v),
        (layers, jnp.arange(n_layers, dtype=jnp.int32)))
    return x, KVCache(ck, cv)


# ---------------------------------------------------------------------------
# Talker
# ---------------------------------------------------------------------------


def init_talker(key, cfg: Qwen3TTSTalkerConfig) -> dict:
    ks = iter(jax.random.split(key, 16 * cfg.num_hidden_layers + 64))
    model = {
        "codec_embedding": init_embedding(next(ks), cfg.vocab_size,
                                          cfg.hidden_size),
        "text_embedding": init_embedding(next(ks), cfg.text_vocab_size,
                                         cfg.text_hidden_size),
        "layers": init_stacked_layers(
            ks, cfg.num_hidden_layers, cfg.hidden_size,
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
            cfg.intermediate_size, cfg.attention_bias),
        "norm": init_rms_norm(cfg.hidden_size),
    }
    cp = init_code_predictor(next(ks), cfg.code_predictor_config,
                             cfg.hidden_size)
    return {
        "model": model,
        "text_projection": {
            "linear_fc1": init_linear(next(ks), cfg.text_hidden_size,
                                      cfg.text_hidden_size, bias=True),
            "linear_fc2": init_linear(next(ks), cfg.text_hidden_size,
                                      cfg.hidden_size, bias=True),
        },
        "codec_head": init_linear(next(ks), cfg.hidden_size, cfg.vocab_size,
                                  bias=False),
        "code_predictor": cp,
    }


def text_projection(p: dict, x: Array) -> Array:
    """ResizeMLP (reference talker.py:338-364)."""
    h = jax.nn.silu(apply_linear(p["text_projection"]["linear_fc1"], x))
    return apply_linear(p["text_projection"]["linear_fc2"], h)


def talker_forward(
    p: dict,
    cfg: Qwen3TTSTalkerConfig,
    inputs_embeds: Array,
    caches: Optional[List[KVCache]],
    offset,
    lengths_mask: Optional[Array] = None,
    positions: Optional[Array] = None,
) -> Tuple[Array, Array, Optional[List[KVCache]]]:
    """-> (codec_logits (B, T, V), hidden (B, T, D), new_caches).

    `offset` is the cache write column; `positions` (B, T) overrides the RoPE
    positions when rows live at different logical times (continuous batching).
    """
    m = p["model"]
    b, t, _ = inputs_embeds.shape
    if positions is None:
        positions = offset + jnp.arange(t)[None, :]
    inv_freq = rope_freqs(cfg.head_dim, cfg.rope_theta)
    x, new_caches = scan_layers(
        m["layers"], inputs_embeds, positions, inv_freq,
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        cfg.rms_norm_eps, caches, offset, lengths_mask, causal=True)
    x = apply_rms_norm(m["norm"], x, cfg.rms_norm_eps)
    logits = apply_linear(p["codec_head"], x)
    return logits, x, new_caches


# ---------------------------------------------------------------------------
# Code predictor
# ---------------------------------------------------------------------------


def init_code_predictor(key, cfg: Qwen3TTSTalkerCodePredictorConfig,
                        talker_hidden: int) -> dict:
    ks = iter(jax.random.split(key, 16 * cfg.num_hidden_layers
                               + 4 * cfg.num_code_groups + 16))
    g1 = cfg.num_code_groups - 1
    p = {
        "model": {
            # per-group codec embeddings for groups 1..G-1, stacked (G-1,V,D)
            "codec_embedding": {"weight": jnp.stack([
                init_embedding(next(ks), cfg.vocab_size,
                               cfg.hidden_size)["weight"]
                for _ in range(g1)])},
            "layers": init_stacked_layers(
                ks, cfg.num_hidden_layers, cfg.hidden_size,
                cfg.num_attention_heads, cfg.num_key_value_heads,
                cfg.head_dim, cfg.intermediate_size, cfg.attention_bias),
            "norm": init_rms_norm(cfg.hidden_size),
        },
        # per-group heads stacked (G-1, V, D)
        "lm_head": {"weight": jnp.stack([
            init_linear(next(ks), cfg.hidden_size, cfg.vocab_size,
                        bias=False)["weight"] for _ in range(g1)])},
    }
    if cfg.hidden_size != talker_hidden:
        p["small_to_mtp_projection"] = init_linear(
            next(ks), talker_hidden, cfg.hidden_size, bias=True)
    return p


def code_predictor_forward(
    p: dict,
    cfg: Qwen3TTSTalkerCodePredictorConfig,
    inputs_embeds: Array,
    caches: KVCache,
    offset,
    head_idx,
) -> Tuple[Array, KVCache]:
    """One code-predictor step -> (logits of lm_head[head_idx], new caches).

    `head_idx` may be traced (the stacked head table is gathered)."""
    if "small_to_mtp_projection" in p:
        inputs_embeds = apply_linear(p["small_to_mtp_projection"],
                                     inputs_embeds)
    m = p["model"]
    b, t, _ = inputs_embeds.shape
    positions = offset + jnp.arange(t)[None, :]
    inv_freq = rope_freqs(cfg.head_dim, cfg.rope_theta)
    x, new_caches = scan_layers(
        m["layers"], inputs_embeds, positions, inv_freq,
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        cfg.rms_norm_eps, caches, offset, None, causal=True)
    x = apply_rms_norm(m["norm"], x, cfg.rms_norm_eps)
    head_w = jnp.take(p["lm_head"]["weight"], head_idx, axis=0)  # (V, D)
    logits = x[:, -1] @ head_w.T
    return logits, new_caches


def code_predictor_sample(
    cp: dict,
    cfg: Qwen3TTSTalkerCodePredictorConfig,
    hidden: Array,
    code0_embed: Array,
    key: Array,
    sample_fn,
    n_groups: int,
) -> Tuple[Array, Array, Array]:
    """Sample groups 1..G-1 sequentially (MTP sub-steps) as ONE lax.scan.

    hidden: talker hidden at the sampled position (B, 1, D_talker);
    code0_embed: talker codec-embedding of group-0's token (B, 1, D).
    Returns (codes (B, G-1), summed cp-embedding of those codes (B, 1, D),
    next key). Sub-step 0 consumes [hidden, code0] (T=2) outside the scan;
    sub-steps 1.. are the scan body (T=1) over stacked per-group tables —
    the HLO holds 2 code-predictor bodies total instead of G-1.
    """
    b = hidden.shape[0]
    cp_emb = cp["model"]["codec_embedding"]["weight"]  # (G-1, V, D)
    caches = make_stacked_caches(
        cfg.num_hidden_layers, b, n_groups + 2, cfg.num_key_value_heads,
        cfg.head_dim, hidden.dtype)

    x = jnp.concatenate([hidden, code0_embed], axis=1)
    logits, caches = code_predictor_forward(cp, cfg, x, caches,
                                            jnp.int32(0), 0)
    key, k0 = jax.random.split(key)
    tok1 = sample_fn(k0, logits)                      # group 1

    def step(carry, gi):
        prev_tok, caches, key, emb_sum = carry
        x = jnp.take(cp_emb, gi - 1, axis=0)[prev_tok][:, None]
        emb_sum = emb_sum + x
        logits, caches = code_predictor_forward(cp, cfg, x, caches,
                                                gi + 1, gi)
        key, kg = jax.random.split(key)
        tok = sample_fn(kg, logits)
        return (tok, caches, key, emb_sum), tok

    emb0 = jnp.zeros_like(code0_embed)
    (last_tok, _, key, emb_sum), toks = jax.lax.scan(
        step, (tok1, caches, key, emb0),
        jnp.arange(1, n_groups - 1, dtype=jnp.int32))
    emb_sum = emb_sum + jnp.take(cp_emb, n_groups - 2,
                                 axis=0)[last_tok][:, None]
    codes = jnp.concatenate([tok1[None], toks], axis=0)  # (G-1, B)
    return codes.T, emb_sum, key
