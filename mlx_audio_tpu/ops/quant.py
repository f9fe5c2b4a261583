"""Affine group-wise weight quantization (int8 / int4).

Scheme: w ≈ scales * q + biases per contiguous group of `group_size` input
features — the same affine layout the reference drives through
`apply_quantization` (/root/reference/mlx_audio/utils.py:209-256) and the
convert CLI's quant recipes (/root/reference/mlx_audio/convert.py:22-23).

TPU design notes:
* Codes are stored one-per-byte (uint8) or packed 2-per-byte for 4-bit;
  dequantization is expressed so XLA fuses it into the consuming matmul —
  weights stream HBM->VMEM once at ~half/quarter bf16 bytes, which is the
  whole win for memory-bound AR decode.
* A Pallas fused dequant-matmul kernel (ops/qmm_pallas.py) can replace the
  XLA path for the largest layers; the functional contract stays identical.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

Array = jax.Array


def quantize_weight(
    w: Array, group_size: int = 64, bits: int = 4
) -> dict:
    """Quantize (out, in) weight to affine group codes.

    Returns params dict {'w_q': uint8 (out, in), 'scales': (out, in/gs),
    'biases': (out, in/gs), '_bits', '_group_size'}.
    """
    out_f, in_f = w.shape
    assert in_f % group_size == 0, (in_f, group_size)
    g = w.reshape(out_f, in_f // group_size, group_size).astype(jnp.float32)
    wmax = jnp.max(g, axis=-1)
    wmin = jnp.min(g, axis=-1)
    n_levels = (1 << bits) - 1
    scales = jnp.maximum((wmax - wmin) / n_levels, 1e-8)
    biases = wmin
    q = jnp.clip(jnp.round((g - biases[..., None]) / scales[..., None]), 0, n_levels)
    # group size is implied by shapes: in_f // scales.shape[1]; no static
    # markers are stored (jit would treat them as traced leaves)
    return {
        "w_q": q.reshape(out_f, in_f).astype(jnp.uint8),
        "scales": scales.astype(jnp.float32),
        "biases": biases.astype(jnp.float32),
    }


def dequantize_weight(params: dict, dtype=jnp.float32) -> Array:
    """Reconstruct the dense weight (out, in); stacked (L, out, in) leaves
    dequantize layer-wise."""
    if params["w_q"].ndim == 3:
        core = {k: params[k] for k in ("w_q", "scales", "biases")}
        return jax.vmap(lambda p: dequantize_weight(p, dtype))(core)
    q = params["w_q"].astype(jnp.float32)
    out_f, in_f = q.shape
    gs = in_f // params["scales"].shape[1]
    qg = q.reshape(out_f, in_f // gs, gs)
    w = qg * params["scales"][..., None] + params["biases"][..., None]
    return w.reshape(out_f, in_f).astype(dtype)


def qmatmul(params: dict, x: Array) -> Array:
    """x (..., in) @ dequant(w)(out, in)^T [+ bias].

    Formulated so the whole dequant fuses into the dot's operand stream:
    the big matrix sees only a u8->compute-dtype cast and one multiply by
    the repeated per-group scale (fused into the matmul's HBM->MXU
    pipeline — the dense weight never materializes in HBM); the group-bias
    term factors out exactly as a tiny (ng -> out) dot against the
    per-group activation sums.

    v5e reality check (8192x3072, gs=64, B=1, 512-step scan): this runs at
    ~0.066 ms/matvec — the SAME wall clock as the bf16 dense matvec,
    because the VPU dequant throughput (~380G weights/s for cast+mul) and
    the HBM bf16 streaming rate (757 GB/s = 380G bf16 weights/s) coincide
    on this chip. Affine-q8 decode is therefore VPU-bound, not
    bandwidth-bound: its win is the 2x weight footprint (and HBM headroom
    for batching/KV), not single-stream latency. For decode latency use
    `qmatmul_i8` (per-channel W8A8 on the MXU, measured 1.5x faster than
    both this and bf16-dense at b=1 — tools/bench_qmm_formulations.py); a
    naive int8 matvec (cast inside one dot) lowers poorly and measures 2x
    slower.
    """
    out_f, in_f = params["w_q"].shape
    ng = params["scales"].shape[1]
    gs = in_f // ng
    scales = jnp.repeat(params["scales"].astype(x.dtype), gs, axis=1)
    wd = params["w_q"].astype(x.dtype) * scales            # fused into dot
    y = jnp.einsum("...i,oi->...o", x, wd)
    xsum = jnp.sum(
        x.reshape(x.shape[:-1] + (ng, gs)).astype(jnp.float32), axis=-1)
    y = y + jnp.einsum("...g,og->...o", xsum,
                       params["biases"].astype(jnp.float32)).astype(y.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# int8 MXU decode path (W8A8, per-channel symmetric)
# ---------------------------------------------------------------------------


def to_i8_layout(params: dict) -> dict:
    """Affine per-group codes -> per-(output)channel symmetric int8.

    w_i8[o, i] = round(dequant(w)[o, i] / scale[o]), scale (out,) f32.
    The re-quantization from the per-group affine grid onto the per-channel
    symmetric grid adds ~0.5 LSB noise (measured ~1.1e-2 max-rel on the
    matmul output at transformer dims, vs ~6e-3 for per-group); the payoff
    is that `qmatmul_i8` becomes ONE int8 MXU dot with no per-group partial
    sums. Formulations that preserve per-group scales were raced and lose
    at model scale (tools/bench_qmm_formulations.py): block-diagonal
    partials multiply dot FLOPs by n_groups (x128 on a down_proj, turning
    the step compute-bound), and a grouped batched dot forces XLA to pad
    the 64-wide contraction to the 128 MXU tile (2x the weight stream).
    """
    rest = {k: v for k, v in params.items()
            if k not in ("w_q", "scales", "biases")}
    core = {k: params[k] for k in ("w_q", "scales", "biases")}
    if params["w_q"].ndim == 3:          # stacked (L, out, in) layer trees
        out = jax.vmap(_to_i8_core)(core)
    else:
        out = _to_i8_core(core)
    out.update(rest)
    return out


def _to_i8_core(core: dict) -> dict:
    wd = dequantize_weight(core, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wd), axis=-1) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wd / scale[:, None]), -127, 127).astype(jnp.int8)
    return {"w_i8": q, "scale": scale}


def qmatmul_i8(params: dict, x: Array) -> Array:
    """x (..., in) @ dequant(w).T via ONE int8 MXU dot (W8A8 per-channel).

    The shipped `qmatmul` dequantizes per-weight on the VPU, which measures
    VPU-bound on v5e (~380 G weights/s — the same wall clock as streaming
    bf16), so affine-q8 bought footprint but zero b=1 latency. This path
    moves all scaling AFTER the matmul: activations are dynamically
    quantized to int8 per token (symmetric), the s8 x s8 -> s32 dot runs on
    the MXU streaming int8 weight bytes, and two rank-1 scale multiplies
    (activation scale, per-channel weight scale) finish on the (B, out)
    result — O(B*out) VPU work instead of O(out*in) per-weight dequant.

    Measured on v5e at Higgs-v2-3B decode dims (14-layer q/k/v/o/gate/up/
    down stack, 1.41 GB int8 weights per step, B=1): 3.82 ms/step vs bf16
    dense 5.76 ms — 1.51x faster, 369 GB/s int8 weight stream. See
    tools/bench_qmm_formulations.py for the losing per-group variants.

    Numerics: W8A8, per-token activation scale + per-channel weight scale;
    max-rel error vs the exact dequant matmul ~1.1e-2 at transformer dims.
    Opt-in (decode hot paths), never the default load format.
    """
    w = params["w_i8"]
    out_f, in_f = w.shape
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    z = jax.lax.dot_general(
        xq, w, dimension_numbers=(((xq.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = z.astype(jnp.float32) * sx * params["scale"].astype(jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def tree_to_i8_layout(params, predicate=None, path: str = "",
                      consume: bool = False):
    """Convert every affine-quantized leaf in a tree to the per-channel int8
    MXU decode layout (see `to_i8_layout`). predicate(path) -> bool gates
    conversion per layer (e.g. keep lm_head on the exact per-group path).
    consume=True frees each source code/scale buffer as its leaf converts
    (peak HBM stays ~one dequantized leaf above the converted tree) — only
    pass it when the input tree is being replaced. Tied weights (one buffer
    referenced by several leaves) are refcounted: a shared buffer is only
    deleted once its last referencing leaf has converted, and never if a
    predicate keeps any referencing leaf on the per-group path."""
    refs = None
    if consume:
        from collections import Counter

        refs = Counter(id(v) for v in jax.tree.leaves(params)
                       if isinstance(v, jax.Array))
    return _tree_to_i8_layout(params, predicate, path, consume, refs)


def _tree_to_i8_layout(params, predicate, path, consume, refs):
    if isinstance(params, dict):
        if "w_q" in params and "scales" in params:
            if predicate is None or predicate(path):
                out = to_i8_layout(params)
                if consume:
                    jax.block_until_ready(out)
                    for k in ("w_q", "scales", "biases"):
                        arr = params.get(k)
                        if isinstance(arr, jax.Array):
                            refs[id(arr)] -= 1
                            if refs[id(arr)] <= 0:
                                arr.delete()
                return out
            return params
        return {k: _tree_to_i8_layout(v, predicate,
                                      f"{path}.{k}" if path else k, consume,
                                      refs)
                for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(
            _tree_to_i8_layout(v, predicate, path, consume, refs)
            for v in params)
    return params


# ---------------------------------------------------------------------------
# Microscaling FP formats (OCP MX / NVIDIA FP4) — reference convert.py:22-23
# ---------------------------------------------------------------------------

# E2M1 magnitude table; code = sign<<3 | magnitude index
_FP4_VALUES = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)
FP_MODE_DEFAULTS = {"mxfp4": 32, "nvfp4": 16, "mxfp8": 32}


def _fp4_encode(g: Array) -> Array:
    """float (..., gs) -> uint8 e2m1 codes (nearest-value)."""
    sign = (g < 0).astype(jnp.uint8)
    mag = jnp.abs(g)
    table = jnp.asarray(_FP4_VALUES)
    idx = jnp.argmin(jnp.abs(mag[..., None] - table), axis=-1).astype(
        jnp.uint8)
    return (sign << 3) | idx


def _fp4_decode(codes: Array, dtype=jnp.float32) -> Array:
    table = jnp.asarray(_FP4_VALUES, dtype)
    mag = table[(codes & 7).astype(jnp.int32)]
    return jnp.where((codes >> 3) > 0, -mag, mag)


def quantize_weight_fp(w: Array, mode: str,
                       group_size: Optional[int] = None) -> dict:
    """Quantize (out, in) to a microscaling FP format.

    mxfp4 / mxfp8: per-group power-of-two (E8M0) shared scale;
    nvfp4: per-group FP8-E4M3 scale. Codes are stored one-per-byte
    (uint8 e2m1) or as float8_e4m3fn; dequant fuses into the consuming
    matmul on TPU exactly like the affine path.
    """
    if mode not in FP_MODE_DEFAULTS:
        raise ValueError(f"unknown fp quant mode: {mode}")
    gs = group_size or FP_MODE_DEFAULTS[mode]
    out_f, in_f = w.shape
    assert in_f % gs == 0, (in_f, gs)
    g = w.reshape(out_f, in_f // gs, gs).astype(jnp.float32)
    amax = jnp.max(jnp.abs(g), axis=-1)
    if mode == "nvfp4":
        scales = (amax / 6.0).astype(jnp.float8_e4m3fn).astype(jnp.float32)
        scales = jnp.maximum(scales, 2.0 ** -20)
        codes = _fp4_encode(g / scales[..., None])
        return {"w_fp4": codes.reshape(out_f, in_f),
                "scales": scales}
    # MX: scale = 2^(floor(log2(amax)) - emax_elem)
    emax = 2.0 if mode == "mxfp4" else 8.0
    exp = jnp.floor(jnp.log2(jnp.maximum(amax, 2.0 ** -126))) - emax
    scales = jnp.exp2(jnp.clip(exp, -127, 127))
    if mode == "mxfp4":
        codes = _fp4_encode(g / scales[..., None])
        return {"w_fp4": codes.reshape(out_f, in_f), "scales": scales}
    # saturating conversion (OCP MX spec): e4m3 max-normal is 448
    q = jnp.clip(g / scales[..., None], -448.0, 448.0) \
        .astype(jnp.float8_e4m3fn)
    # stored as a uint8 bitcast (safetensors has no float8 numpy dtype)
    q = jax.lax.bitcast_convert_type(q, jnp.uint8)
    return {"w_fp8": q.reshape(out_f, in_f), "scales": scales}


def _fp8_decode(codes: Array, dtype=jnp.float32) -> Array:
    return jax.lax.bitcast_convert_type(
        codes, jnp.float8_e4m3fn).astype(dtype)


def dequantize_weight_fp(params: dict, dtype=jnp.float32) -> Array:
    if "w_fp4" in params:
        q = _fp4_decode(params["w_fp4"], dtype)
    else:
        q = _fp8_decode(params["w_fp8"], dtype)
    out_f, in_f = q.shape
    gs = in_f // params["scales"].shape[1]
    qg = q.reshape(out_f, in_f // gs, gs)
    w = qg * params["scales"][..., None].astype(dtype)
    return w.reshape(out_f, in_f)


def fp_matmul(params: dict, x: Array) -> Array:
    """x (..., in) @ dequant(w)^T [+ bias] — scale contraction stays
    factored so XLA fuses the dequant into the matmul."""
    if "w_fp4" in params:
        q = _fp4_decode(params["w_fp4"], x.dtype)
    else:
        q = _fp8_decode(params["w_fp8"], x.dtype)
    out_f, in_f = q.shape
    ng = params["scales"].shape[1]
    gs = in_f // ng
    xg = x.reshape(x.shape[:-1] + (ng, gs))
    qg = q.reshape(out_f, ng, gs)
    xq = jnp.einsum("...gi,ogi->...og", xg, qg)
    y = jnp.einsum("...og,og->...o", xq,
                   params["scales"].astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def unpack_mlx_quantized(
    weight: Array, scales: Array, biases: Array, group_size: int = 64
) -> dict:
    """Unpack an MLX-packed pre-quantized leaf into this module's layout.

    MLX checkpoints (mlx-community quantized repos) store affine group
    quantization as `weight` uint32 (out, in*bits/32) with 32/bits codes
    packed LSB-first per word, plus `scales`/`biases` (out, in/group_size);
    dequant convention is the same as ours: w = scales * q + biases.
    """
    out_f, packed = weight.shape
    in_f = scales.shape[1] * group_size
    if packed == 0 or in_f % packed != 0:
        raise ValueError(
            f"cannot infer MLX quant bits: packed weight {weight.shape}, "
            f"scales {scales.shape}, group_size {group_size}")
    per = in_f // packed  # codes per uint32 word
    if 32 % per != 0:
        raise ValueError(
            f"unsupported MLX packing: {per} codes per word "
            f"(weight {weight.shape}, in_features {in_f})")
    bits = 32 // per
    if bits not in (2, 4, 8):
        raise ValueError(
            f"pre-quantized checkpoint uses {bits}-bit MLX packing; only "
            "2/4/8-bit supported (3/6-bit use a mixed word layout)")
    w = weight.astype(jnp.uint32)
    shifts = (jnp.arange(per, dtype=jnp.uint32) * bits)[None, None, :]
    codes = (w[..., None] >> shifts) & ((1 << bits) - 1)
    return {
        "w_q": codes.reshape(out_f, in_f).astype(jnp.uint8),
        "scales": scales.astype(jnp.float32),
        "biases": biases.astype(jnp.float32),
    }


def _is_prequantized_leaf(params: dict) -> bool:
    w = params.get("weight")
    return (
        "scales" in params
        and isinstance(w, jax.Array)
        and not jnp.issubdtype(w.dtype, jnp.floating)
    )


def maybe_quantize_tree(
    params,
    group_size: int = 64,
    bits: int = 4,
    predicate=None,
    path: str = "",
    mode: str = "affine",
    consume: bool = False,
):
    """Recursively quantize every linear-like {'weight': (out,in)} leaf dict.

    predicate(path, weight) -> bool | int gates per-layer quantization,
    mirroring the reference's class_predicate (utils.py:224-248); an int
    return overrides the bit width for that layer (mixed recipes,
    reference convert.py:22). mode selects affine int-N or a microscaling
    FP format (mxfp4/nvfp4/mxfp8). Embeddings and convs are skipped
    (ndim != 2 or vocab-shaped), as are layers whose input dim is not
    divisible by group_size.

    Pre-quantized MLX checkpoints (uint32-packed `weight` + sibling
    `scales`/`biases`) are unpacked into the native w_q layout instead of
    being (corruptly) re-quantized; embedding-like leaves are dequantized to
    dense so gather lookups stay simple.

    consume=True frees each source weight's device buffer as soon as its
    quantized form exists — without it, quantizing a 3B-class bf16 model
    needs full-precision + quantized trees live at once (~18 GB), which
    does not fit a 16 GB v5e. Only pass it when the input tree is being
    replaced (the original params become unusable).
    """
    if isinstance(params, dict):
        if _is_prequantized_leaf(params):
            q = unpack_mlx_quantized(
                params["weight"], params["scales"],
                params.get("biases", jnp.zeros_like(params["scales"])),
                group_size)
            leaf = path.rsplit(".", 1)[-1].lower()
            rest = {k: v for k, v in params.items()
                    if k not in ("weight", "scales", "biases")}
            if any(tag in leaf for tag in ("embed", "codebook", "positional")):
                return {"weight": dequantize_weight(q), **rest}
            q.update(rest)
            return q
        if "weight" in params and isinstance(params["weight"], jax.Array) \
                and params["weight"].ndim in (2, 3) and "w_q" not in params \
                and "w_fp4" not in params and "w_fp8" not in params:
            w = params["weight"]
            leaf = path.rsplit(".", 1)[-1].lower()
            is_embedding = any(tag in leaf for tag in
                               ("embed", "codebook", "positional"))
            gs = group_size if mode == "affine" \
                else FP_MODE_DEFAULTS.get(mode, group_size)
            ok = w.shape[-1] % gs == 0 and not is_embedding
            # 3-D leaves are ambiguous by shape (a stacked-layer linear
            # (L, out, in) vs a conv kernel): quantize them only when an
            # explicit predicate vouches for the path.
            if w.ndim == 3 and predicate is None:
                ok = False
            verdict = True if predicate is None else predicate(path, w)
            if ok and verdict:
                if mode == "affine":
                    layer_bits = verdict if isinstance(verdict, int) \
                        and not isinstance(verdict, bool) else bits
                    if w.ndim == 3:
                        q = jax.vmap(
                            lambda w2: quantize_weight(w2, gs, layer_bits))(w)
                    else:
                        q = quantize_weight(w, gs, layer_bits)
                elif w.ndim == 3:
                    q = jax.vmap(lambda w2: quantize_weight_fp(w2, mode, gs))(w)
                else:
                    q = quantize_weight_fp(w, mode, gs)
                rest = {k: v for k, v in params.items() if k != "weight"}
                q.update(rest)
                if consume:
                    jax.block_until_ready(q)
                    w.delete()
                return q
            return params
        return {
            k: maybe_quantize_tree(v, group_size, bits, predicate,
                                   f"{path}.{k}" if path else k, mode,
                                   consume)
            for k, v in params.items()
        }
    return params


def dequantize_tree(params, dtype=jnp.float32):
    """Reconstruct dense 'weight' leaves from quantized subtrees (affine
    w_q / microscaling w_fp4 / w_fp8) — the convert CLI's --dequantize path
    (reference convert.py:730-733)."""
    if isinstance(params, dict):
        if "w_q" in params and "scales" in params:
            out = {k: v for k, v in params.items()
                   if k not in ("w_q", "scales", "biases")}
            out["weight"] = dequantize_weight(params, dtype)
            return out
        if ("w_fp4" in params or "w_fp8" in params) and "scales" in params:
            out = {k: v for k, v in params.items()
                   if k not in ("w_fp4", "w_fp8", "scales")}
            out["weight"] = dequantize_weight_fp(params, dtype)
            return out
        return {k: dequantize_tree(v, dtype) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(dequantize_tree(v, dtype) for v in params)
    return params


def mixed_quant_predicate(recipe: str):
    """Mixed-bit recipe predicate (reference convert.py:22 QUANT_RECIPES,
    mirroring mlx_lm's mixed_quant_predicate_builder): `mixed_L_H` uses
    H bits for quality-sensitive layers (embeddings/heads, the first and
    last transformer layer, and every 6th layer's down/o projections) and
    L bits everywhere else."""
    import re

    try:
        low, high = (int(x) for x in recipe.split("_")[1:3])
    except (ValueError, IndexError):
        raise ValueError(f"unknown quant recipe: {recipe!r} "
                         "(expected e.g. 'mixed_3_6')")

    def predicate(path: str, w) -> int:
        p = path.lower()
        if any(t in p for t in ("embed", "lm_head", "head")):
            return high
        m = re.search(r"layers\.(\d+)\.", p)
        if m:
            idx = int(m.group(1))
            if idx == 0 or idx % 6 == 5:
                if "down_proj" in p or "o_proj" in p or "out_proj" in p:
                    return high
        return low

    return predicate
