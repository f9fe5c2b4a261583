"""Pallas TPU kernel: fused dequantize + matmul for affine-quantized weights.

AR decode is HBM-bandwidth-bound: streaming int8 codes (1 byte/weight)
instead of bf16 (2 bytes) halves the dominant traffic, but only if the
dequantize fuses into the matmul so the dense weight never materializes in
HBM. XLA fuses the einsum formulation in ops/quant.py reasonably well; this
kernel makes the fusion explicit — each grid step DMAs one uint8 weight tile
into VMEM, dequantizes on the VPU, and feeds the MXU directly.

Functional contract matches ops.quant.qmatmul:
    y = x @ (scales * q + biases per group).T [+ bias]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _qmm_kernel(x_ref, wq_ref, s_ref, b_ref, o_ref, *, group_size: int):
    from jax.experimental.pallas import tpu as pltpu

    # Inputs use the INTERLEAVED group layout (column j belongs to group
    # j % n_groups), so Mosaic's tiling pltpu.repeat — which concatenates
    # copies of the (TILE_OUT, NG) scale block — expands scales/biases to
    # exactly the per-column values. u8 -> f32 must hop through i32.
    q = wq_ref[:].astype(jnp.int32).astype(jnp.float32)   # (TILE_OUT, IN)
    scales = pltpu.repeat(s_ref[:], group_size, axis=1)   # (TILE_OUT, IN)
    biases = pltpu.repeat(b_ref[:], group_size, axis=1)
    w = q * scales + biases
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.float32), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def interleave_quantized(params: dict) -> dict:
    """Re-lay quantized weights for the Pallas kernel: permute columns from
    grouped-contiguous ([g0 g0 .. g1 g1 ..]) to interleaved
    ([g0 g1 .. g0 g1 ..]) so tile-repeat of scales lines up per column.
    The matching activation permutation happens inside qmm_pallas."""
    wq = params["w_q"]
    out_f, in_f = wq.shape
    ng = params["scales"].shape[1]
    gs = in_f // ng
    wq_il = jnp.transpose(wq.reshape(out_f, ng, gs), (0, 2, 1)).reshape(
        out_f, in_f)
    p = {"w_q": wq_il, "scales": params["scales"],
         "biases": params["biases"]}
    if "bias" in params:
        p["bias"] = params["bias"]
    return p


@functools.partial(jax.jit, static_argnames=("tile_out",))
def qmm_pallas(params: dict, x: Array, tile_out: int = 256) -> Array:
    """x (B, in) @ dequant(w_q (out, in)).T -> (B, out).

    `params` must be in the interleaved layout from `interleave_quantized`.
    Requires out % tile_out == 0 and the standard (8/16, 128) tiling-friendly
    shapes; callers fall back to ops.quant.qmatmul otherwise.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wq = params["w_q"]
    scales = params["scales"].astype(jnp.float32)
    biases = params["biases"].astype(jnp.float32)
    out_f, in_f = wq.shape
    ng = scales.shape[1]
    gs = in_f // ng
    b = x.shape[0]
    grid = (out_f // tile_out,)
    # activations must follow the interleaved column order
    x = x.reshape(b, ng, gs).transpose(0, 2, 1).reshape(b, in_f)

    y = pl.pallas_call(
        functools.partial(_qmm_kernel, group_size=gs),
        out_shape=jax.ShapeDtypeStruct((b, out_f), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, in_f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_out, in_f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_out, ng), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_out, ng), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_out), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * in_f * out_f + 2 * in_f * out_f,
            bytes_accessed=out_f * in_f + out_f * ng * 8 + b * in_f * 4
            + b * out_f * 4,
            transcendentals=0,
        ),
    )(x, wq, scales, biases)
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y.astype(x.dtype)


def qmm_auto(params: dict, x: Array, prefer_pallas: bool = False) -> Array:
    """Dispatch between the Pallas kernel and the XLA einsum path.

    Measured on v5e (4096x4096 int8, B=8): the two are within noise of each
    other (~300-400 us incl. tunnel jitter), both at or under the bf16 dense
    time — XLA already fuses the einsum dequant well, so the XLA path stays
    the default and the kernel is an explicit opt-in / tuning vehicle.
    """
    from .quant import qmatmul

    wq = params.get("w_q")
    if wq is None:
        raise ValueError("not a quantized param dict")
    out_f, in_f = wq.shape
    lead = x.shape[:-1]
    flat = x.reshape(-1, in_f)
    b = flat.shape[0]
    ng = params["scales"].shape[1]
    tile = 256 if out_f % 256 == 0 else (128 if out_f % 128 == 0 else 0)
    on_tpu = jax.default_backend() not in ("cpu",)
    if not prefer_pallas or not on_tpu or tile == 0 or in_f % 128 or b > 256:
        return qmatmul(params, x)
    try:
        il = _interleave_cache_get(params)
        y = qmm_pallas(il, flat, tile_out=tile)
        return y.reshape(lead + (out_f,))
    except Exception:
        return qmatmul(params, x)


_IL_CACHE = {}


def _interleave_cache_get(params: dict) -> dict:
    # keyed on id() but retaining the original array: without the retained
    # reference, CPython id reuse after a model unload could silently return
    # a stale interleaved weight for a *different* layer (ADVICE r1)
    w_q = params.get("w_q")
    key = id(w_q)
    hit = _IL_CACHE.get(key)
    if hit is not None and hit[0] is w_q:
        return hit[1]
    il = interleave_quantized(params)
    if len(_IL_CACHE) > 512:
        _IL_CACHE.clear()
    _IL_CACHE[key] = (w_q, il)
    return il
