"""Race q8 matvec formulations on the real chip at Higgs/Qwen3 decode dims.

The shipped qmatmul (ops/quant.py) dequantizes per-weight on the VPU
(cast + mul fused into the dot's operand stream) and measured VPU-bound at
~380 G weights/s on v5e — the same wall clock as streaming bf16, so q8 buys
footprint but zero b=1 latency. This script measures the candidate fix:

  int8 x int8 MXU dot with a block-diagonal activation matrix.
  y_o = sum_g s_og * sx_g * (Q'_og . xq_g) + sum_g b'_og * xsum_g
  where Q' = (q - 128) int8, b' = b + 128 s, xq = per-group int8 activations,
  and the per-group partial sums Z (out, ng) come from ONE 2D dot
  Q' (out, in) @ X (in, ng) with X[i, g] = xq_i * [group(i) == g].

Dequant then happens on the (out, ng) partials — 64x fewer VPU ops than
per-weight — so the weight stream should run at the int8 byte roofline
(~2x the bf16 step). Run (real TPU): python tools/bench_qmm_formulations.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mlx_audio_tpu.ops.quant import (
    dequantize_weight, qmatmul, qmatmul_i8 as qmatmul_i8mxu, quantize_weight,
    to_i8_layout,
)

N = 64  # decode steps per timed jit


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    return min(walls) / N


def run_dim(out_f, in_f, gs, batch, n_layers):
    """Stack n_layers of (up: in->out, down: out->in) pairs and scan over
    depth each decode step — total weights must exceed the 128 MB VMEM so
    every step genuinely streams HBM (a single matmul gets VMEM-cached in
    a fori_loop and measures nothing)."""
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    wu = jax.random.normal(k1, (n_layers, out_f, in_f), jnp.float32) * 0.02
    wd = jax.random.normal(k2, (n_layers, in_f, out_f), jnp.float32) * 0.02
    q_u = jax.vmap(lambda w: quantize_weight(w, gs, 8))(wu)
    q_d = jax.vmap(lambda w: quantize_weight(w, gs, 8))(wd)
    q8_u = jax.vmap(to_i8_layout)(q_u)
    q8_d = jax.vmap(to_i8_layout)(q_d)
    bf_u = jax.vmap(lambda p: dequantize_weight(p, jnp.bfloat16))(q_u)
    bf_d = jax.vmap(lambda p: dequantize_weight(p, jnp.bfloat16))(q_d)
    x0 = jax.random.normal(k3, (batch, in_f), jnp.bfloat16)

    # accuracy of the blockdiag path vs exact dequant matmul
    p0 = jax.tree.map(lambda a: a[0], q8_u)
    y_ref = x0.astype(jnp.float32) @ dequantize_weight(
        jax.tree.map(lambda a: a[0], q_u)).T
    y_i8 = qmatmul_i8mxu(p0, x0).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(y_i8 - y_ref)) /
                (jnp.max(jnp.abs(y_ref)) + 1e-9))
    print(f"  i8mxu rel err vs dequant ref: {err:.4e}")

    def make(fn, pu, pd):
        def step(x, _):
            def layer(x, p):
                h = fn(p[0], x)
                y = fn(p[1], jax.nn.silu(h).astype(x.dtype))
                return (x + y.astype(x.dtype) * 1e-3), None
            x, _ = jax.lax.scan(layer, x, (pu, pd))
            return x, None

        @jax.jit
        def run(pu, pd, x):
            x, _ = jax.lax.scan(step, x, None, length=N)
            return x
        return lambda: run(pu, pd, x0)

    wb = 2 * n_layers * out_f * in_f   # weights touched per decode step
    for name, fn, pu, pd, bytes_ in (
        ("bf16 dense", lambda p, x: x @ p.T, bf_u, bf_d, wb * 2),
        ("qmatmul u8 (shipped)", qmatmul, q_u, q_d, wb),
        ("i8 MXU blockdiag", qmatmul_i8mxu, q8_u, q8_d, wb),
    ):
        t = timeit(make(fn, pu, pd))
        print(f"  {name:24s} {t*1e6:9.1f} us/step  "
              f"{bytes_/t/1e9:7.1f} GB/s weight stream")


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    for batch in (1, 4):
        for (o, i, L) in ((8192, 3072, 6), (3072, 3072, 16)):
            print(f"(out={o}, in={i}) x{L} layer-pairs gs=64 B={batch} "
                  f"[{2*L*o*i/1e6:.0f} MB int8]:")
            run_dim(o, i, 64, batch, L)


if __name__ == "__main__":
    main()
