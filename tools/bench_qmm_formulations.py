"""Race q8 matvec formulations on the real chip at Higgs/Qwen3 decode dims.

The shipped qmatmul (ops/quant.py) dequantizes per-weight on the VPU
(cast + mul fused into the dot's operand stream) and measured VPU-bound at
~380 G weights/s on v5e — the same wall clock as streaming bf16, so q8 buys
footprint but zero b=1 latency. The shipped fix is `qmatmul_i8`: per-channel
symmetric W8A8, ONE s8 x s8 -> s32 MXU dot, rank-1 scaling on the output.

This script races it against the formulations that LOST, kept here so the
measurements stay reproducible:

* block-diagonal per-group partials — y_og from Q' (out, in) @ X (in, B*ng)
  with X[i, bg] = xq[b,i]*[group(i)==g]. Preserves per-group scales exactly,
  but multiplies dot FLOPs by ng (x128 on a down_proj with in=8192, gs=64),
  which turns the decode step compute-bound at model scale.
* grouped batched dot — batch dim over ng, contraction gs=64. Exact FLOPs,
  but XLA pads the 64-wide contraction to the 128 MXU tile: 2x weight bytes.

Measured (v5e, 14-layer q/k/v/o/gate/up/down Higgs-v2-3B stack, 1.41 GB int8
per step, B=1): per-channel 3.82 ms/step (369 GB/s int8 stream) vs
block-diag 4.68 vs bf16 dense 5.76 vs u8 VPU-dequant 6.60.

Run (real TPU): python tools/bench_qmm_formulations.py
"""

import gc
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mlx_audio_tpu.ops.quant import (
    dequantize_weight, qmatmul, qmatmul_i8, quantize_weight, to_i8_layout,
)

N = 16  # decode steps per timed jit


def timeit(fn, *args):
    jax.block_until_ready(fn(*args))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        walls.append(time.perf_counter() - t0)
    return min(walls) / N


# --- losing formulations (see module docstring) ---


def to_i8bd_layout(params: dict) -> dict:
    """Zero-point fold keeping per-group scales: w = s*(q-128) + (b+128s)."""
    q = params["w_q"].astype(jnp.int32) - 128
    return {"w_bd8": q.astype(jnp.int8), "scales": params["scales"],
            "biases": params["biases"] + 128.0 * params["scales"]}


def qmm_i8_blockdiag(p, x):
    w = p["w_bd8"]
    out_f, in_f = w.shape
    ng = p["scales"].shape[1]
    gs = in_f // ng
    lead = x.shape[:-1]
    b = 1
    for d in lead:
        b *= d
    xg = x.reshape(b, ng, gs).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xg / sx[..., None]), -127, 127).astype(jnp.int8)
    gid = jnp.repeat(jnp.arange(ng, dtype=jnp.int32), gs)
    onehot = (gid[:, None] == jnp.arange(ng, dtype=jnp.int32)[None, :]
              ).astype(jnp.int8)
    X = (xq.reshape(b, in_f).T[:, :, None] * onehot[:, None, :]
         ).reshape(in_f, b * ng)
    z = jax.lax.dot_general(w, X, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).reshape(out_f, b, ng)
    y = jnp.einsum("og,bg,obg->bo", p["scales"], sx.astype(jnp.float32),
                   z.astype(jnp.float32))
    y = y + jnp.einsum("bg,og->bo", jnp.sum(xg, axis=-1),
                       p["biases"].astype(jnp.float32))
    return y.reshape(lead + (out_f,)).astype(x.dtype)


def to_i8g_layout(params: dict) -> dict:
    bd = to_i8bd_layout(params)
    out_f, in_f = bd["w_bd8"].shape
    ng = params["scales"].shape[1]
    return {"w_g8": bd["w_bd8"].reshape(out_f, ng, in_f // ng)
            .transpose(1, 0, 2),
            "scales": bd["scales"], "biases": bd["biases"]}


def qmm_i8_grouped(p, x):
    w = p["w_g8"]                       # (ng, out, gs)
    ng, out_f, gs = w.shape
    lead = x.shape[:-1]
    b = 1
    for d in lead:
        b *= d
    xg = x.reshape(b, ng, gs).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xg / sx[..., None]), -127, 127).astype(jnp.int8)
    z = jax.lax.dot_general(xq.transpose(1, 0, 2), w,
                            (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.int32)  # (ng, b, out)
    y = jnp.einsum("og,gb,gbo->bo", p["scales"], sx.T.astype(jnp.float32),
                   z.astype(jnp.float32))
    y = y + jnp.einsum("bg,og->bo", jnp.sum(xg, axis=-1),
                       p["biases"].astype(jnp.float32))
    return y.reshape(lead + (out_f,)).astype(x.dtype)


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
    variants = {
        "i8 perchan (shipped)": (
            qmatmul_i8, jax.vmap(to_i8_layout)(q_u),
            jax.vmap(to_i8_layout)(q_d)),
        "i8 blockdiag": (qmm_i8_blockdiag, jax.vmap(to_i8bd_layout)(q_u),
                         jax.vmap(to_i8bd_layout)(q_d)),
        "i8 grouped": (qmm_i8_grouped, jax.vmap(to_i8g_layout)(q_u),
                       jax.vmap(to_i8g_layout)(q_d)),
    }
    bf_u = jax.vmap(lambda p: dequantize_weight(p, jnp.bfloat16))(q_u)
    bf_d = jax.vmap(lambda p: dequantize_weight(p, jnp.bfloat16))(q_d)
    del wu, wd
    gc.collect()
    x0 = jax.random.normal(k3, (batch, in_f), jnp.bfloat16)

    # accuracy vs the exact dequant matmul
    y_ref = x0.astype(jnp.float32) @ dequantize_weight(
        jax.tree.map(lambda a: a[0], q_u)).T
    for name, (fn, pu, _) in variants.items():
        y = fn(jax.tree.map(lambda a: a[0], pu), x0).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(y - y_ref)) /
                    (jnp.max(jnp.abs(y_ref)) + 1e-9))
        print(f"  {name:24s} rel err vs dequant ref: {err:.4e}")

    def make(fn, pu, pd):
        @jax.jit
        def run(pu, pd, x):
            # weights must flow in through run's args (NOT closure capture:
            # captured device arrays become HLO constants, which balloons the
            # remote-compile payload past the axon tunnel's request limit)
            def layer(x, p):
                h = fn(p[0], x)
                y = fn(p[1], jax.nn.silu(h).astype(x.dtype))
                return (x + y.astype(x.dtype) * 1e-3), None

            def step(x, _):
                x, _ = jax.lax.scan(layer, x, (pu, pd))
                return x, None

            x, _ = jax.lax.scan(step, x, None, length=N)
            return x
        return lambda: run(pu, pd, x0)

    wb = 2 * n_layers * out_f * in_f   # weights touched per decode step
    rows = [("bf16 dense", lambda p, x: x @ p.T, bf_u, bf_d, wb * 2),
            ("qmatmul u8 (VPU)", qmatmul, q_u, q_d, wb)]
    rows += [(nm, fn, pu, pd, wb) for nm, (fn, pu, pd) in variants.items()]
    for name, fn, pu, pd, bytes_ in rows:
        t = timeit(make(fn, pu, pd))
        print(f"  {name:24s} {t*1e6:9.1f} us/step  "
              f"{bytes_/t/1e9:7.1f} GB/s weight stream")


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    for batch in (1, 4):
        # include an in=8192 shape: ng=128 is where block-diag goes
        # compute-bound (the down_proj case that killed it e2e)
        for (o, i, L) in ((8192, 3072, 6), (3072, 8192, 6), (3072, 3072, 16)):
            print(f"(out={o}, in={i}) x{L} layer-pairs gs=64 B={batch} "
                  f"[{2*L*o*i/1e6:.0f} MB int8]:")
            run_dim(o, i, 64, batch, L)


if __name__ == "__main__":
    main()
