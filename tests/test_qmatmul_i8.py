"""W8A8 int8-MXU matmul path (ops.quant.qmatmul_i8) numerics.

qmatmul_i8 trades exact per-weight dequant for a single s8xs8->s32 MXU dot
plus rank-1 output scaling; the approximations are the per-channel weight
re-quantization (from the per-group affine grid) and dynamic per-token int8
activation quantization. These tests pin the error bound vs the exact
dequant matmul and the transparent apply_linear dispatch on 'w_i8' leaves.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn.layers import apply_linear
from mlx_audio_tpu.ops.quant import (
    dequantize_weight,
    qmatmul,
    qmatmul_i8,
    quantize_weight,
    to_i8_layout,
    tree_to_i8_layout,
)


def _setup(out_f=96, in_f=128, gs=32, batch=3, seed=0, bias=False):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    w = jax.random.normal(k1, (out_f, in_f)) * 0.05
    qp = quantize_weight(w, group_size=gs, bits=8)
    if bias:
        qp["bias"] = jax.random.normal(k3, (out_f,)) * 0.1
    x = jax.random.normal(k2, (batch, in_f))
    return qp, x


def test_i8_matches_exact_dequant_within_activation_quant_error():
    qp, x = _setup()
    y_exact = x @ dequantize_weight(qp).T
    y_i8 = qmatmul_i8(to_i8_layout(qp), x)
    rel = float(jnp.max(jnp.abs(y_i8 - y_exact)) /
                (jnp.max(jnp.abs(y_exact)) + 1e-9))
    assert rel < 2e-2, rel


def test_i8_matches_qmatmul():
    qp, x = _setup(out_f=64, in_f=64, gs=16, batch=1, seed=1)
    y_q = qmatmul(qp, x)
    y_i8 = qmatmul_i8(to_i8_layout(qp), x)
    rel = float(jnp.max(jnp.abs(y_i8 - y_q)) /
                (jnp.max(jnp.abs(y_q)) + 1e-9))
    assert rel < 2e-2, rel


def test_i8_bias_and_leading_dims():
    qp, _ = _setup(bias=True, seed=2)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 5, 128))
    y_exact = x @ dequantize_weight(qp).T + qp["bias"]
    y_i8 = qmatmul_i8(to_i8_layout(qp), x)
    assert y_i8.shape == y_exact.shape
    rel = float(jnp.max(jnp.abs(y_i8 - y_exact)) /
                (jnp.max(jnp.abs(y_exact)) + 1e-9))
    assert rel < 2e-2, rel


def test_per_channel_requant_error_is_half_lsb():
    """The per-channel re-quantization of the dequantized per-group weight
    is nearest-grid rounding: per row, |w_pc - w| <= scale[o]/2 elementwise
    (0.5 LSB of the per-channel grid)."""
    qp, _ = _setup(seed=3)
    p8 = to_i8_layout(qp)
    w_src = np.asarray(dequantize_weight(qp))
    w_pc = (np.asarray(p8["w_i8"], np.float32)
            * np.asarray(p8["scale"])[:, None])
    bound = np.asarray(p8["scale"])[:, None] * 0.5 + 1e-7
    assert (np.abs(w_pc - w_src) <= bound).all()


def test_apply_linear_dispatches_on_w_i8():
    qp, x = _setup(seed=4)
    p8 = to_i8_layout(qp)
    np.testing.assert_allclose(np.asarray(apply_linear(p8, x)),
                               np.asarray(qmatmul_i8(p8, x)),
                               rtol=0, atol=0)


def test_tree_to_i8_layout_predicate():
    qp, _ = _setup(seed=5)
    tree = {"layers": {"mlp": {"up": dict(qp)}},
            "lm_head": dict(qp), "norm": {"weight": jnp.ones((4,))}}
    out = tree_to_i8_layout(tree, predicate=lambda p: "lm_head" not in p)
    assert "w_i8" in out["layers"]["mlp"]["up"]
    assert "w_q" in out["lm_head"] and "w_i8" not in out["lm_head"]
    assert "weight" in out["norm"]


def test_i8_dtype_preserved():
    qp, x = _setup(seed=6)
    y = qmatmul_i8(to_i8_layout(qp), x.astype(jnp.bfloat16))
    assert y.dtype == jnp.bfloat16
