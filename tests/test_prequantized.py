"""Pre-quantized MLX checkpoint loading (uint32-packed codes + scales/biases).

mlx-community quantized repos ship `weight` as uint32 with 32/bits codes
packed LSB-first per word; dequant is w = scales*q + biases. Round 1 silently
re-quantized the packed integers as floats (ADVICE r1, medium) — these tests
pin the unpack path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.ops.quant import (
    dequantize_weight,
    maybe_quantize_tree,
    quantize_weight,
    unpack_mlx_quantized,
)
from mlx_audio_tpu.utils import apply_quantization


def _mlx_pack(w_q: np.ndarray, bits: int) -> np.ndarray:
    """Pack uint8 codes (out, in) into MLX uint32 words, LSB-first."""
    out_f, in_f = w_q.shape
    per = 32 // bits
    codes = w_q.reshape(out_f, in_f // per, per).astype(np.uint32)
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, None, :]
    return np.bitwise_or.reduce(codes << shifts, axis=-1)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_unpack_roundtrip(bits):
    rng = np.random.RandomState(0)
    w = rng.randn(16, 128).astype(np.float32)
    q = quantize_weight(jnp.asarray(w), group_size=32, bits=bits)
    packed = _mlx_pack(np.asarray(q["w_q"]), bits)
    un = unpack_mlx_quantized(
        jnp.asarray(packed), q["scales"], q["biases"], group_size=32)
    np.testing.assert_array_equal(np.asarray(un["w_q"]), np.asarray(q["w_q"]))
    np.testing.assert_allclose(
        np.asarray(dequantize_weight(un)), np.asarray(dequantize_weight(q)))


def test_prequantized_tree_not_requantized():
    rng = np.random.RandomState(1)
    w = rng.randn(8, 64).astype(np.float32)
    q = quantize_weight(jnp.asarray(w), group_size=64, bits=4)
    packed = _mlx_pack(np.asarray(q["w_q"]), 4)
    dense = rng.randn(8, 64).astype(np.float32)
    params = {
        "proj": {"weight": jnp.asarray(packed), "scales": q["scales"],
                 "biases": q["biases"], "bias": jnp.zeros(8)},
        "other": {"weight": jnp.asarray(dense)},
    }
    weights = {"proj.weight": packed, "proj.scales": q["scales"],
               "proj.biases": q["biases"], "other.weight": dense}
    out = apply_quantization(
        params, {"quantization": {"group_size": 64, "bits": 4}}, weights)
    # packed leaf unpacked to native w_q layout with checkpoint scales
    np.testing.assert_array_equal(
        np.asarray(out["proj"]["w_q"]), np.asarray(q["w_q"]))
    assert "bias" in out["proj"] and "weight" not in out["proj"]
    # dense leaf of a pre-quantized checkpoint stays dense
    assert "w_q" not in out["other"]
    np.testing.assert_array_equal(np.asarray(out["other"]["weight"]), dense)


def test_prequantized_embedding_dequantized_dense():
    rng = np.random.RandomState(2)
    w = rng.randn(32, 64).astype(np.float32)
    q = quantize_weight(jnp.asarray(w), group_size=64, bits=4)
    packed = _mlx_pack(np.asarray(q["w_q"]), 4)
    params = {"embed_tokens": {
        "weight": jnp.asarray(packed), "scales": q["scales"],
        "biases": q["biases"]}}
    out = maybe_quantize_tree(params, group_size=64, bits=4)
    emb = out["embed_tokens"]
    assert "w_q" not in emb and emb["weight"].shape == (32, 64)
    np.testing.assert_allclose(
        np.asarray(emb["weight"]), np.asarray(dequantize_weight(q)),
        atol=1e-6)


def test_unsupported_bits_raises():
    scales = jnp.ones((4, 2))
    biases = jnp.zeros((4, 2))
    # 3-bit style packing: in=128, packed cols such that per-word count
    # doesn't divide 32 -> clear error, not silent corruption
    with pytest.raises(ValueError):
        unpack_mlx_quantized(jnp.zeros((4, 12), jnp.uint32), scales, biases,
                             group_size=64)
