"""Microscaling FP quantization (mxfp4 / nvfp4 / mxfp8) + mixed recipes.

Covers reference convert.py:22-23 quant modes/recipes — round-trip error
bounds per mode, fused fp matmul == dequant matmul, mixed-bit predicate
routing, and a convert CLI end-to-end per mode.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.ops.quant import (
    FP_MODE_DEFAULTS,
    dequantize_weight_fp,
    fp_matmul,
    maybe_quantize_tree,
    mixed_quant_predicate,
    quantize_weight_fp,
)


@pytest.fixture(scope="module")
def w():
    return jnp.asarray(
        np.random.RandomState(0).randn(16, 128).astype(np.float32))


class TestFpModes:
    @pytest.mark.parametrize("mode,rel_tol", [
        ("mxfp4", 0.30), ("nvfp4", 0.25), ("mxfp8", 0.06)])
    def test_roundtrip_error_bounds(self, w, mode, rel_tol):
        q = quantize_weight_fp(w, mode)
        deq = np.asarray(dequantize_weight_fp(q))
        err = np.abs(deq - np.asarray(w)).mean() / np.abs(
            np.asarray(w)).mean()
        assert err < rel_tol, (mode, err)

    @pytest.mark.parametrize("mode", ["mxfp4", "nvfp4", "mxfp8"])
    def test_group_sizes_and_dtypes(self, w, mode):
        q = quantize_weight_fp(w, mode)
        gs = FP_MODE_DEFAULTS[mode]
        assert q["scales"].shape == (16, 128 // gs)
        codes = q.get("w_fp4", q.get("w_fp8"))
        assert codes.dtype == jnp.uint8 and codes.shape == (16, 128)

    def test_mx_scales_are_powers_of_two(self, w):
        for mode in ("mxfp4", "mxfp8"):
            s = np.asarray(quantize_weight_fp(w, mode)["scales"])
            exps = np.log2(s)
            np.testing.assert_allclose(exps, np.round(exps), atol=1e-6)

    @pytest.mark.parametrize("mode", ["mxfp4", "nvfp4", "mxfp8"])
    def test_fp_matmul_matches_dequant(self, w, mode):
        q = quantize_weight_fp(w, mode)
        x = jnp.asarray(
            np.random.RandomState(1).randn(3, 128).astype(np.float32))
        y1 = np.asarray(fp_matmul(q, x))
        y2 = np.asarray(x @ dequantize_weight_fp(q).T)
        np.testing.assert_allclose(y1, y2, atol=1e-3, rtol=1e-3)

    def test_apply_linear_routes_fp(self, w):
        from mlx_audio_tpu.nn import apply_linear

        q = quantize_weight_fp(w, "mxfp8")
        x = jnp.asarray(
            np.random.RandomState(2).randn(2, 128).astype(np.float32))
        np.testing.assert_allclose(np.asarray(apply_linear(q, x)),
                                   np.asarray(fp_matmul(q, x)), atol=1e-5)

    def test_tree_quantize_fp_mode(self, w):
        tree = {"proj": {"weight": w}, "embed_tokens": {"weight": w}}
        out = maybe_quantize_tree(tree, mode="mxfp4")
        assert "w_fp4" in out["proj"]
        assert "weight" in out["embed_tokens"]   # embeddings skipped


class TestMixedRecipe:
    def test_predicate_bit_routing(self):
        pred = mixed_quant_predicate("mixed_3_6")
        w = None
        assert pred("model.embed_tokens.weight", w) == 6
        assert pred("lm_head.weight", w) == 6
        assert pred("model.layers.0.self_attn.o_proj.weight", w) == 6
        assert pred("model.layers.5.mlp.down_proj.weight", w) == 6
        assert pred("model.layers.2.mlp.down_proj.weight", w) == 3
        assert pred("model.layers.1.self_attn.q_proj.weight", w) == 3

    def test_unknown_recipe_raises(self):
        with pytest.raises(ValueError):
            mixed_quant_predicate("mixed_x")

    def test_tree_mixed_bits(self, w):
        tree = {"layers": {"1": {"q_proj": {"weight": w}},
                           "5": {"down_proj": {"weight": w}}}}
        out = maybe_quantize_tree(tree, group_size=32,
                                  predicate=mixed_quant_predicate(
                                      "mixed_2_6"))
        # 2-bit: codes in [0, 3]; 6-bit: codes beyond 3 appear
        q_low = np.asarray(out["layers"]["1"]["q_proj"]["w_q"])
        q_high = np.asarray(out["layers"]["5"]["down_proj"]["w_q"])
        assert q_low.max() <= 3
        assert q_high.max() > 3


class TestConvertModes:
    @pytest.mark.parametrize("mode", ["mxfp4", "nvfp4", "mxfp8"])
    def test_convert_quantize_reload(self, mode, tmp_path):
        import dataclasses

        from safetensors.numpy import save_file

        from mlx_audio_tpu.convert import convert
        from mlx_audio_tpu.tts.models.llama import Model, ModelConfig
        from mlx_audio_tpu.tts.utils import load_model
        from mlx_audio_tpu.utils import flatten

        src = tmp_path / "src"
        src.mkdir()
        cfg = dict(model_type="llama", hidden_size=64, num_hidden_layers=2,
                   intermediate_size=128, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=16, vocab_size=128)
        m = Model(ModelConfig.from_dict(cfg)).init_and_bind()
        save_file({k: np.ascontiguousarray(np.asarray(v))
                   for k, v in flatten(m.params).items()},
                  str(src / "model.safetensors"))
        cfg["converted_by"] = "mlx_audio_tpu.convert"
        (src / "config.json").write_text(json.dumps(cfg))

        out = convert(str(src), mlx_path=str(tmp_path / f"out-{mode}"),
                      dtype="float32", quantize=True, q_mode=mode,
                      domain="tts")
        saved = json.loads((out / "config.json").read_text())
        assert saved["quantization"]["mode"] == mode
        m2 = load_model(out, model_type="llama")

        def find_fp(d):
            if isinstance(d, dict):
                if "w_fp4" in d or "w_fp8" in d:
                    return True
                return any(find_fp(v) for v in d.values())
            return False

        assert find_fp(m2.params)
        # quantized forward stays sane vs the dense model
        from mlx_audio_tpu.tts.models.llama.llama import (
            llama_forward, logits_from_hidden)

        toks = np.random.RandomState(0).randint(0, 128, (1, 8))
        ref, _ = llama_forward(m.params, m.config, jnp.asarray(toks))
        got, _ = llama_forward(m2.params, m2.config, jnp.asarray(toks))
        ref_l = np.asarray(logits_from_hidden(m.params, m.config, ref))
        got_l = np.asarray(logits_from_hidden(m2.params, m2.config, got))
        assert np.isfinite(got_l).all()
        # fp8 is near-lossless; fp4 coarser
        tol = 0.15 if mode == "mxfp8" else 1.5
        assert np.abs(got_l - ref_l).mean() < tol
