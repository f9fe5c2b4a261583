"""Quantized end-to-end generation parity: convert -> load -> generate.

The reference's best published Higgs v2 numbers are q8/q6
(reference docs/models/tts/higgs_audio.md:156-160), so the quantized path
is a first-class product path, not a storage trick. These tests pin that
an int8 model produces the *same greedy audio* as bf16 on a fixed seed
(quantization error must stay below the greedy argmax margin), mirroring
how `bench.py::bench_higgs_v2(bits=8)` builds its model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.ops.quant import maybe_quantize_tree
from mlx_audio_tpu.tts.models.higgs_audio import Model, ModelConfig

from test_higgs_audio_v2 import FakeCodec, FakeTok, tiny_cfg

GROUP = 16  # tiny dims (hidden 32); the real model uses 64


def _fresh_model():
    m = Model(tiny_cfg()).init_and_bind()
    m.tokenizer = FakeTok()
    m.codec = FakeCodec()
    return m


def _quantize(model, bits):
    model.params = maybe_quantize_tree(
        model.params, group_size=GROUP, bits=bits,
        predicate=model.model_quant_predicate)
    return model


class TestQuantizedE2E:
    def test_q8_tree_actually_quantized(self):
        m = _quantize(_fresh_model(), 8)
        flat = jax.tree_util.tree_flatten_with_path(m.params)[0]
        q_leaves = [k for k, _ in flat if any(
            getattr(p, "key", "") == "w_q" for p in k)]
        assert q_leaves, "no layer was quantized"
        # the predicate exempts the audio head + codebook embeddings
        assert not any("audio_lm_head" in jax.tree_util.keystr(k)
                       for k in q_leaves)

    def test_q8_greedy_audio_parity(self):
        """int8 generate emits the same greedy code sequence (and therefore
        the same waveform) as bf16 on a fixed seed."""
        bf16 = _fresh_model()
        ref = list(bf16.generate("parity check sentence", temperature=0.0,
                                 max_new_frames=12, seed=0))[0]
        q8 = _quantize(_fresh_model(), 8)
        got = list(q8.generate("parity check sentence", temperature=0.0,
                               max_new_frames=12, seed=0))[0]
        ref_codes = np.asarray(ref.prompt["codes"])
        got_codes = np.asarray(got.prompt["codes"])
        assert got_codes.shape == ref_codes.shape
        agree = float((got_codes == ref_codes).mean())
        assert agree >= 0.95, f"greedy code agreement {agree:.3f} < 0.95"
        if agree == 1.0:
            np.testing.assert_allclose(np.asarray(got.audio),
                                       np.asarray(ref.audio), atol=1e-5)

    def test_q8_mxu_i8_layout_greedy_parity(self):
        """The W8A8 MXU decode layout (tree_to_i8_layout -> qmatmul_i8, the
        bench/product `mxu_int8` path) still reproduces the bf16 greedy code
        sequence: dynamic activation quantization adds ~8e-3 relative error,
        which must stay below the greedy argmax margin."""
        from mlx_audio_tpu.ops.quant import tree_to_i8_layout

        bf16 = _fresh_model()
        ref = list(bf16.generate("parity check sentence", temperature=0.0,
                                 max_new_frames=12, seed=0))[0]
        q8 = _quantize(_fresh_model(), 8)
        q8.params = tree_to_i8_layout(q8.params)
        flat = jax.tree_util.tree_flatten_with_path(q8.params)[0]
        assert any(getattr(p, "key", "") == "w_i8" for k, _ in flat
                   for p in k), "i8 layout conversion did not take"
        got = list(q8.generate("parity check sentence", temperature=0.0,
                               max_new_frames=12, seed=0))[0]
        ref_codes = np.asarray(ref.prompt["codes"])
        got_codes = np.asarray(got.prompt["codes"])
        assert got_codes.shape == ref_codes.shape
        agree = float((got_codes == ref_codes).mean())
        assert agree >= 0.9, f"greedy code agreement {agree:.3f} < 0.9"

    def test_apply_quantization_mxu_int8_optin(self):
        """utils.apply_quantization honors quantization['mxu_int8']."""
        from mlx_audio_tpu.utils import apply_quantization

        m = _fresh_model()
        params = apply_quantization(
            m.params, {"quantization": {"bits": 8, "group_size": GROUP,
                                        "mxu_int8": True}},
            model_quant_predicate=m.model_quant_predicate)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        keys = {getattr(p, "key", "") for k, _ in flat for p in k}
        assert "w_i8" in keys and "w_q" not in keys

    def test_q8_prefill_logits_tolerance(self):
        """Quantization error on the prefill logits is bounded well below
        typical greedy margins."""
        bf16 = _fresh_model()
        embeds, mask = bf16.build_prompt("tolerance probe")
        plen = embeds.shape[1]
        from mlx_audio_tpu.tts.models.higgs_audio.higgs_audio import (
            _bucket)

        pb = _bucket(plen)
        pad = pb - plen
        embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        cache_len = _bucket(pb + 32)
        carry_ref, _ = bf16._prefill_fn(pb, cache_len)(
            bf16.params, embeds, mask, jnp.int32(plen),
            jax.random.PRNGKey(0))
        q8 = _quantize(_fresh_model(), 8)
        carry_q, _ = q8._prefill_fn(pb, cache_len)(
            q8.params, embeds, mask, jnp.int32(plen), jax.random.PRNGKey(0))
        # hidden-state drift between the two carries (KV caches, sampled
        # frame embeds) bounds the logit error seen by every later step
        errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(jax.tree.leaves(carry_ref),
                                jax.tree.leaves(carry_q))
                if hasattr(a, "dtype") and jnp.issubdtype(
                    a.dtype, jnp.floating) and a.shape == b.shape]
        assert errs and max(errs) < 0.5, f"carry drift too large: {max(errs)}"
