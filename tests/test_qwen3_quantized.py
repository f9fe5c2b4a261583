"""Stacked-layer quantization on qwen3_tts (talker params are stored stacked
(L, out, in) for the per-layer lax.scan — quantization must vmap over the
layer axis, and the per-channel W8A8 MXU layout must slice per layer inside
the scan). Mirrors the reference's apply_quantization surface
(/root/reference/mlx_audio/utils.py:209-256) on a stacked functional tree."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.ops.quant import maybe_quantize_tree, tree_to_i8_layout
from mlx_audio_tpu.tts.models.qwen3_tts import Model

from test_qwen3_tts import tiny_cfg

GS = 16


def _fresh():
    return Model(tiny_cfg()).init_and_bind()


def _leaf_keys(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [tuple(getattr(p, "key", p) for p in k) for k, _ in flat]


def _quantized(model):
    model.params = maybe_quantize_tree(
        model.params, group_size=GS, bits=8,
        predicate=lambda p, w: model.model_quant_predicate(p, w))
    return model


class TestStackedQuantization:
    def test_stacked_leaves_quantize_with_layer_axis(self):
        m = _quantized(_fresh())
        layers = m.params["talker"]["model"]["layers"]
        q = layers["self_attn"]["q_proj"]
        assert "w_q" in q and q["w_q"].ndim == 3
        L = m.tcfg.num_hidden_layers
        assert q["w_q"].shape[0] == L
        assert q["scales"].shape == (L, q["w_q"].shape[1],
                                     q["w_q"].shape[2] // GS)

    def test_norms_heads_embeddings_untouched(self):
        m = _quantized(_fresh())
        t = m.params["talker"]
        assert "weight" in t["model"]["layers"]["input_layernorm"]
        assert "weight" in t["code_predictor"]["lm_head"]
        assert "weight" in t["model"]["text_embedding"]
        # the codec (speech_tokenizer) stays full precision entirely
        keys = _leaf_keys(m.params["speech_tokenizer"])
        assert not any("w_q" in k for k in keys)

    def test_3d_leaves_skipped_without_explicit_predicate(self):
        """Shape alone cannot distinguish a stacked linear from a conv
        kernel — the default predicate must leave 3-D leaves alone."""
        m = _fresh()
        m.params = maybe_quantize_tree(m.params, group_size=GS, bits=8)
        q = m.params["talker"]["model"]["layers"]["self_attn"]["q_proj"]
        assert "weight" in q and "w_q" not in q

    def test_q8_i8_generate_matches_bf16_greedy(self):
        text_ids = np.arange(5, 25)[None]
        ref = list(_fresh().generate(text_ids=text_ids, temperature=0.0,
                                     max_tokens=12, seed=0))
        m = _quantized(_fresh())
        m.params = tree_to_i8_layout(m.params, consume=True)
        layers = m.params["talker"]["model"]["layers"]
        q = layers["self_attn"]["q_proj"]
        assert "w_i8" in q and q["w_i8"].ndim == 3
        assert q["scale"].ndim == 2          # (L, out)
        got = list(m.generate(text_ids=text_ids, temperature=0.0,
                              max_tokens=12, seed=0))
        a_ref = np.concatenate([np.asarray(r.audio) for r in ref])
        a_got = np.concatenate([np.asarray(r.audio) for r in got])
        assert a_got.shape == a_ref.shape
        assert np.isfinite(a_got).all()
        n = min(len(a_ref), len(a_got))
        corr = float(np.corrcoef(a_ref[:n], a_got[:n])[0, 1])
        assert corr > 0.99, corr
