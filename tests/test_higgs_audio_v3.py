"""Higgs Audio v3 tiny-config tests: delay pattern, sanitize, generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.higgs_audio_v3 import Model, ModelConfig
from mlx_audio_tpu.tts.models.higgs_audio_v3.higgs_audio_v3 import (
    apply_delay_pattern,
    reverse_delay_pattern,
)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        text_config=dict(hidden_size=32, num_hidden_layers=2,
                         intermediate_size=64, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8, vocab_size=256),
        audio_num_codebooks=4, audio_codebook_size=34,
        audio_boc_token_id=32, audio_eoc_token_id=33)
    return Model(cfg).init_and_bind()


class TestDelayPattern:
    def test_roundtrip(self):
        codes = np.random.RandomState(0).randint(0, 1024, (10, 8))
        d = apply_delay_pattern(codes, 1024)
        assert d.shape == (17, 8)
        np.testing.assert_array_equal(reverse_delay_pattern(d), codes)

    def test_boc_fill(self):
        codes = np.arange(6).reshape(3, 2)
        d = apply_delay_pattern(codes, 99)
        assert d[0, 1] == 99  # codebook 1 delayed one row
        assert d[1, 1] == codes[0, 1]


class TestGeneration:
    def test_generates_delay_consistent_rows(self, model):
        res = list(model.generate(text_ids=np.arange(5, 20), temperature=0.8,
                                  max_tokens=40))[0]
        codes = res.prompt["codes"]
        if len(codes):
            assert codes.shape[1] == 4
            assert (codes <= 31).all()  # specials stripped/clamped

    def test_greedy_deterministic(self, model):
        r1 = list(model.generate(text_ids=np.arange(5, 15), temperature=0.0,
                                 max_tokens=24))[0]
        r2 = list(model.generate(text_ids=np.arange(5, 15), temperature=0.0,
                                 max_tokens=24))[0]
        np.testing.assert_array_equal(r1.prompt["codes"], r2.prompt["codes"])


class TestSanitize:
    def test_checkpoint_key_remap(self, model):
        w = {
            "tied.embedding.text_embedding.weight": jnp.zeros((4, 4)),
            "body.layers.0.self_attn.q_proj.weight": jnp.zeros((4, 4)),
            "body.norm.weight": jnp.zeros((4,)),
            "tied.embedding.modality_embeddings.0.embedding.weight":
                jnp.zeros((8, 4)),
            "tied.embedding.modality_embeddings.0.model.ignored":
                jnp.zeros((2,)),
            "tied.head.ignored": jnp.zeros((2,)),
        }
        out = model.sanitize(w)
        assert "backbone.embed_tokens.weight" in out
        assert "backbone.layers.0.self_attn.q_proj.weight" in out
        assert "backbone.norm.weight" in out
        assert "multimodal_embedding.weight" in out
        assert not any("ignored" in k for k in out)
