"""OmniVoice (tiny config): NAR iterative unmask, prompt grid, duration."""

import numpy as np
import pytest

from mlx_audio_tpu.tts.models.omnivoice import Model, ModelConfig
from mlx_audio_tpu.tts.models.omnivoice.duration import (
    RuleDurationEstimator,
)
from mlx_audio_tpu.tts.models.omnivoice.omnivoice import (
    combine_text,
    tokenize_with_nonverbal_tags,
)
from mlx_audio_tpu.tts.models.omnivoice.utils import (
    detect_nonsilent_ranges_ms,
    remove_silence,
)


class FakeTok:
    class _R:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text, add_special_tokens=False, **kw):
        return self._R([3 + (ord(c) % 40) for c in text][:64])


def _cfg():
    return ModelConfig(
        audio_vocab_size=17, audio_mask_id=16, num_audio_codebook=4,
        llm_config=dict(hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, vocab_size=200,
                        head_dim=8))


@pytest.fixture(scope="module")
def model():
    m = Model(_cfg()).init_and_bind()
    m.text_tokenizer = FakeTok()
    return m


class TestText:
    def test_combine_text_cjk_spaces(self):
        assert combine_text("你 好", None) == "你好"
        assert combine_text("b", "a") == "a b"

    def test_nonverbal_tags_atomic(self):
        tok = FakeTok()
        ids = tokenize_with_nonverbal_tags("hi [laughter] there", tok)
        assert len(ids) > 0

    def test_duration_estimator(self):
        est = RuleDurationEstimator()
        cjk = est.estimate_duration("你好世界" * 8, "Nice to meet you.", 25,
                                    low_threshold=None)
        lat = est.estimate_duration("abcd" * 8, "Nice to meet you.", 25,
                                    low_threshold=None)
        assert cjk > lat > 0

    def test_duration_boost_short(self):
        est = RuleDurationEstimator()
        short = est.estimate_duration("a", "Nice to meet you.", 25)
        assert short > est.estimate_duration(
            "a", "Nice to meet you.", 25, low_threshold=None)


class TestSilence:
    def test_nonsilent_detects_burst(self):
        sr = 1000
        a = np.zeros(3000, np.float32)
        a[1000:1600] = 0.5
        ranges = detect_nonsilent_ranges_ms(a, sr, min_silence_len=200,
                                            silence_thresh=-40)
        assert any(abs(s - 1000) < 250 for s, e in ranges)

    def test_remove_silence_shrinks(self):
        sr = 1000
        a = np.zeros(4000, np.float32)
        a[500:1000] = 0.5
        a[3000:3500] = 0.5
        out = remove_silence(a, sr, mid_sil=300)
        assert 0 < len(out) < len(a)


class TestGenerate:
    def test_forward_shapes(self, model):
        import jax.numpy as jnp

        ids = jnp.full((1, 6, 4), 2, jnp.int32)
        mask = jnp.asarray([[False, False, True, True, True, True]])
        logits = model._forward(model.params, ids, mask)
        assert logits.shape == (1, 6, 4, 17)

    def test_generate_fills_all_masks(self, model):
        res = list(model.generate("hello world", duration_s=0.4,
                                  num_steps=4, seed=0))
        assert len(res) == 1
        r = res[0]
        # 0.4s * 24000 / 960 = 10 tokens
        assert r.token_count == 10
        assert r.samples == 10 * 960

    def test_generate_no_cfg(self, model):
        res = list(model.generate("hi", duration_s=0.4, num_steps=3,
                                  guidance_scale=0.0, seed=1))
        assert res[0].token_count == 10

    def test_generate_gumbel_paths(self, model):
        res = list(model.generate("hi", duration_s=0.4, num_steps=3,
                                  class_temperature=1.0,
                                  position_temperature=5.0, seed=2))
        assert res[0].token_count == 10

    def test_generate_batch_mixed_lengths(self, model):
        results = model.generate_batch(
            ["one", "two two"], duration_s=[0.4, 0.8], num_steps=3,
            seed=0)
        assert [r.token_count for r in results] == [10, 20]
        assert results[0].segment_idx == 0
        assert results[1].segment_idx == 1

    def test_voice_clone_ref_tokens(self, model):
        ref = np.random.RandomState(0).randint(0, 16, (5, 4))
        res = list(model.generate("hi", duration_s=0.4, num_steps=3,
                                  ref_tokens=ref, seed=0))
        assert res[0].token_count == 10

    def test_requires_text_tokenizer(self):
        m = Model(_cfg()).init_and_bind()
        with pytest.raises(ValueError):
            list(m.generate("hi", duration_s=0.4))

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["omnivoice"] == "omnivoice"


class TestSanitize:
    def test_splits_stacked_tables(self, model):
        V, C, H = 17, 4, 32
        w = {
            "llm.embed_tokens.weight": np.zeros((200, H)),
            "audio_embeddings.weight": np.zeros((C * V, H)),
            "audio_heads.weight": np.zeros((C * V, H)),
            "codebook_layer_offsets": np.zeros(C),
        }
        out = model.sanitize(w)
        assert "backbone.embed_tokens.weight" in out
        assert out["audio_embeddings.3.weight"].shape == (V, H)
        assert out["audio_heads.0.weight"].shape == (V, H)
        assert "codebook_layer_offsets" not in out
