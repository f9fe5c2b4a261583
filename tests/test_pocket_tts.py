"""Pocket-TTS: tiny-config streaming flow-matching TTS tests.

Covers reference pocket_tts/ — voice-prompt state, LSD flow decode, EOS +
frames_after_eos, sentence splitting, streaming generate surface.
"""

import jax
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.pocket_tts import Model, ModelConfig
from mlx_audio_tpu.tts.models.pocket_tts.pocket_tts import (
    prepare_text_prompt,
    split_into_best_sentences,
)


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        flow_lm=dict(
            transformer=dict(d_model=32, num_heads=4, num_layers=2,
                             hidden_scale=2, max_period=10000),
            flow=dict(dim=32, depth=2),
            lookup_table=dict(n_bins=64, dim=16)),
        mimi=dict(
            sample_rate=24000, channels=1, frame_rate=12.5,
            seanet=dict(dimension=16, channels=1, n_filters=4,
                        n_residual_layers=1, ratios=[8, 5, 4, 2],
                        kernel_size=7, residual_kernel_size=3,
                        last_kernel_size=3, dilation_base=2,
                        pad_mode="constant", compress=2),
            transformer=dict(d_model=16, num_heads=2, num_layers=1,
                             layer_scale=0.01, context=32,
                             dim_feedforward=32),
            quantizer=dict(dimension=8, output_dimension=16)),
    ))


class CharTokenizer:
    def encode(self, text):
        return [ord(c) % 64 for c in text]

    def decode(self, ids):
        return "".join(chr(97 + i % 26) for i in ids)


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_cfg()).init_and_bind()
    m.tokenizer = CharTokenizer()
    return m


class TestTextHelpers:
    def test_prepare_text_prompt(self):
        text, guess = prepare_text_prompt("hello there")
        assert text.endswith(".")
        assert text.strip()[0].isupper()
        assert guess == 3  # <=4 words
        _, guess2 = prepare_text_prompt("one two three four five six")
        assert guess2 == 1

    def test_prepare_empty_raises(self):
        with pytest.raises(ValueError):
            prepare_text_prompt("   ")

    def test_split_sentences_packs_chunks(self):
        tok = CharTokenizer()
        text = ("First sentence here. " * 3 + "Second longer sentence "
                "with many words to overflow the chunk limit. " * 2)
        chunks = split_into_best_sentences(tok, text, max_tokens=50)
        assert len(chunks) >= 2
        assert all(c.strip() for c in chunks)


class TestVoicePrompt:
    def test_encode_voice_prompt_shape(self, model):
        cond = model.encode_voice_prompt(
            np.random.RandomState(0).randn(24000 // 2).astype(np.float32))
        assert cond.ndim == 3 and cond.shape[0] == 1
        assert cond.shape[2] == model.config.flow_cfg.dim

    def test_state_reusable_across_sentences(self, model):
        state = model.get_state_for_audio_prompt(
            np.random.RandomState(1).randn(4000).astype(np.float32))
        assert state["prompt_frames"] >= 1
        assert state["offset"] == state["prompt_frames"]


class TestGenerate:
    def test_generate_non_streaming(self, model):
        results = list(model.generate(
            "hello world test", seed=0,
            ref_audio=np.random.RandomState(2).randn(4000)
            .astype(np.float32)))
        assert len(results) == 1
        r = results[0]
        assert r.sample_rate == 24000
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_generate_streaming_chunks(self, model):
        results = list(model.generate(
            "hello streaming world", stream=True, streaming_interval=0.1,
            seed=0,
            ref_audio=np.random.RandomState(3).randn(4000)
            .astype(np.float32)))
        assert len(results) >= 1
        assert results[-1].is_final_chunk
        total = sum(r.samples for r in results)
        assert total > 0

    def test_frames_after_eos_extends_audio(self, model):
        ref = np.random.RandomState(4).randn(4000).astype(np.float32)
        short = list(model.generate("hi there friend", frames_after_eos=0,
                                    seed=5, ref_audio=ref))
        longer = list(model.generate("hi there friend", frames_after_eos=4,
                                     seed=5, ref_audio=ref))
        assert sum(r.samples for r in longer) >= sum(
            r.samples for r in short)

    def test_deterministic_given_seed(self, model):
        ref = np.random.RandomState(6).randn(4000).astype(np.float32)
        a = np.concatenate([np.asarray(r.audio) for r in model.generate(
            "same seed", seed=7, ref_audio=ref)])
        b = np.concatenate([np.asarray(r.audio) for r in model.generate(
            "same seed", seed=7, ref_audio=ref)])
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestRegistry:
    def test_pocket_tts_resolves(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="pocket_tts", category="tts",
                                    model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model")
