"""Moshi duplex LM tests (tiny config)."""

import numpy as np
import pytest

from mlx_audio_tpu.sts.models.moshi import Lm, LmConfig, LmGen, Model, ModelConfig


LM_CFG = dict(
    transformer=dict(d_model=32, num_heads=4, num_layers=2,
                     dim_feedforward=64, context=32),
    depformer=dict(d_model=16, num_heads=2, num_layers=1, dim_feedforward=32,
                   num_slices=4),
    text_in_vocab_size=64, text_out_vocab_size=63, audio_vocab_size=65,
    audio_codebooks=8, audio_delays=[0, 1, 1, 1] + [0, 1, 1, 1])


@pytest.fixture(scope="module")
def lm():
    return Lm(LmConfig.from_dict(LM_CFG)).init_and_bind()


class TestLmGen:
    def test_delay_gating(self, lm):
        """Own audio frames only emerge after the max delay fills."""
        gen = LmGen(lm, max_steps=32)
        other = np.zeros((1, 4), np.int32)
        text0, own0 = gen.step(other)
        assert own0 is None  # delay 1 -> first output one step late
        text1, own1 = gen.step(other)
        assert own1 is not None and own1.shape == (1, 4)
        assert (own1 < 64).all() and (own1 >= 0).all()

    def test_tokens_in_range(self, lm):
        gen = LmGen(lm, max_steps=16)
        other = np.random.RandomState(0).randint(0, 64, (1, 4)).astype(np.int32)
        for _ in range(8):
            text, own = gen.step(other)
            assert 0 <= int(text[0]) < 63


class TestDuplexModel:
    def test_audio_to_audio(self):
        from mlx_audio_tpu.codec.models.mimi import Mimi, MimiConfig

        m = Model(ModelConfig(lm_config=LM_CFG,
                              mimi_num_codebooks=4)).init_and_bind()
        mimi_cfg = MimiConfig(
            seanet=dict(dimension=32, channels=1, causal=True, nfilters=4,
                        nresidual_layers=1, ratios=[4, 3], ksize=7,
                        residual_ksize=3, last_ksize=3, dilation_base=2,
                        pad_mode="constant", true_skip=True, compress=2),
            transformer=dict(d_model=32, num_heads=4, num_layers=2,
                             layer_scale=0.01, context=16,
                             dim_feedforward=64),
            quantizer_nq=4, quantizer_bins=64, quantizer_dim=16,
            sample_rate=24000, frame_rate=1000.0)
        m.mimi = Mimi(mimi_cfg).init_and_bind()
        audio = np.random.RandomState(0).randn(
            m.mimi.samples_per_frame * 10).astype(np.float32) * 0.1
        res = m.generate(audio, max_steps=10)
        assert res.token_count == 10
        assert res.samples > 0
        assert np.isfinite(np.asarray(res.audio)).all()
