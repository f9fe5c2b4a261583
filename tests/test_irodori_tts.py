"""Irodori-TTS (tiny config): JP normalize, DiT flow, duration, modes."""

import numpy as np
import pytest

from mlx_audio_tpu.tts.models.irodori_tts import (
    IrodoriDiTConfig,
    Model,
    ModelConfig,
    SamplerConfig,
)
from mlx_audio_tpu.tts.models.irodori_tts.duration import (
    build_duration_features,
)
from mlx_audio_tpu.tts.models.irodori_tts.irodori_tts import (
    find_silence_point,
)
from mlx_audio_tpu.tts.models.irodori_tts.text import normalize_text


class FakeTok:
    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    eos_token = "</s>"
    pad_token = "<pad>"
    padding_side = "right"

    def encode(self, text, add_special_tokens=False):
        return [3 + (ord(c) % 60) for c in text][:30]


class FakeVae:
    """Tiny DACVAE stand-in: hop 16, latent 8 (channels-first API)."""

    hop = 16

    def encode(self, wav):
        wav = np.asarray(wav, np.float32).reshape(-1)
        t = max(1, len(wav) // self.hop)
        return np.zeros((1, 8, t), np.float32)

    def decode(self, frames, chunk_size=None):
        t = frames.shape[2]
        return np.zeros((1, t * self.hop, 1), np.float32)


def _model(**dit_kw):
    dit = dict(latent_dim=8, latent_patch_size=1, model_dim=32,
               num_layers=2, num_heads=4, mlp_ratio=2.0,
               text_vocab_size=100, text_dim=16, text_layers=1,
               text_heads=2, speaker_dim=16, speaker_layers=1,
               speaker_heads=2, timestep_embed_dim=8, adaln_rank=4)
    dit.update(dit_kw)
    cfg = ModelConfig(sample_rate=16000, max_text_length=16,
                      max_caption_length=12, audio_downsample_factor=16,
                      dit=IrodoriDiTConfig(**dit),
                      sampler=SamplerConfig(num_steps=3,
                                            sequence_length=12))
    m = Model(cfg).init_and_bind()
    m.tokenizer = FakeTok()
    m.dacvae = FakeVae()
    return m


@pytest.fixture(scope="module")
def model():
    return _model()


class TestText:
    def test_normalize_fw_to_hw(self):
        assert normalize_text("ＡＢＣ１２３") == "ABC123"

    def test_normalize_brackets_and_punct(self):
        assert normalize_text("「こんにちは。」") == "こんにちは"
        assert normalize_text("ﾃｽﾄ") == "テスト"

    def test_duration_features_shape(self):
        f = build_duration_features(["こんにちは！"], token_counts=[5],
                                    max_text_len=16, has_speaker=[True])
        assert f.shape == (1, 14)
        assert f[0, -1] == 1.0

    def test_silence_point(self):
        lat = np.zeros((30, 8), np.float32)
        lat[:12] = np.random.RandomState(0).randn(12, 8)
        assert 10 <= find_silence_point(lat, window=5) <= 14


class TestGenerate:
    def test_speaker_mode_fixed_seconds(self, model):
        res = list(model.generate("こんにちは", seconds=0.012,
                                  rng_seed=0))
        assert len(res) == 1
        r = res[0]
        assert r.sample_rate == 16000
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_voice_clone(self, model):
        ref = np.random.RandomState(0).randn(320).astype(np.float32)
        r = list(model.generate("テスト", ref_audio=ref, seconds=0.012,
                                rng_seed=1))[0]
        assert r.samples >= 0

    def test_joint_and_alternating_modes(self, model):
        for mode in ("joint", "alternating"):
            r = list(model.generate("テスト", seconds=0.012, rng_seed=0,
                                    cfg_guidance_mode=mode))[0]
            assert np.isfinite(np.asarray(r.audio)).all()

    def test_sway_schedule(self, model):
        r = list(model.generate("テスト", seconds=0.012, rng_seed=0,
                                t_schedule_mode="sway"))[0]
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_requires_dacvae(self):
        m = _model()
        m.dacvae = None
        with pytest.raises(ValueError):
            list(m.generate("x", seconds=0.01))

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["irodori_tts"] == "irodori_tts"


class TestCaptionMode:
    def test_caption_only_generation(self):
        m = _model(use_caption_condition=True, use_speaker_condition=False,
                   caption_dim=16, caption_layers=1, caption_heads=2)
        r = list(m.generate("こんにちは", caption="明るい声",
                            seconds=0.012, rng_seed=0))[0]
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_dual_mode_with_duration_predictor(self):
        m = _model(use_caption_condition=True, use_speaker_condition=True,
                   caption_dim=16, caption_layers=1, caption_heads=2,
                   use_duration_predictor=True, duration_hidden_dim=16,
                   duration_layers=2,
                   duration_architecture="token_sum_dual_adarn_zero_"
                                         "no_aux")
        ref = np.random.RandomState(1).randn(320).astype(np.float32)
        r = list(m.generate("テストです", ref_audio=ref,
                            caption="落ち着いた声", rng_seed=0,
                            max_seconds=0.05))[0]
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_duration_predictor_init_bias(self):
        m = _model(use_duration_predictor=True, duration_hidden_dim=16,
                   duration_layers=1)
        # zero-init modulation + out weight => every token predicts
        # token_init_frames (9.0) via softplus(bias)
        ids, mask = m._prepare_text("あいう")
        pred = m._predict_frames("あいう", ids, mask,
                                 np.zeros((1, 1, 8), np.float32),
                                 np.zeros((1, 1), bool), None, None)
        n_tokens = int(mask.sum())
        np.testing.assert_allclose(pred, 9.0 * n_tokens, rtol=1e-3)


class TestSanitize:
    def test_cond_module_and_prefix(self, model):
        w = {"cond_module.0.weight": np.zeros((32, 8)),
             "blocks.0.attention.wq.weight": np.zeros((32, 32))}
        out = model.sanitize(w)
        assert "cond_module.layers.0.weight" in out
        assert "blocks.0.attention.wq.weight" in out
