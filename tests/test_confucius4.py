"""Confucius4 pipeline (tiny config): w2v cond -> T2S -> S2A -> BigVGAN."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.confucius4 import Model, ModelConfig
from mlx_audio_tpu.tts.models.confucius4.confucius4 import (
    LANGUAGE_TOKEN,
    prefix_cond_emb,
    prefix_text_emb,
    w2v_hidden17,
)
from mlx_audio_tpu.tts.models.confucius4.s2a_voc import (
    ref_mel_22k,
    s2a_build_mu,
    vocoder_forward,
)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(w2v_hidden=32, w2v_heads=4, w2v_layers=2,
                      t2s_layers=2, t2s_heads=4, t2s_dim=32,
                      s2a_depth=4, s2a_hidden=32, s2a_heads=4,
                      voc_ups=(2, 2), voc_up_kernels=(4, 4),
                      voc_channels=8)
    return Model(cfg).init_and_bind()


class TestComponents:
    def test_fbank_shape(self, model):
        audio = np.random.RandomState(0).randn(16000).astype(np.float32)
        fb = model.fbank_160(audio)
        # 16 kHz 1 s -> 98 frames -> stacked by 2 -> 49 x 160
        assert fb.shape == (1, 49, 160)

    def test_w2v_hidden(self, model):
        fb = model.fbank_160(np.zeros(8000, np.float32))
        h = w2v_hidden17(model.params["w2v"], model.config,
                         jnp.asarray(fb))
        assert h.shape == (1, fb.shape[1], 32)

    def test_prefix_embs(self, model):
        cond = jnp.zeros((1, 20, 32))
        ce = prefix_cond_emb(model.params["t2s"], cond)
        assert ce.shape == (1, 1, 32)
        te = prefix_text_emb(model.params["t2s"],
                             jnp.asarray([[1, 2, 3]]))
        assert te.shape == (1, 3, 32)

    def test_ref_mel(self):
        mel = ref_mel_22k(np.zeros(16000, np.float32))
        assert mel.shape[0] == 1 and mel.shape[2] == 80

    def test_build_mu_length(self, model):
        codes = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8, 9, 10]])
        latent = jnp.zeros((1, 10, 32))
        mu = s2a_build_mu(model.params["s2a"], model.config, codes, latent,
                          t_ref=6)
        assert mu.shape == (1, 6 + int(10 * 1.72), 32)

    def test_vocoder_upsampling(self, model):
        mel = jnp.zeros((1, 80, 10))
        wav = vocoder_forward(model.params["voc"], model.config, mel)
        assert wav.shape == (1, 10 * 4)  # ups (2, 2)


class TestGenerate:
    def test_voice_clone_pipeline(self, model):
        ref = np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1
        res = list(model.generate("xin chao", ref_audio=ref, lang="vi",
                                  max_tokens=6))
        assert res[0].samples > 0
        assert res[0].sample_rate == 22050

    def test_requires_ref_audio(self, model):
        with pytest.raises(ValueError):
            list(model.generate("hello"))

    def test_language_tokens(self):
        assert set(LANGUAGE_TOKEN) >= {"zh", "en", "vi", "ja", "ko", "th"}

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["confucius4"] == "confucius4"
