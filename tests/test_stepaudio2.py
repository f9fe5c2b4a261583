"""StepAudio2 token2wav + shared s3gen (HiFT, CAMPPlus, mel)."""

import numpy as np
import jax
import jax.numpy as jnp

from mlx_audio_tpu.codec.models.stepaudio2 import Model, ModelConfig
from mlx_audio_tpu.tts.models.chatterbox.s3gen.hifigan import (
    HiFTConfig, hift_generate, init_hift)
from mlx_audio_tpu.tts.models.chatterbox.s3gen.mel import mel_spectrogram
from mlx_audio_tpu.tts.models.chatterbox.s3gen.xvector import (
    CAMPPlusConfig, campplus_forward, init_campplus, kaldi_fbank,
    sanitize_campplus)


def _cfg():
    return ModelConfig.from_dict(dict(
        input_size=16, output_size=8, spk_embed_dim=12, vocab_size=32,
        num_blocks=1, num_up_blocks=1, up_stride=2, pre_lookahead_len=3,
        attention_heads=2, linear_units=32, dit_depth=1, dit_heads=2,
        dit_head_dim=8, dit_hidden=16, dit_mlp_ratio=2.0))


class _TinyModel(Model):
    def __init__(self):
        super().__init__(_cfg())
        self.hift_cfg = HiFTConfig(
            in_channels=8, base_channels=16, nb_harmonics=2,
            sampling_rate=24000, upsample_rates=[4, 3],
            upsample_kernel_sizes=[8, 7],
            source_resblock_kernel_sizes=[7, 7],
            source_resblock_dilation_sizes=[[1, 3], [1, 3]],
            resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
            use_interpolation=True)
        self.campplus_cfg = CAMPPlusConfig(
            feat_dim=16, embedding_size=12, growth_rate=4, bn_size=2,
            init_channels=8, m_channels=8)
        self.campplus_cfg.block_layers = (2, 2, 2)


class TestMel:
    def test_shape_and_floor(self):
        mel = np.asarray(mel_spectrogram(np.zeros(24000, np.float32)))
        assert mel.shape == (1, 50, 80)         # hop 480
        np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-6)


class TestKaldiFbank:
    def test_snip_edges_frames(self):
        fb = kaldi_fbank(np.random.RandomState(0)
                         .randn(16000).astype(np.float32))
        assert fb.shape == ((16000 - 400) // 160 + 1, 80)
        assert np.isfinite(fb).all()


class TestHiFT:
    def test_generate_shape(self):
        cfg = HiFTConfig(in_channels=8, base_channels=16, nb_harmonics=2,
                         upsample_rates=[4, 3],
                         upsample_kernel_sizes=[8, 7],
                         source_resblock_kernel_sizes=[7, 7],
                         source_resblock_dilation_sizes=[[1, 3], [1, 3]],
                         resblock_kernel_sizes=[3],
                         resblock_dilation_sizes=[[1, 3]],
                         use_interpolation=True)
        p = init_hift(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(np.random.RandomState(1)
                          .randn(1, 20, 8).astype(np.float32))
        wav, src = hift_generate(p, cfg, mel)
        # upsample scale = 4*3*4 (hop) = 48 samples per mel frame
        assert wav.shape == (1, 20 * 48)
        assert float(jnp.abs(wav).max()) <= cfg.audio_limit + 1e-6
        assert src.shape == (1, 20 * 48)


class TestCAMPPlus:
    def test_embedding_shape(self):
        cfg = CAMPPlusConfig(feat_dim=16, embedding_size=12,
                             growth_rate=4, bn_size=2, init_channels=8,
                             m_channels=8)
        cfg.block_layers = (2, 2, 2)
        p = init_campplus(jax.random.PRNGKey(0), cfg)
        feats = jnp.asarray(np.random.RandomState(2)
                            .randn(1, 50, 16).astype(np.float32))
        emb = np.asarray(campplus_forward(p, cfg, feats))
        assert emb.shape == (1, 12)
        assert np.isfinite(emb).all()

    def test_sanitize_renames(self):
        out = sanitize_campplus({
            "xvector.tdnn.linear.weight": jnp.ones((8, 128, 5)),
            "xvector.block1.tdnnd1.linear1.weight": jnp.ones((8, 128, 1)),
            "xvector.transit1.linear.weight": jnp.ones((64, 128, 1)),
            "head.conv1.weight": jnp.ones((8, 1, 3, 3)),
            "xvector.tdnn.nonlinear.batchnorm.running_mean":
                jnp.zeros((8,)),
            "xvector.dense.nonlinear.batchnorm.num_batches_tracked":
                jnp.zeros(()),
        })
        assert out["tdnn.linear.weight"].shape == (5, 128, 8)
        assert "blocks.0.layers.0.linear1.weight" in out
        assert "transits.0.linear.weight" in out
        assert out["head.conv1.weight"].shape == (3, 3, 1, 8)
        assert "tdnn.nonlinear.0.running_mean" in out
        assert not any("num_batches" in k for k in out)


class TestToken2Wav:
    def test_end_to_end(self):
        m = _TinyModel().init_and_bind()
        rs = np.random.RandomState(3)
        prompt_wav = rs.randn(8000).astype(np.float32) * 0.1
        prompt = m.prepare_prompt(
            prompt_wav,
            prompt_tokens=rs.randint(0, 32, size=7).astype(np.int32))
        assert prompt["prompt_feat"].shape == (1, 7 * 2, 80) or \
            prompt["prompt_feat"].shape[1] == 14
        tokens = rs.randint(0, 32, size=9).astype(np.int32)
        wav = m.decode(tokens, prompt, n_timesteps=2)
        # generated span: 9 tokens * up 2 mel frames * 48 samples
        assert wav.shape == (9 * 2 * 48,)
        assert np.isfinite(wav).all()

    def test_prompt_requires_tokens_without_tokenizer(self):
        m = _TinyModel().init_and_bind()
        import pytest
        with pytest.raises(ValueError, match="prompt_tokens"):
            m.prepare_prompt(np.zeros(4000, np.float32))

    def test_cfg_rate_changes_output(self):
        m = _TinyModel().init_and_bind()
        rs = np.random.RandomState(4)
        prompt = m.prepare_prompt(
            rs.randn(8000).astype(np.float32),
            prompt_tokens=rs.randint(0, 32, size=5).astype(np.int32))
        tokens = rs.randint(0, 32, size=6).astype(np.int32)
        w1 = m.decode(tokens, prompt, n_timesteps=2)
        m.config.inference_cfg_rate = 0.0
        m._jit_cache.clear()
        w2 = m.decode(tokens, prompt, n_timesteps=2)
        assert not np.allclose(w1, w2)
