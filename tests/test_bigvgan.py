"""BigVGAN vocoder tests (tiny config)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.codec.models.bigvgan import BigVGAN, ModelConfig
from mlx_audio_tpu.codec.models.bigvgan.bigvgan import (
    _downsample1d,
    _upsample1d,
    kaiser_sinc_filter1d,
)


class TestAntiAliasing:
    def test_filter_normalized(self):
        f = kaiser_sinc_filter1d(0.25, 0.3, 12)
        assert abs(f.sum() - 1.0) < 1e-6

    def test_updown_identity_on_bandlimited(self):
        t = np.arange(2048) / 2048
        x = np.sin(2 * np.pi * 16 * t).astype(np.float32)[None, :, None]
        y = np.asarray(_downsample1d(_upsample1d(jnp.asarray(x), 2), 2))
        assert y.shape == x.shape
        assert np.abs(y[0, 32:-32, 0] - x[0, 32:-32, 0]).max() < 1e-3

    def test_upsample_doubles_length(self):
        x = jnp.zeros((1, 100, 4))
        assert _upsample1d(x, 2).shape == (1, 200, 4)


class TestBigVGAN:
    def test_mel_to_audio(self):
        cfg = ModelConfig(num_mels=20, upsample_rates=[4, 4],
                          upsample_kernel_sizes=[8, 8],
                          upsample_initial_channel=32,
                          resblock_kernel_sizes=[3],
                          resblock_dilation_sizes=[[1, 3]])
        m = BigVGAN(cfg).init_and_bind()
        mel = np.random.RandomState(0).randn(1, 20, 20).astype(np.float32)
        audio = np.asarray(m(mel))
        assert audio.shape == (1, 20 * 16, 1)
        assert np.abs(audio).max() <= 1.0  # tanh bounded
        assert np.isfinite(audio).all()

    def test_sanitize_weight_norm_and_tconv(self):
        cfg = ModelConfig(num_mels=8, upsample_rates=[2],
                          upsample_kernel_sizes=[4],
                          upsample_initial_channel=16,
                          resblock_kernel_sizes=[3],
                          resblock_dilation_sizes=[[1]])
        m = BigVGAN(cfg)
        w = {
            "conv_pre.weight_v": jnp.ones((16, 8, 7)),
            "conv_pre.weight_g": jnp.ones((16, 1, 1)),
            "ups.0.0.weight_v": jnp.ones((16, 8, 4)),  # torch convT (I,O,W)
            "ups.0.0.weight_g": jnp.ones((16, 1, 1)),
            "resblocks.0.activations.0.act.alpha": jnp.ones((1, 8, 1)),
        }
        out = m.sanitize(w)
        assert out["conv_pre.weight"].shape == (7, 8, 16)
        assert out["ups.0.0.weight"].shape == (4, 16, 8)
        assert out["resblocks.0.activations.0.act.alpha"].shape == (8,)
