"""MossFormer2 SE (tiny config): FLASH block, FSMN, masknet, enhance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.sts.models.mossformer2_se import (
    Model,
    MossFormer2SEConfig,
)
from mlx_audio_tpu.sts.models.mossformer2_se.mossformer2_se import (
    _flash_block,
    _flash_init,
    _gated_fsmn_block,
    _fsmn_init,
    masknet_forward,
)


def _cfg():
    return MossFormer2SEConfig(
        sample_rate=8000, win_len=256, win_inc=128, fft_len=256,
        num_mels=20, in_channels=60, out_channels=32,
        out_channels_final=129, num_blocks=2, group_size=16,
        query_key_dim=64, fsmn_inner=16, fsmn_lorder=3,
        one_time_decode_length=2, decode_window=1,
        chunk_seconds=1.0, auto_chunk_threshold=8.0)


@pytest.fixture(scope="module")
def model():
    return Model(_cfg()).init_and_bind()


class TestBlocks:
    def test_flash_block_shape(self):
        ks = iter(jax.random.split(jax.random.PRNGKey(0), 64))
        p = _flash_init(ks, 32, 64)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 21, 32))
        y = _flash_block(p, x, group_size=16)
        assert y.shape == (2, 21, 32)
        assert bool(jnp.isfinite(y).all())

    def test_flash_group_padding_invariance(self):
        # same prefix output whether n is a multiple of group or not
        ks = iter(jax.random.split(jax.random.PRNGKey(0), 64))
        p = _flash_init(ks, 32, 64)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32))
        y16 = _flash_block(p, x, group_size=16)
        assert y16.shape == (1, 16, 32)

    def test_gated_fsmn_shape(self):
        ks = iter(jax.random.split(jax.random.PRNGKey(0), 64))
        p = _fsmn_init(ks, 32, 16, 3)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 32))
        y = _gated_fsmn_block(p, x, lorder=3)
        assert y.shape == (1, 10, 32)

    def test_masknet_output(self, model):
        feats = jax.random.normal(jax.random.PRNGKey(0), (1, 30, 60))
        mask = masknet_forward(model.params, model.config, feats)
        assert mask.shape == (1, 30, 129)
        assert float(mask.min()) >= 0.0  # ReLU mask


class TestEnhance:
    def test_enhance_full(self, model):
        audio = np.random.RandomState(0).randn(4000).astype(
            np.float32) * 0.1
        out = model.enhance(audio)
        assert out.shape == (4000,)
        assert np.isfinite(out).all()

    def test_enhance_segmented(self, model):
        # > one_time_decode_length (2s at 8k) triggers segmented path
        audio = np.random.RandomState(1).randn(20000).astype(
            np.float32) * 0.1
        out = model.enhance(audio)
        assert out.shape == (20000,)
        assert np.isfinite(out).all()

    def test_enhance_chunked(self, model):
        audio = np.random.RandomState(2).randn(72000).astype(
            np.float32) * 0.1
        out = model.enhance(audio, chunked=True)
        assert out.shape == (72000,)
        assert np.isfinite(out).all()

    def test_generate_surface(self, model):
        audio = np.random.RandomState(3).randn(2000).astype(
            np.float32) * 0.1
        res = model.generate(audio)
        assert res["sample_rate"] == 8000
        assert res["audio"].shape == (2000,)

    def test_registry(self):
        from mlx_audio_tpu.sts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["mossformer2_se"] == "mossformer2_se"


class TestSanitize:
    def test_conv_layouts(self, model):
        w = {
            "model.mossformer.conv1d_encoder.weight":
                np.zeros((32, 60, 1)),
            "model.mossformer.mdl.intra_mdl.mossformerM.fsmn.0."
            "gated_fsmn.fsmn.conv1.weight": np.zeros((16, 1, 5, 1)),
            "model.mossformer.mdl.intra_mdl.mossformerM.layers.0."
            "to_hidden.conv_module.weight": np.zeros((128, 1, 17)),
        }
        out = model.sanitize(w)
        assert out["conv1d_encoder.weight"].shape == (32, 60)
        assert out["mdl.intra_mdl.mossformerM.fsmn.0.gated_fsmn.fsmn."
                   "conv1.weight"].shape == (5, 1, 1, 16)
        assert out["mdl.intra_mdl.mossformerM.layers.0.to_hidden."
                   "conv_module.weight"].shape == (17, 1, 128)
