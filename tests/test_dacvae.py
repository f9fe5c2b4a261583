"""DACVAE: shape contracts, chunked decode, weight-norm sanitize."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.codec.models.dacvae import Model, ModelConfig


def _tiny():
    return Model(ModelConfig(encoder_dim=8, encoder_rates=[2, 4],
                             latent_dim=32, decoder_dim=32,
                             decoder_rates=[4, 2], codebook_dim=8,
                             sample_rate=16000)).init_and_bind()


class TestRoundtrip:
    def test_encode_shape(self):
        m = _tiny()
        wav = np.random.RandomState(0).randn(1, 800, 1).astype(np.float32)
        z = np.asarray(m.encode(wav))
        assert z.shape == (1, 8, 100)      # hop = 8
        assert np.isfinite(z).all()

    def test_encode_pads_to_hop(self):
        m = _tiny()
        z = np.asarray(m.encode(np.zeros(805, np.float32)))
        assert z.shape[2] == 101            # ceil(805/8)

    def test_decode_shape_and_bounded(self):
        m = _tiny()
        z = np.random.RandomState(1).randn(1, 8, 50).astype(np.float32)
        wav = np.asarray(m.decode(jnp.asarray(z)))
        assert wav.shape == (1, 50 * 8, 1)
        assert np.abs(wav).max() <= 1.0

    def test_chunked_decode_same_length_approx(self):
        """Chunked decode is the reference's memory optimization: exact
        far from seams, approximate near them (the snake res stack's
        non-causal receptive field exceeds the 4-frame overlap)."""
        m = _tiny()
        z = np.random.RandomState(2).randn(1, 8, 64).astype(np.float32)
        full = np.asarray(m.decode(jnp.asarray(z)))
        chunked = np.asarray(m.decode(jnp.asarray(z), chunk_size=32))
        assert chunked.shape == full.shape
        assert np.isfinite(chunked).all()
        hop = m.hop_length
        # frames far inside the first chunk are exact
        np.testing.assert_allclose(chunked[:, : 12 * hop],
                                   full[:, : 12 * hop], atol=1e-4)


class TestSanitize:
    def test_weight_norm_fold_and_wm_drop(self):
        m = Model(ModelConfig(encoder_dim=8, encoder_rates=[2],
                              latent_dim=16, decoder_dim=16,
                              decoder_rates=[2], codebook_dim=8))
        v = np.random.RandomState(0).randn(16, 7, 8).astype(np.float32)
        g = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
        out = m.sanitize({
            "encoder.conv_in.weight_v": v,
            "encoder.conv_in.weight_g": g,
            "encoder.conv_in.bias": np.zeros(16, np.float32),
            "decoder.blocks.0.block_1.weight_v":
                np.random.randn(8, 4, 16).astype(np.float32),
            "decoder.blocks.0.block_1.weight_g":
                np.ones((1, 1, 16), np.float32),
            "decoder.wm_model.msg_processor.weight": np.ones((4, 4)),
            "decoder.blocks.0.block_3.weight": np.ones((2, 2, 2)),
            "encoder.blocks.0.res1.act1.alpha": np.ones((1, 4, 1)),
        })
        # g == ||v|| -> folded weight == v (then layout-transposed)
        np.testing.assert_allclose(
            np.asarray(out["encoder.conv_in.weight"]),
            v.transpose(1, 2, 0), atol=1e-5)
        assert out["decoder.blocks.0.block_1.weight"].shape == (4, 16, 8)
        assert not any("wm_model" in k or "block_3" in k for k in out)
        assert "encoder.blocks.0.res1.act1_alpha" in out

    def test_converted_passthrough(self):
        m = _tiny()
        from mlx_audio_tpu.utils import flatten
        flat = flatten(m.params)
        again = m.sanitize(flat)
        assert set(again) == set(flat)
