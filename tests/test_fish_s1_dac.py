"""Fish S1 DAC: shape contracts, causal prefix exactness, VQ, sanitize."""

import numpy as np
import jax
import jax.numpy as jnp

from mlx_audio_tpu.codec.models.fish_s1_dac import Model, ModelConfig
from mlx_audio_tpu.codec.models.fish_s1_dac.fish_s1_dac import (
    TransformerArgs, window_transformer)


def _cfg():
    return ModelConfig.from_dict(dict(
        model_type="fish_s1_dac", encoder_dim=4,
        encoder_rates=[2, 4], latent_dim=16, decoder_dim=16,
        decoder_rates=[4, 2], sample_rate=16000, causal=True,
        encoder_transformer_layers=[0, 1],
        n_codebooks=2, codebook_size=16, codebook_dim=4,
        semantic_codebook_size=32, downsample_factor=[2],
        vq_dim=16,
        vq_transformer=dict(n_layer=1, n_head=2, dim=16,
                            intermediate_size=32, head_dim=8),
        vq_window=8, enc_window=8))


def _tiny():
    return Model(_cfg()).init_and_bind()


class TestShapes:
    def test_encode_decode_roundtrip_shapes(self):
        m = _tiny()
        # hop 8, frame_length 16
        assert m.config.hop_length == 8 and m.frame_length == 16
        audio = np.random.RandomState(0).randn(330).astype(np.float32)
        codes = m.encode(audio)
        assert codes.shape == (21, 3)          # ceil(330/16), 1 sem + 2
        assert codes[:, 0].max() < 32 and codes[:, 1:].max() < 16
        out = m.decode(codes)
        assert out.shape == (21 * 16,)
        assert np.abs(out).max() <= 1.0        # tanh

    def test_causal_prefix_exact(self):
        """Causal stack: extending the audio never changes earlier codes
        beyond the window-transformer context."""
        m = _tiny()
        rs = np.random.RandomState(1)
        a1 = rs.randn(320).astype(np.float32)
        c1 = m.encode(a1)
        a2 = np.concatenate([a1, rs.randn(4096).astype(np.float32)])
        c2 = m.encode(a2)
        np.testing.assert_array_equal(c2[:c1.shape[0]], c1)

    def test_decode_prefix_exact(self):
        m = _tiny()
        rs = np.random.RandomState(2)
        codes = rs.randint(0, 16, size=(20, 3)).astype(np.int32)
        full = m.decode(codes)
        # decoding a longer code stream keeps the earlier audio identical
        more = np.concatenate([codes,
                               rs.randint(0, 16, (300, 3)).astype(
                                   np.int32)])
        full2 = m.decode(more)
        np.testing.assert_allclose(full2[:len(full)], full, atol=1e-5)


class TestWindowTransformer:
    def test_window_limits_context(self):
        m = _tiny()
        a = m.config.vq_transformer
        p = m.params["quantizer"]["pre_module"]
        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(1, 24, 16).astype(np.float32))
        # with window W, output at t depends only on [t-W+1, t]
        w = 4
        y_full = np.asarray(window_transformer(p, a, x, w, jnp.int32(24)))
        x2 = np.asarray(x).copy()
        x2[0, 0] += 10.0                       # perturb far past
        y_pert = np.asarray(window_transformer(
            p, a, jnp.asarray(x2), w, jnp.int32(24)))
        np.testing.assert_allclose(y_pert[0, 10:], y_full[0, 10:],
                                   atol=1e-5)
        assert not np.allclose(y_pert[0, 0], y_full[0, 0])


class TestSanitize:
    def test_wn_fold_and_layouts(self):
        m = Model(_cfg())
        rs = np.random.RandomState(4)
        v = rs.randn(4, 1, 7).astype("f")
        g = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
        vt = rs.randn(16, 8, 8).astype("f")    # transposed (I, O, K)
        gt = np.sqrt((vt * vt).sum(axis=(1, 2), keepdims=True))
        out = m.sanitize({
            "encoder.block.0.conv.parametrizations.weight.original0":
                jnp.asarray(g),
            "encoder.block.0.conv.parametrizations.weight.original1":
                jnp.asarray(v),
            "encoder.block.0.conv.bias": jnp.zeros((4,)),
            "decoder.model.1.block.1.parametrizations.weight.original0":
                jnp.asarray(gt),
            "decoder.model.1.block.1.parametrizations.weight.original1":
                jnp.asarray(vt),
            "quantizer.downsample.0.0.conv.weight":
                jnp.ones((16, 16, 2)),
            "quantizer.upsample.0.0.conv.weight":
                jnp.ones((16, 16, 2)),
        })
        # g == ||v|| -> fold == v, then (O,I,K)->(K,I,O)
        np.testing.assert_allclose(
            np.asarray(out["encoder.block.0.weight"]),
            v.transpose(2, 1, 0), atol=1e-5)
        assert out["encoder.block.0.bias"].shape == (4,)
        assert out["decoder.model.1.block.1.weight"].shape == (8, 16, 8)
        assert out["quantizer.downsample.0.0.conv.weight"].shape \
            == (2, 16, 16)
        assert out["quantizer.upsample.0.0.conv.weight"].shape \
            == (2, 16, 16)

    def test_converted_passthrough(self):
        m = _tiny()
        from mlx_audio_tpu.utils import flatten
        flat = flatten(m.params)
        again = m.sanitize(flat)
        assert set(again) == set(flat)
        for k in flat:
            assert again[k].shape == flat[k].shape, k
