"""MOSS audio tokenizer: RVQ-LFQ, patching, interleave, streaming parity."""

import numpy as np
import jax
import jax.numpy as jnp

from mlx_audio_tpu.codec.models.moss_audio_tokenizer import (Model,
                                                             ModelConfig)
from mlx_audio_tpu.codec.models.moss_audio_tokenizer \
    .moss_audio_tokenizer import (patch_decode, patch_encode, rvq_decode,
                                  rvq_encode)


def _cfg(channels=2):
    # sampling_rate 1600, patch 4 then 5 -> downsample_rate (per channel)
    # = 4*5*(2 if interleave) / channels -> use 40 with interleave stereo
    return ModelConfig.from_dict(dict(
        model_type="moss_audio_tokenizer",
        sample_rate=1600, sampling_rate=1600,
        downsample_rate=40 if channels == 2 else 20,
        causal_transformer_context_duration=0.1,
        number_channels=channels, enable_channel_interleave=True,
        encoder_kwargs=[
            dict(module_type="PatchedPretransform", patch_size=4),
            dict(module_type="Transformer", input_dimension=4,
                 output_dimension=8, d_model=16, num_heads=2,
                 num_layers=1, dim_feedforward=32, causal=True,
                 positional_embedding="rope", max_period=10000.0,
                 layer_scale=0.01),
            dict(module_type="PatchedPretransform", patch_size=5),
            dict(module_type="Transformer", input_dimension=40,
                 output_dimension=24, d_model=16, num_heads=2,
                 num_layers=1, dim_feedforward=32, causal=True,
                 positional_embedding="sin_rope", max_period=10000.0),
        ],
        decoder_kwargs=[
            dict(module_type="Transformer", input_dimension=24,
                 output_dimension=40, d_model=16, num_heads=2,
                 num_layers=1, dim_feedforward=32, causal=True,
                 positional_embedding="rope", max_period=10000.0),
            dict(module_type="PatchedPretransform", patch_size=5),
            dict(module_type="Transformer", input_dimension=8,
                 output_dimension=4, d_model=16, num_heads=2,
                 num_layers=1, dim_feedforward=32, causal=True,
                 positional_embedding="rope", max_period=10000.0),
            dict(module_type="PatchedPretransform", patch_size=4),
        ],
        quantizer_kwargs=dict(input_dim=24, rvq_dim=16, output_dim=24,
                              num_quantizers=3, codebook_size=16,
                              codebook_dim=4)))


def _tiny(channels=2):
    return Model(_cfg(channels)).init_and_bind()


class TestPatching:
    def test_roundtrip(self):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(1, 12, 6).astype(np.float32))
        y = patch_encode(x, 4)
        assert y.shape == (1, 3, 24)
        np.testing.assert_allclose(np.asarray(patch_decode(y, 4)),
                                   np.asarray(x))


class TestRVQ:
    def test_codes_and_decode_shapes(self):
        m = _tiny()
        rs = np.random.RandomState(1)
        z = jnp.asarray(rs.randn(1, 10, 24).astype(np.float32))
        codes = rvq_encode(m.params["quantizer"], z, jnp.int32(10), 3)
        assert codes.shape == (3, 1, 10)
        assert int(np.asarray(codes).max()) < 16
        out = rvq_decode(m.params["quantizer"], codes)
        assert out.shape == (1, 10, 24)

    def test_residual_order_invariance(self):
        """Earlier stages are independent of how many later stages run
        (residual quantization is strictly sequential)."""
        m = _tiny()
        rs = np.random.RandomState(2)
        z = jnp.asarray(rs.randn(1, 20, 24).astype(np.float32))
        c1 = np.asarray(rvq_encode(m.params["quantizer"], z,
                                   jnp.int32(20), 1))
        c3 = np.asarray(rvq_encode(m.params["quantizer"], z,
                                   jnp.int32(20), 3))
        np.testing.assert_array_equal(c3[:1], c1)
        # stages generally pick different codes
        assert not np.array_equal(c3[0], c3[1])


class TestEndToEnd:
    def test_encode_decode_stereo(self):
        m = _tiny(2)
        rs = np.random.RandomState(3)
        audio = rs.randn(800, 2).astype(np.float32) * 0.3
        codes = m.encode(audio)
        assert codes.shape[1] == 3
        assert codes.shape[0] == 800 * 2 // 20      # interleave / patches
        out = m.decode(codes)
        assert out.shape == (codes.shape[0] * 10, 2)
        assert np.isfinite(out).all()

    def test_bucket_exactness(self):
        """Longer (bucketed) input yields identical prefix codes (causal
        transformers + validity masks)."""
        m = _tiny(2)
        rs = np.random.RandomState(4)
        a1 = rs.randn(800, 2).astype(np.float32)
        c1 = m.encode(a1)
        a2 = np.concatenate([a1, rs.randn(24000, 2).astype(np.float32)])
        c2 = m.encode(a2)
        np.testing.assert_array_equal(c2[:c1.shape[0]], c1)

    def test_mono_model(self):
        m = _tiny(1)
        audio = np.random.RandomState(5).randn(400).astype(np.float32)
        codes = m.encode(audio)
        out = m.decode(codes)
        assert out.shape[1] == 1


class TestStreaming:
    def test_streamed_equals_offline(self):
        m = _tiny(2)
        rs = np.random.RandomState(6)
        audio = rs.randn(1600, 2).astype(np.float32) * 0.3
        codes = m.encode(audio)
        full = m.decode(codes)
        dec = m.make_streaming_decoder()
        parts = [dec.decode_frames(codes[i:i + 7])
                 for i in range(0, codes.shape[0], 7)]
        streamed = np.concatenate(parts, axis=0)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, atol=2e-5)


class TestSanitize:
    def test_renames_and_wn_fold(self):
        m = Model(_cfg())
        v = np.random.RandomState(7).randn(16, 24, 1).astype("f")
        g = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
        out = m.sanitize({
            "encoder.1.transformer.layers.0.linear1.weight":
                jnp.ones((32, 16)),
            "encoder.1.transformer.layers.0.self_attn.in_projs.0.weight":
                jnp.ones((48, 16)),
            "quantizer.input_proj.parametrizations.weight.original0":
                jnp.asarray(g),
            "quantizer.input_proj.parametrizations.weight.original1":
                jnp.asarray(v),
            "quantizer.input_proj.bias": jnp.zeros((16,)),
        })
        assert "encoder.1.transformer.layers.0.ffn.0.weight" in out
        assert "encoder.1.transformer.layers.0.self_attn.in_proj.weight" \
            in out
        # g == ||v|| -> folded == v squeezed
        np.testing.assert_allclose(
            np.asarray(out["quantizer.input_proj.weight"]), v[..., 0],
            atol=1e-5)

    def test_converted_passthrough(self):
        m = _tiny()
        from mlx_audio_tpu.utils import flatten
        flat = flatten(m.params)
        again = m.sanitize(flat)
        assert set(again) == set(flat)
