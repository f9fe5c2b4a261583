"""Codec family tests: SNAC/DAC/Encodec/Mimi/Vocos shape + parity contracts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestSNAC:
    @pytest.fixture(scope="class")
    def snac(self):
        from mlx_audio_tpu.codec.models.snac import SNAC, ModelConfig

        cfg = ModelConfig(
            sampling_rate=24000, encoder_dim=48, encoder_rates=[2, 4, 8, 8],
            decoder_dim=1024, decoder_rates=[8, 8, 4, 2],
            attn_window_size=None, codebook_size=4096, codebook_dim=8,
            vq_strides=[4, 2, 1], noise=True, depthwise=True)
        return SNAC(cfg).init_and_bind()

    def test_reference_shape_contract(self, snac):
        """The reference's published contract (codec/tests/test_snac.py:25):
        120 000 samples -> 3 levels (59, 118, 236). Decode returns the
        torch-exact padded length (120 832 = ceil-to-hop; the MLX reference
        emits 120 907 due to its conv-transpose padding artifacts)."""
        audio = np.zeros((1, 1, 120_000), np.float32)
        codes = snac.encode(audio)
        assert len(codes) == 3
        assert codes[0].shape == (1, 59)
        assert codes[1].shape == (1, 118)
        assert codes[2].shape == (1, 236)
        rec = snac.decode(codes)
        assert rec.shape == (1, 120_832, 1)

    def test_vq_roundtrip_identity(self, snac):
        """Encoding a codebook entry's decoded latent reproduces the code."""
        codes = [jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 8), jnp.int32),
                 jnp.zeros((1, 16), jnp.int32)]
        rec = snac.decode(codes)
        assert np.isfinite(np.asarray(rec)).all()


class TestDAC:
    def test_encode_decode_shapes(self):
        from mlx_audio_tpu.codec.models.descript import DAC, ModelConfig

        cfg = ModelConfig(encoder_dim=16, encoder_rates=[2, 4], latent_dim=32,
                          decoder_dim=64, decoder_rates=[4, 2], n_codebooks=3,
                          codebook_size=64, codebook_dim=4, sample_rate=16000)
        dac = DAC(cfg).init_and_bind()
        audio = np.random.RandomState(0).randn(1, 1, 800).astype(np.float32)
        z_q, codes = dac.encode(audio)
        assert codes.shape == (1, 3, 100)  # 800 / (2*4)
        rec = dac.decode(dac.from_codes(codes))
        assert rec.shape == (1, 800, 1)
        assert np.abs(np.asarray(rec)).max() <= 1.0  # tanh bounded


class TestEncodec:
    @pytest.fixture(scope="class")
    def codec(self):
        from mlx_audio_tpu.codec.models.encodec import Encodec, ModelConfig

        cfg = ModelConfig(num_filters=8, hidden_size=16, codebook_dim=16,
                          codebook_size=32, num_quantizers=4,
                          upsampling_ratios=[4, 2], num_lstm_layers=1)
        return Encodec(cfg).init_and_bind()

    def test_roundtrip_shapes(self, codec):
        audio = np.random.RandomState(1).randn(1, 1, 640).astype(np.float32)
        codes = codec.encode(audio)
        assert codes.shape == (1, 4, 80)  # 640 / 8
        rec = codec.decode(codes)
        assert rec.shape[1] >= 640

    def test_n_quantizers_subset(self, codec):
        audio = np.random.RandomState(2).randn(1, 1, 320).astype(np.float32)
        codes = codec.encode(audio, n_quantizers=2)
        assert codes.shape[1] == 2

    def test_sanitize_lstm_and_codebook(self, codec):
        w = {
            "encoder.layers.13.lstm.weight_ih_l0": jnp.zeros((64, 16)),
            "quantizer.layers.0.codebook.embed_sum": jnp.ones((32, 16)) * 6,
            "quantizer.layers.0.codebook.cluster_size": jnp.full((32,), 3.0),
        }
        out = codec.sanitize(w)
        assert "encoder.layers.13.lstm.0.weight_ih" in out
        np.testing.assert_allclose(
            np.asarray(out["quantizer.layers.0.codebook.embed.weight"]),
            np.full((32, 16), 2.0))


class TestMimi:
    @pytest.fixture(scope="class")
    def mimi(self):
        from mlx_audio_tpu.codec.models.mimi import Mimi, MimiConfig

        cfg = MimiConfig(
            seanet=dict(dimension=32, channels=1, causal=True, nfilters=4,
                        nresidual_layers=1, ratios=[4, 3], ksize=7,
                        residual_ksize=3, last_ksize=3, dilation_base=2,
                        pad_mode="constant", true_skip=True, compress=2),
            transformer=dict(d_model=32, num_heads=4, num_layers=2,
                             layer_scale=0.01, context=16,
                             dim_feedforward=64),
            quantizer_nq=4, quantizer_bins=64, quantizer_dim=16,
            sample_rate=24000, frame_rate=1000.0)
        return Mimi(cfg).init_and_bind()

    def test_encode_decode_shapes(self, mimi):
        audio = np.random.RandomState(0).randn(
            1, 1, mimi.samples_per_frame * 10).astype(np.float32) * 0.1
        codes = mimi.encode(audio)
        assert codes.shape == (1, 4, 10)
        rec = mimi.decode(codes)
        assert rec.shape == (1, 1, mimi.samples_per_frame * 10)

    def test_streaming_decode_matches_full(self, mimi):
        """decode_step chunks == one-shot decode (the Moshi streaming
        contract, reference mimi.py:146-175)."""
        codes = jnp.asarray(
            np.random.RandomState(3).randint(0, 64, (1, 4, 12)))
        full = np.asarray(mimi.decode(codes))
        state = mimi.init_decode_stream_state(1, max_frames=64)
        outs = []
        for a, b in [(0, 1), (1, 4), (4, 12)]:
            state, chunk = mimi.decode_step(state, codes[:, :, a:b])
            outs.append(np.asarray(chunk))
        streamed = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(streamed, full, atol=1e-5)


class TestVocos:
    def test_mel_to_audio(self):
        from mlx_audio_tpu.codec.models.vocos import ModelConfig, Vocos

        cfg = ModelConfig(n_fft=256, hop_length=64, n_mels=20,
                          input_channels=20, dim=32, intermediate_dim=64,
                          num_layers=2)
        v = Vocos(cfg).init_and_bind()
        audio = np.random.RandomState(0).randn(4096).astype(np.float32) * 0.1
        feats = v.features(audio)
        assert feats.shape[-1] == 20
        out = v.decode(feats[None])
        assert out.ndim == 2 and out.shape[-1] > 3800
        assert np.isfinite(np.asarray(out)).all()
