"""Smart Turn end-of-turn detector (tiny config)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.vad.models.smart_turn import (EncoderConfig, Model,
                                                 ModelConfig,
                                                 ProcessorConfig)


def _tiny():
    cfg = ModelConfig(
        encoder_config=EncoderConfig(
            num_mel_bins=20, max_source_positions=50, d_model=16,
            encoder_attention_heads=2, encoder_layers=2,
            encoder_ffn_dim=32),
        processor_config=ProcessorConfig(max_audio_seconds=1, n_mels=20))
    return Model(cfg).init_and_bind()


class TestForward:
    def test_probability_shape_and_range(self):
        m = _tiny()
        mel = jnp.asarray(
            np.random.RandomState(0).randn(2, 100, 20).astype(np.float32))
        p = np.asarray(m(mel))
        assert p.shape == (2, 1)
        assert (0 <= p).all() and (p <= 1).all()

    def test_accepts_hf_layout(self):
        m = _tiny()
        rng = np.random.RandomState(1)
        mel = rng.randn(100, 20).astype(np.float32)
        a = np.asarray(m(jnp.asarray(mel)))
        b = np.asarray(m(jnp.asarray(mel.T)))  # (n_mels, frames)
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestPredictEndpoint:
    def test_end_to_end_from_audio(self):
        m = _tiny()
        sr = m.config.processor_config.sampling_rate
        audio = np.random.RandomState(2).randn(sr // 2).astype(np.float32)
        out = m.predict_endpoint(audio)
        assert out.prediction in (0, 1)
        assert 0.0 <= out.probability <= 1.0
        # threshold override flips the decision deterministically
        assert m.predict_endpoint(audio, threshold=1.0).prediction == 0
        assert m.predict_endpoint(audio, threshold=-1.0).prediction == 1

    def test_fixed_frame_count_regardless_of_length(self):
        m = _tiny()
        pc = m.config.processor_config
        target = pc.max_audio_seconds * pc.sampling_rate // pc.hop_length
        for seconds in (0.2, 1.0, 3.0):
            audio = np.zeros(int(seconds * pc.sampling_rate), np.float32)
            mel = m.prepare_input_features(audio)
            assert mel.shape == (target, pc.n_mels)

    def test_resamples_other_rates(self):
        m = _tiny()
        audio = np.random.RandomState(3).randn(4000).astype(np.float32)
        out = m.predict_endpoint(audio, sample_rate=8000)
        assert 0.0 <= out.probability <= 1.0


class TestSanitize:
    def test_key_remap_and_layouts(self):
        m = _tiny()
        d = m.config.encoder_config.d_model
        w = {
            "inner.encoder.conv1.weight": jnp.ones((d, 20, 3)),
            "pool_attention.0.weight": jnp.ones((d, 256)),  # ONNX (in,out)
            "pool_attention.2.weight": jnp.ones((256, 1)),
            "classifier.1.weight": jnp.ones((256,)),
            "val_helper_const": jnp.ones((4,)),
            "encoder.layers.0.fc1.weight": jnp.ones((d, 32)),  # (in,out)
        }
        out = m.sanitize(w)
        assert "val_helper_const" not in out
        assert out["encoder.conv1.weight"].shape == (3, 20, d)
        assert out["pool_attention_0.weight"].shape == (256, d)
        assert out["pool_attention_2.weight"].shape == (1, 256)
        assert out["classifier_1.weight"].shape == (256,)
        assert out["encoder.layers.0.fc1.weight"].shape == (32, d)

    def test_roundtrip_into_bind(self):
        m = _tiny()
        # init -> flatten -> sanitize (no-op path) -> bind succeeds
        from mlx_audio_tpu.utils import flatten, unflatten
        flat = flatten(m.params)
        m2 = Model(m.config)
        m2.bind(unflatten(m2.sanitize(flat)))
        mel = jnp.zeros((1, 100, 20))
        np.testing.assert_allclose(np.asarray(m(mel)), np.asarray(m2(mel)),
                                   atol=1e-6)


class TestWhisperEncoderTorchParity:
    """smart_turn's acoustic backbone vs transformers WhisperModel.encoder.

    The endpoint classifier rides a Whisper-style encoder (pipecat
    smart-turn-v2 checkpoints export exactly the HF naming); pin the conv
    stem + pre-norm attention stack against the torch oracle.
    """

    def test_encoder_matches_hf(self):
        import pytest as _pytest

        torch = _pytest.importorskip("torch")
        from transformers import WhisperConfig, WhisperModel

        from mlx_audio_tpu.vad.models.smart_turn import (
            EncoderConfig, Model, ModelConfig,
        )
        from mlx_audio_tpu.vad.models.smart_turn.smart_turn import (
            encoder_forward,
        )
        from mlx_audio_tpu.utils import unflatten

        hf_cfg = WhisperConfig(
            d_model=32, encoder_layers=2, encoder_attention_heads=4,
            decoder_layers=1, decoder_attention_heads=4,
            decoder_ffn_dim=64, encoder_ffn_dim=64, num_mel_bins=16,
            max_source_positions=24, max_target_positions=24,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
        torch.manual_seed(0)
        hf = WhisperModel(hf_cfg).get_encoder().eval()

        cfg = ModelConfig(encoder_config=dict(
            d_model=32, encoder_layers=2, encoder_attention_heads=4,
            encoder_ffn_dim=64, num_mel_bins=16, max_source_positions=24))
        model = Model(cfg).init_and_bind()
        flat = model.sanitize({
            f"encoder.{k}": jnp.asarray(v.detach().numpy())
            for k, v in hf.state_dict().items()})
        enc = unflatten({k: v for k, v in flat.items()
                         if k.startswith("encoder.")})["encoder"]
        assert set(enc) == set(model.params["encoder"])
        model.params["encoder"] = enc

        rs = np.random.RandomState(0)
        mel = rs.randn(1, 16, 48).astype(np.float32)  # T = 2*msp
        with torch.no_grad():
            ref = hf(torch.from_numpy(mel)).last_hidden_state.numpy()
        got = np.asarray(encoder_forward(
            model.params["encoder"], model.config.encoder_config,
            jnp.asarray(mel.transpose(0, 2, 1))))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)
