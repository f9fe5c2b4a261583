"""FireRedASR2: encoder shapes/masking, beam search, sanitize, registry."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.fireredasr2 import Model, ModelConfig
from mlx_audio_tpu.stt.models.fireredasr2.fireredasr2 import (
    _rel_pe,
    encoder_forward,
    sub_lengths,
)


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        idim=32, odim=50, d_model=32, sos_id=3, eos_id=4,
        encoder=dict(n_layers=2, n_head=4, d_model=32, kernel_size=9),
        decoder=dict(n_layers=2, n_head=4, d_model=32)))


@pytest.fixture(scope="module")
def model():
    return Model(tiny_cfg()).init_and_bind()


class TestEncoder:
    def test_subsampling_and_shape(self, model):
        import jax.numpy as jnp

        mel = np.random.RandomState(0).randn(1, 100, 32).astype(np.float32)
        out = encoder_forward(model.params, model.config, jnp.asarray(mel))
        # pad 6 -> 106; two valid k3/s2 convs: 52 -> 25
        assert out.shape == (1, sub_lengths(100), 32) == (1, 25, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_rel_pe_center_is_position_zero(self):
        pe = _rel_pe(5, 8)[0]
        assert pe.shape == (9, 8)
        # center row = position 0: sin(0)=0, cos(0)=1
        np.testing.assert_allclose(pe[4, 0::2], 0.0, atol=1e-7)
        np.testing.assert_allclose(pe[4, 1::2], 1.0, atol=1e-7)

    def test_pad_masking_matches_unpadded(self, model):
        """Bucket-padded + masked encoding == unpadded encoding on the
        valid frames (reference runs unpadded)."""
        import jax.numpy as jnp

        rng = np.random.RandomState(1)
        mel = rng.randn(1, 60, 32).astype(np.float32)
        ref = np.asarray(encoder_forward(model.params, model.config,
                                         jnp.asarray(mel)))
        padded = np.zeros((1, 100, 32), np.float32)
        padded[:, :60] = mel
        got = np.asarray(encoder_forward(
            model.params, model.config, jnp.asarray(padded),
            jnp.asarray([60])))
        n = sub_lengths(60)
        np.testing.assert_allclose(got[:, :n], ref[:, :n], atol=1e-4)


class TestBeamSearch:
    def test_generate_deterministic(self, model):
        audio = np.random.RandomState(2).randn(8000).astype(np.float32) * 0.1
        out1 = model.generate(audio, beam_size=2)
        out2 = model.generate(audio, beam_size=2)
        assert out1.text == out2.text
        assert out1.generation_tokens == out2.generation_tokens
        assert 0 <= out1.generation_tokens

    def test_beam_sizes_run(self, model):
        audio = np.random.RandomState(3).randn(8000).astype(np.float32) * 0.1
        for beam in (1, 3):
            out = model.generate(audio, beam_size=beam)
            assert isinstance(out.text, str)

    def test_eos_penalty_and_max_len(self, model):
        audio = np.random.RandomState(4).randn(8000).astype(np.float32) * 0.1
        out = model.generate(audio, beam_size=2, max_len=5,
                             eos_penalty=2.0)
        assert out.generation_tokens <= 5

    def test_confidence_in_unit_interval(self, model):
        audio = np.random.RandomState(5).randn(8000).astype(np.float32) * 0.1
        out = model.generate(audio, beam_size=2)
        conf = out.segments[0]["confidence"]
        assert 0.0 <= conf <= 1.0


class TestSanitize:
    def test_key_renames_and_transposes(self, model):
        out = model.sanitize({
            "encoder.input_preprocessor.conv.0.weight":
                np.zeros((16, 1, 3, 3), np.float32),
            "encoder.layer_stack.0.ffn1.net.1.weight":
                np.zeros((128, 32), np.float32),
            "encoder.layer_stack.0.conv.depthwise_conv.weight":
                np.zeros((64, 1, 9), np.float32),
            "decoder.tgt_word_emb.weight": np.zeros((50, 32), np.float32),
        })
        assert out["encoder.input_preprocessor.conv1.weight"].shape \
            == (3, 3, 1, 16)
        assert "encoder.layer_stack.0.ffn1.net_1.weight" in out
        assert out["encoder.layer_stack.0.conv.depthwise_conv.weight"] \
            .shape == (9, 1, 64)
        # tied projection materialized
        assert out["decoder.tgt_word_prj.weight"].shape == (50, 32)


class TestTokenizer:
    def test_detokenize_spm_space_and_strips(self, model):
        model._tokenizer = ["<blank>", "▁he", "llo", "<sil>", " ",
                            "WORLD"]
        assert model._detokenize([1, 2, 4, 5, 0, 3]) == "hello world"
        model._tokenizer = None


class TestRegistry:
    def test_resolves(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="fireredasr2",
                                    category="stt",
                                    model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model")
