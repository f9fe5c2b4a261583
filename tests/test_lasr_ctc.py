"""LASR-CTC: encoder shapes, CTC collapse, registry."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.lasr_ctc import Model, ModelConfig


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        vocab_size=40, pad_token_id=0,
        encoder_config=dict(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4,
                            intermediate_size=64, conv_kernel_size=8,
                            num_mel_bins=32, subsampling_conv_channels=16,
                            subsampling_conv_kernel_size=5,
                            subsampling_conv_stride=2)))


@pytest.fixture(scope="module")
def model():
    return Model(tiny_cfg()).init_and_bind()


class TestForward:
    def test_subsampling_4x(self, model):
        import jax.numpy as jnp
        from mlx_audio_tpu.stt.models.lasr_ctc.lasr import lasr_forward

        mel = np.random.RandomState(0).randn(1, 100, 32).astype(np.float32)
        logits = lasr_forward(model.params, model.config, jnp.asarray(mel))
        assert logits.shape[0] == 1 and logits.shape[2] == 40
        # two stride-2 convs (kernel 5, no pad): (100-5)//2+1=48 -> 22
        assert logits.shape[1] == 22
        assert np.isfinite(np.asarray(logits)).all()


class TestGenerate:
    def test_generate_ctc_collapse(self, model):
        audio = np.random.RandomState(1).randn(16000).astype(np.float32) * 0.1
        out = model.generate(audio)
        assert isinstance(out.text, str)
        # collapsed tokens contain no blanks and no immediate repeats
        toks = out.text.split()
        assert all(t != "0" for t in toks)
        assert all(a != b for a, b in zip(toks, toks[1:]))

    def test_sanitize_ctc_head_conv(self, model):
        out = model.sanitize({
            "ctc_head.weight": np.zeros((40, 32, 1), np.float32),
            "encoder.layers.0.conv.depthwise_conv.weight":
                np.zeros((32, 1, 8), np.float32)})
        assert out["ctc_head.weight"].shape == (40, 32)
        assert out["encoder.layers.0.conv.depthwise_conv.weight"].shape \
            == (8, 1, 32)


class TestRegistry:
    def test_resolves(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="lasr", category="stt",
                                    model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model")
