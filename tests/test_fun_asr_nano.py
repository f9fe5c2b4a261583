"""Fun-ASR-Nano: encoder/adaptor shapes, prompt building, decode,
sanitize, registry."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.fun_asr_nano import Model, ModelConfig
from mlx_audio_tpu.stt.models.fun_asr_nano.fun_asr_nano import (
    adaptor_forward,
    encoder_forward,
    fake_token_length,
)


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        input_size=24,
        frontend_conf=dict(n_mels=8, lfr_m=3, lfr_n=2),
        audio_encoder_conf=dict(output_size=32, attention_heads=4,
                                linear_units=64, num_blocks=2,
                                tp_blocks=1, kernel_size=5),
        audio_adaptor_conf=dict(downsample_rate=2, ffn_dim=48,
                                llm_dim=32, encoder_dim=32, n_layer=1,
                                attention_heads=4),
        llm_config=dict(vocab_size=200, hidden_size=32,
                        intermediate_size=64, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=8, tie_word_embeddings=True),
        default_max_tokens=8))


class FakeTok:
    def encode(self, text):
        return [ord(c) % 150 + 5 for c in text][:30]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_cfg()).init_and_bind()
    m._tokenizer = FakeTok()
    return m


class TestFrontend:
    def test_fake_token_length(self):
        # matches the reference's double conv-downsample formula
        assert fake_token_length(1) == 1
        assert fake_token_length(100) == 13

    def test_lfr_features(self, model):
        audio = np.random.RandomState(0).randn(3200).astype(np.float32)
        feats, speech_len, fake_len = model._extract_features(audio)
        assert feats.shape[1] == 24          # lfr_m * n_mels
        assert speech_len == feats.shape[0]
        assert fake_len == fake_token_length(speech_len)


class TestEncoderAdaptor:
    def test_shapes_and_masking(self, model):
        import jax.numpy as jnp

        x = np.random.RandomState(1).randn(1, 20, 24).astype(np.float32)
        enc = encoder_forward(model.params, model.config,
                              jnp.asarray(x), jnp.asarray([12]))
        assert enc.shape == (1, 20, 32)
        # masked tail is exactly zero
        assert np.abs(np.asarray(enc)[0, 12:]).max() == 0.0
        out = adaptor_forward(model.params, model.config, enc,
                              jnp.asarray([12]))
        assert out.shape == (1, 10, 32)      # downsample 2

    def test_pad_invariance(self, model):
        """Bucket padding must not change the valid adaptor outputs."""
        import jax.numpy as jnp

        rng = np.random.RandomState(2)
        x = rng.randn(1, 10, 24).astype(np.float32)
        a = np.asarray(adaptor_forward(
            model.params, model.config,
            encoder_forward(model.params, model.config, jnp.asarray(x),
                            jnp.asarray([10])), jnp.asarray([10])))
        xp = np.zeros((1, 20, 24), np.float32)
        xp[:, :10] = x
        b = np.asarray(adaptor_forward(
            model.params, model.config,
            encoder_forward(model.params, model.config, jnp.asarray(xp),
                            jnp.asarray([10])), jnp.asarray([10])))
        np.testing.assert_allclose(b[0, :5], a[0, :5], atol=1e-4)


class TestPrompt:
    def test_prompt_text_variants(self, model):
        t = model._prompt_text(None, None, True)
        assert t == "语音转写："
        t2 = model._prompt_text(["OpenAI"], "中文", False)
        assert "热词列表：[OpenAI]" in t2
        assert "语音转写成中文，不进行文本规整：" in t2

    def test_language_mapping(self, model):
        assert model._map_language("EN") == "英文"
        assert model._map_language("auto") is None
        with pytest.raises(ValueError):
            model._map_language("xx")

    def test_hotwords_context_exclusive(self, model):
        with pytest.raises(ValueError):
            model._resolve_hotwords(["a"], "b")
        assert model._resolve_hotwords(None, " ctx ") == ["ctx"]

    def test_prompt_ids_place_audio(self, model):
        ids, beg = model._build_prompt_ids(4, language=None,
                                           hotwords=None, itn=True)
        assert ids[beg:beg + 4] == [0, 0, 0, 0]


class TestGenerate:
    def test_end_to_end(self, model):
        audio = np.random.RandomState(3).randn(16000).astype(np.float32) \
            * 0.1
        out = model.generate(audio, max_tokens=6)
        assert isinstance(out.text, str)
        assert out.generation_tokens <= 6
        assert out.segments and out.segments[0]["start"] == 0.0

    def test_deterministic(self, model):
        audio = np.random.RandomState(4).randn(8000).astype(np.float32) \
            * 0.1
        a = model.generate(audio, max_tokens=5)
        b = model.generate(audio, max_tokens=5)
        assert a.text == b.text


class TestSanitize:
    def test_fsmn_transpose_and_tied_head_drop(self, model):
        out = model.sanitize({
            "module.audio_encoder.encoders.0.self_attn.fsmn_block.weight":
                np.zeros((32, 1, 5), np.float32),
            "llm.lm_head.weight": np.zeros((200, 32), np.float32)})
        key = "audio_encoder.encoders.0.self_attn.fsmn_block.weight"
        assert out[key].shape == (5, 1, 32)
        assert "llm.lm_head.weight" not in out


class TestRegistry:
    def test_resolves(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="fun_asr_nano",
                                    category="stt",
                                    model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model")
