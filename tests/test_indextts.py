"""IndexTTS (tiny config): normalize, conformer/perceiver, AR decode."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.indextts import Model, ModelConfig
from mlx_audio_tpu.tts.models.indextts import normalize
from mlx_audio_tpu.tts.models.indextts.bigvgan_cond import (
    BigVGANConditioningConfig,
)
from mlx_audio_tpu.tts.models.indextts.conformer import (
    ConformerArgs,
    conformer_forward,
    perceiver_forward,
)
from mlx_audio_tpu.tts.models.indextts.indextts import (
    GPTConfig,
    log_mel_spectrogram,
)


class FakeSPM:
    def encode(self, text):
        return [2 + (ord(c) % 50) for c in text][:20]


def _cfg():
    cm = ConformerArgs(input_size=20, output_size=16, num_blocks=1,
                       linear_units=32, attention_heads=2,
                       input_layer="conv2d2", cnn_module_kernel=3,
                       perceiver_mult=2)
    gpt = GPTConfig(model_dim=32, heads=4, layers=2, max_mel_tokens=128,
                    max_text_tokens=40, number_text_tokens=100,
                    number_mel_codes=64, start_mel_token=62,
                    stop_mel_token=63, condition_module=cm,
                    condition_num_latent=4)
    voc = BigVGANConditioningConfig(
        num_mels=20, upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
        upsample_initial_channel=16, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], gpt_dim=32,
        speaker_embedding_dim=8)
    return ModelConfig(gpt=gpt, bigvgan=voc)


@pytest.fixture(scope="module")
def model():
    m = Model(_cfg()).init_and_bind()
    m.tokenizer = FakeSPM()
    return m


class TestNormalize:
    def test_cjk_spacing(self):
        out = normalize.tokenize_by_CJK_char("你好 hello 中文")
        assert out == "你 好 HELLO 中 文"

    def test_english_numbers(self):
        assert normalize.normalize("42 cats") == "forty two cats"

    def test_currency(self):
        out = normalize.normalize("costs $2 only")
        assert "two dollars" in out

    def test_chinese_route(self):
        assert normalize.use_chinese("你好")
        assert not normalize.use_chinese("plain text")
        assert normalize.normalize("你好：世界") == "你好,世界"

    def test_pinyin_correction(self):
        assert normalize.correct_pinyin("qu4") == "QV4"
        assert normalize.correct_pinyin("ma1") == "ma1"


class TestConditioning:
    def test_conformer_shapes(self, model):
        cm = model.config.gpt.condition_module
        mel = jnp.zeros((1, 21, 20))
        out = conformer_forward(model.params["conditioning_encoder"], cm,
                                mel)
        # conv2d2: one (3, 2) conv -> T' = (21 - 3 + 2) // 2 = 10
        assert out.shape == (1, 10, 16)

    def test_perceiver_latents(self, model):
        cm = model.config.gpt.condition_module
        ctx = jnp.zeros((1, 9, 16))
        out = perceiver_forward(model.params["perceiver_encoder"], ctx,
                                cm.attention_heads)
        assert out.shape == (1, 4, 32)

    def test_get_conditioning(self, model):
        mel = jnp.zeros((1, 25, 20))
        cond = model.get_conditioning(mel)
        assert cond.shape == (1, 4, 32)
        assert np.isfinite(np.asarray(cond)).all()

    def test_mel_is_magnitude_scale(self):
        audio = np.random.RandomState(0).randn(2400).astype(np.float32)
        mel = log_mel_spectrogram(audio, sample_rate=24000, n_mels=20,
                                  n_fft=256, hop_length=64)
        assert mel.ndim == 3 and mel.shape[2] == 20
        assert float(mel.min()) >= np.log(1e-5) - 1e-5


class TestGenerate:
    def test_prompt_embedding_layout(self, model):
        cond = jnp.zeros((1, 4, 32))
        emb = model.prepare_input_embedding("hi", cond)
        # 4 cond + [start_text] h i [stop_text, start_mel]
        assert emb.shape == (1, 4 + 2 + 3, 32)

    def test_generate_produces_audio(self, model):
        ref = np.random.RandomState(0).randn(2000).astype(np.float32) * 0.1
        res = list(model.generate("hello", ref_audio=ref, max_tokens=8,
                                  temperature=0.8, top_k=5, seed=0))
        assert len(res) == 1
        r = res[0]
        assert r.sample_rate == 24000
        assert r.samples == r.token_count * 4  # hop = 2*2
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_greedy_deterministic(self, model):
        ref = np.random.RandomState(1).randn(2000).astype(np.float32) * 0.1
        a = list(model.generate("abc", ref_audio=ref, max_tokens=8,
                                temperature=0.0))[0]
        b = list(model.generate("abc", ref_audio=ref, max_tokens=8,
                                temperature=0.0))[0]
        np.testing.assert_allclose(np.asarray(a.audio),
                                   np.asarray(b.audio), atol=1e-5)

    def test_requires_ref(self, model):
        with pytest.raises(ValueError):
            list(model.generate("hello"))

    def test_requires_tokenizer(self):
        m = Model(_cfg()).init_and_bind()
        ref_mel = jnp.zeros((1, 25, 20))
        with pytest.raises(ValueError):
            list(m.generate("hello", ref_mel=ref_mel))

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["indextts"] == "indextts"


class TestSanitize:
    def test_gpt_conv1d_transpose_and_perceiver_split(self, model):
        w = {
            "gpt.h.0.attn.c_attn.weight": np.zeros((32, 96)),
            "gpt.h.0.attn.bias": np.zeros((1, 1, 8, 8)),
            "gpt.h.0.mlp.c_fc.weight": np.zeros((32, 128)),
            "perceiver_encoder.layers.0.0.to_kv.weight": np.zeros((32, 16)),
            "perceiver_encoder.norm.gamma": np.ones(32),
        }
        out = model.sanitize(w)
        assert out["gpt.h.0.attn.c_attn.weight"].shape == (96, 32)
        assert "gpt.h.0.attn.bias" not in out
        assert out["gpt.h.0.mlp.fc_in.weight"].shape == (128, 32)
        assert out[
            "perceiver_encoder.layers.0.0.linear_k.weight"].shape == (16, 16)
        assert "perceiver_encoder.norm.weight" in out
