"""Soprano: text cleanup, hidden-state vocoder, compiled decode."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.soprano import (DecoderConfig, Model,
                                              ModelConfig, clean_text)
from mlx_audio_tpu.tts.models.soprano.soprano import decode_hidden


def _tiny():
    cfg = ModelConfig(
        hidden_size=16, num_hidden_layers=1, intermediate_size=32,
        num_attention_heads=2, num_key_value_heads=2, head_dim=8,
        vocab_size=64, sample_rate=16000,
        decoder_config=DecoderConfig(decoder_num_layers=1,
                                     decoder_dim=16,
                                     decoder_intermediate_dim=32,
                                     hop_length=64, n_fft=256,
                                     upscale=4, input_kernel=1,
                                     dw_kernel=3))
    return Model(cfg).init_and_bind()


class _FakeTok:
    pad_token_id = 2
    eos_token_id = 3

    def encode(self, text, add_special_tokens=False):
        return [min(ord(c), 63) for c in text][:40]


class TestText:
    def test_clean_text_pipeline(self):
        out = clean_text("Dr. Smith paid $5.50 on the 3rd!!")
        assert "doctor" in out
        assert "five dollars" in out and "fifty cents" in out
        assert "third" in out
        assert out == out.lower()
        assert "!!" not in out

    def test_number_expansion(self):
        assert "twenty one" in clean_text("21 items")

    def test_preprocess_prompts(self):
        prompts = Model.preprocess_text(
            "This is a long enough first sentence, truly. Hi. Bye.")
        assert all(p.startswith("[STOP][TEXT]") and p.endswith("[START]")
                   for p in prompts)
        # short sentences merged into the previous one
        assert len(prompts) == 1


class TestVocoder:
    def test_decode_hidden_shapes(self):
        m = _tiny()
        hidden = jnp.asarray(np.random.RandomState(0)
                             .randn(1, 10, 16).astype(np.float32) * 0.1)
        audio = np.asarray(decode_hidden(m.params, m.config, hidden,
                                         jnp.asarray([10])))
        # upscale*(L-1)+1 = 37 frames -> istft samples
        assert audio.shape[0] == 1
        assert audio.shape[1] > 30 * m.config.decoder_config.hop_length
        assert np.isfinite(audio).all()

    def test_upscale_increases_length(self):
        m = _tiny()
        h5 = decode_hidden(m.params, m.config,
                           jnp.zeros((1, 5, 16)), jnp.asarray([5]))
        h10 = decode_hidden(m.params, m.config,
                            jnp.zeros((1, 10, 16)), jnp.asarray([10]))
        assert h10.shape[1] > h5.shape[1] * 1.8


class TestGenerate:
    def test_generate_end_to_end(self):
        m = _tiny()
        m._tokenizer = _FakeTok()
        m._stop_token_id = 2
        results = list(m.generate(
            "This is a long enough sentence to synthesize nicely.",
            max_tokens=16, temperature=0.0, seed=0))
        assert len(results) == 1
        r = results[0]
        assert r.samples > 0
        assert r.sample_rate == 16000

    def test_no_tokenizer_errors(self):
        m = _tiny()
        with pytest.raises(RuntimeError, match="tokenizer"):
            list(m.generate("hello"))


class TestSanitize:
    def test_prefix_and_conv_layout(self):
        m = _tiny()
        out = m.sanitize({
            "model.embed_tokens.weight": jnp.ones((64, 16)),
            "decoder.decoder.convnext.0.dwconv.weight":
                jnp.ones((16, 1, 3)),
            "decoder.decoder.embed.weight": jnp.ones((16, 16, 1)),
            "language_model.norm.weight": jnp.ones((16,)),
        })
        assert "language_model.embed_tokens.weight" in out
        assert out["decoder.decoder.convnext.0.dwconv.weight"].shape \
            == (3, 1, 16)
        assert "language_model.norm.weight" in out
