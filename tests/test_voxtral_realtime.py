"""Voxtral Realtime: token math, mel, lockstep decode, tekken decode."""

import base64
import json

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.stt.models.voxtral_realtime import (Model, ModelConfig,
                                                       TekkenTokenizer)
from mlx_audio_tpu.stt.models.voxtral_realtime.voxtral_realtime import (
    _num_audio_tokens, _num_delay_tokens, _pad_audio_streaming,
    ada_scales, compute_time_embedding, voxtral_mel)


def _cfg():
    return ModelConfig.from_dict(dict(
        model_type="voxtral_realtime",
        encoder_args=dict(dim=16, n_layers=1, n_heads=2, head_dim=8,
                          hidden_dim=32, n_kv_heads=2, sliding_window=64,
                          downsample_factor=4,
                          audio_encoding_args=dict(num_mel_bins=16)),
        decoder=dict(dim=16, n_layers=1, n_heads=2, n_kv_heads=2,
                     head_dim=8, hidden_dim=32, vocab_size=64,
                     ada_rms_norm_t_cond_dim=4),
        transcription_delay_ms=160, n_left_pad_tokens=2))


def _tiny():
    return Model(_cfg()).init_and_bind()


def _tekken(tmp_path):
    vocab = [{"token_bytes": base64.b64encode(c.encode()).decode()}
             for c in "abcdefghij"]
    data = {"vocab": vocab,
            "config": {"default_num_special_tokens": 40},
            "special_tokens": [{"rank": 1}, {"rank": 2}, {"rank": 32}]}
    p = tmp_path / "tekken.json"
    p.write_text(json.dumps(data))
    return TekkenTokenizer(str(p))


class TestTokenMath:
    def test_num_audio_tokens(self):
        assert _num_audio_tokens(1280) == 1
        assert _num_audio_tokens(16000) == 13       # 100 frames / 8
        assert _num_delay_tokens(480) == 6

    def test_pad_alignment(self):
        out = _pad_audio_streaming(np.zeros(1000, np.float32), 2, 3)
        assert len(out) % 1280 == 0
        assert len(out) == 2 * 1280 + 1280 + 3 * 1280   # left+align+right


class TestMel:
    def test_shape_and_clamp(self):
        aec = _cfg().audio_encoding_args
        mel = np.asarray(voxtral_mel(jnp.zeros(16000), aec))
        assert mel.shape == (100, 16)
        # silence clamps to (global_max - 8 + 4) / 4
        np.testing.assert_allclose(mel, (1.5 - 8.0 + 4.0) / 4.0,
                                   atol=1e-6)


class TestTekken:
    def test_decode_skips_specials(self, tmp_path):
        tok = _tekken(tmp_path)
        assert tok.decode([1, 40, 41, 2, 42]) == "abc"

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            TekkenTokenizer.from_model_path(tmp_path)


class TestEncoder:
    def test_token_count_and_bucket_exactness(self):
        m = _tiny()
        rs = np.random.RandomState(0)
        audio = _pad_audio_streaming(
            rs.randn(16000).astype(np.float32), 2, 3)
        a1, n1 = m.encode(audio)
        assert n1 == len(audio) // 1280
        assert a1.shape == (1, n1, 16)
        # longer padding -> bigger bucket; prefix tokens must agree
        longer = np.concatenate([audio,
                                 np.zeros(1280 * 80, np.float32)])
        a2, n2 = m.encode(longer)
        np.testing.assert_allclose(a2[:, :n1], a1, rtol=2e-4, atol=2e-5)


class TestAdaScales:
    def test_delay_changes_scales(self):
        m = _tiny()
        d = m.config.decoder
        t1 = jnp.asarray(compute_time_embedding(2.0, d.dim))
        t2 = jnp.asarray(compute_time_embedding(6.0, d.dim))
        s1 = np.asarray(ada_scales(m.params["decoder"], d, t1))
        s2 = np.asarray(ada_scales(m.params["decoder"], d, t2))
        assert s1.shape == (1, 16)
        assert not np.allclose(s1, s2)


class TestGenerate:
    def test_lockstep_token_budget(self, tmp_path):
        m = _tiny()
        m._tokenizer = _tekken(tmp_path)
        rs = np.random.RandomState(1)
        audio = rs.randn(16000).astype(np.float32)   # 1 s
        out = m.generate(audio, max_tokens=512)
        # lockstep: tokens <= n_audio - prompt_len + 1
        n_delay = _num_delay_tokens(160)
        padded_len = len(_pad_audio_streaming(audio, 2, n_delay + 1 + 10))
        n_audio = padded_len // 1280
        assert out.generation_tokens <= n_audio - (1 + 2 + n_delay) + 1
        assert isinstance(out.text, str)

    def test_stream_deltas(self, tmp_path):
        m = _tiny()
        m._tokenizer = _tekken(tmp_path)
        rs = np.random.RandomState(2)
        deltas = list(m.generate(rs.randn(16000).astype(np.float32),
                                 stream=True, max_tokens=64))
        assert all(isinstance(d, str) for d in deltas)

    def test_no_tokenizer_errors(self):
        m = _tiny()
        with pytest.raises(RuntimeError, match="tekken"):
            m.generate(np.zeros(8000, np.float32))


class TestSanitize:
    def test_conv_layouts(self):
        m = Model(_cfg())
        out = m.sanitize({
            "encoder.conv_layers_0_conv.conv.weight":
                jnp.ones((16, 3, 16)),      # MLX (O, K, I)
            "encoder.conv_layers_1_conv.conv.weight":
                jnp.ones((16, 16, 3)),      # torch (O, I, K)
        })
        assert out["encoder.conv_layers_0_conv.conv.weight"].shape \
            == (3, 16, 16)
        assert out["encoder.conv_layers_1_conv.conv.weight"].shape \
            == (3, 16, 16)

    def test_converted_passthrough(self):
        m = _tiny()
        from mlx_audio_tpu.utils import flatten
        flat = flatten(m.params)
        again = m.sanitize(flat)
        assert set(again) == set(flat)
        for k in flat:
            assert again[k].shape == flat[k].shape, k
