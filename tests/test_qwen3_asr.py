"""Qwen3-ASR: chunked encoder, window isolation, prompt splice, decode."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.stt.models.qwen3_asr import Model, ModelConfig
from mlx_audio_tpu.stt.models.qwen3_asr.qwen3_asr import (
    feat_out_len, split_audio_into_chunks)


def _cfg():
    return ModelConfig.from_dict(dict(
        model_type="qwen3_asr", audio_token_id=5,
        audio_config=dict(num_mel_bins=16, encoder_layers=1,
                          encoder_attention_heads=2, encoder_ffn_dim=32,
                          d_model=16, downsample_hidden_size=4,
                          output_dim=16),
        text_config=dict(vocab_size=64, hidden_size=16,
                         intermediate_size=32, num_hidden_layers=1,
                         num_attention_heads=2, num_key_value_heads=2,
                         head_dim=8, tie_word_embeddings=True)))


def _tiny():
    return Model(_cfg()).init_and_bind()


class _FakeTok:
    eos_token_id = 3
    unk_token_id = 0

    def encode(self, text, add_special_tokens=False):
        n_audio = text.count("<|audio_pad|>")
        prefix = [11] if "<asr_text>" in text else []
        return [7, 8] + [5] * n_audio + [9, 10] + prefix

    def decode(self, toks, skip_special_tokens=True):
        return " ".join(str(t) for t in toks)

    def convert_tokens_to_ids(self, s):
        return 3 if s == "<|im_end|>" else 4


class TestLengths:
    def test_feat_out_len_matches_conv_math(self):
        def conv_len(n):
            for _ in range(3):
                n = (n + 2 - 3) // 2 + 1      # k=3, s=2, p=1
            return n

        for n in (1, 2, 7, 50, 99, 100):
            assert feat_out_len(n) == conv_len(n), n
        assert feat_out_len(250) == 2 * 13 + conv_len(50)
        assert feat_out_len(300) == 3 * 13

    def test_encode_token_count(self):
        m = _tiny()
        audio = np.random.RandomState(0).randn(32000).astype(np.float32)
        feats, n = m.encode(audio)
        n_frames = 32000 // 160          # mel drops the last frame
        assert n == feat_out_len(n_frames)
        assert feats.shape == (n, 16)
        assert np.isfinite(feats).all()


class TestWindowIsolation:
    def test_first_window_independent_of_later_audio(self):
        """Block attention + per-chunk positions: the first
        n_window_infer frames must not change when audio is extended."""
        m = _tiny()
        rs = np.random.RandomState(1)
        long = rs.randn(160 * 1200 + 80).astype(np.float32)  # 12 s
        short = long[: 160 * 800 + 80]                       # 8 s = 1 win
        f_long, _ = m.encode(long)
        f_short, n_short = m.encode(short)
        assert n_short == 104                                # 8 * 13
        np.testing.assert_allclose(f_long[:104], f_short, rtol=2e-4,
                                   atol=2e-5)


class TestGenerate:
    def test_end_to_end(self):
        m = _tiny()
        m._tokenizer = _FakeTok()
        audio = np.random.RandomState(2).randn(16000).astype(np.float32)
        out = m.generate(audio, max_tokens=8, language="English")
        assert isinstance(out.text, str)
        assert out.prompt_tokens > 0
        assert out.segments and out.segments[0]["end"] == 1.0

    def test_language_extraction(self):
        lang, text = Model.extract_language(
            "language Mandarin<asr_text>ni hao")
        assert lang == "Mandarin" and text == "ni hao"
        lang, text = Model.extract_language("plain text")
        assert lang == "English" and text == "plain text"

    def test_stream_transcribe_yields_final(self):
        m = _tiny()
        m._tokenizer = _FakeTok()
        audio = np.random.RandomState(3).randn(16000).astype(np.float32)
        results = list(m.stream_transcribe(audio, max_tokens=8,
                                           language="English"))
        assert results[-1].is_final
        assert results[-1].prompt_tokens > 0

    def test_no_tokenizer_errors(self):
        m = _tiny()
        with pytest.raises(RuntimeError, match="tokenizer"):
            m.generate(np.zeros(16000, np.float32))


class TestChunking:
    def test_short_audio_single_chunk(self):
        chunks = split_audio_into_chunks(np.zeros(16000, np.float32),
                                         16000)
        assert len(chunks) == 1 and chunks[0][1] == 0.0

    def test_long_audio_splits_with_offsets(self):
        rs = np.random.RandomState(4)
        wav = rs.randn(16000 * 30).astype(np.float32)
        wav[16000 * 9:16000 * 11] *= 0.001       # quiet seam
        chunks = split_audio_into_chunks(wav, 16000, chunk_duration=10.0)
        assert len(chunks) >= 2
        assert chunks[0][1] == 0.0
        total = sum(len(c) for c, _ in chunks)
        assert total >= len(wav)                 # covers everything
        # cut lands in the quiet region
        assert 9.0 <= len(chunks[0][0]) / 16000 <= 11.5

    def test_min_duration_pad(self):
        chunks = split_audio_into_chunks(np.zeros(100, np.float32), 16000,
                                         min_chunk_duration=1.0)
        assert len(chunks[0][0]) == 16000


class TestSanitize:
    def test_thinker_strip_conv_and_lm_head(self):
        m = _tiny()
        out = m.sanitize({
            "thinker.audio_tower.conv2d1.weight": jnp.ones((4, 1, 3, 3)),
            "thinker.model.layers.0.self_attn.q_proj.weight":
                jnp.ones((16, 16)),
            "lm_head.weight": jnp.ones((64, 16)),
        })
        assert out["audio_tower.conv2d1.weight"].shape == (3, 3, 1, 4)
        assert "model.layers.0.self_attn.q_proj.weight" in out
        assert "lm_head.weight" not in out       # tied embeddings

    def test_converted_passthrough(self):
        m = _tiny()
        from mlx_audio_tpu.utils import flatten
        flat = flatten(m.params)
        again = m.sanitize(flat)
        assert set(again) == set(flat)
        for k in flat:
            assert again[k].shape == flat[k].shape


class TestQwen3OmniAudioTowerParity:
    """encode_features vs transformers Qwen3OmniMoeAudioEncoder.

    Qwen3-ASR's chunked conv2d + windowed-block-attention tower is the
    Qwen3-Omni audio encoder (same conv stem, per-chunk sinusoidal
    positions, n_window_infer varlen attention, ln_post+proj MLP); the HF
    implementation is the torch oracle for the whole mel->features path,
    including the ragged final chunk.
    """

    @pytest.fixture(scope="class")
    def pair(self):
        torch = pytest.importorskip("torch")
        from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe \
            import Qwen3OmniMoeAudioEncoderConfig
        from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe \
            import Qwen3OmniMoeAudioEncoder

        from mlx_audio_tpu.utils import unflatten

        hf_cfg = Qwen3OmniMoeAudioEncoderConfig(
            num_mel_bins=32, d_model=32, encoder_layers=2,
            encoder_attention_heads=4, encoder_ffn_dim=64,
            downsample_hidden_size=16, output_dim=40,
            n_window=50, n_window_infer=200, conv_chunksize=500)
        torch.manual_seed(0)
        hf = Qwen3OmniMoeAudioEncoder(hf_cfg).eval()

        cfg = ModelConfig.from_dict(dict(
            model_type="qwen3_asr",
            audio_config=dict(num_mel_bins=32, encoder_layers=2,
                              encoder_attention_heads=4, encoder_ffn_dim=64,
                              d_model=32, downsample_hidden_size=16,
                              output_dim=40, n_window=50,
                              n_window_infer=200),
            text_config=dict(vocab_size=32, hidden_size=16,
                             intermediate_size=32, num_hidden_layers=1,
                             num_attention_heads=2, num_key_value_heads=2,
                             head_dim=8, tie_word_embeddings=True)))
        model = Model(cfg).init_and_bind()
        flat = model.sanitize({
            f"audio_tower.{k}": v.detach().numpy()
            for k, v in hf.state_dict().items()
            if "positional_embedding" not in k})
        tower = unflatten(flat)["audio_tower"]
        assert set(tower) == set(model.params["audio_tower"]), \
            "state-dict mapping drifted"
        model.params["audio_tower"] = tower
        return hf, model

    @pytest.mark.parametrize("n_frames", [100, 337])
    def test_features_match(self, pair, n_frames):
        torch = pytest.importorskip("torch")
        hf, model = pair
        rs = np.random.RandomState(n_frames)
        mel = rs.randn(32, n_frames).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.from_numpy(mel),
                     feature_lens=torch.tensor([n_frames])
                     ).last_hidden_state.numpy()
        got, n_tokens = model.encode_features(mel)
        assert n_tokens == ref.shape[0]
        np.testing.assert_allclose(np.asarray(got), ref,
                                   atol=5e-4, rtol=5e-3)
