"""MOSS STT families: moss_transcribe_diarize + moss_music (tiny configs)."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.moss_music import (
    Model as MusicModel,
    ModelConfig as MusicConfig,
    conv3_downsample_len,
)
from mlx_audio_tpu.stt.models.moss_transcribe_diarize import (
    Model as DiarizeModel,
    ModelConfig as DiarizeConfig,
)


class CharTok:
    eos_token_id = 5

    def encode(self, s, **kwargs):
        return [10 + (ord(c) % 80) for c in s]

    def decode(self, ids, **kwargs):
        return "".join(chr(97 + i % 26) for i in ids)


@pytest.fixture(scope="module")
def diarize():
    cfg = DiarizeConfig(
        text_config=dict(vocab_size=1000, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=8),
        audio_config=dict(num_mel_bins=80, d_model=32, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          max_source_positions=1500),
        audio_token_id=999, audio_merge_size=4)
    m = DiarizeModel(cfg).init_and_bind()
    m._tokenizer = CharTok()
    m._digit_token_ids = {d: 20 + int(d) for d in "0123456789"}
    return m


class TestDiarize:
    def test_encode_token_count(self, diarize):
        # 2 s at 16 kHz -> 200 encoder frames -> /4 merge = 25 tokens
        wav = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
        feats, n, dur = diarize.encode_audio(wav)
        assert feats.shape == (25, 32) and n == 25 and dur == 2.0

    def test_time_markers_in_span(self, diarize):
        span = diarize._audio_span_ids(100)  # 8 s at 12.5 tok/s
        digits = [t for t in span if 20 <= t <= 29]
        assert digits == [25]  # marker "5" at 5 s
        assert span.count(999) == 100

    def test_generate(self, diarize):
        wav = np.random.RandomState(1).randn(24000).astype(np.float32) * 0.1
        out = diarize.generate(wav, max_tokens=6)
        assert isinstance(out.text, str) and out.generation_tokens <= 6
        assert out.segments

    def test_stream_respects_max_tokens(self, diarize):
        wav = np.random.RandomState(2).randn(16000).astype(np.float32) * 0.1
        res = list(diarize.generate(wav, max_tokens=4, stream=True))
        assert res[-1].is_final
        assert len(res) <= 5

    def test_segment_parsing(self, diarize):
        segs = diarize._parse_segments(
            "[0.0][S01] hello [2.5][2.5][S02] hi [4.0]", 4.0)
        assert [s["speaker_id"] for s in segs] == ["S01", "S02"]
        assert segs[0]["start"] == 0.0 and segs[1]["end"] == 4.0

    def test_mismatched_audio_raises(self, diarize):
        with pytest.raises(ValueError):
            diarize._decode([999, 999], np.zeros((1, 32), np.float32),
                            4, 0.0, 0)


@pytest.fixture(scope="module")
def music():
    cfg = MusicConfig.from_dict(dict(
        audio_config=dict(d_model=32, output_dim=32, num_mel_bins=128,
                          encoder_layers=4, encoder_attention_heads=4,
                          encoder_ffn_dim=64, downsample_hidden_size=8,
                          n_window=50,
                          deepstack_encoder_layer_indexes=[1, 2, 3]),
        language_config=dict(vocab_size=1000, hidden_size=32,
                             intermediate_size=64, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=8, tie_word_embeddings=False),
        adapter_hidden_size=48, deepstack_num_inject_layers=2,
        audio_token_id=999, audio_start_id=998, audio_end_id=997,
        eos_token_id=5))
    m = MusicModel(cfg).init_and_bind()
    m._tokenizer = CharTok()
    m._digit_token_ids = {d: 20 + int(d) for d in "0123456789"}
    return m


class TestMusic:
    def test_downsample_len(self):
        assert conv3_downsample_len(400) == 50
        assert conv3_downsample_len(1) == 1

    def test_encode_deepstack(self, music):
        wav = np.random.RandomState(0).randn(48000).astype(np.float32) * 0.1
        feats, ds, n_tok, dur = music.encode_audio(wav)
        assert feats.shape[0] == n_tok
        assert len(ds) == 2                       # capped by inject layers
        assert all(d.shape == feats.shape for d in ds)

    def test_generate_with_audio(self, music):
        wav = np.random.RandomState(1).randn(32000).astype(np.float32) * 0.1
        out = music.generate(wav, max_tokens=6)
        assert out.generation_tokens <= 6 and out.segments

    def test_generate_text_only(self, music):
        out = music.generate(None, prompt="describe", max_tokens=4)
        assert out.generation_tokens <= 4

    def test_structured_segments(self):
        segs = MusicModel.parse_structured_segments(
            "[0:05 - 0:12] guitar intro\n[0:12] drums enter",
            audio_duration=20.0)
        assert segs[0]["start"] == 5.0 and segs[0]["end"] == 12.0
        assert segs[1]["start"] == 12.0 and segs[1]["end"] == 20.0

    def test_strip_thinking(self):
        assert MusicModel._strip_thinking(
            "<think>reasoning</think>final") == "final"

    def test_registry(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["moss_music"] == "moss_music"
        assert (MODEL_REMAPPING["moss_transcribe_diarize"]
                == "moss_transcribe_diarize")
