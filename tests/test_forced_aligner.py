"""Qwen3-ForcedAligner: processor logic + tiny-config alignment forward.

Covers reference qwen3_asr/qwen3_forced_aligner.py — language tokenizers,
LIS-based timestamp repair, prompt construction, and the non-AR alignment
forward over the qwen3_asr stack.
"""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.qwen3_forced_aligner import (
    ForceAlignProcessor,
    ForcedAlignResult,
    Model,
    ModelConfig,
)


@pytest.fixture(scope="module")
def proc():
    return ForceAlignProcessor()


class TestProcessor:
    def test_tokenize_space_lang(self, proc):
        assert proc.tokenize_space_lang("Hello, world! it's me") == \
            ["Hello", "world", "it's", "me"]

    def test_tokenize_chinese_mixed(self, proc):
        toks = proc.tokenize_chinese_mixed("你好world再见")
        assert toks == ["你", "好", "world", "再", "见"]

    def test_space_lang_splits_embedded_cjk(self, proc):
        assert proc.tokenize_space_lang("abc你def") == ["abc", "你", "def"]

    def test_encode_timestamp_layout(self, proc):
        words, text = proc.encode_timestamp("hello world", "English")
        assert words == ["hello", "world"]
        assert text.startswith("<|audio_start|><|audio_pad|><|audio_end|>")
        assert text.count("<timestamp>") == 2 * len(words)

    def test_fix_timestamp_monotonic_passthrough(self, proc):
        assert proc.fix_timestamp([0, 80, 160, 240]) == [0, 80, 160, 240]

    def test_fix_timestamp_small_anomaly_nearest(self, proc):
        # one bad value inside an increasing run -> nearest valid neighbor
        out = proc.fix_timestamp([0, 80, 10, 240, 320])
        assert out[0] == 0 and out[-1] == 320
        assert all(out[i] <= out[i + 1] for i in range(len(out) - 1))

    def test_fix_timestamp_large_anomaly_interpolated(self, proc):
        out = proc.fix_timestamp([0, 5, 3, 1, 400])
        assert out[0] == 0 and out[-1] == 400
        assert all(out[i] <= out[i + 1] for i in range(len(out) - 1))

    def test_parse_timestamp_pairs(self, proc):
        parsed = proc.parse_timestamp(["a", "b"], np.asarray([0, 80, 160,
                                                              240]))
        assert parsed == [
            {"text": "a", "start_time": 0, "end_time": 80},
            {"text": "b", "start_time": 160, "end_time": 240}]


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        audio_config=dict(d_model=32, encoder_attention_heads=4,
                          encoder_layers=2, encoder_ffn_dim=64,
                          num_mel_bins=32, output_dim=32,
                          n_window=50, n_window_infer=400,
                          conv_chunksize=500),
        text_config=dict(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=8, intermediate_size=64,
                         vocab_size=400, rope_theta=10000.0),
        audio_token_id=398, timestamp_token_id=397,
        timestamp_segment_time=80.0, classify_num=50))


class FakeTok:
    def encode(self, text, add_special_tokens=False):
        out = []
        i = 0
        specials = {"<|audio_start|>": 396, "<|audio_pad|>": 398,
                    "<|audio_end|>": 395, "<timestamp>": 397}
        while i < len(text):
            for s, tid in specials.items():
                if text.startswith(s, i):
                    out.append(tid)
                    i += len(s)
                    break
            else:
                out.append(ord(text[i]) % 390)
                i += 1
        return out


class TestAlignment:
    def test_generate_returns_word_timestamps(self):
        m = Model(tiny_cfg()).init_and_bind()
        m._tokenizer = FakeTok()
        audio = np.random.RandomState(0).randn(16000).astype(np.float32)
        res = m.generate(audio, text="hello world again",
                         language="English")
        assert isinstance(res, ForcedAlignResult)
        assert [it.text for it in res] == ["hello", "world", "again"]
        for it in res:
            assert 0.0 <= it.start_time <= it.end_time
        assert len(res.segments) == 3

    def test_batch_generate(self):
        m = Model(tiny_cfg()).init_and_bind()
        m._tokenizer = FakeTok()
        a = np.random.RandomState(1).randn(8000).astype(np.float32)
        res = m.generate([a, a], text=["one two", "three"],
                         language="English")
        assert len(res) == 2
        assert len(res[0]) == 2 and len(res[1]) == 1


class TestRegistry:
    def test_resolves(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="qwen3_forced_aligner",
                                    category="stt",
                                    model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model")
