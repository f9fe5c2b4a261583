"""higgs_audio_3 STT + granite_speech_nar (tiny configs)."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.granite_speech_nar import (
    Model as NarModel,
    ModelConfig as NarConfig,
)
from mlx_audio_tpu.stt.models.granite_speech_nar.granite_speech_nar import (
    add_insertion_slots,
    ctc_collapse_decode,
)
from mlx_audio_tpu.stt.models.higgs_audio_3 import (
    Model as HiggsModel,
    ModelConfig as HiggsConfig,
)
from mlx_audio_tpu.stt.models.higgs_audio_3.higgs_audio_3 import (
    split_long,
    vad_chunk_ranges,
)


class TestHiggs3Chunking:
    def test_split_long(self):
        assert split_long(0, 10, 4) == [(0, 4), (4, 8), (8, 10)]

    def test_no_backend_plain_split(self):
        assert vad_chunk_ranges(np.zeros(20), 8) == [(0, 8), (8, 16),
                                                     (16, 20)]

    def test_vad_spans_cover_gaps(self):
        r = vad_chunk_ranges(np.zeros(20), 8,
                             backend=lambda w: [(2, 6), (10, 18)])
        # non-split mode extends the last span to the end of audio
        assert r[0][0] == 0 and r[-1][1] == 20

    def test_split_vads_mode(self):
        r = vad_chunk_ranges(np.zeros(20), 8,
                             backend=lambda w: [(2, 6), (10, 18)],
                             split_vads=True)
        assert r == [(2, 6), (10, 18)]

    def test_backend_failure_falls_back(self):
        def broken(w):
            raise RuntimeError("vad down")

        assert vad_chunk_ranges(np.zeros(10), 4, backend=broken) == \
            [(0, 4), (4, 8), (8, 10)]


@pytest.fixture(scope="module")
def higgs3():
    cfg = HiggsConfig.from_dict(dict(
        audio_encoder_config=dict(num_mel_bins=80, d_model=32,
                                  encoder_layers=2,
                                  encoder_attention_heads=4,
                                  encoder_ffn_dim=64,
                                  max_source_positions=1500),
        text_config=dict(vocab_size=1000, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=8),
        projector_temporal_downsample=2, chunk_size_seconds=1.0,
        vad_cut=False))
    m = HiggsModel(cfg).init_and_bind()

    class Tok:
        def encode(self, s, **k):
            return [10 + (ord(c) % 80) for c in s]

        def decode(self, ids, **k):
            return "".join(chr(97 + i % 26) for i in ids)

    m._tokenizer = Tok()
    return m


class TestHiggs3:
    def test_features_downsample(self, higgs3):
        # 1-s chunk: 100 mel frames -> /2 conv -> /2 pool -> /2 temporal ≈ 13
        wav = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
        feats, n_chunks = higgs3.get_audio_features(wav)
        assert n_chunks == 2
        assert all(f.shape == (13, 32) for f in feats)

    def test_generate(self, higgs3):
        wav = np.random.RandomState(1).randn(16000).astype(np.float32) * 0.1
        out = higgs3.generate(wav, max_tokens=6)
        assert isinstance(out.text, str)
        assert out.generation_tokens <= 6

    def test_parse_output(self):
        assert HiggsModel.parse_output(
            "<think>x</think>hello <|im_end|>") == "hello"


class TestNarDecoding:
    def test_ctc_collapse(self):
        out = ctc_collapse_decode(np.array([5, 5, 0, 3, 3, 0, 5]),
                                  blank_id=0)
        assert out.tolist() == [5, 3, 5]

    def test_ctc_all_blank(self):
        assert ctc_collapse_decode(np.zeros(4, int), blank_id=0).size == 0

    def test_insertion_slots(self):
        slots = add_insertion_slots(np.array([7, 9]), blank_id=0, min_len=8)
        assert slots.tolist() == [0, 7, 0, 9, 0, 0, 0, 0]

    def test_insertion_slots_empty(self):
        assert add_insertion_slots(np.array([], int), blank_id=3,
                                   min_len=4).tolist() == [3, 3, 3, 3]


@pytest.fixture(scope="module")
def nar():
    cfg = NarConfig.from_dict(dict(
        encoder_config=dict(input_dim=160, num_layers=4, hidden_dim=32,
                            feedforward_mult=2, num_heads=2, dim_head=16,
                            output_dim=12, context_size=50, max_pos_emb=64,
                            conv_kernel_size=5, conv_expansion_factor=2,
                            bpe_output_dim=40, bpe_pooling_window=4,
                            self_conditioning_layer=2, blank_token_id=0),
        projector_config=dict(num_layers=2, num_encoder_layers=4,
                              hidden_size=32, num_heads=4, block_size=15,
                              downsample_rate=5, encoder_dim=32, llm_dim=32,
                              mlp_ratio=2),
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, vocab_size=40,
                         attention_multiplier=0.35,
                         embedding_multiplier=12.0, logits_scaling=8.0,
                         residual_multiplier=0.22),
        encoder_layer_indices=[1, 2, 3, -1], blank_token_id=0))
    return NarModel(cfg).init_and_bind()


class TestNarModel:
    def test_single_pass_transcribe(self, nar):
        wav = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
        out = nar.generate(wav)
        assert isinstance(out.text, str)

    def test_deterministic(self, nar):
        wav = np.random.RandomState(1).randn(8000).astype(np.float32) * 0.1
        assert nar.generate(wav).text == nar.generate(wav).text

    def test_feature_shape(self, nar):
        feats = nar._extract_features(np.zeros(16000, np.float32))
        assert feats.shape[1] == 160
        assert feats.shape[0] == 50  # 100 mel frames stacked by 2

    def test_registry(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["granite_speech_nar"] == "granite_speech_nar"
        assert MODEL_REMAPPING["higgs_audio_3"] == "higgs_audio_3"
