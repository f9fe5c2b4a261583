"""Fish Speech S1 dual-AR TTS (tiny config)."""

import numpy as np
import pytest

from mlx_audio_tpu.tts.models.fish_qwen3_omni import Model, ModelConfig


class CharTok:
    def encode(self, s, **kwargs):
        return [10 + (ord(c) % 200) for c in s]

    def convert_tokens_to_ids(self, t):
        return 480 if t == "<|im_end|>" else 5


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.from_dict(dict(
        text_config=dict(vocab_size=600, n_layer=2, n_head=4, dim=32,
                         intermediate_size=64, n_local_heads=2, head_dim=8,
                         attention_qk_norm=True),
        audio_decoder_config=dict(vocab_size=24, n_layer=1, n_head=4,
                                  dim=32, intermediate_size=64,
                                  n_local_heads=2, head_dim=8,
                                  attention_qk_norm=False, num_codebooks=4),
        semantic_start_token_id=500, semantic_end_token_id=523))
    m = Model(cfg).init_and_bind()
    m.tokenizer = CharTok()
    m.im_end_id = 480
    return m


class TestFish:
    def test_prompt_rows_vq_splice(self, model):
        codes = np.random.RandomState(0).randint(0, 24, size=(4, 6))
        rows = model.build_prompt_rows([("text", "ab"), ("vq", codes),
                                        ("text", "c")])
        assert rows.shape == (5, 2 + 6 + 1)
        # semantic row = code row 0 + semantic_start
        assert (rows[0, 2:8] == codes[0] + 500).all()
        assert (rows[1:, 2:8] == codes).all()

    def test_generate(self, model):
        res = list(model.generate("hello world", max_tokens=6))
        assert res[0].token_count > 0
        # codebook rows within audio vocab
        assert res[0].samples == res[0].token_count * 512

    def test_speaker_turn_chunking(self, model):
        turns = model.split_text_by_speaker(
            "<|speaker:0|>hi <|speaker:1|>yo")
        assert len(turns) == 2
        res = list(model.generate("<|speaker:0|>hi <|speaker:1|>yo",
                                  max_tokens=4, chunk_length=12))
        assert len(res) == 2

    def test_batch_generate(self, model):
        outs = list(model.batch_generate(["one", "two"], max_tokens=3))
        assert {o.sequence_idx for o in outs} == {0, 1}

    def test_speed_adjust(self, model):
        a = np.arange(100, dtype=np.float32)
        fast = model._adjust_speed(a, 2.0)
        assert len(fast) == 50

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["fish_speech"] == "fish_qwen3_omni"
