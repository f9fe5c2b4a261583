"""MOSS-TTS family: delay / legacy-local / v1.5-local + nano (tiny configs)."""

import numpy as np
import pytest

from mlx_audio_tpu.tts.models.moss_tts import (
    Model,
    ModelConfig,
    apply_de_delay_pattern,
    apply_delay_pattern,
)
from mlx_audio_tpu.tts.models.moss_tts_nano import (
    Model as NanoModel,
    ModelConfig as NanoConfig,
)

SPECIALS = {151643: "<pad>", 151644: "<|im_start|>", 151645: "<|im_end|>",
            151652: "<audio_start>", 151653: "<audio_end>",
            151654: "<u_slot>", 151656: "<a_slot>", 151662: "<d_slot>"}


class CharTok:
    """Char-level tokenizer that round-trips the MOSS special tokens."""

    def convert_ids_to_tokens(self, i):
        return SPECIALS.get(i, f"<{i}>")

    def encode(self, s, **kwargs):
        rev = {v: k for k, v in SPECIALS.items()}
        ids, i = [], 0
        while i < len(s):
            for tok_str, tid in rev.items():
                if s.startswith(tok_str, i):
                    ids.append(tid)
                    i += len(tok_str)
                    break
            else:
                ids.append(100 + (ord(s[i]) % 200))
                i += 1
        return ids


LANG = dict(vocab_size=151700, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8)


class TestDelayPattern:
    def test_round_trip(self):
        codes = np.arange(24).reshape(6, 4)
        delayed = apply_delay_pattern(codes, 99)
        assert delayed.shape == (9, 4)
        # channel c starts after c pads
        assert delayed[0, 0] == codes[0, 0] and delayed[0, 1] == 99
        assert np.array_equal(apply_de_delay_pattern(delayed), codes)

    def test_empty_dedelay(self):
        out = apply_de_delay_pattern(np.zeros((2, 4), np.int32))
        assert out.shape == (0, 4)


@pytest.fixture(scope="module")
def delay_model():
    cfg = ModelConfig.from_dict(dict(
        model_type="moss_tts_delay", language_config=LANG,
        n_vq=4, audio_vocab_size=24))
    m = Model(cfg).init_and_bind()
    m.tokenizer = CharTok()
    return m


class TestDelayVariant:
    def test_prompt_rows(self, delay_model):
        proc = delay_model._processor()
        batch = proc([[proc.build_user_message(text="hello world")]])
        rows = batch["input_ids"]
        assert rows.shape[0] == 1 and rows.shape[2] == 5
        # audio channels of a text-only prompt are all PAD
        assert (rows[0, :, 1:] == delay_model.config.audio_pad_code).all()

    def test_reference_prompt_delayed(self, delay_model):
        proc = delay_model._processor()
        ref = np.random.RandomState(0).randint(0, 24, size=(6, 4))
        batch = proc([[proc.build_user_message(text="hi", reference=[ref])]])
        rows = batch["input_ids"][0]
        slot_rows = rows[rows[:, 0] == 151654]
        # gen slots (6) + delay tail (n_vq - 1)
        assert slot_rows.shape[0] == 6 + 3
        assert np.array_equal(slot_rows[:6, 1], ref[:, 0])  # ch0 undelayed
        assert slot_rows[0, 2] == delay_model.config.audio_pad_code

    def test_generate_ids(self, delay_model):
        proc = delay_model._processor()
        batch = proc([[proc.build_user_message(text="ab")]])
        out = delay_model.generate_delay_pattern_ids(
            batch["input_ids"], max_new_tokens=12, seed=0)
        start_len, gen = out[0]
        assert gen.ndim == 2 and gen.shape[1] == 5
        assert start_len >= 0

    def test_deterministic_greedy(self, delay_model):
        proc = delay_model._processor()
        batch = proc([[proc.build_user_message(text="xy")]])
        a = delay_model.generate_delay_pattern_ids(
            batch["input_ids"], max_new_tokens=6, text_temperature=0.0,
            audio_temperature=0.0, seed=0)[0][1]
        b = delay_model.generate_delay_pattern_ids(
            batch["input_ids"], max_new_tokens=6, text_temperature=0.0,
            audio_temperature=0.0, seed=5)[0][1]
        assert np.array_equal(a, b)


class TestV15Variant:
    @pytest.fixture(scope="class")
    def model(self):
        cfg = ModelConfig.from_dict(dict(
            model_type="moss_tts_local", language_config=LANG,
            n_vq=4, audio_vocab_size=24, audio_codebook_sizes=[24] * 4,
            gpt2_config=dict(vocab_size=64, n_embd=32, n_layer=1, n_head=4,
                             n_inner=64)))
        m = Model(cfg).init_and_bind()
        m.tokenizer = CharTok()
        return m

    def test_variant_flags(self, model):
        assert model.config.is_v15_local_transformer
        assert not model.config.is_legacy_local_transformer

    def test_clone_prompt_rows(self, model):
        proc = model._processor()
        ref = np.random.RandomState(0).randint(0, 24, size=(5, 4))
        batch = proc([[proc.build_user_message(text="hi", reference=[ref])]])
        ids = batch["input_ids"][0]
        assert (ids[:, 0] == 151654).sum() == 5
        assert (ids[:, 0] == 151652).sum() == 2  # ref span + generation start

    def test_generate_and_fixed_nq(self, model):
        proc = model._processor()
        batch = proc([[proc.build_user_message(text="hello")]])
        out = model.generate_v15_local_ids(batch["input_ids"],
                                           max_new_tokens=4, seed=2)
        assert out[0][1].shape[1] == 5
        with pytest.raises(ValueError):
            model.generate_v15_local_ids(batch["input_ids"],
                                         max_new_tokens=2,
                                         n_vq_for_inference=2)


class TestLegacyVariant:
    def test_generate(self):
        cfg = ModelConfig.from_dict(dict(
            model_type="moss_tts", language_config=LANG,
            n_vq=4, audio_vocab_size=24,
            additional_mlp_ffn_hidden_size=48, local_ffn_hidden_size=48,
            local_hidden_size=32, local_num_layers=1))
        assert cfg.is_legacy_local_transformer
        m = Model(cfg).init_and_bind()
        m.tokenizer = CharTok()
        proc = m._processor()
        batch = proc([[proc.build_user_message(text="hey")]])
        out = m.generate_local_ids(batch["input_ids"], max_new_tokens=4,
                                   seed=0)
        gen = out[0][1]
        assert gen.shape[1] == 5
        # generation prompt ends with a bare <audio_start> row
        assert gen[0, 0] == m.config.audio_start_token_id


class TestNano:
    @pytest.fixture(scope="class")
    def nano(self):
        cfg = NanoConfig(
            gpt2_config=dict(vocab_size=64, n_embd=32, n_layer=2, n_head=4,
                             n_inner=64),
            n_vq=4, audio_vocab_size=24, audio_codebook_sizes=[24] * 4,
            audio_pad_token_id=24)
        m = NanoModel(cfg).init_and_bind()

        class Tok:
            def encode(self, s, **k):
                return [10 + (ord(c) % 40) for c in s][:24]

        m.tokenizer = Tok()
        return m

    def test_prompt_rows(self, nano):
        codes = np.random.RandomState(0).randint(0, 24, size=(6, 4))
        rows, mask = nano.build_inference_input_ids(
            text="hello", tokenizer=nano.tokenizer, mode="voice_clone",
            prompt_audio_codes=codes)
        assert rows.shape[2] == 5 and mask.all()
        slot = rows[0, rows[0, :, 0] == nano.config.audio_user_slot_token_id]
        assert np.array_equal(slot[:, 1:], codes)

    def test_greedy_deterministic(self, nano):
        codes = np.random.RandomState(1).randint(0, 24, size=(4, 4))
        rows, _ = nano.build_inference_input_ids(
            text="hi", tokenizer=nano.tokenizer, mode="voice_clone",
            prompt_audio_codes=codes)
        a = nano.generate_audio_token_ids(prompt_input_ids=rows,
                                          max_new_frames=4, do_sample=False)
        b = nano.generate_audio_token_ids(prompt_input_ids=rows,
                                          max_new_frames=4, do_sample=False)
        assert np.array_equal(a, b)

    def test_continuation_mode(self, nano):
        rows, _ = nano.build_inference_input_ids(
            text="target", tokenizer=nano.tokenizer, mode="continuation")
        assert rows[0, -1, 0] == nano.config.audio_start_token_id
        with pytest.raises(ValueError):
            nano.build_inference_input_ids(
                text="x", tokenizer=nano.tokenizer, mode="voice_clone")


class TestRegistry:
    def test_remapping(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        for name in ("moss_tts", "moss_tts_delay", "moss_tts_local",
                     "moss_tts_nano", "moss_ttsd"):
            assert name in MODEL_REMAPPING

    def test_alias_modules(self):
        from mlx_audio_tpu.tts.models import moss_tts_delay, moss_tts_local

        assert moss_tts_delay.Model is Model
        assert moss_tts_local.Model is Model
