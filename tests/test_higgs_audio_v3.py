"""Higgs Audio v3 tiny-config tests: delay pattern, sanitize, generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.higgs_audio_v3 import Model, ModelConfig
from mlx_audio_tpu.tts.models.higgs_audio_v3.higgs_audio_v3 import (
    apply_delay_pattern,
    reverse_delay_pattern,
)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        text_config=dict(hidden_size=32, num_hidden_layers=2,
                         intermediate_size=64, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8, vocab_size=256),
        audio_num_codebooks=4, audio_codebook_size=34,
        audio_boc_token_id=32, audio_eoc_token_id=33)
    return Model(cfg).init_and_bind()


class TestDelayPattern:
    def test_roundtrip(self):
        codes = np.random.RandomState(0).randint(0, 1024, (10, 8))
        d = apply_delay_pattern(codes, 1024)
        assert d.shape == (17, 8)
        np.testing.assert_array_equal(reverse_delay_pattern(d), codes)

    def test_boc_fill(self):
        codes = np.arange(6).reshape(3, 2)
        d = apply_delay_pattern(codes, 99)
        assert d[0, 1] == 99  # codebook 1 delayed one row
        assert d[1, 1] == codes[0, 1]


class TestGeneration:
    def test_generates_delay_consistent_rows(self, model):
        res = list(model.generate(text_ids=np.arange(5, 20), temperature=0.8,
                                  max_tokens=40))[0]
        codes = res.prompt["codes"]
        if len(codes):
            assert codes.shape[1] == 4
            assert (codes <= 31).all()  # specials stripped/clamped

    def test_greedy_deterministic(self, model):
        r1 = list(model.generate(text_ids=np.arange(5, 15), temperature=0.0,
                                 max_tokens=24))[0]
        r2 = list(model.generate(text_ids=np.arange(5, 15), temperature=0.0,
                                 max_tokens=24))[0]
        np.testing.assert_array_equal(r1.prompt["codes"], r2.prompt["codes"])


class TestSanitize:
    def test_checkpoint_key_remap(self, model):
        w = {
            "tied.embedding.text_embedding.weight": jnp.zeros((4, 4)),
            "body.layers.0.self_attn.q_proj.weight": jnp.zeros((4, 4)),
            "body.norm.weight": jnp.zeros((4,)),
            "tied.embedding.modality_embeddings.0.embedding.weight":
                jnp.zeros((8, 4)),
            "tied.embedding.modality_embeddings.0.model.ignored":
                jnp.zeros((2,)),
            "tied.head.ignored": jnp.zeros((2,)),
        }
        out = model.sanitize(w)
        assert "backbone.embed_tokens.weight" in out
        assert "backbone.layers.0.self_attn.q_proj.weight" in out
        assert "backbone.norm.weight" in out
        assert "multimodal_embedding.weight" in out
        assert not any("ignored" in k for k in out)


class FakeTok:
    """byte-ish text ids + the Higgs v3 specials (reference prompt.py)."""
    _specials = {"<|tts|>": 200, "<|ref_audio|>": 201, "<|text|>": 202,
                 "<|audio|>": 203, "<|ref_text|>": 204}

    def get_added_vocab(self):
        return dict(self._specials)

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 100 for c in text]


class FakeCodec:
    """4-book codec: encode -> (T, 4) codes, decode -> (T*hop,) audio."""
    hop = 16

    def encode(self, audio):
        t = max(1, len(np.asarray(audio).reshape(-1)) // 256)
        return np.tile(np.arange(4)[None], (t, 1))

    def decode(self, codes):
        codes = np.asarray(codes)
        return np.zeros((codes.shape[0] * self.hop,), np.float32)


@pytest.fixture(scope="module")
def cloning_model(model):
    model.tokenizer = FakeTok()
    model.codec = FakeCodec()
    return model


class TestPromptBuilder:
    def test_plain_prompt(self, cloning_model):
        ids, segs = cloning_model.build_prompt("hi")
        assert ids[0] == 200 and ids[-1] == 203
        assert 202 in ids and not segs

    def test_reference_prompt_layout(self, cloning_model):
        codes = np.zeros((5, 4), np.int32)
        ids, segs = cloning_model.build_prompt(
            "hi", [{"codes": codes, "text": "ref"}])
        # <|tts|> <|ref_text|> r e f <|ref_audio|> [5 placeholders] ...
        assert ids[0] == 200 and ids[1] == 204
        i = ids.index(201)
        assert ids[i + 1: i + 6] == [-100] * 5
        assert segs[0][0] == i + 1
        # embeds splice resolves every placeholder
        emb = cloning_model._prompt_embeds(ids, segs)
        assert emb.shape == (1, len(ids), 32)

    def test_missing_specials_raise(self, model):
        class NoSpecials:
            def get_added_vocab(self):
                return {}

            def encode(self, t, add_special_tokens=False):
                return [1]

        old = model.tokenizer
        model.tokenizer = NoSpecials()
        try:
            with pytest.raises(ValueError, match="specials"):
                model.build_prompt("hi")
        finally:
            model.tokenizer = old


class TestReferences:
    def test_ref_audio_encodes_delayed(self, cloning_model):
        m = cloning_model
        audio = np.zeros(2048, np.float32)
        delayed = m.encode_reference_audio(audio)
        n = m.config.audio_num_codebooks
        assert delayed.shape[1] == n
        # BOC ramp above the diagonal, EOC below
        assert delayed[0, 1] == m.config.audio_boc_token_id
        assert delayed[-1, 0] == m.config.audio_eoc_token_id

    def test_alias_exclusivity(self, cloning_model):
        with pytest.raises(ValueError, match="not both"):
            cloning_model._normalize_references(
                ref_audio=np.zeros(2048), ref_audio_codes=np.zeros((3, 4)))

    def test_ref_text_length_check(self, cloning_model):
        with pytest.raises(ValueError, match="same length"):
            cloning_model._normalize_references(
                ref_audios=[np.zeros(2048)], ref_texts=["a", "b"])

    def test_generate_with_ref_audio(self, cloning_model):
        res = list(cloning_model.generate(
            "hello", ref_audio=np.zeros(4096, np.float32), ref_text="ref",
            temperature=0.0, max_new_tokens=16))[0]
        assert res.samples >= 0
        assert np.isfinite(np.asarray(res.audio)).all()

    def test_generate_with_precomputed_codes(self, cloning_model):
        codes = cloning_model.encode_reference_audio(
            np.zeros(4096, np.float32))
        res = list(cloning_model.generate(
            "hello", ref_audio_codes=codes, temperature=0.7, top_p=0.9,
            top_k=8, seed=3, max_new_frames=16))[0]
        assert np.isfinite(np.asarray(res.audio)).all()


class TestDrainSemantics:
    def test_eoc_drains_n_minus_2_rows(self, model):
        """After codebook 0 emits EOC, exactly N-2 more rows are sampled
        (reference generation.py:144-151) and reverse_delay_pattern drops
        the EOC row from codebook 0's column."""
        n = model.config.audio_num_codebooks
        pre = 6  # rows before the EOC row
        delayed = np.random.RandomState(0).randint(0, 32, (pre + n - 1, n))
        delayed[pre, 0] = model.config.audio_eoc_token_id
        codes = reverse_delay_pattern(delayed)
        assert codes.shape == (pre, n)
        assert (codes[:, 0] != model.config.audio_eoc_token_id).all()


class TestFades:
    def test_fade_shapes(self, model):
        audio = np.ones(24000, np.float32)
        out = model._apply_fades(audio, fade_in_ms=30.0, fade_out_ms=15.0)
        assert out[0] == 0.0 and out[-1] == 0.0
        mid = len(out) // 2
        assert out[mid] == 1.0
