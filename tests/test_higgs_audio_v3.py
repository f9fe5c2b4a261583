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


class TestBatchGenerate:
    """batch_generate parity: each left-padded batch row must decode exactly
    as it would alone (reference model.py:547-735)."""

    def test_rows_match_solo_greedy(self, cloning_model):
        m = cloning_model
        texts = ["hello world", "a much longer sentence to force padding",
                 "hi"]
        limit = 24
        batch = list(m.batch_generate(texts, temperature=0.0,
                                      max_new_frames=limit))
        assert len(batch) == 3
        for r in batch:
            solo = list(m.generate(texts[r.sequence_idx], temperature=0.0,
                                   max_new_frames=limit))[0]
            assert r.token_count == solo.token_count
            assert len(np.asarray(r.audio)) == len(np.asarray(solo.audio))

    def test_batched_rows_bitmatch_single_stepper(self, cloning_model):
        """The left-padded batched stepper must emit the SAME greedy rows as
        the single-sequence stepper — masks and row-local RoPE make padding
        invisible."""
        import jax
        import jax.numpy as jnp
        m = cloning_model
        texts = ["hello world", "hi"]
        embeds = []
        for t in texts:
            ids, segs = m.build_prompt(t)
            embeds.append(m._prompt_embeds(ids, segs))
        plens = [e.shape[1] for e in embeds]
        pb = 1 << max(4, (max(plens) - 1).bit_length())
        pad_w = jnp.asarray([pb - p for p in plens], jnp.int32)
        batch = jnp.concatenate(
            [jnp.pad(e, ((0, 0), (pb - e.shape[1], 0), (0, 0)))
             for e in embeds], axis=0)
        bc = m._prefill_batch(m.params, batch, pad_w, jax.random.PRNGKey(0))
        bst = m._make_batch_chunk_stepper(8, 0.0, 0, 0.0)
        _, brows, _ = bst(m.params, bc)
        for i, (e, plen) in enumerate(zip(embeds, plens)):
            spb = 1 << max(4, (plen - 1).bit_length())
            se = jnp.pad(e, ((0, 0), (0, spb - plen), (0, 0)))
            sc = m._prefill(m.params, se, jnp.int32(plen),
                            jax.random.PRNGKey(0))
            sst = m._make_chunk_stepper(8, 0.0, 0, 0.0)
            _, srows, _ = sst(m.params, sc)
            np.testing.assert_array_equal(np.asarray(brows)[:, i],
                                          np.asarray(srows)[:, 0])

    def test_validations(self, cloning_model):
        m = cloning_model
        with pytest.raises(ValueError, match="voices"):
            list(m.batch_generate(["a", "b"], voices=["x", None]))
        with pytest.raises(ValueError, match="speed"):
            list(m.batch_generate(["a"], speeds=[2.0]))
        with pytest.raises(ValueError, match="length"):
            list(m.batch_generate(["a", "b"], ref_audios=["x"]))

    def test_supports_tts_batch(self, model):
        assert model.supports_tts_batch()
        assert not model.supports_tts_batch(stream=True)
        assert not model.supports_tts_batch(voice="belinda")
        assert not model.supports_tts_batch(speed=1.5)
        assert model.supports_tts_continuous_batch(gender="male")


class TestContinuousSession:
    def _item(self, rid, text):
        from mlx_audio_tpu.tts.continuous import TTSBatchItem
        return TTSBatchItem(request_id=rid, text=text)

    def test_session_matches_solo(self, cloning_model):
        from mlx_audio_tpu.tts.continuous import TTSBatchOptions
        m = cloning_model
        opts = TTSBatchOptions(max_batch_size=2, temperature=0.0,
                               max_tokens=20)
        sess = m.create_tts_batch_session(opts)
        assert sess.idle and sess.available_slots == 2
        sess.add(self._item("r1", "hello world"))
        assert not sess.idle and sess.available_slots == 1
        # staggered admission: second request joins mid-decode
        events = []
        for i in range(6):
            events.extend(sess.step())
        sess.add(self._item("r2", "hi"))
        for _ in range(60):
            events.extend(sess.step())
            if sess.idle:
                break
        assert sess.idle
        done = {e.request_id for e in events if e.kind == "done"}
        assert done == {"r1", "r2"}
        chunks = {e.request_id: e for e in events if e.kind == "chunk"}
        for rid, text in (("r1", "hello world"), ("r2", "hi")):
            solo = list(m.generate(text, temperature=0.0,
                                   max_new_frames=opts.max_tokens))[0]
            assert chunks[rid].token_count == solo.token_count, rid
            assert len(np.asarray(chunks[rid].audio)) == \
                len(np.asarray(solo.audio)), rid

    def test_cancel(self, cloning_model):
        from mlx_audio_tpu.tts.continuous import TTSBatchOptions
        m = cloning_model
        sess = m.create_tts_batch_session(
            TTSBatchOptions(max_batch_size=2, temperature=0.0,
                            max_tokens=12))
        sess.add(self._item("c1", "hello"))
        sess.step()
        sess.cancel("c1")
        assert sess.idle
