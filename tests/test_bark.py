"""Bark: GPT cache parity, merge-context, three-stage pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.bark import GPTConfig, Model, ModelConfig
from mlx_audio_tpu.tts.models.bark.bark import (CODEBOOK_SIZE,
                                                N_COARSE_CODEBOOKS,
                                                N_FINE_CODEBOOKS,
                                                SEMANTIC_VOCAB_SIZE,
                                                fine_gpt_forward, gpt_prefill,
                                                gpt_step, init_fine_gpt,
                                                init_gpt)
from mlx_audio_tpu.ops.kvcache import KVCache


SEM = GPTConfig(block_size=64, input_vocab_size=129_600,
                output_vocab_size=129_600, n_layer=2, n_head=2, n_embd=16)
TINY = GPTConfig(block_size=64, input_vocab_size=200, output_vocab_size=200,
                 n_layer=2, n_head=2, n_embd=16)
FINE = GPTConfig(block_size=64, input_vocab_size=1056,
                 output_vocab_size=1056, n_layer=2, n_head=2, n_embd=16,
                 n_codes_total=4, n_codes_given=1)


def _caches(cfg, cap):
    return [KVCache.init(1, cap, cfg.n_head, cfg.n_embd // cfg.n_head,
                         dtype=jnp.float32) for _ in range(cfg.n_layer)]


class TestGPT:
    def test_prefill_then_steps_match_full_prefill(self):
        p = init_gpt(jax.random.PRNGKey(0), TINY)
        toks = np.random.RandomState(0).randint(0, 200, (1, 10))
        # full prefill over 10 tokens
        lg_full, _ = gpt_prefill(p, TINY, jnp.asarray(toks),
                                 jnp.asarray([10]), _caches(TINY, 16))
        # prefill 7 + 3 cached steps
        lg, caches = gpt_prefill(p, TINY, jnp.asarray(toks[:, :7]),
                                 jnp.asarray([7]), _caches(TINY, 16))
        for i in range(7, 10):
            lg, caches = gpt_step(p, TINY, jnp.asarray(toks[:, i:i + 1]),
                                  jnp.int32(i), caches)
        # TPU default matmul precision (bf16 passes) separates the two
        # computation orders by ~5e-3; CPU stays at f32
        atol = 2e-4 if jax.default_backend() == "cpu" else 2e-2
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lg_full),
                                   atol=atol)

    def test_prefill_padding_invariance(self):
        p = init_gpt(jax.random.PRNGKey(1), TINY)
        toks = np.random.RandomState(1).randint(0, 200, (1, 6))
        lg_tight, _ = gpt_prefill(p, TINY, jnp.asarray(toks),
                                  jnp.asarray([6]), _caches(TINY, 8))
        padded = np.zeros((1, 12), np.int64)
        padded[:, :6] = toks
        lg_pad, _ = gpt_prefill(p, TINY, jnp.asarray(padded),
                                jnp.asarray([6]), _caches(TINY, 16))
        np.testing.assert_allclose(np.asarray(lg_pad),
                                   np.asarray(lg_tight), atol=1e-4)

    def test_merge_context_sums_embeddings(self):
        p = init_gpt(jax.random.PRNGKey(2), SEM)
        toks = np.random.RandomState(2).randint(0, 1000, (1, 513))
        lg1, _ = gpt_prefill(p, SEM, jnp.asarray(toks), jnp.asarray([513]),
                             _caches(SEM, 513), merge_context=True)
        # merged prompt occupies 513 - 256 = 257 positions
        assert lg1.shape == (1, SEM.output_vocab_size)

    def test_fine_gpt_tied_heads_and_shapes(self):
        p = init_fine_gpt(jax.random.PRNGKey(3), FINE)
        codes = np.random.RandomState(3).randint(0, 1000, (1, 20, 4))
        logits = fine_gpt_forward(p, FINE, 2, jnp.asarray(codes))
        assert logits.shape == (1, 20, 1056)
        # tied: lm_heads[i] shares weight with input_embeds_layers[i+1]
        np.testing.assert_array_equal(
            np.asarray(p["lm_heads"]["0"]["weight"]),
            np.asarray(p["input_embeds_layers"]["1"]["weight"]))

    def test_fine_non_causal(self):
        """Changing a late frame must change early logits (bidirectional)."""
        p = init_fine_gpt(jax.random.PRNGKey(4), FINE)
        codes = np.random.RandomState(4).randint(0, 1000, (1, 16, 4))
        c2 = codes.copy()
        c2[0, -1, 0] = (c2[0, -1, 0] + 1) % 1000
        l1 = np.asarray(fine_gpt_forward(p, FINE, 1, jnp.asarray(codes)))
        l2 = np.asarray(fine_gpt_forward(p, FINE, 1, jnp.asarray(c2)))
        assert np.abs(l1[0, 0] - l2[0, 0]).max() > 1e-6


class _FakeTok:
    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 100 for c in text][:50]


class _FakeCodec:
    def decode(self, codes):
        # (1, n_books, T) -> fake audio: 320 samples per frame
        t = codes.shape[-1]
        return jnp.zeros((1, t * 320, 1))


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(
        semantic_config=dict(block_size=600, n_layer=1, n_head=2,
                             n_embd=16),
        coarse_acoustics_config=dict(block_size=600, n_layer=1, n_head=2,
                                     n_embd=16),
        fine_acoustics_config=dict(block_size=1024, n_layer=1, n_head=2,
                                   n_embd=16))
    m = Model(cfg).init_and_bind()
    m._tokenizer = _FakeTok()
    m._codec = _FakeCodec()
    return m


class TestPipeline:
    def test_semantic_tokens_in_range(self, tiny_model):
        toks = tiny_model.generate_semantic("hi there", max_steps=16)
        assert toks.ndim == 1 and len(toks) <= 16
        assert ((toks >= 0) & (toks < SEMANTIC_VOCAB_SIZE)).all()

    def test_coarse_shape_and_range(self, tiny_model):
        sem = np.random.RandomState(0).randint(0, SEMANTIC_VOCAB_SIZE, 20)
        coarse = tiny_model.generate_coarse(sem.astype(np.int32))
        assert coarse.shape[0] == N_COARSE_CODEBOOKS
        # ratio: 75/49.9*2 per semantic token / 2 books
        assert coarse.shape[1] == int(20 * 75 / 49.9)
        assert ((coarse >= 0) & (coarse < CODEBOOK_SIZE)).all()

    def test_fine_fills_remaining_codebooks(self, tiny_model):
        coarse = np.random.RandomState(1).randint(
            0, CODEBOOK_SIZE, (N_COARSE_CODEBOOKS, 30))
        fine = tiny_model.generate_fine(coarse, temperature=None)
        assert fine.shape == (N_FINE_CODEBOOKS, 30)
        np.testing.assert_array_equal(fine[:N_COARSE_CODEBOOKS], coarse)
        assert ((fine >= 0) & (fine < CODEBOOK_SIZE)).all()

    def test_generate_end_to_end(self, tiny_model):
        results = list(tiny_model.generate("ok", max_semantic_steps=8))
        assert len(results) == 1
        r = results[0]
        assert r.samples > 0
        assert r.sample_rate == 24_000


class TestSanitize:
    def test_h_to_layers_and_drop_codec(self, tiny_model):
        out = tiny_model.sanitize({
            "_orig_mod.transformer.h.0.attn.att_proj.weight":
                jnp.ones((4, 4)),
            "semantic.h.11.mlp.in_proj.weight": jnp.ones((2, 2)),
            "codec.decoder.weight": jnp.ones((1,)),
            "_orig_mod.lm_head.weight": jnp.ones((3, 3)),
        })
        assert "layers.0.attn.att_proj.weight" in out
        assert "semantic.layers.11.mlp.in_proj.weight" in out
        assert "lm_head.weight" in out
        assert not any("codec" in k for k in out)
