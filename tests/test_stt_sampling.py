"""Sampled-decode knobs shared by the STT families.

Covers the round-2 sweep that threaded temperature/top_k/top_p/min_p/
repetition_penalty through every LLM-decoder STT family (reference threads
mlx_lm's make_sampler kwargs through each model's generate, e.g.
/root/reference/mlx_audio/stt/models/qwen3_asr/qwen3_asr.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.ops.sampling import (make_sampler, make_token_selector,
                                        top_k_top_p_filter)


class TestMinTokensToKeep:
    def test_top_p_keeps_at_least_n(self):
        # one dominant logit: plain top_p=0.5 would keep only token 0
        logits = jnp.asarray([[10.0, 1.0, 0.5, 0.1, -2.0]])
        filtered = top_k_top_p_filter(logits, top_p=0.5,
                                      min_tokens_to_keep=3)
        assert int(jnp.sum(jnp.isfinite(filtered))) >= 3

    def test_min_p_keeps_at_least_n(self):
        logits = jnp.asarray([[10.0, 1.0, 0.5, 0.1, -2.0]])
        filtered = top_k_top_p_filter(logits, min_p=0.9,
                                      min_tokens_to_keep=2)
        assert int(jnp.sum(jnp.isfinite(filtered))) >= 2

    def test_survivors_are_the_top_ranked(self):
        logits = jnp.asarray([[10.0, 1.0, 0.5, 0.1, -2.0]])
        filtered = top_k_top_p_filter(logits, top_p=0.3,
                                      min_tokens_to_keep=3)
        finite = np.isfinite(np.asarray(filtered))[0]
        assert finite[:3].all()

    def test_noop_when_one(self):
        logits = jnp.asarray([[10.0, 1.0, 0.5]])
        a = top_k_top_p_filter(logits, top_p=0.5, min_tokens_to_keep=1)
        b = top_k_top_p_filter(logits, top_p=0.5)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTokenSelector:
    def test_neutral_is_argmax_and_hist_static(self):
        init_hist, select, push = make_token_selector()
        hist = init_hist()
        logits = jnp.asarray([[0.1, 5.0, -1.0, 2.0]])
        tok, _ = select(jax.random.PRNGKey(0), logits, hist)
        assert int(tok) == 1
        hist2 = push(hist, tok, jnp.bool_(False))
        np.testing.assert_array_equal(np.asarray(hist2), np.asarray(hist))

    def test_repetition_penalty_flips_choice(self):
        init_hist, select, push = make_token_selector(
            repetition_penalty=10.0, repetition_context_size=4)
        hist = init_hist()
        logits = jnp.asarray([[3.0, 2.9, 0.0, 0.0]])
        tok, _ = select(jax.random.PRNGKey(0), logits, hist)
        assert int(tok) == 0
        hist = push(hist, tok, jnp.bool_(False))
        tok2, _ = select(jax.random.PRNGKey(0), logits, hist)
        assert int(tok2) == 1  # 0 now penalized below 2.9

    def test_push_eos_inserts_pad(self):
        init_hist, select, push = make_token_selector(
            repetition_penalty=2.0, repetition_context_size=3)
        hist = push(init_hist(), jnp.int32(5), jnp.bool_(True))
        assert int(hist[0, -1]) == -1

    def test_sampled_select_in_vocab_and_seeded(self):
        init_hist, select, push = make_token_selector(
            temperature=0.8, top_k=3, repetition_penalty=1.1)
        hist = init_hist()
        logits = jnp.asarray([[1.0, 2.0, 3.0, -1.0, 0.0]])
        t1, _ = select(jax.random.PRNGKey(7), logits, hist)
        t2, _ = select(jax.random.PRNGKey(7), logits, hist)
        assert int(t1) == int(t2) and 0 <= int(t1) < 5

    def test_jit_safe_inside_scan(self):
        init_hist, select, push = make_token_selector(
            temperature=0.5, top_p=0.9, repetition_penalty=1.3)

        @jax.jit
        def run(rng, logits):
            def body(carry, _):
                rng, hist = carry
                tok, rng = select(rng, logits, hist)
                hist = push(hist, tok, jnp.bool_(False))
                return (rng, hist), tok

            (_, _), toks = jax.lax.scan(
                body, (rng, init_hist()), None, length=8)
            return toks

        toks = run(jax.random.PRNGKey(0),
                   jnp.asarray([[1.0, 2.0, 3.0, 0.5]]))
        assert toks.shape == (8,)
        assert bool(jnp.all((toks >= 0) & (toks < 4)))


class TestSamplerHistory:
    def test_make_sampler_threads_history(self):
        sampler = make_sampler(temperature=0.0, repetition_penalty=100.0)
        logits = jnp.asarray([[5.0, 4.9, 0.0]])
        hist = jnp.asarray([[0, -1, -1, -1]], jnp.int32)
        tok = sampler(jax.random.PRNGKey(0), logits, hist)
        assert int(tok[0]) == 1


class TestMoonshineSampledDecode:
    def test_temperature_decode_runs_and_seeds(self):
        from mlx_audio_tpu.stt.models.moonshine import ModelConfig
        from mlx_audio_tpu.stt.models.moonshine.moonshine import (
            encoder_forward, greedy_decode, init_moonshine)

        cfg = ModelConfig(
            vocab_size=32, hidden_size=16, intermediate_size=32,
            encoder_num_hidden_layers=1, decoder_num_hidden_layers=1,
            encoder_num_attention_heads=2, decoder_num_attention_heads=2,
            encoder_num_key_value_heads=2, decoder_num_key_value_heads=2,
            max_position_embeddings=64, decoder_start_token_id=1,
            eos_token_id=2)
        params = init_moonshine(jax.random.PRNGKey(0), cfg)
        wave = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 4000)),
            jnp.float32)
        enc, frames = encoder_forward(params, cfg, wave,
                                      jnp.asarray([4000]))
        t1, c1 = greedy_decode(params, cfg, enc, frames, 16,
                               temperature=0.9, rng=jax.random.PRNGKey(3))
        t2, c2 = greedy_decode(params, cfg, enc, frames, 16,
                               temperature=0.9, rng=jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        toks = np.asarray(t1)[: int(c1)]
        assert ((toks >= 0) & (toks < cfg.vocab_size)).all()
