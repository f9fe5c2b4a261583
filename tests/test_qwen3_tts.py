"""Qwen3-TTS tiny-config tests: streaming==full codec parity, talker caches,
end-to-end compiled generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig
from mlx_audio_tpu.tts.models.qwen3_tts.speech_tokenizer import (
    decode_full,
    init_stream_state,
    streaming_step,
)


def tiny_cfg():
    return ModelConfig(
        talker_config=dict(
            vocab_size=300, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, num_code_groups=4, text_hidden_size=48,
            text_vocab_size=500, codec_eos_token_id=280, codec_think_id=284,
            codec_nothink_id=285, codec_think_bos_id=286,
            codec_think_eos_id=287, codec_pad_id=278, codec_bos_id=279,
            code_predictor_config=dict(
                vocab_size=256, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=8, num_code_groups=4),
        ),
        tokenizer_config=dict(decoder_config=dict(
            latent_dim=32, codebook_dim=16, codebook_size=256, decoder_dim=64,
            hidden_size=24, intermediate_size=48, head_dim=8,
            num_attention_heads=3, num_hidden_layers=2, num_key_value_heads=3,
            num_quantizers=4, num_semantic_quantizers=1, sliding_window=16,
            upsample_rates=[4, 3], upsampling_ratios=[2, 2])),
    )


@pytest.fixture(scope="module")
def model():
    return Model(tiny_cfg()).init_and_bind()


class TestCodecDecoder:
    def test_full_decode_shape(self, model):
        codes = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (1, 4, 10)))
        audio = decode_full(model.params["speech_tokenizer"]["decoder"],
                            model.dcfg, codes)
        assert audio.shape == (1, 10 * model.total_upsample)
        assert np.isfinite(np.asarray(audio)).all()

    def test_streaming_matches_full(self, model):
        """Chunked streaming decode must equal the one-shot decode exactly
        (the reference asserts this property via its conv-buffer design;
        here the state is an explicit pytree)."""
        p = model.params["speech_tokenizer"]["decoder"]
        codes = jnp.asarray(
            np.random.RandomState(1).randint(0, 256, (1, 4, 24)))
        full = np.asarray(decode_full(p, model.dcfg, codes))

        state = init_stream_state(model.dcfg, batch=1)
        outs = []
        for start, end in [(0, 5), (5, 6), (6, 14), (14, 24)]:
            state, chunk = streaming_step(p, model.dcfg, state,
                                          codes[:, :, start:end])
            outs.append(np.asarray(chunk))
        streamed = np.concatenate(outs, axis=-1)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, atol=2e-4)

    def test_rvq_decode_additive(self, model):
        from mlx_audio_tpu.tts.models.qwen3_tts.speech_tokenizer import (
            split_rvq_decode,
        )

        p = model.params["speech_tokenizer"]["decoder"]["quantizer"]
        codes = jnp.asarray(np.random.RandomState(2).randint(0, 256, (1, 4, 6)))
        out = split_rvq_decode(p, model.dcfg, codes)
        assert out.shape == (1, 6, model.dcfg.codebook_dim)


class TestTalker:
    def test_cached_decode_matches_full(self, model):
        from mlx_audio_tpu.tts.models.qwen3_tts.talker import (
            make_stacked_caches, talker_forward)

        tcfg = model.tcfg
        rng = np.random.RandomState(3)
        embeds = jnp.asarray(rng.randn(1, 7, 32).astype(np.float32) * 0.1)
        full_logits, _, _ = talker_forward(model.params["talker"], tcfg,
                                           embeds, None, 0)
        caches = make_stacked_caches(
            tcfg.num_hidden_layers, 1, 16, tcfg.num_key_value_heads,
            tcfg.head_dim, jnp.float32)
        logits_p, _, caches = talker_forward(model.params["talker"], tcfg,
                                             embeds[:, :4], caches, 0)
        np.testing.assert_allclose(np.asarray(logits_p),
                                   np.asarray(full_logits[:, :4]), atol=1e-4)
        for i in range(4, 7):
            step_l, _, caches = talker_forward(
                model.params["talker"], tcfg, embeds[:, i:i + 1], caches,
                jnp.int32(i))
            np.testing.assert_allclose(np.asarray(step_l[:, 0]),
                                       np.asarray(full_logits[:, i]),
                                       atol=1e-4)


class TestGenerate:
    def test_streaming_generation(self, model):
        text_ids = np.arange(10, 30)[None]
        results = list(model.generate(text_ids=text_ids, temperature=0.8,
                                      max_tokens=40, stream=True,
                                      streaming_interval=1.0))
        assert len(results) >= 1
        total = sum(r.samples for r in results)
        assert total % model.total_upsample == 0
        assert results[-1].is_final_chunk

    def test_greedy_deterministic(self, model):
        text_ids = np.arange(10, 25)[None]
        r1 = list(model.generate(text_ids=text_ids, temperature=0.0,
                                 max_tokens=20))
        r2 = list(model.generate(text_ids=text_ids, temperature=0.0,
                                 max_tokens=20))
        np.testing.assert_array_equal(np.asarray(r1[0].audio),
                                      np.asarray(r2[0].audio))

    def test_stream_audio_matches_nonstream(self, model):
        """Greedy: streamed chunks concatenated == one-shot decode."""
        text_ids = np.arange(10, 25)[None]
        stream = list(model.generate(text_ids=text_ids, temperature=0.0,
                                     max_tokens=20, stream=True,
                                     streaming_interval=0.5))
        full = list(model.generate(text_ids=text_ids, temperature=0.0,
                                   max_tokens=20))
        a1 = np.concatenate([np.asarray(r.audio) for r in stream])
        a2 = np.asarray(full[0].audio)
        assert a1.shape == a2.shape
        np.testing.assert_allclose(a1, a2, atol=2e-4)

    def test_speaker_and_language_tables(self, model):
        assert model.get_supported_speakers() == []
        assert model.get_supported_languages() == []

    def test_stream_max_tokens_one(self, model):
        """Budget fully consumed by step 0: the flush-only superstep must
        still emit the single frame and a final marker."""
        text_ids = np.arange(10, 25)[None]
        results = list(model.generate(text_ids=text_ids, temperature=0.0,
                                      max_tokens=1, stream=True))
        assert results[-1].is_final_chunk
        total = sum(r.samples for r in results)
        assert total == model.total_upsample  # exactly one frame of audio

    def test_stream_stats_recorded(self, model):
        """The fused stepper records fetch count + host stall for bench
        introspection; fetches = dispatched chunks (one sync per chunk)."""
        text_ids = np.arange(10, 25)[None]
        list(model.generate(text_ids=text_ids, temperature=0.0,
                            max_tokens=20, stream=True,
                            streaming_interval=1.0))
        stats = model._last_stream_stats
        # chunks: first (8 frames) + 12-frame interval chunks for the rest
        assert 1 <= stats["n_fetches"] <= 4
        assert stats["stall_s"] >= 0.0

    def test_stream_token_budget_respected(self, model):
        """Frames streamed never exceed max_tokens even with speculation."""
        text_ids = np.arange(10, 25)[None]
        for mt in (5, 9, 17):
            results = list(model.generate(text_ids=text_ids, temperature=0.9,
                                          max_tokens=mt, stream=True,
                                          streaming_interval=0.4, seed=3))
            total = sum(r.samples for r in results)
            assert total <= mt * model.total_upsample
            assert results[-1].is_final_chunk


class TestSanitize:
    def test_codebook_reconstruction(self, model):
        w = {
            "decoder.quantizer.rvq_first.vq.layers.0._codebook.cluster_usage":
                jnp.full((256,), 2.0),
            "decoder.quantizer.rvq_first.vq.layers.0._codebook.embedding_sum":
                jnp.ones((256, 16)) * 4.0,
        }
        out = model.sanitize(w)
        key = ("decoder.quantizer.rvq_first.vq.layers.0.codebook.embed.weight")
        assert key in out
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.full((256, 16), 2.0))

    def test_conv_layout_conversion(self, model):
        w = {
            "decoder.pre_conv.conv.weight": jnp.zeros((32, 16, 3)),  # (O,I,W)
            "decoder.upsample.0.0.conv.weight": jnp.zeros((32, 32, 4)),  # convT
            "encoder.anything.weight": jnp.zeros((4, 4)),
        }
        out = model.sanitize(w)
        assert out["decoder.pre_conv.conv.weight"].shape == (3, 16, 32)
        assert out["decoder.upsample.0.0.conv.weight"].shape == (4, 32, 32)
        assert "encoder.anything.weight" not in out


class TestPreTransformerCode2WavParity:
    """Codec pre_transformer vs transformers Qwen3OmniMoeCode2WavTransformerModel.

    Qwen3-TTS's tokenizer decoder trunk is the Qwen3-Omni Code2Wav
    transformer (identical layer naming: self_attn.{q,k,v,o}_proj,
    gate/up/down MLP, layer scales, final RMS norm, all-sliding-window
    attention) — the HF torch module is the oracle for the sliding-window
    mask + RoPE + layer-scale arithmetic.
    """

    def test_sliding_window_trunk_matches(self):
        torch = pytest.importorskip("torch")
        from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe \
            import Qwen3OmniMoeCode2WavConfig
        from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe \
            import Qwen3OmniMoeCode2WavTransformerModel

        from mlx_audio_tpu.tts.models.qwen3_tts.config import (
            Qwen3TTSTokenizerDecoderConfig,
        )
        from mlx_audio_tpu.tts.models.qwen3_tts.speech_tokenizer import (
            init_pre_transformer, pre_transformer_forward,
        )
        from mlx_audio_tpu.utils import unflatten

        H, NH, HD, LAYERS, WIN = 32, 4, 8, 2, 8
        hf_cfg = Qwen3OmniMoeCode2WavConfig(
            hidden_size=H, num_attention_heads=NH, num_key_value_heads=NH,
            intermediate_size=64, num_hidden_layers=LAYERS,
            sliding_window=WIN, codebook_size=32, num_quantizers=4,
            decoder_dim=16)
        torch.manual_seed(0)
        hf = Qwen3OmniMoeCode2WavTransformerModel(hf_cfg).eval()

        cfg = Qwen3TTSTokenizerDecoderConfig(
            latent_dim=H, hidden_size=H, num_attention_heads=NH,
            num_key_value_heads=NH, head_dim=HD, intermediate_size=64,
            num_hidden_layers=LAYERS, sliding_window=WIN)
        import jax

        params = init_pre_transformer(jax.random.PRNGKey(0), cfg)
        flat = {k: jnp.asarray(v.detach().numpy())
                for k, v in hf.state_dict().items()}
        mapped = unflatten(flat)
        params["layers"] = mapped["layers"]
        params["norm"] = mapped["norm"]
        eye = jnp.eye(H, dtype=jnp.float32)
        for proj in ("input_proj", "output_proj"):
            params[proj]["weight"] = eye
            if "bias" in params[proj]:
                params[proj]["bias"] = jnp.zeros((H,), jnp.float32)

        rs = np.random.RandomState(0)
        # T > sliding window so the mask actually truncates history
        x = rs.randn(1, 3 * WIN + 5, H).astype(np.float32)
        with torch.no_grad():
            ref = hf(inputs_embeds=torch.from_numpy(x)
                     ).last_hidden_state.numpy()
        got, _ = pre_transformer_forward(params, cfg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref,
                                   atol=5e-4, rtol=5e-3)


class TestKwargsParity:
    """Reference generate surface :1138-1272: lang_code alias,
    split_pattern segmentation, speed accepted."""

    def test_split_pattern_segments(self, model):
        class Tok:
            def encode(self, t):
                return [ord(c) % 400 + 10 for c in t][:32]

        model.tokenizer = Tok()
        try:
            outs = list(model.generate(text="one\ntwo", lang_code="auto",
                                       speed=1.0, temperature=0.0,
                                       max_tokens=12, seed=0))
        finally:
            model.tokenizer = None
        assert {r.segment_idx for r in outs} == {0, 1}
        for r in outs:
            assert np.isfinite(np.asarray(r.audio)).all()


class TestLateEosTail:
    def test_late_eos_partial_block_not_truncated(self, model, monkeypatch):
        """EOS can flush a partial codec block on ANY chunk (device:
        flush = all_fin | final). Regression: the host fetch slice used the
        floor block bound on non-final chunks, silently dropping up to
        BLOCK-1 tail frames when EOS landed on a block-unaligned pending
        count (here: EOS as the 25th step of the 2nd stream chunk ->
        device flushes 25 frames, floor bound fetched only 24)."""
        from mlx_audio_tpu.tts.models.qwen3_tts import qwen3_tts as q

        K = 33  # prefill frame + 8 (first chunk) + 24 valid of the 25-chunk
        G = model.tcfg.num_code_groups

        def fake_make(temperature, top_k, top_p, repetition_penalty, tb):
            def ar_chunk(params, gen, trailing, trailing_len, pad_embed,
                         n_steps):
                c = gen.n_generated[0]
                steps = jnp.arange(q.CHUNK_TOKENS, dtype=jnp.int32)
                active = ((steps < n_steps) & ((c + steps) < K)
                          & ~gen.finished[0])
                vals = ((c + steps) % 200 + 1).astype(jnp.int32)
                codes = jnp.where(active[:, None, None],
                                  jnp.broadcast_to(vals[:, None, None],
                                                   (q.CHUNK_TOKENS, 1, G)), 0)
                fin = ~active[:, None]
                n_new = jnp.sum(active).astype(jnp.int32)
                fired = (c + n_steps) > K  # the EOS step ran this chunk
                gen2 = gen._replace(
                    finished=gen.finished | fired,
                    n_generated=gen.n_generated + n_new)
                return gen2, codes, fin
            return ar_chunk

        monkeypatch.setattr(model, "_make_ar_chunk", fake_make)
        # unique temperature -> fresh stream-stepper cache entry that binds
        # the fake AR chunk (and doesn't poison other tests' cache)
        results = list(model.generate(text_ids=np.arange(10, 25)[None],
                                      temperature=0.1235, max_tokens=60,
                                      stream=True, streaming_interval=2.0,
                                      seed=0))
        model._jit_cache = {k: v for k, v in model._jit_cache.items()
                            if not (isinstance(k, tuple) and len(k) > 1
                                    and k[1] == 0.1235)}
        total = sum(r.samples for r in results)
        assert total == K * model.total_upsample, (
            f"expected {K} frames, got {total / model.total_upsample}")


class TestPrewarm:
    def test_prewarm_then_generate(self):
        """prewarm_async (zeros-weight clone on a background thread) must
        populate the same _jit_cache entries the real generate uses, and
        generate must join the thread and produce normal audio."""
        m = Model(tiny_cfg())
        m.prewarm_async(text_len=10, max_tokens=12, dtype=jnp.float32)
        m.init_and_bind()
        assert m._prewarm_thread is not None
        res = list(m.generate(text_ids=np.arange(100, 110)[None],
                              temperature=0.9, max_tokens=12, stream=True,
                              streaming_interval=0.5, seed=0))
        assert m._prewarm_thread is None          # joined
        total = sum(r.samples for r in res)
        assert total > 0
        for r in res:
            assert np.isfinite(np.asarray(r.audio)).all()

    def test_prewarm_covers_generate_programs(self):
        """After prewarm completes, the real generate with matching args
        must not add new top-level jit cache entries (the program set is
        covered)."""
        m = Model(tiny_cfg())
        m.init_and_bind()
        m.prewarm_async(text_len=10, max_tokens=12, dtype=jnp.float32)
        m._join_prewarm()
        keys_before = set(m._jit_cache)
        assert keys_before, "prewarm populated nothing"
        list(m.generate(text_ids=np.arange(100, 110)[None],
                        temperature=0.9, max_tokens=12, stream=True,
                        streaming_interval=0.5, seed=0))
        new = set(m._jit_cache) - keys_before
        assert not new, f"generate compiled programs prewarm missed: {new}"

    def test_prewarm_outcome_recorded(self):
        """Prewarm must report what it warmed (VERDICT r4 weak #4: a broken
        prewarm silently regressed cold start to 19 s with no signal)."""
        m = Model(tiny_cfg())
        m.init_and_bind()
        m.prewarm_async(text_len=10, max_tokens=12, dtype=jnp.float32)
        m._join_prewarm()
        out = m._prewarm_outcome
        assert out["ok"] is True and out["error"] is None
        assert out["n_programs"] > 0

    def test_prewarm_failure_recorded(self, monkeypatch):
        """A prewarm crash must land in the outcome, not vanish."""
        m = Model(tiny_cfg())
        m.init_and_bind()
        monkeypatch.setattr(
            Model, "generate",
            lambda self, **kw: (_ for _ in ()).throw(RuntimeError("boom")))
        m.prewarm_async(text_len=10, max_tokens=12, dtype=jnp.float32)
        m._prewarm_thread.join()
        out = m._prewarm_outcome
        assert out["ok"] is False
        assert "RuntimeError: boom" in out["error"]
