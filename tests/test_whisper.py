"""Whisper tiny-config tests: encoder shapes, decode rules, windowed generate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
from mlx_audio_tpu.stt.models.whisper.decoding import (
    DecodingOptions,
    DecodingTask,
)

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=100, n_audio_state=32, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=64, n_text_state=32,
    n_text_head=2, n_text_layer=2)


@pytest.fixture(scope="module")
def model():
    return Model(DIMS).init_and_bind()


@pytest.fixture(scope="module")
def mel(model):
    return np.random.RandomState(0).randn(1, 200, 80).astype(np.float32) * 0.1


class TestEncoder:
    def test_shapes(self, model, mel):
        feats = model.embed_audio(mel)
        assert feats.shape == (1, 100, 32)
        assert np.isfinite(np.asarray(feats)).all()

    def test_language_detection_distribution(self, model, mel):
        lang, probs = model.detect_language(mel)
        assert lang in probs
        assert abs(sum(probs.values()) - 1.0) < 1e-3


class TestDecodingTask:
    def test_timestamp_rules_enforced(self, model, mel):
        task = DecodingTask(model, DecodingOptions(language="en",
                                                   sample_len=16))
        res = task.run(mel, [], temperature=0.0)
        tok = task.tokenizer
        assert len(res.tokens) > 0
        # first sampled token must be a timestamp
        assert res.tokens[0] >= tok.timestamp_begin
        # a timestamp pair is always followed by text or another pair start
        for a, b, c in zip(res.tokens, res.tokens[1:], res.tokens[2:]):
            if a >= tok.timestamp_begin and b >= tok.timestamp_begin:
                assert c < tok.timestamp_begin  # no triple timestamps
        # non-decreasing timestamps
        ts = [t for t in res.tokens if t >= tok.timestamp_begin]
        assert ts == sorted(ts)

    def test_without_timestamps(self, model, mel):
        task = DecodingTask(model, DecodingOptions(
            language="en", without_timestamps=True, sample_len=16))
        res = task.run(mel, [], temperature=0.0)
        tok = task.tokenizer
        assert all(t < tok.timestamp_begin for t in res.tokens)

    def test_greedy_deterministic(self, model, mel):
        task = DecodingTask(model, DecodingOptions(language="en",
                                                   sample_len=12))
        r1 = task.run(mel, [], temperature=0.0)
        r2 = task.run(mel, [], temperature=0.0)
        assert r1.tokens == r2.tokens

    def test_suppressed_tokens_never_sampled(self, model, mel):
        task = DecodingTask(model, DecodingOptions(language="en",
                                                   sample_len=16))
        res = task.run(mel, [], temperature=1.0)
        tok = task.tokenizer
        banned = set(task.suppress) | {tok.no_timestamps, tok.sot}
        assert not (set(res.tokens) & banned)

    def test_prompt_bucketing_consistent(self, model, mel):
        """Different prompt lengths within one bucket give valid decodes."""
        task = DecodingTask(model, DecodingOptions(language="en",
                                                   sample_len=8))
        for plen in (0, 2, 5):
            res = task.run(mel, list(range(100, 100 + plen)), temperature=0.0)
            assert len(res.tokens) > 0


class TestGenerate:
    def test_windowed_transcription(self, model):
        audio = (np.random.RandomState(1).randn(80000) * 0.05).astype(np.float32)
        out = model.generate(audio, language="en", temperature=0.0,
                             sample_len=8)
        assert out.language == "en"
        assert isinstance(out.text, str)
        assert len(out.segments) > 0
        for seg in out.segments:
            assert seg["end"] >= seg["start"] >= 0
        assert out.generation_tokens > 0

    def test_hf_config_mapping(self):
        dims = ModelDimensions.from_dict({
            "d_model": 384, "encoder_layers": 4, "decoder_layers": 4,
            "encoder_attention_heads": 6, "decoder_attention_heads": 6,
            "num_mel_bins": 80, "vocab_size": 51865,
            "max_source_positions": 1500, "max_target_positions": 448})
        assert dims.n_audio_state == 384
        assert dims.n_audio_ctx == 1500

    def test_sanitize_hf_keys(self, model):
        w = {
            "model.encoder.layers.0.self_attn.q_proj.weight": jnp.zeros((4, 4)),
            "model.decoder.layers.1.encoder_attn.k_proj.weight": jnp.zeros((4, 4)),
            "model.decoder.embed_tokens.weight": jnp.zeros((10, 4)),
            "model.encoder.conv1.weight": jnp.zeros((8, 4, 3)),
            "proj_out.weight": jnp.zeros((10, 4)),
        }
        out = model.sanitize(w)
        assert "encoder.blocks.0.attn.query.weight" in out
        assert "decoder.blocks.1.cross_attn.key.weight" in out
        assert "decoder.token_embedding.weight" in out
        assert out["encoder.conv1.weight"].shape == (3, 4, 8)
        assert "proj_out.weight" not in out


class TestBeamSearch:
    def test_beam1_matches_greedy(self, model, mel):
        g = DecodingTask(model, DecodingOptions(language="en",
                                                sample_len=10))
        b = DecodingTask(model, DecodingOptions(language="en", sample_len=10,
                                                beam_size=1))
        rg = g.run(mel, prompt=[], temperature=0.0)
        rb = b.run(mel, prompt=[], temperature=0.0)
        assert rb.tokens == rg.tokens

    def test_beam5_never_worse_than_greedy(self, model, mel):
        g = DecodingTask(model, DecodingOptions(language="en",
                                                sample_len=10))
        b = DecodingTask(model, DecodingOptions(language="en", sample_len=10,
                                                beam_size=5))
        rg = g.run(mel, prompt=[], temperature=0.0)
        rb = b.run(mel, prompt=[], temperature=0.0)
        # beam explores a superset of greedy's path: total logprob of the
        # returned beam must be >= the greedy sequence's
        lp_g = rg.avg_logprob * (len(rg.tokens) + 1)
        lp_b = rb.avg_logprob * (len(rb.tokens) + 1)
        assert lp_b >= lp_g - 1e-3
        assert len(rb.tokens) >= 1

    def test_beam_deterministic(self, model, mel):
        b = DecodingTask(model, DecodingOptions(language="en", sample_len=8,
                                                beam_size=3))
        r1 = b.run(mel, prompt=[], temperature=0.0)
        r2 = b.run(mel, prompt=[], temperature=0.0)
        assert r1.tokens == r2.tokens

    def test_best_of_sampling(self, model, mel):
        b = DecodingTask(model, DecodingOptions(language="en", sample_len=8,
                                                best_of=3, temperature=0.7))
        r = b.run(mel, prompt=[], temperature=0.7)
        assert isinstance(r.tokens, list)
        assert np.isfinite(r.avg_logprob)

    def test_option_validation(self, model):
        with pytest.raises(ValueError):
            DecodingTask(model, DecodingOptions(beam_size=3, best_of=3))
        with pytest.raises(ValueError):
            DecodingTask(model, DecodingOptions(best_of=3, temperature=0.0))
        with pytest.raises(ValueError):
            DecodingTask(model, DecodingOptions(patience=2.0))


class TestClipTimestamps:
    def test_clip_restricts_window(self, model):
        """clip_timestamps "a,b" transcribes only [a, b] seconds
        (reference whisper.py:915-931)."""
        audio = (np.random.RandomState(2).randn(16000 * 8) * 0.05
                 ).astype(np.float32)
        full = model.generate(audio, language="en", temperature=0.0,
                              sample_len=8)
        clipped = model.generate(audio, language="en", temperature=0.0,
                                 sample_len=8, clip_timestamps="2,5")
        assert len(clipped.segments) >= 1
        assert all(seg["start"] >= 2.0 - 1e-6 for seg in clipped.segments)
        # both parse; the clip runs over fewer frames
        assert clipped.generation_tokens <= full.generation_tokens * 2

    def test_multiple_clips(self, model):
        audio = (np.random.RandomState(3).randn(16000 * 8) * 0.05
                 ).astype(np.float32)
        out = model.generate(audio, language="en", temperature=0.0,
                             sample_len=8, clip_timestamps=[0.0, 2.0, 5.0])
        assert isinstance(out.text, str)
        # second clip is [5, end]: no segment starts in the (2, 5) gap
        assert all(not (2.5 < seg["start"] < 4.9) for seg in out.segments)

    def test_hallucination_threshold_accepted(self, model):
        audio = (np.random.RandomState(4).randn(16000 * 4) * 0.05
                 ).astype(np.float32)
        out = model.generate(audio, language="en", temperature=0.0,
                             sample_len=8, word_timestamps=True,
                             hallucination_silence_threshold=2.0)
        assert isinstance(out.text, str)
