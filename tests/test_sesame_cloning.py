"""Sesame/CSM reference-parity surface: ref_audio cloning, voice_match
prompt merging, split_pattern segmentation, streaming via causal Mimi."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.sesame import Model, ModelConfig
from mlx_audio_tpu.tts.models.sesame.sesame import Segment


class FakeTok:
    def encode(self, text):
        return [ord(c) % 100 + 3 for c in text][:64]


def _tiny_mimi():
    from mlx_audio_tpu.codec.models.mimi import Mimi, MimiConfig

    cfg = MimiConfig(
        seanet=dict(dimension=32, channels=1, causal=True, nfilters=4,
                    nresidual_layers=1, ratios=[4, 3], ksize=7,
                    residual_ksize=3, last_ksize=3, dilation_base=2,
                    pad_mode="constant", true_skip=True, compress=2),
        transformer=dict(d_model=32, num_heads=4, num_layers=2,
                         layer_scale=0.01, context=16,
                         dim_feedforward=64),
        quantizer_nq=4, quantizer_bins=40, quantizer_dim=16,
        sample_rate=24000, frame_rate=1000.0)
    return Mimi(cfg).init_and_bind()


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        text_vocab_size=128, audio_vocab_size=40, audio_num_codebooks=4,
        backbone_config=dict(hidden_size=32, num_hidden_layers=2,
                             intermediate_size=64, num_attention_heads=4,
                             num_key_value_heads=2, head_dim=8),
        depth_decoder_config=dict(hidden_size=24, num_hidden_layers=1,
                                  intermediate_size=48,
                                  num_attention_heads=4,
                                  num_key_value_heads=2, head_dim=8))
    m = Model(cfg).init_and_bind()
    m.tokenizer = FakeTok()
    m._mimi = _tiny_mimi()
    return m


REF_AUDIO = np.random.RandomState(0).randn(24 * 50).astype(np.float32) * 0.1


class TestPromptAssembly:
    def test_segment_rows_order(self, model):
        """text rows then audio rows (+EOS frame) — reference
        _tokenize_segment sesame.py:563-579."""
        seg = Segment(speaker=0, text="hi", audio=REF_AUDIO)
        rows, mask = model._segment_rows(seg, add_eos=True)
        n_text = len(model._tokenize_text_segment("hi", 0))
        assert mask[:n_text, -1].all() and not mask[:n_text, :-1].any()
        assert mask[n_text:, :-1].all() and not mask[n_text:, -1].any()
        # EOS frame is all-zero codes
        assert (rows[-1, :-1] == 0).all()

    def test_voice_match_skips_eos(self, model):
        seg = Segment(speaker=0, text="hi", audio=REF_AUDIO)
        with_eos, _ = model._segment_rows(seg, add_eos=True)
        without, _ = model._segment_rows(seg, add_eos=False)
        assert len(with_eos) == len(without) + 1

    def test_default_voice_prompt_missing(self, model):
        with pytest.raises(ValueError, match="voice preset"):
            model.default_speaker_prompt("conversational_a")

    def test_default_voice_prompt_local(self, model, tmp_path):
        from mlx_audio_tpu.audio_io import write as wav_write

        prompts = tmp_path / "prompts"
        prompts.mkdir()
        wav_write(str(prompts / "zoe.wav"), REF_AUDIO, 24000)
        (prompts / "zoe.txt").write_text("a preset transcript")
        old = model.config.model_path
        model.config.model_path = str(tmp_path)
        try:
            ctx = model.default_speaker_prompt("zoe")
        finally:
            model.config.model_path = old
        assert len(ctx) == 1 and ctx[0].text == "a preset transcript"
        assert ctx[0].audio is not None and len(ctx[0].audio) > 0


class TestCloning:
    def test_ref_audio_generate(self, model):
        outs = list(model.generate(
            "hello there", ref_audio=REF_AUDIO, ref_text="a reference",
            temperature=0.0, max_audio_length_ms=1600, voice_match=True))
        assert len(outs) == 1
        assert outs[0].samples > 0
        assert np.isfinite(np.asarray(outs[0].audio)).all()

    def test_voice_match_changes_prompt(self, model):
        """voice_match merges ref text + prompt over the ref audio, so the
        generation differs from the unmatched (separate-segments) prompt."""
        a = list(model.generate("same words", ref_audio=REF_AUDIO,
                                ref_text="ref", temperature=0.0,
                                max_audio_length_ms=1600, voice_match=True))
        b = list(model.generate("same words", ref_audio=REF_AUDIO,
                                ref_text="ref", temperature=0.0,
                                max_audio_length_ms=1600, voice_match=False))
        ca = a[0].prompt["codes"]
        cb = b[0].prompt["codes"]
        assert ca.shape != cb.shape or not np.array_equal(ca, cb)

    def test_split_pattern_segments(self, model):
        outs = list(model.generate("one\ntwo", temperature=0.0,
                                   max_audio_length_ms=800,
                                   voice_match=False))
        assert {r.segment_idx for r in outs} == {0, 1}


class TestStreaming:
    def test_stream_equals_offline(self, model):
        """Mimi's decoder is fully causal, so streamed chunks concatenated
        must equal the offline decode bit-for-bit."""
        off = list(model.generate("stream me please", temperature=0.0,
                                  max_audio_length_ms=2400,
                                  voice_match=False, seed=7))
        st = list(model.generate("stream me please", temperature=0.0,
                                 max_audio_length_ms=2400,
                                 voice_match=False, seed=7, stream=True,
                                 streaming_interval=0.2))
        assert len(st) >= 1
        offline_audio = np.asarray(off[0].audio)
        stream_audio = np.concatenate([np.asarray(r.audio) for r in st])
        n = min(len(offline_audio), len(stream_audio))
        assert n > 0
        np.testing.assert_allclose(stream_audio[:n], offline_audio[:n],
                                   atol=1e-4)
        # every interval chunk is flagged as streaming; a trailing partial
        # chunk (when generation doesn't end on an interval boundary) is
        # flagged final — same contract as the reference's generate :858-865
        assert all(r.is_streaming_chunk or r.is_final_chunk for r in st)
