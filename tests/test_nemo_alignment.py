"""nemo alignment utilities + parakeet chunked long-audio decode."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.nemo import (
    AlignedToken,
    merge_longest_common_subsequence,
    merge_longest_contiguous,
    sentences_to_result,
    tokens_to_sentences,
)


def _tok(i, text, start, dur=0.1):
    return AlignedToken(id=i, text=text, start=start, duration=dur)


class TestSentences:
    def test_split_on_punctuation(self):
        toks = [_tok(0, "Hi", 0.0), _tok(1, "!", 0.1),
                _tok(2, " Bye", 0.2), _tok(3, ".", 0.3)]
        sents = tokens_to_sentences(toks)
        assert len(sents) == 2
        assert sents[0].text == "Hi!"
        assert sents[1].text == " Bye."
        assert sents[0].start == 0.0 and sents[0].end == pytest.approx(0.2)

    def test_period_mid_word_does_not_split(self):
        # '3.5' style: '.' not followed by a space-leading token
        toks = [_tok(0, "3", 0.0), _tok(1, ".", 0.1), _tok(2, "5", 0.2)]
        assert len(tokens_to_sentences(toks)) == 1

    def test_result_text(self):
        toks = [_tok(0, " a", 0.0), _tok(1, ".", 0.1)]
        res = sentences_to_result(tokens_to_sentences(toks))
        assert res.text == "a."


def _stream(ids, t0, spf=0.1):
    return [_tok(i, chr(97 + i % 26), t0 + k * spf) for k, i in enumerate(ids)]


class TestMerge:
    def test_disjoint_concatenates(self):
        a = _stream([1, 2, 3], 0.0)
        b = _stream([4, 5], 1.0)
        for merge in (merge_longest_contiguous,
                      merge_longest_common_subsequence):
            out = merge(a, b, overlap_duration=0.5)
            assert [t.id for t in out] == [1, 2, 3, 4, 5]

    def test_overlap_dedup(self):
        # a covers [0, 0.8); b re-decodes [0.4, 1.2) with identical tokens
        a = _stream([1, 2, 3, 4, 5, 6, 7, 8], 0.0)
        b = _stream([5, 6, 7, 8, 9, 10, 11, 12], 0.4)
        for merge in (merge_longest_contiguous,
                      merge_longest_common_subsequence):
            out = merge(a, b, overlap_duration=0.4)
            assert [t.id for t in out] == list(range(1, 13))

    def test_lcs_with_disagreement(self):
        # b's overlap decode drops one token; LCS still aligns the rest
        a = _stream([1, 2, 3, 4, 5, 6], 0.0)
        b = [_tok(3, "c", 0.2), _tok(5, "e", 0.4), _tok(6, "f", 0.5),
             _tok(7, "g", 0.6), _tok(8, "h", 0.7)]
        out = merge_longest_common_subsequence(a, b, overlap_duration=0.4)
        ids = [t.id for t in out]
        assert ids[-2:] == [7, 8]
        assert ids == sorted(ids)

    def test_empty_sides(self):
        a = _stream([1], 0.0)
        assert merge_longest_contiguous(a, [], overlap_duration=1.0) == a
        assert merge_longest_contiguous([], a, overlap_duration=1.0) == a


class TestParakeetChunked:
    def test_chunked_matches_single_shape(self):
        from mlx_audio_tpu.stt.models.parakeet import Model, ModelConfig

        m = Model(ModelConfig(
            decoding="tdt",
            encoder=dict(feat_in=80, n_layers=2, d_model=64, n_heads=4,
                         ff_expansion_factor=2, subsampling_factor=4,
                         conv_kernel_size=9, subsampling_conv_channels=16),
            prediction=dict(pred_hidden=32, pred_rnn_layers=1),
            joint=dict(joint_hidden=32, num_classes=46),
            vocab_size=40, durations=[0, 1, 2, 3, 4],
            vocabulary=[chr(97 + i % 26) for i in range(40)],
        )).init_and_bind()
        audio = np.random.RandomState(0).randn(48000).astype(np.float32) * 0.1
        calls = []
        out = m.generate(audio, chunk_duration=1.5, overlap_duration=0.5,
                         chunk_callback=lambda cur, tot: calls.append((cur, tot)))
        assert isinstance(out.text, str)
        assert calls and calls[-1][0] == calls[-1][1] == 48000
        for seg in out.segments:
            assert seg["end"] >= seg["start"] >= 0
