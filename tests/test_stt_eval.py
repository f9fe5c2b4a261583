"""STT WER eval harness: scoring math, normalization, runner artifacts."""

import json

import numpy as np
import pytest

from mlx_audio_tpu.stt.eval import (STTEvalSample, aggregate_wer,
                                    compute_wer, iter_samples_from_manifest,
                                    normalize_for_wer,
                                    parse_seed_tts_meta_line,
                                    run_stt_wer_eval)


class TestComputeWer:
    def test_exact_match(self):
        r = compute_wer("the cat sat", "the cat sat")
        assert r.wer == 0.0 and r.edits == 0
        assert r.reference_tokens == 3 and r.hypothesis_tokens == 3

    def test_substitution(self):
        r = compute_wer("the cat sat", "the dog sat")
        assert (r.substitutions, r.deletions, r.insertions) == (1, 0, 0)
        assert r.wer == pytest.approx(1 / 3)

    def test_deletion_and_insertion(self):
        r = compute_wer("a b c", "a c")
        assert (r.substitutions, r.deletions, r.insertions) == (0, 1, 0)
        r = compute_wer("a c", "a b c")
        assert (r.substitutions, r.deletions, r.insertions) == (0, 0, 1)

    def test_empty_reference(self):
        assert compute_wer("", "").wer == 0.0
        r = compute_wer("", "hello world")
        assert r.wer == 1.0 and r.insertions == 2

    def test_empty_hypothesis(self):
        r = compute_wer("hello world", "")
        assert r.wer == 1.0 and r.deletions == 2

    def test_tie_break_prefers_substitution_over_ins_del(self):
        # "a" -> "b" can be 1 sub or 1 del + 1 ins; sub must win.
        r = compute_wer("a", "b")
        assert (r.substitutions, r.deletions, r.insertions) == (1, 0, 0)

    def test_matches_random_levenshtein(self):
        """Edit count == plain Levenshtein distance on random token seqs."""
        rng = np.random.RandomState(0)
        for _ in range(20):
            ref = [str(t) for t in rng.randint(0, 5, rng.randint(0, 10))]
            hyp = [str(t) for t in rng.randint(0, 5, rng.randint(0, 10))]
            # reference Levenshtein
            n, m = len(ref), len(hyp)
            dp = np.zeros((n + 1, m + 1), np.int64)
            dp[:, 0] = np.arange(n + 1)
            dp[0, :] = np.arange(m + 1)
            for i in range(1, n + 1):
                for j in range(1, m + 1):
                    dp[i, j] = min(
                        dp[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]),
                        dp[i - 1, j] + 1, dp[i, j - 1] + 1)
            assert compute_wer(ref, hyp).edits == dp[n, m]

    def test_aggregate(self):
        rs = [compute_wer("a b", "a b"), compute_wer("a b", "x b")]
        agg = aggregate_wer(rs)
        assert agg["wer_micro"] == pytest.approx(0.25)
        assert agg["wer_macro"] == pytest.approx(0.25)
        assert agg["total_edits"] == 1
        assert agg["total_reference_tokens"] == 4


class TestNormalize:
    def test_punctuation_and_case(self):
        assert normalize_for_wer("Hello, World!") == "hello world"

    def test_keeps_contractions(self):
        assert normalize_for_wer("Don’t stop.") == "don't stop"

    def test_collapses_whitespace(self):
        assert normalize_for_wer("  a \t b\nc ") == "a b c"

    def test_empty(self):
        assert normalize_for_wer("") == ""


class TestSeedTtsMeta:
    def test_four_field_line(self):
        e = parse_seed_tts_meta_line("utt1|prompt|p.wav|target text")
        assert e["utt_id"] == "utt1"
        assert e["target_wav"] == "en/wavs/utt1.wav"

    def test_five_field_line_and_wav_suffix(self):
        e = parse_seed_tts_meta_line("u2.wav|p|p.wav|t|en/wavs/custom.wav")
        assert e["utt_id"] == "u2"
        assert e["target_wav"] == "en/wavs/custom.wav"

    def test_blank_returns_none(self):
        assert parse_seed_tts_meta_line("  \n") is None


class _EchoModel:
    """Fake STT model returning canned text per file stem."""

    def __init__(self, table):
        self.table = table

    def generate(self, audio, language=None):
        from pathlib import Path
        return self.table[Path(audio).stem]


def _write_wav(path, seconds=0.5, sr=16000):
    from mlx_audio_tpu.audio_io import write
    t = np.zeros(int(seconds * sr), np.float32)
    write(str(path), t, sr)


class TestRunner:
    def test_end_to_end_artifacts(self, tmp_path):
        wavs = tmp_path / "wavs"
        wavs.mkdir()
        _write_wav(wavs / "u1.wav")
        _write_wav(wavs / "u2.wav")
        samples = [
            STTEvalSample("u1", wavs / "u1.wav", "the cat sat"),
            STTEvalSample("u2", wavs / "u2.wav", "hello world"),
        ]
        model = _EchoModel({"u1": "The cat sat!", "u2": "hello word"})
        out = tmp_path / "out"
        summary = run_stt_wer_eval(model, samples, out,
                                   dataset_name="unit-test")
        assert summary["num_samples"] == 2
        assert summary["wer_micro"] == pytest.approx(1 / 5)
        assert summary["rtf"] is not None
        preds = [json.loads(l) for l in
                 (out / "predictions.jsonl").read_text().splitlines()]
        assert preds[0]["hypothesis_normalized"] == "the cat sat"
        assert (out / "summary.json").exists()
        assert "WER micro" in (out / "summary.txt").read_text()

    def test_skip_existing_resumes(self, tmp_path):
        wavs = tmp_path / "wavs"
        wavs.mkdir()
        _write_wav(wavs / "u1.wav")
        _write_wav(wavs / "u2.wav")
        samples = [STTEvalSample("u1", wavs / "u1.wav", "a"),
                   STTEvalSample("u2", wavs / "u2.wav", "b")]
        out = tmp_path / "out"
        run_stt_wer_eval(_EchoModel({"u1": "a", "u2": "b"}), samples[:1],
                         out, dataset_name="t")

        class Boom:
            def generate(self, audio, language=None):
                from pathlib import Path
                if Path(audio).stem == "u1":
                    raise AssertionError("should have been skipped")
                return "b"

        summary = run_stt_wer_eval(Boom(), samples, out, dataset_name="t",
                                   skip_existing=True)
        assert summary["num_samples"] == 2 and summary["num_skipped"] == 1
        assert summary["wer_micro"] == 0.0

    def test_manifest_loader(self, tmp_path):
        wavs = tmp_path
        _write_wav(wavs / "x.wav")
        man = tmp_path / "data.jsonl"
        man.write_text(json.dumps(
            {"id": "x", "audio": "x.wav", "text": "hi", "extra": 1}) + "\n")
        got = list(iter_samples_from_manifest(man))
        assert len(got) == 1
        assert got[0].utt_id == "x"
        assert got[0].audio_path == wavs / "x.wav"
        assert got[0].metadata == {"extra": 1}

    def test_unsupported_metric_raises(self, tmp_path):
        with pytest.raises(ValueError, match="unsupported metric"):
            run_stt_wer_eval(_EchoModel({}), [], tmp_path,
                             dataset_name="t", metrics=["bleu"])
