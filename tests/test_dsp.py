"""DSP parity tests against independent numpy/scipy references.

Pattern follows the reference's streaming-vs-batch / golden-value strategy
(SURVEY.md §4): every transform is checked against a straightforward numpy
implementation, not against the reference code.
"""

import numpy as np
import pytest

from mlx_audio_tpu import dsp


def _np_stft(x, n_fft, hop, window, center=True):
    if center:
        pad = n_fft // 2
        x = np.concatenate([x[1 : pad + 1][::-1], x, x[-(pad + 1) : -1][::-1]])
    num_frames = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] for i in range(num_frames)])
    return np.fft.rfft(frames * window)


class TestWindows:
    def test_hann_matches_numpy(self):
        got = np.asarray(dsp.hanning(64))
        np.testing.assert_allclose(got, np.hanning(64), atol=1e-6)

    def test_hamming_matches_numpy(self):
        got = np.asarray(dsp.hamming(64))
        np.testing.assert_allclose(got, np.hamming(64), atol=1e-6)

    def test_blackman_matches_numpy(self):
        got = np.asarray(dsp.blackman(64))
        np.testing.assert_allclose(got, np.blackman(64), atol=1e-6)

    def test_bartlett_matches_numpy(self):
        got = np.asarray(dsp.bartlett(65))
        np.testing.assert_allclose(got, np.bartlett(65), atol=1e-6)

    def test_periodic(self):
        w = np.asarray(dsp.hanning(64, periodic=True))
        np.testing.assert_allclose(w, np.hanning(65)[:-1], atol=1e-6)


class TestSTFT:
    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        x = rng.randn(4000).astype(np.float32)
        n_fft, hop = 400, 160
        w = np.hanning(400).astype(np.float32)
        ours = np.asarray(dsp.stft(x, n_fft=n_fft, hop_length=hop, window="hann"))
        ref = _np_stft(x.astype(np.float64), n_fft, hop, w)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_constant_pad(self):
        x = np.random.RandomState(1).randn(2000).astype(np.float32)
        out = dsp.stft(x, n_fft=256, hop_length=64, pad_mode="constant")
        assert out.shape[1] == 129

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            dsp.stft(np.zeros(16, np.float32), n_fft=256, center=False)


class TestISTFT:
    def test_roundtrip(self):
        rng = np.random.RandomState(2)
        x = rng.randn(4096).astype(np.float32)
        n_fft, hop = 512, 128
        w = dsp.hanning(n_fft)  # same (symmetric) analysis + synthesis window
        spec = dsp.stft(x, n_fft=n_fft, hop_length=hop, window=w)
        recon = np.asarray(
            dsp.istft(spec, hop_length=hop, win_length=n_fft, window=w,
                      normalized=True)
        )
        assert recon.shape == x.shape
        np.testing.assert_allclose(recon[256:-256], x[256:-256], atol=1e-3)

    def test_length_skips_center_trim(self):
        # reference behavior (dsp.py:489-494): an explicit `length` bypasses
        # the center trim, so the result starts at the padded origin.
        x = np.random.RandomState(11).randn(2048).astype(np.float32)
        w = dsp.hanning(256)
        spec = dsp.stft(x, n_fft=256, hop_length=64, window=w)
        full = np.asarray(
            dsp.istft(spec, hop_length=64, win_length=256, window=w,
                      length=1024, normalized=True)
        )
        assert full.shape == (1024,)
        np.testing.assert_allclose(full[128:1000], x[: 1000 - 128], atol=1e-3)

    def test_istft_cache_batched_roundtrip(self):
        rng = np.random.RandomState(3)
        x = rng.randn(2, 4096).astype(np.float32)
        n_fft, hop = 512, 128
        w = np.asarray(dsp.hanning(n_fft))
        spec = np.asarray(dsp.stft(x, n_fft=n_fft, hop_length=hop, window=w))
        cache = dsp.ISTFTCache()
        out = np.asarray(
            cache.istft(
                np.ascontiguousarray(spec.real.transpose(0, 2, 1)),
                np.ascontiguousarray(spec.imag.transpose(0, 2, 1)),
                n_fft=n_fft, hop_length=hop, win_length=n_fft,
                window=w, center=True, audio_length=x.shape[1],
            )
        )
        assert out.shape == x.shape
        np.testing.assert_allclose(out[:, 256:-256], x[:, 256:-256], atol=1e-3)


class TestOverlapAdd:
    def test_matches_loop(self):
        rng = np.random.RandomState(4)
        frames = rng.randn(7, 64).astype(np.float32)
        hop = 16
        ours = np.asarray(dsp.overlap_add(frames, hop, 64))
        ref = np.zeros(6 * hop + 64)
        for i in range(7):
            ref[i * hop : i * hop + 64] += frames[i]
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestMelFilters:
    def test_htk_vs_librosa_formula(self):
        fb = np.asarray(dsp.mel_filters(16000, 400, 80))
        assert fb.shape == (80, 201)
        assert fb.min() >= 0
        # every FFT bin between the first and last filter peak is covered
        coverage = fb.sum(axis=0)
        assert (coverage[5:190] > 0).all()

    def test_slaney_norm(self):
        fb = np.asarray(dsp.mel_filters(16000, 400, 80, norm="slaney", mel_scale="slaney"))
        # slaney-normalized filters have area ~ 2/bandwidth -> peaks well below 1
        assert fb.max() < 0.1

    def test_precise_close_to_fast(self):
        fast = np.asarray(dsp.mel_filters(16000, 512, 80))
        precise = np.asarray(dsp.mel_filters(16000, 512, 80, precise=True))
        np.testing.assert_allclose(fast, precise, atol=1e-4)


class TestLogMel:
    def test_whisper_shape_and_range(self):
        rng = np.random.RandomState(5)
        x = rng.randn(16000).astype(np.float32) * 0.1
        mel = np.asarray(dsp.log_mel_spectrogram(x, n_fft=400, hop_length=160, n_mels=80))
        assert mel.shape == (101, 80)
        # whisper normalization maps into ~[-1, 1+eps]
        assert mel.max() <= 2.0 and mel.min() >= -2.0

    def test_matches_numpy_pipeline(self):
        rng = np.random.RandomState(6)
        x = rng.randn(8000).astype(np.float32) * 0.2
        mel = np.asarray(
            dsp.log_mel_spectrogram(x, n_fft=400, hop_length=160, n_mels=80)
        )
        # independent numpy pipeline
        w = np.hanning(401)[:-1]
        spec = _np_stft(x.astype(np.float64), 400, 160, w)
        power = np.abs(spec) ** 2
        fb = np.asarray(dsp.mel_filters(16000, 400, 80)).astype(np.float64)
        m = power @ fb.T
        logspec = np.log10(np.maximum(m, 1e-10))
        logspec = np.maximum(logspec, logspec.max() - 8.0)
        ref = (logspec + 4.0) / 4.0
        np.testing.assert_allclose(mel, ref, atol=2e-3)


class TestLoudness:
    def test_sine_loudness(self):
        rate = 48000
        t = np.arange(rate * 2) / rate
        x = (0.1 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float64)
        lufs = dsp.integrated_loudness(x, rate)
        # 0.1 amplitude sine at ~1 kHz is about -23 LUFS under K-weighting
        assert -26 < lufs < -20

    def test_normalize_loudness_gain(self):
        x = np.ones(100) * 0.1
        out = dsp.normalize_loudness(x, -30.0, -24.0)
        np.testing.assert_allclose(out, x * 10 ** (6 / 20), atol=1e-9)

    def test_normalize_peak(self):
        x = np.sin(np.linspace(0, 10, 1000)) * 0.25
        out = dsp.normalize_peak(x, -6.0)
        np.testing.assert_allclose(np.max(np.abs(out)), 10 ** (-6 / 20), atol=1e-9)


class TestLfilter:
    def test_matches_scipy(self):
        from scipy.signal import lfilter as sp

        rng = np.random.RandomState(7)
        x = rng.randn(500)
        b = np.array([0.2, 0.3, 0.1])
        a = np.array([1.0, -0.5, 0.25])
        np.testing.assert_allclose(dsp.lfilter(b, a, x), sp(b, a, x), atol=1e-10)


class TestKaldi:
    def test_deltas_match_loop(self):
        rng = np.random.RandomState(8)
        spec = rng.randn(3, 10, 50).astype(np.float32)
        got = np.asarray(dsp.compute_deltas_kaldi(spec, win_length=5))
        n = 2
        denom = n * (n + 1) * (2 * n + 1) / 3.0
        flat = spec.reshape(-1, 50)
        padded = np.pad(flat, [(0, 0), (n, n)], mode="edge")
        kernel = np.arange(-n, n + 1)
        ref = np.stack(
            [
                np.sum(padded[:, i : i + 5] * kernel, axis=1) / denom
                for i in range(50)
            ],
            axis=1,
        ).reshape(spec.shape)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_mel_scale_roundtrip(self):
        f = np.array([100.0, 1000.0, 8000.0])
        back = np.asarray(dsp.inverse_mel_scale_kaldi(dsp.mel_scale_kaldi(f)))
        np.testing.assert_allclose(back, f, rtol=1e-5)

    def test_fbank_shape(self):
        rng = np.random.RandomState(9)
        x = rng.randn(48000).astype(np.float32) * 0.1
        feats = np.asarray(
            dsp.compute_fbank_kaldi(x, sample_rate=48000, win_len=1920, win_inc=384,
                                    num_mels=60, dither=0.0)
        )
        assert feats.shape == (1 + (48000 - 1920) // 384, 60)
        assert np.isfinite(feats).all()

    def test_fbank_snip_edges_false(self):
        x = np.random.RandomState(10).randn(16000).astype(np.float32)
        feats = np.asarray(
            dsp.compute_fbank_kaldi(x, sample_rate=16000, win_len=400, win_inc=160,
                                    num_mels=40, dither=0.0, snip_edges=False)
        )
        assert feats.shape[0] == (16000 + 80) // 160
