"""Native WAV codec round-trip tests (no miniaudio/ffmpeg required)."""

import io

import numpy as np
import pytest

from mlx_audio_tpu import audio_io


class TestWavRoundtrip:
    def test_mono_float_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        x = (rng.randn(8000) * 0.3).clip(-1, 1).astype(np.float32)
        p = tmp_path / "a.wav"
        audio_io.write(p, x, 16000)
        y, rate = audio_io.read(p, dtype="float32")
        assert rate == 16000
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=1.0 / 32000)

    def test_stereo_roundtrip(self, tmp_path):
        rng = np.random.RandomState(1)
        x = (rng.randn(4000, 2) * 0.2).clip(-1, 1).astype(np.float32)
        p = tmp_path / "s.wav"
        audio_io.write(p, x, 44100)
        y, rate = audio_io.read(p, dtype="float32")
        assert rate == 44100
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=1.0 / 32000)

    def test_bytesio_roundtrip(self):
        x = (np.sin(np.linspace(0, 100, 2000)) * 0.5).astype(np.float32)
        buf = io.BytesIO()
        audio_io.write(buf, x, 24000)
        y, rate = audio_io.read(io.BytesIO(buf.getvalue()), dtype="float32")
        assert rate == 24000
        np.testing.assert_allclose(y, x, atol=1.0 / 32000)

    def test_int16_passthrough(self, tmp_path):
        x = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
        p = tmp_path / "i.wav"
        audio_io.write(p, x, 8000)
        y, _ = audio_io.read(p, dtype="int16")
        np.testing.assert_array_equal(y, x)

    def test_always_2d(self, tmp_path):
        x = np.zeros(100, dtype=np.float32)
        p = tmp_path / "m.wav"
        audio_io.write(p, x, 16000)
        y, _ = audio_io.read(p, always_2d=True)
        assert y.shape == (100, 1)

    def test_channel_conversion_on_read(self, tmp_path):
        x = np.stack([np.ones(100), -np.ones(100)], axis=1).astype(np.float32) * 0.5
        p = tmp_path / "c.wav"
        audio_io.write(p, x, 16000)
        y, _ = audio_io.read(p, nchannels=1, dtype="float32")
        np.testing.assert_allclose(y, np.zeros(100), atol=1e-4)

    def test_resample_on_read(self, tmp_path):
        x = np.sin(np.linspace(0, 50, 1600)).astype(np.float32) * 0.4
        p = tmp_path / "r.wav"
        audio_io.write(p, x, 16000)
        y, rate = audio_io.read(p, sample_rate=8000, dtype="float32")
        assert rate == 8000
        assert abs(y.shape[0] - 800) <= 1


class TestFormatDetection:
    def test_wav_magic(self):
        assert audio_io.detect_format(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"

    def test_mp3_magic(self):
        assert audio_io.detect_format(b"ID3\x04" + b"\x00" * 12) == "mp3"
        assert audio_io.detect_format(b"\xff\xfb" + b"\x00" * 14) == "mp3"

    def test_flac_ogg_m4a_webm(self):
        assert audio_io.detect_format(b"fLaC" + b"\x00" * 12) == "flac"
        assert audio_io.detect_format(b"OggS" + b"\x00" * 12) == "vorbis"
        assert audio_io.detect_format(b"\x00\x00\x00\x20ftypM4A " + b"\x00" * 4) == "m4a"
        assert audio_io.detect_format(b"\x1a\x45\xdf\xa3" + b"\x00" * 12) == "webm"

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            audio_io.detect_format(b"\x00" * 16)


class TestSfCompat:
    def test_sf_read_write(self, tmp_path):
        x = (np.random.RandomState(2).randn(500) * 0.1).astype(np.float64)
        p = tmp_path / "sf.wav"
        audio_io.sf_write(p, x, 22050)
        y, rate = audio_io.sf_read(p)
        assert rate == 22050
        assert y.dtype == np.float64
