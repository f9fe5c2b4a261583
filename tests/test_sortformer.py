"""Sortformer diarization: features, encoder, segments, streaming cache."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.vad.models.sortformer import (FCEncoderConfig, Model,
                                                 ModelConfig,
                                                 ModulesConfig,
                                                 ProcessorConfig,
                                                 TFEncoderConfig)
from mlx_audio_tpu.vad.models.sortformer.sortformer import (
    extract_mel_features, preds_to_segments, sortformer_forward,
    trim_silence)


def _cfg():
    return ModelConfig(
        fc_encoder_config=FCEncoderConfig(
            hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=32, num_mel_bins=16, conv_kernel_size=5,
            subsampling_conv_channels=4),
        tf_encoder_config=TFEncoderConfig(
            d_model=8, encoder_layers=1, encoder_attention_heads=2,
            encoder_ffn_dim=16, max_source_positions=256),
        modules_config=ModulesConfig(num_speakers=3, fc_d_model=16,
                                     tf_d_model=8, chunk_len=8,
                                     spkcache_len=16),
        processor_config=ProcessorConfig(feature_size=16))


@pytest.fixture(scope="module")
def model():
    return Model(_cfg()).init_and_bind()


class TestFeatures:
    def test_mel_shape_and_normalization(self):
        proc = ProcessorConfig(feature_size=16)
        wav = np.random.RandomState(0).randn(16000).astype(np.float32)
        mel = extract_mel_features(wav, proc)
        assert mel.shape[1] == 16
        # per-feature normalized: near-zero mean, near-unit std
        np.testing.assert_allclose(mel.mean(0), 0.0, atol=1e-3)
        np.testing.assert_allclose(mel.std(0), 1.0, atol=0.05)

    def test_trim_silence(self):
        sr = 16000
        wav = np.concatenate([
            np.zeros(sr, np.float32),
            0.5 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)
            .astype(np.float32),
            np.zeros(sr, np.float32)])
        trimmed, off = trim_silence(wav, sr)
        assert off >= sr - 2000          # leading second mostly gone
        assert len(trimmed) < len(wav)

    def test_trim_noop_for_speech_only(self):
        sr = 16000
        wav = (0.5 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)) \
            .astype(np.float32)
        trimmed, off = trim_silence(wav, sr)
        # at most the sub-frame remainder is dropped (reference behavior:
        # end clamps to whole frames when the tail frame is incomplete)
        frame_len = int(sr * 30 / 1000)
        assert off == 0 and len(trimmed) >= len(wav) - frame_len


class TestForward:
    def test_shapes_and_probability_range(self, model):
        mel = jnp.asarray(np.random.RandomState(0)
                          .randn(1, 64, 16).astype(np.float32))
        preds, n = sortformer_forward(model.params, model.config, mel,
                                      jnp.asarray([64]))
        f = int(n[0])
        assert f == 64 // 8 + (1 if 64 % 8 else 1) - 1 or f > 0
        p = np.asarray(preds)[0, :f]
        assert p.shape[1] == 3
        assert (p >= 0).all() and (p <= 1).all()
        # padding rows are zeroed
        assert np.asarray(preds)[0, f:].sum() == 0

    def test_bucket_invariance(self, model):
        rng = np.random.RandomState(1)
        mel = rng.randn(1, 48, 16).astype(np.float32)
        tight, n1 = sortformer_forward(model.params, model.config,
                                       jnp.asarray(mel),
                                       jnp.asarray([48]))
        padded = np.zeros((1, 96, 16), np.float32)
        padded[:, :48] = mel
        pad, n2 = sortformer_forward(model.params, model.config,
                                     jnp.asarray(padded),
                                     jnp.asarray([48]))
        f = int(n1[0])
        assert f == int(n2[0])
        np.testing.assert_allclose(np.asarray(tight)[0, :f],
                                   np.asarray(pad)[0, :f], atol=2e-4)


class TestSegments:
    def test_threshold_and_merge(self):
        preds = np.zeros((20, 2), np.float32)
        preds[2:6, 0] = 0.9
        preds[8:12, 0] = 0.9
        preds[5:15, 1] = 0.8
        segs = preds_to_segments(preds, frame_duration=0.08,
                                 threshold=0.5)
        spk0 = [s for s in segs if s.speaker == 0]
        assert len(spk0) == 2
        merged = preds_to_segments(preds, 0.08, 0.5, merge_gap=0.3)
        assert len([s for s in merged if s.speaker == 0]) == 1

    def test_min_duration_filters(self):
        preds = np.zeros((20, 1), np.float32)
        preds[3:4, 0] = 0.9          # single 80ms frame
        segs = preds_to_segments(preds, 0.08, 0.5, min_duration=0.2)
        assert segs == []


class TestGenerate:
    def test_diarize_end_to_end(self, model):
        sr = 16000
        wav = (0.3 * np.sin(2 * np.pi * 220 *
                            np.arange(2 * sr) / sr)).astype(np.float32)
        out = model.generate(wav)
        assert out.num_speakers <= 3
        assert out.speaker_probs.shape[1] == 3
        for s in out.segments:
            assert 0 <= s.start < s.end
        # RTTM-style text
        if out.segments:
            assert out.text.startswith("SPEAKER audio 1")


class TestStreaming:
    def test_streaming_accumulates_and_compresses(self, model):
        mc = model.config.modules_config
        state = model.init_streaming_state()
        proc = model.config.processor_config
        rng = np.random.RandomState(2)
        total = 0
        for _ in range(4):
            mel = rng.randn(64, 16).astype(np.float32)
            preds, state = model.streaming_step(mel, state)
            total += preds.shape[0]
            assert preds.shape[1] == mc.num_speakers
        assert state.frames_processed == total
        # fifo bounded, cache bounded after compression
        assert state.fifo.shape[1] <= max(mc.fifo_len, mc.chunk_len)
        assert state.spkcache.shape[1] <= mc.spkcache_len

    def test_generate_stream_yields_output(self, model):
        sr = 16000
        wav = (0.2 * np.random.RandomState(3).randn(3 * sr)) \
            .astype(np.float32)
        chunks = list(model.generate_stream(wav, chunk_seconds=1.0))
        # last yield is the DiarizationOutput
        from mlx_audio_tpu.vad.models.sortformer import DiarizationOutput
        assert isinstance(chunks[-1], DiarizationOutput)
        assert len(chunks) >= 2


class TestSanitize:
    def test_layouts(self, model):
        out = model.sanitize({
            "fc_encoder.subsampling.layers.0.weight":
                jnp.ones((4, 1, 3, 3)),
            "fc_encoder.layers.0.conv.pointwise_conv1.weight":
                jnp.ones((32, 16, 1)),
            "fc_encoder.layers.0.conv.depthwise_conv.weight":
                jnp.ones((16, 1, 5)),
            "fc_encoder.layers.0.conv.norm.num_batches_tracked":
                jnp.ones(()),
        })
        assert out["fc_encoder.subsampling.layers_0.weight"].shape \
            == (3, 3, 1, 4)
        assert out["fc_encoder.layers.0.conv.pointwise_conv1.weight"] \
            .shape == (1, 16, 32)
        assert out["fc_encoder.layers.0.conv.depthwise_conv.weight"] \
            .shape == (5, 1, 16)
        assert not any("num_batches" in k for k in out)
        # idempotent on converted
        again = model.sanitize(out)
        assert again["fc_encoder.subsampling.layers_0.weight"].shape \
            == (3, 3, 1, 4)


class TestAOSC:
    def _aosc_model(self):
        cfg = _cfg()
        mc = cfg.modules_config
        mc.use_aosc = True
        mc.spkcache_len = 12
        mc.spkcache_update_period = 8
        mc.spkcache_sil_frames_per_spk = 1
        return Model(cfg).init_and_bind()

    def test_silence_profile_update(self):
        from mlx_audio_tpu.vad.models.sortformer.sortformer import (
            _silence_profile)

        embs = np.ones((1, 4, 6), np.float32)
        embs[0, 2:] = 3.0
        preds = np.zeros((1, 4, 3), np.float32)
        preds[0, 2:] = 0.9        # frames 2,3 are speech
        mean, n = _silence_profile(np.zeros((1, 6), np.float32), 0.0,
                                   embs, preds, 0.1)
        assert n == 2.0
        np.testing.assert_allclose(mean, np.ones((1, 6)), atol=1e-6)

    def test_aosc_compression_shapes_and_selection(self):
        from mlx_audio_tpu.vad.models.sortformer.sortformer import (
            compress_spkcache_aosc)

        cfg = _cfg()
        mc = cfg.modules_config
        mc.use_aosc = True
        mc.spkcache_len = 12
        mc.spkcache_sil_frames_per_spk = 1
        rng = np.random.RandomState(0)
        n = 40
        embs = rng.randn(1, n, 16).astype(np.float32)
        preds = np.full((1, n, 3), 0.01, np.float32)
        # speaker 0 confidently alone on frames 0-9, spk 1 on 10-19
        preds[0, 0:10, 0] = 0.95
        preds[0, 10:20, 1] = 0.95
        mean_sil = np.zeros((1, 16), np.float32)
        c_embs, c_preds = compress_spkcache_aosc(embs, preds, mean_sil, mc)
        assert c_embs.shape == (1, 12, 16)
        assert c_preds.shape == (1, 12, 3)
        # both active speakers keep representation
        assert (c_preds[0, :, 0] > 0.5).sum() >= 2
        assert (c_preds[0, :, 1] > 0.5).sum() >= 2

    def test_streaming_with_aosc_bounds_cache(self):
        m = self._aosc_model()
        mc = m.config.modules_config
        state = m.init_streaming_state()
        rng = np.random.RandomState(5)
        for _ in range(5):
            mel = rng.randn(64, 16).astype(np.float32)
            preds, state = m.streaming_step(mel, state)
        assert state.spkcache.shape[1] <= mc.spkcache_len
        assert state.mean_sil_emb is not None
        assert np.isfinite(state.spkcache).all()

    def test_generate_stream_aosc(self):
        m = self._aosc_model()
        sr = 16000
        wav = (0.2 * np.random.RandomState(6).randn(3 * sr)) \
            .astype(np.float32)
        chunks = list(m.generate_stream(wav, chunk_seconds=1.0))
        from mlx_audio_tpu.vad.models.sortformer import DiarizationOutput
        assert isinstance(chunks[-1], DiarizationOutput)
