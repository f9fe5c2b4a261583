"""FSMN-VAD: encoder shapes/causality, frontend, segment state machine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.vad.models.fsmn import FSMNEncoderConfig, Model, \
    ModelConfig
from mlx_audio_tpu.vad.models.fsmn.fsmn import (_VadSession, apply_lfr,
                                                compute_decibel,
                                                encoder_forward,
                                                extract_features,
                                                init_encoder, load_cmvn)

ENC = FSMNEncoderConfig(input_dim=40, input_affine_dim=16, fsmn_layers=2,
                        linear_dim=24, proj_dim=8, lorder=4,
                        output_affine_dim=16, output_dim=12)


def _cfg():
    return ModelConfig(encoder=ENC, n_mels=8, lfr_m=5, lfr_n=1)


class TestEncoder:
    def test_softmax_output(self):
        p = init_encoder(jax.random.PRNGKey(0), ENC)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 30, 40),
                        jnp.float32)
        y = np.asarray(encoder_forward(p, ENC, x))
        assert y.shape == (1, 30, 12)
        np.testing.assert_allclose(y.sum(-1), 1.0, atol=1e-5)

    def test_causal_memory(self):
        """Future frames must not change past posteriors."""
        p = init_encoder(jax.random.PRNGKey(1), ENC)
        rng = np.random.RandomState(1)
        x = rng.randn(1, 20, 40).astype(np.float32)
        x2 = x.copy()
        x2[:, 15:] += 10.0
        y1 = np.asarray(encoder_forward(p, ENC, jnp.asarray(x)))
        y2 = np.asarray(encoder_forward(p, ENC, jnp.asarray(x2)))
        np.testing.assert_allclose(y1[:, :15], y2[:, :15], atol=1e-5)

    def test_streaming_prefix_consistency(self):
        """Posteriors for a prefix equal the full-sequence prefix."""
        p = init_encoder(jax.random.PRNGKey(2), ENC)
        x = jnp.asarray(np.random.RandomState(2).randn(1, 25, 40),
                        jnp.float32)
        full = np.asarray(encoder_forward(p, ENC, x))
        pre = np.asarray(encoder_forward(p, ENC, x[:, :10]))
        np.testing.assert_allclose(pre, full[:, :10], atol=1e-5)


class TestFrontend:
    def test_lfr_shape_and_left_pad(self):
        f = np.arange(12, dtype=np.float32).reshape(6, 2)
        out = apply_lfr(f, lfr_m=5, lfr_n=1)
        assert out.shape == (8, 10)
        # first output stacks [f0 f0 f0 f1 f2] (left pad repeats frame 0)
        np.testing.assert_array_equal(out[0, :2], f[0])
        np.testing.assert_array_equal(out[0, 2:4], f[0])
        np.testing.assert_array_equal(out[0, 6:8], f[1])

    def test_lfr_right_pad_repeats_last(self):
        f = np.arange(6, dtype=np.float32).reshape(3, 2)
        out = apply_lfr(f, lfr_m=3, lfr_n=1)
        np.testing.assert_array_equal(out[-1, 4:], f[-1])

    def test_extract_features_dims(self):
        cfg = _cfg()
        wav = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
        feats = extract_features(wav, cfg)
        assert feats.shape[1] == cfg.n_mels * cfg.lfr_m
        assert np.isfinite(feats).all()

    def test_cmvn_parse_and_apply(self, tmp_path):
        mvn = tmp_path / "am.mvn"
        mvn.write_text(
            "<Nnet>\n<AddShift> 4 4\n<LearnRateCoef> 0 [ 1 2 3 4 ]\n"
            "<Rescale> 4 4\n<LearnRateCoef> 0 [ 2 2 2 2 ]\n</Nnet>\n")
        shift, scale = load_cmvn(mvn)
        np.testing.assert_array_equal(shift, [1, 2, 3, 4])
        np.testing.assert_array_equal(scale, [2, 2, 2, 2])

    def test_decibel_frames(self):
        wav = np.ones(16000, np.float32)
        db = compute_decibel(wav, 16000, 25, 10)
        assert db.shape[0] == (16000 - 400) // 160 + 1
        np.testing.assert_allclose(db, 10 * np.log10(400 + 1e-6), atol=1e-3)


class TestStateMachine:
    def _session(self):
        return _VadSession(_cfg())

    def test_clean_speech_segment(self):
        s = self._session()
        # 50 sil frames, 100 speech frames, 100 sil frames
        sil = np.concatenate([np.ones(50) * 0.99, np.ones(100) * 0.01,
                              np.ones(100) * 0.99])
        db = np.full(250, -20.0)
        segs = s.feed(sil, db, is_final=True)
        assert len(segs) == 1
        start, end = segs[0]
        # start near 500ms (with lookback it can reach back ~400ms)
        assert 0 <= start <= 600
        assert 1400 <= end <= 2500

    def test_all_silence_yields_nothing(self):
        s = self._session()
        segs = s.feed(np.ones(300) * 0.99, np.full(300, -30.0),
                      is_final=True)
        assert segs == []

    def test_two_utterances_split(self):
        s = self._session()
        blocks = [np.ones(50) * 0.99, np.ones(80) * 0.01,
                  np.ones(120) * 0.99, np.ones(80) * 0.01,
                  np.ones(100) * 0.99]
        sil = np.concatenate(blocks)
        segs = s.feed(sil, np.full(len(sil), -20.0), is_final=True)
        assert len(segs) == 2
        assert segs[0][1] <= segs[1][0]

    def test_streaming_matches_offline(self):
        rng = np.random.RandomState(0)
        sil = np.concatenate([np.ones(60) * 0.95, np.ones(90) * 0.02,
                              np.ones(120) * 0.95, np.ones(70) * 0.03,
                              np.ones(90) * 0.95])
        sil = np.clip(sil + 0.02 * rng.randn(len(sil)), 0.001, 0.999)
        db = np.full(len(sil), -25.0)
        off = self._session().feed(sil, db, is_final=True)

        s = self._session()
        got = []
        chunk = 37
        for i in range(0, len(sil), chunk):
            last = i + chunk >= len(sil)
            got += s.feed(sil[i:i + chunk], db[i:i + chunk], is_final=last)
        assert got == off

    def test_final_flush_closes_open_segment(self):
        s = self._session()
        sil = np.concatenate([np.ones(40) * 0.99, np.ones(100) * 0.01])
        segs = s.feed(sil, np.full(140, -20.0), is_final=True)
        assert len(segs) == 1
        assert segs[0][1] >= 1300


class TestModel:
    def test_detect_end_to_end(self):
        cfg = _cfg()
        m = Model(cfg).init_and_bind()
        sr = cfg.sample_rate
        wav = (0.001 * np.random.RandomState(0).randn(2 * sr)) \
            .astype(np.float32)
        segs = m.detect(wav)
        assert isinstance(segs, list)
        for a, b in segs:
            assert 0 <= a < b

    def test_sanitize_prefixes_and_conv_layout(self):
        m = Model(_cfg())
        w = {
            "in_linear1.weight": jnp.ones((16, 40)),
            "fsmn.0.fsmn_block.conv_left.weight": jnp.ones((8, 1, 4)),
        }
        out = m.sanitize(w)
        assert "encoder.in_linear1.weight" in out
        assert out["encoder.fsmn.0.fsmn_block.conv_left.weight"].shape \
            == (4, 1, 8)
