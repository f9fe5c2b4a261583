"""MeloTTS (VITS2): splines, rel-pos attention shifts, e2e synthesis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.melotts import Model, ModelConfig
from mlx_audio_tpu.tts.models.melotts.melotts import _build_path
from mlx_audio_tpu.tts.models.melotts.text import (g2p, process_text,
                                                   text_normalize)
from mlx_audio_tpu.tts.models.melotts.transforms import (
    piecewise_rational_quadratic_transform)


def _tiny_cfg():
    return ModelConfig(
        sampling_rate=16000, n_speakers=4, spk2id={"EN-US": 1},
        inter_channels=16, hidden_channels=16, filter_channels=32,
        n_heads=2, n_layers=2, n_layers_trans_flow=1, kernel_size=3,
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
        upsample_rates=[4, 4], upsample_initial_channel=32,
        upsample_kernel_sizes=[8, 8], gin_channels=8, n_vocab=64)


class TestTransforms:
    def test_spline_inverts(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-4, 4, (2, 5, 3)).astype(np.float32))
        uw = jnp.asarray(rng.randn(2, 5, 3, 10).astype(np.float32))
        uh = jnp.asarray(rng.randn(2, 5, 3, 10).astype(np.float32))
        ud = jnp.asarray(rng.randn(2, 5, 3, 9).astype(np.float32))
        y, ld = piecewise_rational_quadratic_transform(
            x, uw, uh, ud, inverse=False)
        x2, ld2 = piecewise_rational_quadratic_transform(
            y, uw, uh, ud, inverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-4)

    def test_outside_tails_identity(self):
        x = jnp.asarray([[10.0, -10.0]])
        uw = jnp.zeros((1, 2, 10))
        uh = jnp.zeros((1, 2, 10))
        ud = jnp.zeros((1, 2, 9))
        y, ld = piecewise_rational_quadratic_transform(
            x, uw, uh, ud, inverse=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))
        np.testing.assert_allclose(np.asarray(ld), 0.0)


class TestRelAttention:
    def test_shift_roundtrip_shapes(self):
        from mlx_audio_tpu.tts.models.melotts.modules import (_abs_to_rel,
                                                              _rel_to_abs)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 2, 6, 11).astype(np.float32))
        absd = _rel_to_abs(x)
        assert absd.shape == (1, 2, 6, 6)
        rel = _abs_to_rel(absd)
        assert rel.shape == (1, 2, 6, 11)

    def test_rel_to_abs_diagonal_semantics(self):
        """rel index (window) == relative offset 0 maps to the diagonal."""
        from mlx_audio_tpu.tts.models.melotts.modules import _rel_to_abs
        t = 4
        x = np.zeros((1, 1, t, 2 * t - 1), np.float32)
        x[:, :, :, t - 1] = 7.0    # offset 0 column
        a = np.asarray(_rel_to_abs(jnp.asarray(x)))[0, 0]
        np.testing.assert_allclose(np.diag(a), 7.0)


class TestPath:
    def test_build_path_expands_durations(self):
        dur = jnp.asarray([[2.0, 3.0, 1.0]])
        mask = jnp.ones((1, 3))
        path = np.asarray(_build_path(dur, mask, 8))
        assert path.shape == (1, 3, 8)
        np.testing.assert_array_equal(path[0, 0], [1, 1, 0, 0, 0, 0, 0, 0])
        np.testing.assert_array_equal(path[0, 1], [0, 0, 1, 1, 1, 0, 0, 0])
        np.testing.assert_array_equal(path[0, 2], [0, 0, 0, 0, 0, 1, 0, 0])

    def test_masked_phones_contribute_nothing(self):
        dur = jnp.asarray([[2.0, 3.0, 99.0]])
        mask = jnp.asarray([[1.0, 1.0, 0.0]])
        path = np.asarray(_build_path(dur, mask, 6))
        assert path[0, 2].sum() == 0


class TestText:
    def test_normalize_numbers_and_abbrev(self):
        out = text_normalize("Dr. Smith has 1,234 apples and 2.5 pies")
        assert "doctor" in out
        assert "one thousand two hundred thirty four" in out
        assert "two point five" in out

    def test_g2p_structure(self):
        phones, tones, w2p = g2p("hello world")
        assert phones[0] == "_" and phones[-1] == "_"
        assert len(phones) == len(tones)
        assert sum(w2p) == len(phones)

    def test_process_text_blank_interleave(self):
        r = process_text("hi", add_blank=True)
        assert len(r["phone_ids"]) % 2 == 1       # _ p _ p _ pattern
        assert r["bert_features"].shape[0] == 768
        assert r["bert_features"].shape[1] == len(r["phone_ids"])
        # EN tone offset applied
        assert all(t >= 7 or t == 7 for t in r["tone_ids"][:1])


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def model(self):
        return Model(_tiny_cfg()).init_and_bind()

    def test_synthesize_shapes(self, model):
        audio = model.synthesize(
            phone_ids=[1, 5, 9, 2], tone_ids=[7, 8, 7, 7],
            lang_ids=[2, 2, 2, 2], bert=None,
            ja_bert=np.zeros((768, 4), np.float32), sid=1)
        assert audio.ndim == 1
        assert len(audio) % model.config.upsample_factor == 0
        assert np.isfinite(audio).all()
        assert np.abs(audio).max() <= 1.0

    def test_generate_end_to_end(self, model):
        results = list(model.generate("hello world", voice="EN-US",
                                      seed=1))
        assert len(results) == 1
        assert results[0].samples > 0
        assert results[0].sample_rate == 16000

    def test_speed_scales_duration(self, model):
        kw = dict(phone_ids=[1, 5, 9, 2], tone_ids=[7, 8, 7, 7],
                  lang_ids=[2, 2, 2, 2], bert=None,
                  ja_bert=np.zeros((768, 4), np.float32), sid=1)
        slow = model.synthesize(**kw, speed=0.5)
        fast = model.synthesize(**kw, speed=2.0)
        assert len(slow) > len(fast)

    def test_deterministic_given_seed(self, model):
        kw = dict(phone_ids=[1, 5, 9], tone_ids=[7, 7, 7],
                  lang_ids=[2, 2, 2], bert=None,
                  ja_bert=np.zeros((768, 3), np.float32), sid=0, seed=7)
        a = model.synthesize(**kw)
        b = model.synthesize(**kw)
        np.testing.assert_array_equal(a, b)


class TestSanitize:
    def test_weight_norm_fold_and_layouts(self):
        m = Model(_tiny_cfg())
        v = np.random.RandomState(0).randn(8, 4, 3).astype(np.float32)
        g = np.ones((8, 1, 1), np.float32) * 2.0
        out = m.sanitize({
            "dec.conv_pre.conv.weight_v": v,
            "dec.conv_pre.conv.weight_g": g,
            "dec.ups.0.conv_t.weight": np.ones((8, 4, 6), np.float32),
            "sdp.flows.0.m": np.zeros((2, 1), np.float32),
            "flow.flows.0.pre.conv.weight": np.ones((16, 8, 1),
                                                    np.float32),
            "flow.flows.1.dummy": np.zeros((1,)),   # Flip -> dropped
        })
        assert out["dec.conv_pre.weight"].shape == (3, 4, 8)
        norm = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
        expected = (2.0 * v / norm).transpose(2, 1, 0)
        np.testing.assert_allclose(np.asarray(out["dec.conv_pre.weight"]),
                                   expected, atol=1e-5)
        assert out["dec.ups.0.weight"].shape == (6, 8, 4)
        assert out["sdp.flows.0.m"].shape == (2,)
        assert "flow_layers.0.pre.weight" in out
        assert not any("DROPFLIP" in k or "flows.1.dummy" in k
                       for k in out)
