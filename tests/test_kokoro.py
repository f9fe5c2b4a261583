"""Kokoro tiny-config tests: shapes, bucket invariance, masking, pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_configs import TINY_VOCAB, tiny_kokoro_config


@pytest.fixture(scope="module")
def model():
    from mlx_audio_tpu.tts.models.kokoro import Model

    return Model(tiny_kokoro_config()).init_and_bind()


@pytest.fixture(scope="module")
def ref_s():
    return np.random.RandomState(0).randn(1, 32).astype(np.float32)


class TestKokoroForward:
    def test_audio_shape_matches_durations(self, model, ref_s):
        audio, pred_dur = model("hɛlO wɜɹld", ref_s, deterministic_noise=True)
        total = int(np.asarray(pred_dur).sum())
        assert audio.shape == (total * model.samples_per_frame,)
        assert np.isfinite(audio).all()

    def test_speed_scales_duration(self, model, ref_s):
        a1, d1 = model("hɛlO wɜɹld", ref_s, deterministic_noise=True, speed=1.0)
        a2, d2 = model("hɛlO wɜɹld", ref_s, deterministic_noise=True, speed=2.0)
        assert int(np.asarray(d2).sum()) < int(np.asarray(d1).sum())
        assert len(a2) < len(a1)

    def test_bucket_invariance(self, model, ref_s):
        """Padded (bucketed) shapes produce the same audio as tight shapes in
        the valid region (up to fp noise; boundary STFT frames excluded)."""
        audio_b, _ = model("hɛlO wɜɹld", ref_s, deterministic_noise=True)
        audio_t, _ = model("hɛlO wɜɹld", ref_s, deterministic_noise=True,
                           tight=True)
        assert audio_b.shape == audio_t.shape
        n = len(audio_t)
        cut = n - 10 * model.samples_per_frame  # exclude boundary tail
        scale = np.abs(audio_t[:cut]).max() + 1e-9
        rel = np.abs(audio_b[:cut] - audio_t[:cut]).max() / scale
        assert rel < 2e-4, rel

    def test_unknown_phonemes_skipped(self, model, ref_s):
        audio, _ = model("hɛl§O", ref_s, deterministic_noise=True)
        assert len(audio) > 0


class TestAlignment:
    def test_build_alignment_matches_repeat(self):
        from mlx_audio_tpu.tts.models.kokoro.modules import build_alignment

        dur = jnp.asarray([[2, 0, 3, 1]])
        aln = np.asarray(build_alignment(dur, 8))
        expected = np.zeros((4, 8), np.float32)
        expected[0, 0:2] = 1
        expected[2, 2:5] = 1
        expected[3, 5] = 1
        np.testing.assert_array_equal(aln[0], expected)


class TestSanitize:
    def test_torch_layout_roundtrip(self, model, ref_s):
        """Convert init params back to a fake torch-layout checkpoint, run
        sanitize, and check the model reproduces identical audio — validates
        every layout transform (weight-norm folding excluded: folded ckpt)."""
        from mlx_audio_tpu.utils import flatten, unflatten

        flat = flatten(model.params)
        fake = {}
        for k, v in flat.items():
            v = np.asarray(v)
            if (".forward." in k or ".backward." in k):
                direction, name = k.split(".")[-2], k.split(".")[-1]
                base = k.rsplit(".", 2)[0]
                suffix = {"weight_ih": "weight_ih_l0", "weight_hh": "weight_hh_l0",
                          "bias_ih": "bias_ih_l0", "bias_hh": "bias_hh_l0"}[name]
                if direction == "backward":
                    suffix += "_reverse"
                fake[f"{base}.{suffix}"] = v
            elif k.endswith(".weight") and v.ndim == 3:
                plain = ("noise_convs" in k or "F0_proj" in k or "N_proj" in k)
                if ".pool." in k:
                    # inverse of convert(groups=C): (W,1,C) -> torch (C,1,W)
                    torch_w = np.transpose(np.flip(v, 0), (2, 1, 0))
                elif "generator.ups" in k:
                    # inverse of convert: (W,I,O) -> torch (I,O,W)
                    torch_w = np.transpose(np.flip(v, 0), (1, 2, 0))
                else:
                    torch_w = np.transpose(v, (2, 1, 0))  # WIO -> torch OIW
                if plain:
                    fake[k] = torch_w
                else:
                    # ConvWeighted modules ship weight-normalized (g, v) pairs
                    base = k[: -len(".weight")]
                    norm = np.sqrt((torch_w ** 2).sum(
                        axis=tuple(range(1, torch_w.ndim)), keepdims=True))
                    fake[base + ".weight_v"] = torch_w
                    fake[base + ".weight_g"] = norm
            elif ("alpha1" in k or "alpha2" in k) and v.ndim == 1:
                fake[k] = v.reshape(1, -1, 1)
            elif ".LayerNorm.weight" in k or "full_layer_layer_norm.weight" in k:
                fake[k] = v
            else:
                fake[k] = v
        from mlx_audio_tpu.tts.models.kokoro import Model

        m2 = Model(tiny_kokoro_config())
        weights = m2.sanitize({k: jnp.asarray(v) for k, v in fake.items()})
        m2.bind(unflatten(weights), strict=True)
        a1, _ = jax.tree.flatten(model.params)
        a2, _ = jax.tree.flatten(m2.params)
        for x, y in zip(a1, a2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


class TestComputeDtype:
    def test_bf16_acoustic_matches_f32(self, model, ref_s):
        """The default bf16 acoustic stage (compute_dtype='bfloat16') must
        track the f32 path closely: stats/ISTFT/source stay f32 by design
        (istftnet.py), so only conv/matmul rounding differs. Transfer is
        kept f32 here because random-init weights emit audio far outside
        f16 range (~1e10) — the f16 transfer path has its own test below."""
        a32, _ = model("hɛlO wɜɹld", ref_s, deterministic_noise=True)
        old_c, old_t = model.config.compute_dtype, model.config.transfer_dtype
        model.config.compute_dtype = "bfloat16"
        model.config.transfer_dtype = "float32"
        model._acoustic_jit = None
        model._frontend_jit = None
        try:
            a16, _ = model("hɛlO wɜɹld", ref_s, deterministic_noise=True)
        finally:
            model.config.compute_dtype, model.config.transfer_dtype = old_c, old_t
            model._acoustic_jit = None
            model._frontend_jit = None
        assert a16.dtype == np.float32        # public API stays f32
        assert a16.shape == a32.shape
        scale = np.abs(a32).max() + 1e-9
        rel = np.abs(a16 - a32).max() / scale
        # bf16 conv rounding through a deep residual stack; keep a loose but
        # meaningful bound (uncorrelated outputs would be ~2.0)
        assert rel < 0.15, rel
        corr = np.corrcoef(a16, a32)[0, 1]
        assert corr > 0.999, corr

    def test_f16_transfer_snr_and_clamp(self):
        """f16 D2H on [-1, 1] audio keeps >60 dB SNR (above PCM16 program
        material); out-of-range values clamp to ±65504 instead of inf —
        the guard in Model._run_acoustic (kokoro.py)."""
        rng = np.random.RandomState(0)
        wav = np.tanh(rng.randn(24000).astype(np.float32))  # [-1, 1]
        w16 = np.clip(wav, -65504.0, 65504.0).astype(np.float16)
        err = wav - w16.astype(np.float32)
        snr = 10 * np.log10((wav ** 2).mean() / max((err ** 2).mean(), 1e-30))
        assert snr > 60.0, snr
        big = np.float32(1e10)
        assert np.isfinite(np.clip(big, -65504.0, 65504.0).astype(np.float16))


class TestPipeline:
    def test_generate_with_fallback_g2p(self, model, ref_s, tmp_path):
        # build a fake voice pack on disk
        import numpy as np
        from safetensors.numpy import save_file

        vdir = tmp_path / "voices"
        vdir.mkdir()
        pack = np.random.RandomState(1).randn(510, 1, 32).astype(np.float32)
        save_file({"voice": pack}, str(vdir / "af_test.safetensors"))
        model.config.model_path = str(tmp_path)
        results = list(model.generate("Hello world. This is a test.",
                                      voice="af_test", split_pattern=r"\."))
        assert len(results) >= 2
        for r in results:
            assert r.samples > 0
            assert r.sample_rate == 24000
            assert np.isfinite(np.asarray(r.audio)).all()
            assert r.real_time_factor >= 0


class TestG2P:
    def test_lexicon_words(self):
        from mlx_audio_tpu.tts.g2p import g2p

        out = g2p("hello world")
        assert "həˈlO" in out and "wɜɹld" in out

    def test_oov_words_produce_phonemes(self):
        from mlx_audio_tpu.tts.g2p import g2p

        out = g2p("zorblax")
        assert len(out) > 3

    def test_punctuation_preserved(self):
        from mlx_audio_tpu.tts.g2p import g2p

        assert "!" in g2p("hello!")
