"""SenseVoice: SANM encoder, LFR frontend, rich-tag CTC decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.stt.models.sensevoice import (EncoderConfig,
                                                 FrontendConfig, Model,
                                                 ModelConfig)
from mlx_audio_tpu.stt.models.sensevoice.sensevoice import (
    apply_lfr, init_sensevoice, parse_am_mvn, sensevoice_forward)


def _cfg():
    return ModelConfig(
        vocab_size=64, input_size=40,
        encoder_conf=EncoderConfig(output_size=16, attention_heads=2,
                                   linear_units=32, num_blocks=2,
                                   tp_blocks=1, kernel_size=5),
        frontend_conf=FrontendConfig(n_mels=8, lfr_m=5, lfr_n=3))


class TestFrontend:
    def test_lfr_shape(self):
        f = np.arange(40, dtype=np.float32).reshape(10, 4)
        out = apply_lfr(f, lfr_m=7, lfr_n=6)
        assert out.shape == (2, 28)
        # first frame stacks [f0 f0 f0 f0 f1 f2 f3] (left pad 3)
        np.testing.assert_array_equal(out[0, :4], f[0])
        np.testing.assert_array_equal(out[0, 12:16], f[0])
        np.testing.assert_array_equal(out[0, 16:20], f[1])

    def test_lfr_right_edge_replicates(self):
        f = np.arange(8, dtype=np.float32).reshape(4, 2)
        out = apply_lfr(f, lfr_m=5, lfr_n=3)
        np.testing.assert_array_equal(out[-1, -2:], f[-1])

    def test_parse_am_mvn(self, tmp_path):
        p = tmp_path / "am.mvn"
        p.write_text(
            "<Nnet>\n<AddShift> 3 3\n<LearnRateCoef> 0 [ -1 -2 -3 ]\n"
            "<Rescale> 3 3\n<LearnRateCoef> 0 [ 0.5 0.5 0.5 ]\n</Nnet>\n")
        means, istd = parse_am_mvn(p)
        np.testing.assert_array_equal(means, [-1, -2, -3])
        np.testing.assert_array_equal(istd, [0.5, 0.5, 0.5])


class TestEncoder:
    def test_log_probs_normalized(self):
        cfg = _cfg()
        p = init_sensevoice(jax.random.PRNGKey(0), cfg)
        speech = jnp.asarray(
            np.random.RandomState(0).randn(1, 20, 40).astype(np.float32))
        lp = np.asarray(sensevoice_forward(p, cfg, speech,
                                           jnp.asarray([20])))
        assert lp.shape == (1, 20, 64)
        np.testing.assert_allclose(np.exp(lp[0, :20]).sum(-1), 1.0,
                                   atol=1e-4)

    def test_bucket_invariance(self):
        cfg = _cfg()
        p = init_sensevoice(jax.random.PRNGKey(1), cfg)
        rng = np.random.RandomState(1)
        speech = rng.randn(1, 12, 40).astype(np.float32)
        tight = sensevoice_forward(p, cfg, jnp.asarray(speech),
                                   jnp.asarray([12]))
        padded = np.zeros((1, 32, 40), np.float32)
        padded[:, :12] = speech
        pad = sensevoice_forward(p, cfg, jnp.asarray(padded),
                                 jnp.asarray([12]))
        np.testing.assert_allclose(np.asarray(tight)[:, :12],
                                   np.asarray(pad)[:, :12], atol=2e-4)


class TestGenerate:
    def test_end_to_end_with_token_list(self):
        m = Model(_cfg()).init_and_bind()
        m._token_list = [f"tok{i}" if i else "<blank>" for i in range(64)]
        audio = (0.1 * np.random.RandomState(2).randn(16000)) \
            .astype(np.float32)
        out = m.generate(audio)
        assert isinstance(out.text, str)
        assert out.language is not None
        seg = out.segments[0]
        assert {"text", "language", "emotion", "event"} <= set(seg)

    def test_language_query_changes_output(self):
        m = Model(_cfg()).init_and_bind()
        m._token_list = [str(i) for i in range(64)]
        audio = (0.1 * np.random.RandomState(3).randn(8000)) \
            .astype(np.float32)
        a = m.generate(audio, language="auto").text
        b = m.generate(audio, language="en").text
        # different prefix embedding -> generally different CTC path;
        # both must at least be valid strings
        assert isinstance(a, str) and isinstance(b, str)

    def test_sanitize_layouts(self):
        m = Model(_cfg())
        out = m.sanitize({
            "ctc.ctc_lo.weight": jnp.ones((64, 16)),
            "encoder.encoders.0.self_attn.fsmn_block.weight":
                jnp.ones((16, 1, 5)),
        })
        assert "ctc_lo.weight" in out
        assert out["encoder.encoders.0.self_attn.fsmn_block.weight"] \
            .shape == (5, 1, 16)
        # converted checkpoints pass through
        again = m.sanitize(out)
        assert again["encoder.encoders.0.self_attn.fsmn_block.weight"] \
            .shape == (5, 1, 16)
