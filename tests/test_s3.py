"""S3 speech tokenizer: v1 VQ + v2 FSQ, masking, long-audio windows."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.codec.models.s3 import Model, ModelConfig, s3_encode


def _v2():
    return Model(ModelConfig(name="speech_tokenizer_v2_25hz", n_mels=16,
                             n_audio_state=32, n_audio_head=2,
                             n_audio_layer=1)).init_and_bind()


def _v1():
    return Model(ModelConfig(name="speech_tokenizer_v1_25hz", n_mels=16,
                             n_audio_state=32, n_audio_head=2,
                             n_audio_layer=1,
                             n_codebook_size=64)).init_and_bind()


class TestV2:
    def test_fsq_code_range(self):
        m = _v2()
        mel = np.random.RandomState(0).randn(1, 64, 16).astype(np.float32)
        codes, n = s3_encode(m.params, m.config, jnp.asarray(mel),
                             jnp.asarray([64]))
        f = int(n[0])
        assert f == 16          # 64 / 4 (stride 2 * 2)
        c = np.asarray(codes)[0, :f]
        assert (c >= 0).all() and (c < 3 ** 8).all()

    def test_bucket_invariance(self):
        m = _v2()
        rng = np.random.RandomState(1)
        mel = rng.randn(1, 40, 16).astype(np.float32)
        a, n1 = s3_encode(m.params, m.config, jnp.asarray(mel),
                          jnp.asarray([40]))
        pad = np.zeros((1, 80, 16), np.float32)
        pad[:, :40] = mel
        b, n2 = s3_encode(m.params, m.config, jnp.asarray(pad),
                          jnp.asarray([40]))
        f = int(n1[0])
        assert f == int(n2[0])
        np.testing.assert_array_equal(np.asarray(a)[0, :f],
                                      np.asarray(b)[0, :f])

    def test_encode_from_waveform(self):
        m = _v2()
        audio = (0.1 * np.random.RandomState(2).randn(16000)) \
            .astype(np.float32)
        codes = m.encode(audio)
        assert codes.ndim == 2
        # 1s -> ~100 mel frames -> ~25 tokens at 25Hz
        assert 20 <= codes.shape[1] <= 26

    def test_fsq_decode_unavailable(self):
        """The reference raises for FSQ decode (no official up-project);
        our Model simply has no decode — assert that contract."""
        m = _v2()
        assert not hasattr(m, "decode")


class TestV1:
    def test_vq_code_range(self):
        m = _v1()
        mel = np.random.RandomState(3).randn(1, 32, 16).astype(np.float32)
        codes, n = s3_encode(m.params, m.config, jnp.asarray(mel),
                             jnp.asarray([32]))
        f = int(n[0])
        c = np.asarray(codes)[0, :f]
        assert (c >= 0).all() and (c < 64).all()

    def test_l2_normalized_vq_scale_invariant(self):
        """v1 VQ normalizes inputs, so scaling the mel encoder output
        uniformly must not change codes — check via scaled mel input with
        a linear-ish network? Instead: directly check the quantizer math
        by scaling hidden states."""
        m = _v1()
        embed = np.asarray(m.params["quantizer"]["_codebook"]["embed"])
        rng = np.random.RandomState(4)
        h = rng.randn(5, 32).astype(np.float32)
        for scale in (1.0, 7.0):
            x = h * scale
            xn = x / np.sqrt((x * x).sum(-1, keepdims=True) + 1e-8)
            dist = (-np.sum(xn * xn, -1, keepdims=True) + 2 * xn @ embed.T
                    - np.sum(embed * embed, -1)[None])
            if scale == 1.0:
                base = dist.argmax(-1)
            else:
                np.testing.assert_array_equal(dist.argmax(-1), base)


class TestLongAudio:
    def test_windowed_equals_concat_of_windows(self):
        m = _v2()
        rng = np.random.RandomState(5)
        mel = rng.randn(6100, 16).astype(np.float32)   # > 2 windows
        codes, n = m.quantize(mel, 6100)
        # manual windows
        parts = []
        for s in range(0, 6100, 3000):
            c, _ = m.quantize(mel[s: s + 3000], min(3000, 6100 - s))
            parts.append(c)
        np.testing.assert_array_equal(codes, np.concatenate(parts))
        assert n == len(codes)


class TestSanitize:
    def test_conv_layouts_and_mlp_indices(self):
        m = _v2()
        out = m.sanitize({
            "encoder.conv1.weight": jnp.ones((32, 16, 3)),
            "encoder.blocks.0.attn.fsmn_block.weight":
                jnp.ones((32, 1, 31)),
            "encoder.blocks.0.mlp.layers.0.weight": jnp.ones((128, 32)),
        })
        assert out["encoder.conv1.weight"].shape == (3, 16, 32)
        assert out["encoder.blocks.0.attn.fsmn_block.weight"].shape \
            == (31, 1, 32)
        assert "encoder.blocks.0.mlp.0.weight" in out
