"""Parity tests for the fused AdaIN+Snake+conv Pallas kernel and the
DFT-as-matmul helpers feeding the Kokoro ISTFTNet hot path.

The Pallas kernel runs in interpreter mode on CPU; parity targets are the
plain XLA compositions the kernel replaces (istftnet.py non-fused branch).
Reference for the op semantics: reference istftnet.py:341-397 (AdaIN ->
snake -> dilated conv residual legs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# ---------------------------------------------------------------------------
# DFT-as-matmul (dsp.rdft_pair / irdft_pair)
# ---------------------------------------------------------------------------


class TestDftMatmul:
    @pytest.mark.parametrize("n_fft", [20, 32, 21])
    def test_rdft_matches_rfft(self, n_fft):
        from mlx_audio_tpu.dsp import rdft_pair

        x = np.random.RandomState(0).randn(3, 7, n_fft).astype(np.float32)
        re, im = rdft_pair(jnp.asarray(x))
        spec = np.fft.rfft(x)
        np.testing.assert_allclose(np.asarray(re), spec.real,
                                   rtol=1e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(im), spec.imag,
                                   rtol=1e-4, atol=2e-4)

    @pytest.mark.parametrize("n_fft", [20, 32, 21])
    def test_irdft_matches_irfft(self, n_fft):
        from mlx_audio_tpu.dsp import irdft_pair

        rng = np.random.RandomState(1)
        bins = n_fft // 2 + 1
        re = rng.randn(4, bins).astype(np.float32)
        im = rng.randn(4, bins).astype(np.float32)
        got = np.asarray(irdft_pair(jnp.asarray(re), jnp.asarray(im), n_fft))
        want = np.fft.irfft(re + 1j * im, n_fft)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)

    def test_irfft_pair_dispatches_small_to_matmul(self):
        """irfft_pair must agree with numpy for small n (matmul branch)
        and large n (FFT branch)."""
        from mlx_audio_tpu.dsp import irfft_pair, _DFT_MATMUL_MAX

        rng = np.random.RandomState(2)
        for n in (20, _DFT_MATMUL_MAX, 2 * _DFT_MATMUL_MAX):
            bins = n // 2 + 1
            re = rng.randn(2, bins).astype(np.float32)
            im = rng.randn(2, bins).astype(np.float32)
            got = np.asarray(irfft_pair(jnp.asarray(re), jnp.asarray(im), n))
            want = np.fft.irfft(re + 1j * im, n)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


class TestOverlapAddDivisible:
    @pytest.mark.parametrize("win,hop", [(20, 5), (16, 4), (12, 5)])
    def test_matches_naive(self, win, hop):
        """Divisible win/hop takes the shifted-add path; 12/5 the
        conv-transpose path. Both must equal the naive scatter."""
        from mlx_audio_tpu.dsp import overlap_add

        rng = np.random.RandomState(3)
        frames = rng.randn(2, 9, win).astype(np.float32)
        t = (9 - 1) * hop + win
        want = np.zeros((2, t), np.float32)
        for f in range(9):
            want[:, f * hop : f * hop + win] += frames[:, f]
        got = np.asarray(overlap_add(jnp.asarray(frames), hop, win))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Fused AdaIN + Snake + conv kernel (interpreter mode)
# ---------------------------------------------------------------------------


def _xla_reference(x, scale, shift, alpha, w, bias, dilation, valid_len):
    """The unfused composition the kernel replaces, in f32."""
    h = x.astype(jnp.float32) * scale[:, None, :] + shift[:, None, :]
    h = h + (1.0 / alpha) * jnp.sin(alpha * h) ** 2
    if valid_len is not None:
        t_idx = jnp.arange(x.shape[1])[None, :, None]
        h = jnp.where(t_idx < valid_len[:, None, None], h, 0.0)
    h = h.astype(x.dtype)
    pad = (w.shape[0] - 1) // 2 * dilation
    out = jax.lax.conv_general_dilated(
        h, w.astype(x.dtype), window_strides=(1,),
        padding=[(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias[None, None, :]
    if valid_len is not None:
        t_idx = jnp.arange(x.shape[1])[None, :, None]
        out = jnp.where(t_idx < valid_len[:, None, None], out, 0.0)
    return out.astype(x.dtype)


class TestFusedSnakeConv:
    @pytest.mark.parametrize("dilation", [1, 3])
    @pytest.mark.parametrize("masked", [False, True])
    def test_matches_xla_composition(self, dilation, masked):
        from mlx_audio_tpu.ops.snake_conv_pallas import adain_snake_conv1d

        rng = np.random.RandomState(4)
        b, t, c, k = 2, 300, 128, 3
        x = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
        scale = jnp.asarray(rng.randn(b, c).astype(np.float32) * 0.5 + 1.0)
        shift = jnp.asarray(rng.randn(b, c).astype(np.float32) * 0.1)
        alpha = jnp.asarray(np.abs(rng.randn(c)).astype(np.float32) + 0.5)
        w = jnp.asarray((rng.randn(k, c, c) / np.sqrt(k * c)).astype(np.float32))
        bias = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05)
        vlen = jnp.asarray([t, 170], np.int32) if masked else None

        got = adain_snake_conv1d(x, scale, shift, alpha, w, bias,
                                 dilation=dilation, valid_len=vlen,
                                 block_t=128, interpret=True)
        want = _xla_reference(x, scale, shift, alpha, w, bias, dilation, vlen)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_bf16_activation(self):
        from mlx_audio_tpu.ops.snake_conv_pallas import adain_snake_conv1d

        rng = np.random.RandomState(5)
        b, t, c, k = 1, 200, 128, 7
        x = jnp.asarray(rng.randn(b, t, c).astype(np.float32)).astype(jnp.bfloat16)
        scale = jnp.ones((b, c), jnp.float32)
        shift = jnp.zeros((b, c), jnp.float32)
        alpha = jnp.ones((c,), jnp.float32)
        w = jnp.asarray((rng.randn(k, c, c) / np.sqrt(k * c)).astype(np.float32))

        got = adain_snake_conv1d(x, scale, shift, alpha, w, None,
                                 dilation=1, block_t=128, interpret=True)
        assert got.dtype == jnp.bfloat16
        want = _xla_reference(x, scale, shift, alpha, w, None, 1, None)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0.05, atol=0.05)

    def test_fold_adain_matches_instance_norm_affine(self):
        from mlx_audio_tpu.ops.snake_conv_pallas import fold_adain

        rng = np.random.RandomState(6)
        b, t, c = 2, 50, 8
        x = rng.randn(b, t, c).astype(np.float32)
        gamma = rng.randn(b, c).astype(np.float32) * 0.3
        beta = rng.randn(b, c).astype(np.float32) * 0.3
        mean = x.mean(axis=1)
        var = x.var(axis=1)
        scale, shift = fold_adain(jnp.asarray(mean), jnp.asarray(var),
                                  jnp.asarray(gamma), jnp.asarray(beta))
        got = x * np.asarray(scale)[:, None, :] + np.asarray(shift)[:, None, :]
        want = ((1 + gamma[:, None, :])
                * (x - mean[:, None, :]) / np.sqrt(var[:, None, :] + 1e-5)
                + beta[:, None, :])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestFusedResBlockParity:
    def test_block_fused_vs_xla(self):
        """Full AdaINResBlock1 through the fused path (interpret mode)
        vs the XLA branch."""
        from mlx_audio_tpu.tts.models.kokoro import istftnet as m

        key = jax.random.PRNGKey(0)
        c, style, kern = 128, 16, 3
        p = m.init_adain_res_block1(key, c, kern, [1, 3, 5], style)
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, 160, c).astype(np.float32))
        s = jnp.asarray(rng.randn(2, style).astype(np.float32))
        valid = jnp.asarray(
            np.arange(160)[None, :] < np.asarray([160, 120])[:, None])

        want = m.adain_res_block1(p, x, s, kern, [1, 3, 5], valid)
        m._FORCE_FUSED_INTERPRET = True
        try:
            got = m.adain_res_block1(p, x, s, kern, [1, 3, 5], valid)
        finally:
            m._FORCE_FUSED_INTERPRET = False
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
