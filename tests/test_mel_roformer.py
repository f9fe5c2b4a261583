"""Mel-Band-RoFormer: stacked-band machinery vs naive per-band loops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.sts.models.mel_roformer import (BandLayout,
                                                   MelRoFormerConfig, Model)


def _tiny_cfg(**kw):
    base = dict(dim=16, depth=1, heads=2, dim_head=8, num_bands=6,
                ff_mult=2, mlp_expansion_factor=2, mask_estimator_depth=2,
                n_fft=64, hop_length=16, win_length=64, sample_rate=8000,
                chunk_size=2048, num_overlap=2)
    base.update(kw)
    return MelRoFormerConfig(**base)


def _torch_style_weights(cfg, layout, seed=0):
    """Build a fake ZFTurbo-layout state dict (numpy) for sanitize."""
    rng = np.random.RandomState(seed)
    w = {}
    for i, bd in enumerate(layout.band_dims):
        w[f"band_split.to_features.{i}.0.gamma"] = rng.randn(bd) * 0.1 + 1
        w[f"band_split.to_features.{i}.1.weight"] = \
            rng.randn(cfg.dim, bd) * 0.1
        w[f"band_split.to_features.{i}.1.bias"] = rng.randn(cfg.dim) * 0.01
    inner = cfg.dim_inner
    for d in range(cfg.depth):
        for axis in (0, 1):
            a = f"layers.{d}.{axis}.layers.0.0"
            w[f"{a}.norm.gamma"] = np.ones(cfg.dim, np.float32)
            w[f"{a}.to_qkv.weight"] = rng.randn(3 * inner, cfg.dim) * 0.1
            w[f"{a}.to_gates.weight"] = rng.randn(cfg.heads, cfg.dim) * 0.1
            w[f"{a}.to_gates.bias"] = np.zeros(cfg.heads, np.float32)
            w[f"{a}.to_out.0.weight"] = rng.randn(cfg.dim, inner) * 0.1
            w[f"{a}.rotary_embed.freqs"] = np.ones(4, np.float32)
            f = f"layers.{d}.{axis}.layers.0.1.net"
            w[f"{f}.0.gamma"] = np.ones(cfg.dim, np.float32)
            w[f"{f}.1.weight"] = rng.randn(cfg.ff_dim, cfg.dim) * 0.1
            w[f"{f}.1.bias"] = np.zeros(cfg.ff_dim, np.float32)
            w[f"{f}.4.weight"] = rng.randn(cfg.dim, cfg.ff_dim) * 0.1
            w[f"{f}.4.bias"] = np.zeros(cfg.dim, np.float32)
            w[f"layers.{d}.{axis}.norm.gamma"] = np.ones(cfg.dim,
                                                         np.float32)
    h = cfg.mlp_hidden
    for i, bd in enumerate(layout.band_dims):
        base = f"mask_estimators.0.to_freqs.{i}.0"
        w[f"{base}.0.weight"] = rng.randn(h, cfg.dim) * 0.1
        w[f"{base}.0.bias"] = np.zeros(h, np.float32)
        w[f"{base}.2.weight"] = rng.randn(h, h) * 0.1
        w[f"{base}.2.bias"] = np.zeros(h, np.float32)
        w[f"{base}.4.weight"] = rng.randn(2 * bd, h) * 0.1
        w[f"{base}.4.bias"] = rng.randn(2 * bd) * 0.01
    return w


@pytest.fixture(scope="module")
def model():
    cfg = _tiny_cfg()
    m = Model(cfg)
    from mlx_audio_tpu.utils import unflatten
    w = _torch_style_weights(cfg, m.layout)
    m.bind(unflatten(m.sanitize(w)))
    return m, w


class TestLayout:
    def test_every_freq_covered(self):
        lay = BandLayout(_tiny_cfg())
        covered = np.zeros(lay.f2, bool)
        idx = np.asarray(lay.gather_idx)
        val = np.asarray(lay.valid)
        covered[idx[val]] = True
        assert covered.all()

    def test_counts_match_overlaps(self):
        lay = BandLayout(_tiny_cfg())
        idx = np.asarray(lay.gather_idx)
        val = np.asarray(lay.valid)
        counts = np.zeros(lay.f2)
        for i in range(lay.num_bands):
            counts[idx[i][val[i]]] += 1
        np.testing.assert_array_equal(np.asarray(lay.counts),
                                      np.maximum(counts, 1))


class TestStackedVsNaive:
    def test_band_split_matches_per_band_loop(self, model):
        m, w = model
        cfg, lay = m.config, m.layout
        rng = np.random.RandomState(1)
        B, T = 1, 5
        repr_ri = rng.randn(B, T, lay.f2, 2).astype(np.float32)

        # stacked path (same code as the forward)
        padded = np.concatenate(
            [repr_ri, np.zeros((B, T, 1, 2), np.float32)], axis=2)
        g = padded[:, :, np.asarray(lay.gather_idx), :]
        g = g * np.asarray(lay.valid)[None, None, :, :, None]
        x = g.reshape(B, T, lay.num_bands, lay.max_bd)
        bs = m.params["band_split"]
        scale = np.sqrt(np.asarray(lay.band_dims, np.float32))
        norm = np.sqrt((x * x).sum(-1, keepdims=True))
        xn = x / np.maximum(norm, 1e-12) * scale[:, None] \
            * np.asarray(bs["norm_gamma"])
        stacked = np.einsum("btnd,ndo->btno", xn, np.asarray(bs["proj_w"])) \
            + np.asarray(bs["proj_b"])

        # naive per-band loop straight from the torch-layout weights
        idx = np.asarray(lay.gather_idx)
        val = np.asarray(lay.valid)
        for i in range(lay.num_bands):
            sel = idx[i][val[i]]
            band = repr_ri[:, :, sel, :].reshape(B, T, -1)
            nrm = np.sqrt((band * band).sum(-1, keepdims=True))
            gam = w[f"band_split.to_features.{i}.0.gamma"]
            b_n = band / np.maximum(nrm, 1e-12) * np.sqrt(band.shape[-1]) \
                * gam
            ref = b_n @ w[f"band_split.to_features.{i}.1.weight"].T \
                + w[f"band_split.to_features.{i}.1.bias"]
            np.testing.assert_allclose(stacked[:, :, i], ref, atol=1e-4)

    def test_mask_estimator_matches_per_band_loop(self, model):
        m, w = model
        cfg, lay = m.config, m.layout
        rng = np.random.RandomState(2)
        B, T = 1, 4
        x = rng.randn(B, T, lay.num_bands, cfg.dim).astype(np.float32)
        me = m.params["mask_est"]
        h = np.tanh(np.einsum("btnd,ndh->btnh", x, np.asarray(me["w0"]))
                    + np.asarray(me["b0"]))
        h = np.tanh(np.einsum("btnh,nhk->btnk", h, np.asarray(me["wm0"]))
                    + np.asarray(me["bm0"]))
        out = np.einsum("btnh,nho->btno", h, np.asarray(me["wf"])) \
            + np.asarray(me["bf"])
        value, gate = out[..., : lay.max_bd], out[..., lay.max_bd:]
        mask = value / (1 + np.exp(-gate))

        for i, bd in enumerate(lay.band_dims):
            base = f"mask_estimators.0.to_freqs.{i}.0"
            hh = np.tanh(x[:, :, i] @ w[f"{base}.0.weight"].T
                         + w[f"{base}.0.bias"])
            hh = np.tanh(hh @ w[f"{base}.2.weight"].T + w[f"{base}.2.bias"])
            oo = hh @ w[f"{base}.4.weight"].T + w[f"{base}.4.bias"]
            ref = oo[..., :bd] / (1 + np.exp(-oo[..., bd:]))
            np.testing.assert_allclose(mask[:, :, i, :bd], ref, atol=1e-4)


class TestForward:
    def test_shape_and_finite(self, model):
        m, _ = model
        audio = np.random.RandomState(0).randn(1, 2, 2048) \
            .astype(np.float32) * 0.1
        out = np.asarray(m(audio))
        assert out.shape == (1, 2, 2048)
        assert np.isfinite(out).all()

    def test_zero_mask_weights_give_silence(self):
        cfg = _tiny_cfg()
        m = Model(cfg)
        from mlx_audio_tpu.utils import unflatten
        w = _torch_style_weights(cfg, m.layout)
        for i in range(m.layout.num_bands):
            base = f"mask_estimators.0.to_freqs.{i}.0"
            w[f"{base}.4.weight"] = np.zeros_like(w[f"{base}.4.weight"])
            w[f"{base}.4.bias"] = np.zeros_like(w[f"{base}.4.bias"])
        m.bind(unflatten(m.sanitize(w)))
        audio = np.random.RandomState(1).randn(1, 2, 1024) \
            .astype(np.float32)
        out = np.asarray(m(audio))
        np.testing.assert_allclose(out, 0.0, atol=1e-5)

    def test_separate_chunked(self, model):
        m, _ = model
        sr = m.config.sample_rate
        audio = np.random.RandomState(3).randn(2, 5000) \
            .astype(np.float32) * 0.1
        res = m.separate(audio)
        assert res.vocals.shape == (2, 5000)
        assert res.sample_rate == sr
        assert np.isfinite(res.vocals).all()

    def test_separate_mono_input_upmixed(self, model):
        m, _ = model
        res = m.separate(np.zeros(3000, np.float32))
        assert res.vocals.shape == (2, 3000)

    def test_sanitize_idempotent_on_converted(self, model):
        m, w = model
        once = m.sanitize(w)
        twice = m.sanitize(once)
        assert set(once) == set(twice)
