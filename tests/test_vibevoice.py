"""VibeVoice: DPM-Solver++ scan parity, causal VAE decode, CFG streams."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.vibevoice import Model, ModelConfig
from mlx_audio_tpu.tts.models.vibevoice.scheduler import dpm_tables
from mlx_audio_tpu.tts.models.vibevoice.vibevoice import (
    decode_latents, diffusion_sample, head_forward)


def _cfg():
    return ModelConfig(
        sample_rate=16000,
        acoustic_vae_dim=8,
        tts_backbone_num_hidden_layers=1,
        decoder_config=dict(hidden_size=16, intermediate_size=32,
                            num_attention_heads=2, num_hidden_layers=2,
                            num_key_value_heads=2, vocab_size=64),
        diffusion_head_config=dict(hidden_size=16, head_layers=1,
                                   head_ffn_ratio=2.0, latent_size=8,
                                   freq_embed_size=8, ddpm_num_steps=50,
                                   ddpm_num_inference_steps=4),
        acoustic_tokenizer_config=dict(vae_dim=8, decoder_n_filters=4,
                                       encoder_ratios=[2, 2],
                                       encoder_depths="1-1-1"))


def _tiny():
    return Model(_cfg()).init_and_bind()


class _FakeTok:
    def encode(self, text, add_special_tokens=False):
        return [min(ord(c), 63) for c in text][:23]


class TestScheduler:
    def test_tables_final_step_returns_x0(self):
        t = dpm_tables(50, 4)
        # final step: sigma_next=0, alpha_next=1, exp(-h)=0 -> prev = x0
        assert t["sigma_ratio"][-1] == 0.0
        assert t["alpha_next"][-1] == 1.0
        assert t["em1"][-1] == -1.0
        assert t["use_first"][0] == 1.0 and t["use_first"][-1] == 1.0
        assert np.all(t["use_first"][1:-1] == 0.0)
        # noise level decreases along the trajectory
        assert np.all(np.diff(t["alpha"]) > 0)

    def test_scan_matches_stepwise_reference_semantics(self):
        """The folded tables + single lax.scan must reproduce the
        reference's per-step scheduler mutation (scheduler.py:234-313):
        v-pred x0, order-1 at the first and final steps, order-2 with
        prev_x0 elsewhere."""
        m = _tiny()
        dh = m.config.diffusion_head_config
        p = m.params["prediction_head"]
        rs = np.random.RandomState(0)
        cond = jnp.asarray(rs.randn(1, 16).astype(np.float32))
        neg = jnp.asarray(rs.randn(1, 16).astype(np.float32))
        noise = jnp.asarray(rs.randn(1, 8).astype(np.float32))
        cfg_scale = 1.5
        n_inf, n_train = 4, 50

        # independent stepwise loop from the reference formulas
        i = np.arange(n_train, dtype=np.float64)
        ab = lambda t: np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.minimum(1 - ab((i + 1) / n_train) / ab(i / n_train),
                           0.999)
        abar = np.sqrt(np.cumprod(1 - betas))
        ts = [int(round((n_train - 1) * (1 - k / n_inf)))
              for k in range(n_inf)]
        al, si, la = [], [], []
        for t in ts:
            s = np.sqrt((1 - abar[t] ** 2) / abar[t] ** 2)
            a = 1 / np.sqrt(s ** 2 + 1)
            al.append(a); si.append(s * a)
            la.append(np.log(a) - np.log(s * a))
        al.append(1.0); si.append(0.0); la.append(np.inf)

        sample = np.asarray(noise)
        prev_x0 = None
        cond2 = jnp.concatenate([cond, neg], 0)
        for k, t in enumerate(ts):
            eps = np.asarray(head_forward(
                p, dh, jnp.asarray(np.concatenate([sample, sample], 0)),
                jnp.full((2,), float(t)), cond2))
            guided = eps[1:] + cfg_scale * (eps[:1] - eps[1:])
            x0 = al[k] * sample - si[k] * guided
            h = la[k + 1] - la[k]
            ratio = si[k + 1] / si[k] if si[k] > 0 else 0.0
            enh = np.exp(-h) if np.isfinite(h) else 0.0
            first = ratio * sample - al[k + 1] * (enh - 1) * x0
            last = k == n_inf - 1          # final_sigmas_type == "zero"
            if k == 0 or last or prev_x0 is None:
                sample = first
            else:
                h0 = la[k] - la[k - 1]
                d1 = (h / h0) * (x0 - prev_x0)
                sample = first - 0.5 * al[k + 1] * (enh - 1) * d1
            prev_x0 = x0

        tables = {k: jnp.asarray(v)
                  for k, v in dpm_tables(n_train, n_inf).items()}
        got = np.asarray(diffusion_sample(p, dh, cond, neg, noise, tables,
                                          jnp.float32(cfg_scale)))
        np.testing.assert_allclose(got, sample, rtol=1e-4, atol=1e-5)


class TestVaeDecoder:
    def test_length_and_causal_bucket_parity(self):
        m = _tiny()
        a = m.config.acoustic_tokenizer_config
        rs = np.random.RandomState(1)
        lat = rs.randn(1, 6, 8).astype(np.float32)
        tight = np.asarray(decode_latents(
            m.params["acoustic_tokenizer"], a, jnp.asarray(lat)))
        assert tight.shape == (1, 6 * a.hop_length)
        padded = np.zeros((1, 16, 8), np.float32)
        padded[:, :6] = lat
        buck = np.asarray(decode_latents(
            m.params["acoustic_tokenizer"], a, jnp.asarray(padded)))
        np.testing.assert_allclose(buck[:, : 6 * a.hop_length], tight,
                                   atol=1e-5)


class TestGenerate:
    def test_end_to_end_and_eos(self):
        m = _tiny()
        m.tokenizer = _FakeTok()
        results = list(m.generate("hello world from the tpu",
                                  max_tokens=8, seed=0))
        assert len(results) == 1
        r = results[0]
        hop = m.config.acoustic_tokenizer_config.hop_length
        assert r.samples % hop == 0 and r.samples > 0
        assert r.sample_rate == 16000

    def test_eos_classifier_stops(self):
        m = _tiny()
        m.tokenizer = _FakeTok()
        # force sigmoid(fc2) > 0.5 at every step -> stop after 1 latent
        m.params["tts_eos_classifier"]["fc2"]["bias"] = jnp.full((1,), 50.0)
        m._jit_cache.clear()
        r = list(m.generate("hello", max_tokens=8, seed=0))[0]
        hop = m.config.acoustic_tokenizer_config.hop_length
        assert r.samples == hop          # exactly one latent decoded

    def test_no_tokenizer_errors(self):
        m = _tiny()
        with pytest.raises(RuntimeError, match="tokenizer"):
            list(m.generate("hi"))


class TestVoiceCache:
    def _save_voice(self, m, path, pos_len=3, neg_len=3):
        from safetensors.numpy import save_file
        d = m.config.decoder_config
        rs = np.random.RandomState(2)
        hd = d.hidden_size // d.num_attention_heads
        t = {"lm_hidden": rs.randn(1, 3, 16).astype(np.float32),
             "tts_lm_hidden": rs.randn(1, pos_len, 16).astype(np.float32),
             "neg_tts_lm_hidden":
                 rs.randn(1, neg_len, 16).astype(np.float32)}
        for i in range(1):      # lm layers
            t[f"lm_key_{i}"] = rs.randn(1, 2, 3, hd).astype(np.float32)
            t[f"lm_value_{i}"] = rs.randn(1, 2, 3, hd).astype(np.float32)
        for i in range(1):      # tts layers
            for pref, ln in (("tts_lm", pos_len), ("neg_tts_lm", neg_len)):
                t[f"{pref}_key_{i}"] = \
                    rs.randn(1, 2, ln, hd).astype(np.float32)
                t[f"{pref}_value_{i}"] = \
                    rs.randn(1, 2, ln, hd).astype(np.float32)
        save_file(t, str(path))

    def test_voice_conditioned_generate(self, tmp_path):
        m = _tiny()
        m.tokenizer = _FakeTok()
        vp = tmp_path / "alice.safetensors"
        self._save_voice(m, vp)
        r = list(m.generate("hi there", voice=str(vp), max_tokens=6,
                            seed=1))[0]
        assert r.samples > 0

    def test_mismatched_voice_lengths_raise(self, tmp_path):
        m = _tiny()
        vp = tmp_path / "bad.safetensors"
        self._save_voice(m, vp, pos_len=3, neg_len=4)
        with pytest.raises(ValueError, match="lengths differ"):
            m.load_voice(str(vp))


class TestSanitize:
    def test_lm_prefix_and_conv_layouts(self):
        m = _tiny()
        out = m.sanitize({
            "model.language_model.layers.0.self_attn.q_proj.weight":
                jnp.ones((16, 16)),
            "model.tts_language_model.norm.weight": jnp.ones((16,)),
            "model.language_model.rotary_emb.inv_freq": jnp.ones((4,)),
            "acoustic_tokenizer.decoder.stages.0.0.mixer.conv.conv.conv"
            ".weight": jnp.ones((16, 1, 7)),
            "acoustic_tokenizer.decoder.upsample_layers.1.0.convtr.convtr"
            ".weight": jnp.ones((16, 8, 4)),
            "model.speech_scaling_factor": jnp.asarray(0.5),
        })
        assert "language_model.model.layers.0.self_attn.q_proj.weight" \
            in out
        assert "tts_language_model.model.norm.weight" in out
        assert not any("inv_freq" in k for k in out)
        assert out["acoustic_tokenizer.decoder.stages.0.0.mixer.conv.conv"
                   ".conv.weight"].shape == (7, 1, 16)
        assert out["acoustic_tokenizer.decoder.upsample_layers.1.0.convtr"
                   ".convtr.weight"].shape == (4, 16, 8)
        assert float(out["speech_scaling_factor"]) == 0.5

    def test_converted_passthrough(self):
        m = _tiny()
        from mlx_audio_tpu.utils import flatten
        flat = flatten(m.params)
        again = m.sanitize(flat)
        assert set(again) == set(flat)
        for k in flat:
            assert again[k].shape == flat[k].shape
