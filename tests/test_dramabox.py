"""Dramabox (tiny config): duration, sigmas, VAE, DiT euler, vocoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.dramabox import Model, ModelConfig
from mlx_audio_tpu.tts.models.dramabox.dit import (
    TransformerConfig,
    auto_rescale_for_cfg,
    ltx2_sigmas,
)
from mlx_audio_tpu.tts.models.dramabox.dramabox import (
    aligned_frame_count,
    estimate_speech_duration,
    latent_frames_for_duration,
)
from mlx_audio_tpu.tts.models.dramabox.vae_vocoder import (
    init_audio_vae,
    vae_decode,
    vae_encode,
)


def _cfg():
    return ModelConfig(
        text_encoder_hidden_size=8, num_gemma_layers=3,
        transformer=TransformerConfig(
            num_layers=2, audio_num_attention_heads=4,
            audio_attention_head_dim=8, audio_in_channels=32,
            audio_out_channels=32, audio_cross_attention_dim=32,
            audio_connector_attention_head_dim=8,
            audio_connector_num_attention_heads=4,
            connector_num_layers=1,
            connector_num_learnable_registers=4),
        audio=dict(vae_channels=2, mel_bins=16),
        inference_defaults=dict(steps=2, stg_block=1, ref_duration=0.2))


def _fake_encoder(hidden_size=8, layers=3, seq=8):
    def fn(prompts):
        out = []
        for p in prompts:
            rng = np.random.RandomState(abs(hash(p)) % 2 ** 31)
            h = rng.randn(1, seq, hidden_size, layers).astype(np.float32)
            m = np.ones((1, seq), np.int32)
            m[0, -2:] = 0  # some padding
            out.append((h, m))
        return out
    return fn


@pytest.fixture(scope="module")
def model():
    m = Model(_cfg()).init_and_bind()
    m.text_encoder_fn = _fake_encoder()
    return m


class TestHeuristics:
    def test_duration_quotes(self):
        d = estimate_speech_duration('He said "hello there my friend"')
        assert d >= 3.0

    def test_duration_nonverbal(self):
        base = estimate_speech_duration("says a line of text here now")
        more = estimate_speech_duration(
            "says a line of text here now and sighs then pauses")
        assert more > base

    def test_aligned_frames(self):
        assert (aligned_frame_count(1.0) - 1) % 8 == 0
        assert latent_frames_for_duration(1.0, _cfg().audio) > 0

    def test_sigmas_monotone(self):
        s = ltx2_sigmas(10, token_count=800)
        assert s[0] > s[-1] and s[-1] == 0.0
        assert np.all(np.diff(s) < 1e-7)

    def test_auto_rescale(self):
        assert auto_rescale_for_cfg(1.0) == 0.0
        assert 0 < auto_rescale_for_cfg(2.5) < 0.8
        assert auto_rescale_for_cfg(8.0) == 0.8


class TestVae:
    def test_roundtrip_shapes(self):
        key = jax.random.PRNGKey(0)
        p = init_audio_vae(key, ch=4, ch_mult=(1, 2), num_res_blocks=1,
                           z_channels=2, in_mel_bins=16)
        spec = jnp.zeros((1, 2, 9, 16))
        lat = vae_encode(p, spec, ch_mult=(1, 2), num_res_blocks=1,
                         z_channels=2)
        assert lat.shape[0] == 1 and lat.shape[1] == 2
        mel = vae_decode(p, lat, ch_mult=(1, 2), num_res_blocks=1,
                         out_ch=2, mel_bins=16)
        assert mel.shape[1] == 2 and mel.shape[3] == 16

    def test_ref_audio_encode(self, model):
        # tiny VAE inside model: z_channels=2
        ref = np.random.RandomState(0).randn(3000).astype(np.float32)
        lat = model.encode_reference_audio(ref * 0.2)
        assert lat.shape[0] == 1
        assert lat.shape[1] == model.config.audio.vae_channels


class TestGenerate:
    def test_generate_stereo_audio(self, model):
        res = list(model.generate("hi", gen_duration=0.15, steps=2,
                                  cfg_scale=1.0, stg_scale=0.0, seed=0))
        assert len(res) == 1
        r = res[0]
        assert r.sample_rate == 48000
        audio = np.asarray(r.audio)
        assert audio.ndim == 2 and audio.shape[1] == 2
        assert np.isfinite(audio).all()

    def test_generate_with_cfg_and_stg(self, model):
        r = list(model.generate("hello there", gen_duration=0.15,
                                steps=2, cfg_scale=2.5, stg_scale=1.5,
                                seed=1))[0]
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_voice_conditioning(self, model):
        ref = np.random.RandomState(1).randn(2500).astype(np.float32)
        r = list(model.generate("cloned line", gen_duration=0.15,
                                steps=2, cfg_scale=1.0, stg_scale=0.0,
                                ref_audio=ref * 0.2, seed=2))[0]
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_requires_text_encoder(self):
        m = Model(_cfg()).init_and_bind()
        with pytest.raises(RuntimeError):
            list(m.generate("x", gen_duration=0.15))

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["dramabox-tts"] == "dramabox"
