"""Echo-TTS (tiny config): byte tokenizer, joint-attention DiT, samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.echo_tts import Model, ModelConfig
from mlx_audio_tpu.tts.models.echo_tts.echo_tts import (
    EchoDiTConfig,
    SamplerConfig,
    build_kv_caches,
    dit_forward,
    normalize_text_prompt,
    text_encode,
    tokenize_bytes,
)

TINY = EchoDiTConfig(
    latent_size=8, model_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, text_vocab_size=256, text_model_size=16,
    text_num_layers=2, text_num_heads=2, text_intermediate_size=32,
    speaker_patch_size=2, speaker_model_size=16, speaker_num_layers=2,
    speaker_num_heads=2, speaker_intermediate_size=32,
    timestep_embed_size=8, adaln_rank=4)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(dit=TINY,
                      sampler=SamplerConfig(num_steps=3,
                                            sequence_length=16))
    return Model(cfg).init_and_bind()


class TestText:
    def test_normalize_adds_speaker_tag(self):
        assert normalize_text_prompt("hello").startswith("[S1] ")

    def test_normalize_keeps_existing_tag(self):
        assert normalize_text_prompt("[S2] hi") == "[S2] hi"

    def test_tokenize_bos_and_bytes(self):
        ids = tokenize_bytes("ab", normalize=False)
        assert ids[0] == 0 and list(ids[1:]) == [97, 98]

    def test_tokenize_utf8(self):
        ids = tokenize_bytes("é", normalize=False)
        assert len(ids) == 3  # BOS + 2 utf-8 bytes


class TestDiT:
    def test_text_encoder_shape(self, model):
        ids = jnp.asarray([[0, 65, 66, 67]])
        mask = jnp.ones((1, 4), bool)
        out = text_encode(model.params, TINY, ids, mask)
        assert out.shape == (1, 4, TINY.text_model_size)

    def test_velocity_field_shape(self, model):
        p = model.params
        ids = jnp.asarray([[0, 65, 66]])
        tm = jnp.ones((1, 3), bool)
        spk = jnp.zeros((1, 4, TINY.latent_size))
        sm = jnp.ones((1, 4), bool)
        from mlx_audio_tpu.tts.models.echo_tts.echo_tts import (
            _patched_encode,
        )

        ts = text_encode(p, TINY, ids, tm)
        ss = _patched_encode(p["speaker_encoder"],
                             p["speaker_norm"]["weight"], TINY, spk)
        kvs = build_kv_caches(p, TINY, ts, ss)
        x = jnp.zeros((1, 6, TINY.latent_size))
        v = dit_forward(p, TINY, x, jnp.asarray([0.5]), tm, sm, kvs)
        assert v.shape == (1, 6, TINY.latent_size)
        assert v.dtype == jnp.float32

    def test_kv_cache_layers(self, model):
        p = model.params
        ts = text_encode(p, TINY, jnp.asarray([[0]]),
                         jnp.ones((1, 1), bool))
        from mlx_audio_tpu.tts.models.echo_tts.echo_tts import (
            _patched_encode,
        )

        ss = _patched_encode(p["speaker_encoder"],
                             p["speaker_norm"]["weight"], TINY,
                             jnp.zeros((1, 2, TINY.latent_size)))
        kvs = build_kv_caches(p, TINY, ts, ss)
        assert len(kvs["text"]) == TINY.num_layers
        assert kvs["text"][0][0].shape == (
            1, 1, TINY.num_heads, TINY.model_size // TINY.num_heads)


class TestSampling:
    def test_generate_latents_shape(self, model):
        lat = model.generate_latents("hi", rng_seed=0)
        assert lat.shape == (1, 16, TINY.latent_size)
        assert np.isfinite(lat).all()

    def test_deterministic_per_seed(self, model):
        a = model.generate_latents("hi", rng_seed=3)
        b = model.generate_latents("hi", rng_seed=3)
        c = model.generate_latents("hi", rng_seed=4)
        np.testing.assert_allclose(a, b)
        assert np.abs(a - c).max() > 1e-6

    def test_blockwise_latents(self, model):
        lat = model.generate_latents("hi", rng_seed=0,
                                     block_sizes=[4, 4])
        assert lat.shape == (1, 8, TINY.latent_size)
        assert np.isfinite(lat).all()

    def test_speaker_kv_scale_changes_output(self, model):
        spk = np.random.RandomState(0).randn(
            1, 4, TINY.latent_size).astype(np.float32)
        mask = np.ones((1, 4), bool)
        a = model.generate_latents("hi", speaker_latent=spk,
                                   speaker_mask=mask, rng_seed=0)
        b = model.generate_latents("hi", speaker_latent=spk,
                                   speaker_mask=mask, rng_seed=0,
                                   speaker_kv_scale=2.0,
                                   speaker_kv_min_t=0.4)
        assert np.abs(a - b).max() > 1e-6

    def test_rescale_changes_output(self, model):
        a = model.generate_latents("hi", rng_seed=0)
        b = model.generate_latents("hi", rng_seed=0, rescale_k=0.8,
                                   rescale_sigma=1.0)
        assert np.abs(a - b).max() > 1e-6


class TestModel:
    def test_flattening_point(self):
        lat = np.zeros((40, 8), np.float32)
        lat[:10] = np.random.RandomState(0).randn(10, 8)
        assert 8 <= Model.find_flattening_point(lat, window=5) <= 12

    def test_generate_without_codec(self, model):
        res = list(model.generate("hello world", rng_seed=0))
        assert len(res) == 1
        assert res[0].sample_rate == 44100

    def test_pca_roundtrip(self, model):
        rng = np.random.RandomState(0)
        comp = np.linalg.qr(rng.randn(24, 24))[0][:8].astype(np.float32)
        model.pca_state = {
            "pca_components": jnp.asarray(comp),
            "pca_mean": jnp.zeros(24),
            "latent_scale": jnp.asarray(2.0)}
        z = rng.randn(1, 5, 24).astype(np.float32) @ comp.T @ comp
        enc = model._pca_encode(jnp.asarray(z))
        dec = np.asarray(model._pca_decode(enc))
        np.testing.assert_allclose(dec, z, atol=1e-4)
        model.pca_state = None

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["echo_tts"] == "echo_tts"
        assert MODEL_REMAPPING["echo"] == "echo_tts"


class TestFishZq:
    def test_encode_decode_zq_shapes(self):
        from mlx_audio_tpu.codec.models.fish_s1_dac import (
            Model as DAC,
            ModelConfig as DACConfig,
        )

        cfg = DACConfig.from_dict(dict(
            encoder_dim=4, encoder_rates=[2, 4], latent_dim=16,
            decoder_dim=16, decoder_rates=[4, 2],
            encoder_transformer_layers=[0, 1], n_codebooks=2,
            codebook_size=16, codebook_dim=4, semantic_codebook_size=32,
            downsample_factor=[2], vq_dim=16,
            vq_transformer=dict(n_layer=1, n_head=2, dim=16,
                                intermediate_size=32, head_dim=8),
            vq_window=8, enc_window=8))
        dac = DAC(cfg).init_and_bind()
        audio = np.random.RandomState(0).randn(64).astype(np.float32)
        zq = dac.encode_zq(audio)
        assert zq.ndim == 3 and zq.shape[0] == 1
        assert zq.shape[2] == cfg.vq_dim
        out = dac.decode_zq(zq)
        assert out.shape[0] == 1
        assert out.shape[1] == zq.shape[1] * cfg.frame_length
