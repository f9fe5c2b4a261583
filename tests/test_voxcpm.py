"""VoxCPM + VoxCPM2 (tiny configs): backbone, VAE, CFM, generation modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.voxcpm import Model as V1Model, ModelArgs
from mlx_audio_tpu.tts.models.voxcpm.minicpm import (
    LMConfig,
    init_minicpm,
    minicpm_caches,
    minicpm_forward,
)
from mlx_audio_tpu.tts.models.voxcpm.vae import (
    AudioVAEConfig,
    init_vae_decoder,
    init_vae_encoder,
    vae_decode,
    vae_encode,
)
from mlx_audio_tpu.tts.models.voxcpm2 import (
    Model as V2Model,
    ModelConfig as V2Config,
)


class CharTok:
    def encode(self, s, **kwargs):
        return [10 + (ord(c) % 90) for c in s]

    def tokenize(self, s):
        return list(s)

    def convert_tokens_to_ids(self, toks):
        return [10 + (ord(t[0]) % 90) for t in toks]


V1_ARGS = dict(
    lm_config=dict(hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, num_key_value_heads=2,
                   intermediate_size=64, vocab_size=200, use_mup=False),
    encoder_config=dict(hidden_dim=24, ffn_dim=48, num_heads=4,
                        num_layers=1),
    dit_config=dict(hidden_dim=24, ffn_dim=48, num_heads=4, num_layers=1),
    audio_vae_config=dict(encoder_dim=4, encoder_rates=[2, 2], latent_dim=8,
                          decoder_dim=16, decoder_rates=[2, 2],
                          sample_rate=16000),
    patch_size=2, feat_dim=8, scalar_quantization_latent_dim=16,
    residual_lm_num_layers=1)


class TestMiniCPM:
    def test_decode_matches_prefill(self):
        cfg = LMConfig(hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       intermediate_size=64, vocab_size=0, use_mup=True)
        p = init_minicpm(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32))
        full, _ = minicpm_forward(p, cfg, x)
        caches = minicpm_caches(cfg, 1, 16)
        _, caches = minicpm_forward(p, cfg, x[:, :4], caches, 0)
        step, _ = minicpm_forward(p, cfg, x[:, 4:5], caches, 4)
        np.testing.assert_allclose(np.asarray(full[:, -1]),
                                   np.asarray(step[:, -1]), atol=1e-5)

    def test_no_rope_flag(self):
        cfg = LMConfig(hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=4, num_key_value_heads=2,
                       intermediate_size=64, vocab_size=0, no_rope=True)
        p = init_minicpm(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32))
        out, _ = minicpm_forward(p, cfg, x, is_causal=False)
        # without rope, bidirectional attention is permutation-equivariant
        perm = [1, 0, 3, 2]
        out_p, _ = minicpm_forward(p, cfg, x[:, perm], is_causal=False)
        np.testing.assert_allclose(np.asarray(out[:, perm]),
                                   np.asarray(out_p), atol=1e-5)


class TestVAE:
    def test_encode_decode_shapes(self):
        cfg = AudioVAEConfig(encoder_dim=4, encoder_rates=[2, 2],
                             latent_dim=8, decoder_dim=16,
                             decoder_rates=[2, 2], sample_rate=16000)
        pe = init_vae_encoder(jax.random.PRNGKey(0), cfg)
        pd = init_vae_decoder(jax.random.PRNGKey(1), cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 1))
        z = vae_encode(pe, cfg, x)
        assert z.shape == (1, 16, 8)          # /4 hop
        audio = vae_decode(pd, cfg, z)
        assert audio.shape == (1, 64)
        assert float(jnp.abs(audio).max()) <= 1.0   # tanh output

    def test_sr_conditioning(self):
        cfg = AudioVAEConfig(encoder_dim=4, encoder_rates=[2],
                             latent_dim=8, decoder_dim=16,
                             decoder_rates=[2], sample_rate=16000,
                             out_sample_rate=48000,
                             sr_bin_boundaries=[20000, 30000, 40000])
        pd = init_vae_decoder(jax.random.PRNGKey(0), cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8))
        a48 = vae_decode(pd, cfg, z, sr=48000)
        a24 = vae_decode(pd, cfg, z, sr=24000)
        assert not np.allclose(np.asarray(a48), np.asarray(a24))


@pytest.fixture(scope="module")
def v1():
    m = V1Model(ModelArgs.from_dict(dict(V1_ARGS))).init_and_bind()
    m.tokenizer = CharTok()
    return m


class TestV1:
    def test_zero_shot(self, v1):
        r = list(v1.generate("hello", max_tokens=3, inference_timesteps=4))
        assert r[0].samples > 0 and r[0].sample_rate == 16000

    def test_voice_clone(self, v1):
        ref = np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1
        r = list(v1.generate("hi", ref_text="reference", ref_audio=ref,
                             max_tokens=2, inference_timesteps=4))
        assert r[0].samples > 0

    def test_prompt_feat_patching(self, v1):
        ref = np.zeros(64, np.float32)
        feat = v1.encode_prompt_audio(ref)
        # 64 samples / (hop 4 * patch 2) = 8 patches
        assert feat.shape == (8, 2, 8)


@pytest.fixture(scope="module")
def v2():
    args = dict(V1_ARGS)
    args["lm_config"] = dict(args["lm_config"])
    args["lm_config"].pop("use_mup")
    args["audio_vae_config"] = dict(
        encoder_dim=4, encoder_rates=[2, 2], latent_dim=8, decoder_dim=16,
        decoder_rates=[2, 2, 2], sample_rate=16000, out_sample_rate=48000,
        sr_bin_boundaries=[20000, 30000, 40000])
    args["residual_lm_no_rope"] = True
    m = V2Model(V2Config.from_dict(args)).init_and_bind()
    m.tokenizer = CharTok()
    return m


class TestV2:
    def test_defaults(self, v2):
        assert v2.config.lm_config.use_mup
        assert v2.sample_rate == 48000
        assert v2.encode_sample_rate == 16000

    def test_zero_shot(self, v2):
        r = list(v2.generate("hello", max_tokens=3, inference_timesteps=4))
        assert r[0].samples > 0 and r[0].sample_rate == 48000

    def test_reference_clone(self, v2):
        ref = np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1
        r = list(v2.generate("hi", ref_audio=ref, max_tokens=2,
                             inference_timesteps=4))
        assert r[0].samples > 0

    def test_continuation_trims_prefix(self, v2):
        ref = np.random.RandomState(1).randn(8000).astype(np.float32) * 0.1
        r = list(v2.generate("more", prompt_text="prev", prompt_audio=ref,
                             max_tokens=3, inference_timesteps=4))
        assert r[0].samples > 0

    def test_voice_design(self, v2):
        r = list(v2.generate("styled", instruct="calm", max_tokens=2,
                             inference_timesteps=4, warmup_patches=2))
        assert r[0].samples > 0

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["voxcpm"] == "voxcpm"
        assert MODEL_REMAPPING["voxcpm2"] == "voxcpm2"
