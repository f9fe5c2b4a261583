"""KugelAudio: SDE-DPM tables + AR/diffusion loop (tiny config)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.kugelaudio import Model, ModelConfig
from mlx_audio_tpu.tts.models.kugelaudio.kugelaudio import (
    EOS_TOKEN_ID,
    SPEECH_DIFFUSION_ID,
    SPEECH_END_ID,
    SPEECH_START_ID,
    VALID_SPEECH_TOKENS,
)
from mlx_audio_tpu.tts.models.vibevoice.scheduler import sde_dpm_tables


class CharTok:
    def encode(self, s, **kwargs):
        return [100 + (ord(c) % 200) for c in s]


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.from_dict(dict(
        acoustic_tokenizer_config=dict(vae_dim=8, decoder_n_filters=4,
                                       encoder_ratios=[2, 2],
                                       encoder_depths="1-1-1", channels=1),
        decoder_config=dict(hidden_size=32, num_hidden_layers=2,
                            intermediate_size=64, num_attention_heads=4,
                            num_key_value_heads=2, vocab_size=151700),
        diffusion_head_config=dict(hidden_size=32, head_layers=2,
                                   head_ffn_ratio=2.0, latent_size=8,
                                   ddpm_num_steps=1000,
                                   ddpm_num_inference_steps=4),
        acoustic_vae_dim=8, tie_word_embeddings=False))
    m = Model(cfg).init_and_bind()
    m.tokenizer = CharTok()
    return m


class TestScheduler:
    def test_sde_tables(self):
        t = sde_dpm_tables(1000, 10)
        assert len(t["t"]) == 10
        # final step reaches sigma=0: no injected noise, sample term dies
        assert t["c_noise"][-1] == 0.0
        assert t["a_sample"][-1] == 0.0
        # first + last steps are order-1
        assert t["use_first"][0] == 1.0 and t["use_first"][-1] == 1.0

    def test_config_typo_alias(self):
        cfg = ModelConfig.from_dict(dict(acostic_vae_dim=32))
        assert cfg.acoustic_vae_dim == 32


class TestGenerate:
    def test_prompt_frame(self, model):
        toks = model._build_prompt_tokens("hi there")
        assert toks[-1] == SPEECH_START_ID

    def test_valid_token_constraint(self, model):
        # whatever the weights, the picked token is one of the 4 valid ids
        res = list(model.generate("hello", max_tokens=3, cfg_scale=1.0,
                                  ddpm_steps=4))
        assert res[0].token_count > 0

    def test_forced_diffusion_decodes(self, model):
        # bias the head so speech_diffusion wins initially -> latents flow
        # through connector + VAE decode (hop = prod(ratios) = 4)
        for sign in (10.0, -10.0):
            w = np.zeros_like(np.asarray(model.params["lm_head"]["weight"]))
            w[SPEECH_DIFFUSION_ID] = sign
            model.params["lm_head"]["weight"] = jnp.asarray(w)
            res = list(model.generate("x", max_tokens=5, cfg_scale=3.0,
                                      ddpm_steps=4))
            if res[0].samples:
                assert res[0].samples % 4 == 0
                return
        pytest.fail("diffusion branch never taken for either bias sign")

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["kugelaudio"] == "kugelaudio"
        assert set(VALID_SPEECH_TOKENS) == {SPEECH_START_ID, SPEECH_END_ID,
                                            SPEECH_DIFFUSION_ID,
                                            EOS_TOKEN_ID}
