"""bailingmm (Ming-Omni) + dense shim + qwen3 (VyvoTTS) families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.bailingmm import Model, ModelConfig
from mlx_audio_tpu.tts.models.bailingmm.backbones import (
    BailingMoeConfig,
    Qwen2Config,
    bailing_moe_forward,
    group_expert_select,
    init_bailing_moe,
    init_qwen2,
    qwen2_forward,
)
from mlx_audio_tpu.tts.models.bailingmm.bailingmm import get_epss_timesteps
from mlx_audio_tpu.tts.models.dense import Model as DenseModel
from mlx_audio_tpu.tts.models.qwen3 import (
    Model as VyvoModel,
    ModelConfig as VyvoConfig,
)
from mlx_audio_tpu.tts.models.qwen3.qwen3 import (
    AUDIO_TOKENS_START,
    END_OF_SPEECH,
    START_OF_SPEECH,
    deinterleave_snac_codes,
    interleave_snac_codes,
    parse_output,
)

BACKBONE = dict(hidden_size=32, num_hidden_layers=2, intermediate_size=64,
                num_attention_heads=4, num_key_value_heads=2, vocab_size=32)


class CharTok:
    def encode(self, s, **kwargs):
        return [10 + (ord(c) % 200) for c in s]

    def convert_tokens_to_ids(self, t):
        return 5


def _mm_config(llm_extra=None):
    llm = dict(hidden_size=48, num_hidden_layers=2, intermediate_size=96,
               num_attention_heads=4, num_key_value_heads=2, vocab_size=500)
    llm.update(llm_extra or {})
    return ModelConfig.from_dict(dict(
        llm_config=llm,
        audio_tokenizer_config=dict(
            sample_rate=16000, patch_size=2,
            enc_kwargs=dict(backbone=BACKBONE, input_dim=320, hop_size=320,
                            latent_dim=8),
            dec_kwargs=dict(backbone=BACKBONE, output_dim=40, latent_dim=8)),
        ditar_config=dict(patch_size=2, history_patch_size=4,
                          hidden_size=32, depth=2, num_heads=4,
                          mlp_ratio=2.0),
        aggregator_config=dict(hidden_size=32, depth=2, num_heads=4,
                               mlp_ratio=2.0)))


class TestBackbones:
    def test_moe_decode_matches_prefill(self):
        cfg = BailingMoeConfig(
            hidden_size=32, num_hidden_layers=2, intermediate_size=64,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=64,
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
            num_shared_experts=1, first_k_dense_replace=1,
            score_function="softmax")
        p = init_bailing_moe(jax.random.PRNGKey(0), cfg)
        emb = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 32))
        full, _ = bailing_moe_forward(p, cfg, emb)
        one, _ = bailing_moe_forward(p, cfg, emb[:, :1])
        np.testing.assert_allclose(np.asarray(full[:, 0]),
                                   np.asarray(one[:, 0]), atol=1e-5)

    def test_grouped_routing(self):
        gates = jax.random.normal(jax.random.PRNGKey(3), (5, 8))
        cfg = BailingMoeConfig(num_experts=8, num_experts_per_tok=2,
                               n_group=2, topk_group=1)
        inds, w = group_expert_select(gates, cfg, None)
        # topk_group=1: both experts must come from the same group of 4
        assert bool((inds[:, 0] // 4 == inds[:, 1] // 4).all())
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)

    def test_qwen2_sliding_window(self):
        cfg = Qwen2Config(**BACKBONE, use_sliding_window=True,
                          sliding_window=2, max_window_layers=0)
        p = init_qwen2(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32))
        # last position with window 2 must ignore inputs before t-2
        out_a, _ = qwen2_forward(p, cfg, x)
        x2 = x.at[:, 0].set(99.0)
        out_b, _ = qwen2_forward(p, cfg, x2)
        np.testing.assert_allclose(np.asarray(out_a[:, -1]),
                                   np.asarray(out_b[:, -1]), atol=1e-5)

    def test_epss_timesteps(self):
        t = get_epss_timesteps(10)
        assert len(t) == 11 and t[0] == 0.0 and t[-1] == 1.0
        assert len(get_epss_timesteps(3)) == 4  # fallback linspace


class TestMingOmni:
    def test_dense_generate(self):
        m = Model(_mm_config()).init_and_bind()
        m.tokenizer = CharTok()
        res = list(m.generate("hello", max_tokens=5, ddpm_steps=5))
        assert res[0].samples > 0
        assert res[0].sample_rate == 16000

    def test_moe_generate(self):
        m = Model(_mm_config(dict(
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=24,
            num_shared_experts=1, norm_topk_prob=True,
            first_k_dense_replace=1))).init_and_bind()
        assert m.is_moe
        m.tokenizer = CharTok()
        res = list(m.generate("hello", max_tokens=4, ddpm_steps=5))
        assert res[0].samples > 0

    def test_voice_clone_path(self):
        m = Model(_mm_config()).init_and_bind()
        m.tokenizer = CharTok()
        ref = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
        res = list(m.generate("hi", ref_audio=ref, ref_text="ref",
                              max_tokens=4, ddpm_steps=5))
        assert res[0].samples > 0

    def test_encode_latent_shape(self):
        m = Model(_mm_config()).init_and_bind()
        wav = np.zeros((1, 16000), np.float32)
        lat = m.encode_latent(wav)
        # 16000/320 = 50 frames, patch 2 -> 25 latents
        assert lat.shape == (1, 25, 8)

    def test_dense_shim_forces_qwen2(self):
        cfg = _mm_config(dict(
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=24,
            num_shared_experts=1, norm_topk_prob=True,
            first_k_dense_replace=1))
        d = DenseModel(dict(
            llm_config=cfg.text_config,
            audio_tokenizer_config=cfg.audio_tokenizer_config,
            ditar_config=cfg.ditar_config,
            aggregator_config=cfg.aggregator_config))
        assert not d.is_moe and d.model_type == "dense"


class TestVyvo:
    def test_snac_interleave_round_trip(self):
        l1 = [1, 2]
        l2 = [3, 4, 5, 6]
        l3 = [7, 8, 9, 10, 11, 12, 13, 14]
        assert deinterleave_snac_codes(
            interleave_snac_codes(l1, l2, l3)) == (l1, l2, l3)

    def test_parse_output(self):
        ids = ([5, START_OF_SPEECH]
               + [AUDIO_TOKENS_START + i for i in range(15)]
               + [END_OF_SPEECH])
        assert parse_output(ids) == list(range(14))

    def test_generate(self):
        cfg = VyvoConfig.from_dict(dict(
            vocab_size=151700, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, tie_word_embeddings=True))
        m = VyvoModel(cfg).init_and_bind()
        m.tokenizer = CharTok()
        res = list(m.generate("hello world", voice="zoe", max_tokens=16))
        assert res and res[0].token_count <= 16

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        for k in ("qwen3", "vyvotts", "bailingmm", "ming_omni_tts",
                  "dense"):
            assert k in MODEL_REMAPPING
