"""ZONOS2 (tiny config): prompt/shear, textnorm, MoE backbone, AR decode."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.zonos2 import Model, ModelConfig
from mlx_audio_tpu.tts.models.zonos2.model import (
    compute_logits,
    zonos2_forward,
)
from mlx_audio_tpu.tts.models.zonos2.prompt import (
    BYTE_TEXT_VOCAB_SIZE,
    TTSPromptBuilder,
    TTSPromptConfig,
    shear,
    shear_up,
    speaking_rate_token_id,
    text_to_byte_ids,
)
from mlx_audio_tpu.tts.models.zonos2.textnorm import normalize_english_text


def _cfg():
    return ModelConfig(
        n_layers=4, dim=32, head_dim=8, n_heads=4, n_kv_heads=2,
        ffn_dim_multiplier=1.5, multiple_of=8, n_codebooks=3,
        codebook_size=30, eoa_id=30, audio_pad_id=31, text_vocab=519,
        speaker_embedding_dim=16, speaker_lda_dim=8,
        moe_n_experts=4, moe_router_dim=8, moe_start_from_layer=1,
        moe_end_from_layer=1, special_topk_layers={2: 2})


@pytest.fixture(scope="module")
def model():
    return Model(_cfg()).init_and_bind()


class TestPrompt:
    def test_byte_ids(self):
        ids = text_to_byte_ids("ab")
        assert ids[0] == 2 and ids[-1] == 3
        assert ids[1] == 192 + ord("a")

    def test_shear_roundtrip(self):
        x = np.arange(12).reshape(4, 3).astype(np.int32)
        sheared = shear(x, 99)
        assert sheared.shape == (4, 3)
        assert sheared[0, 1] == 99      # delayed column padded
        un = shear_up(np.concatenate(
            [sheared, np.full((2, 3), 99, np.int32)]), 99)
        np.testing.assert_array_equal(un[:4, 0], x[:, 0])

    def test_conditioning_token_layout(self):
        cfg = TTSPromptConfig()
        base = cfg.text_vocab - 8 - 60 - 2 - 1
        assert base >= BYTE_TEXT_VOCAB_SIZE
        assert speaking_rate_token_id(cfg, 0) == base
        assert speaking_rate_token_id(cfg, 7) == base + 7

    def test_builder_rows(self):
        cfg = TTSPromptConfig(n_codebooks=3)
        b = TTSPromptBuilder(cfg)
        rows = b.build_list("hi", speaking_rate_bucket=2)
        assert all(len(r) == 4 for r in rows)
        # marker + BOS,h,i,EOS + 17 silence rows
        assert len(rows) == 1 + 4 + 17
        prefix = b.speaker_marker_prefix()
        assert len(prefix) == 3  # slot + background + accurate


class TestTextnorm:
    def test_numbers_dates_money(self):
        assert normalize_english_text("3 cats") == "three cats"
        assert "march third" in normalize_english_text("2024-03-03")
        assert "five dollars" in normalize_english_text("$5")
        assert "fifty percent" in normalize_english_text("50%")
        assert "n a s a" == normalize_english_text("NASA")

    def test_time_and_units(self):
        out = normalize_english_text("at 3:05 pm")
        assert "three oh five p m" in out
        assert "two kilometers" in normalize_english_text("2 km")


class TestBackbone:
    def test_forward_and_logits(self, model):
        cfg = model.config
        ids = jnp.full((1, 5, cfg.frame_width), 3, jnp.int32)
        h, _ = zonos2_forward(model.params, cfg, ids)
        assert h.shape == (1, 5, cfg.dim)
        logits = compute_logits(model.params, cfg, h)
        assert logits.shape == (1, 5, cfg.n_codebooks,
                                cfg.audio_vocab_size)
        assert float(jnp.abs(logits).max()) <= cfg.loss_softcap + 1e-3

    def test_moe_layers_flagged(self, model):
        cfg = model.config
        assert not cfg.is_moe_layer(0)
        assert cfg.is_moe_layer(1) and cfg.is_moe_layer(2)
        assert not cfg.is_moe_layer(3)
        assert cfg.num_experts_per_tok(2) == 2
        assert cfg.num_experts_per_tok(1) == 1

    def test_speaker_injection_changes_hidden(self, model):
        cfg = model.config
        ids = jnp.full((1, 4, cfg.frame_width), 3, jnp.int32)
        spk = jnp.ones((1, cfg.dim))
        a, _ = zonos2_forward(model.params, cfg, ids)
        b, _ = zonos2_forward(model.params, cfg, ids, speaker_proj=spk,
                              speaker_pos=jnp.asarray([0]))
        assert float(jnp.abs(a - b).max()) > 1e-6


class TestGenerate:
    def test_generate_frames(self, model):
        res = list(model.generate("hi", max_new_tokens=8, seed=0,
                                  text_normalization=False))
        assert len(res) == 1
        r = res[0]
        assert r.sample_rate == 44100
        assert r.token_count <= 8
        # no DAC bound -> silence placeholder sized by frames
        assert r.samples % 512 == 0

    def test_greedy_deterministic(self, model):
        a = list(model.generate("ab", max_new_tokens=6, temperature=0.0,
                                seed=1))[0]
        b = list(model.generate("ab", max_new_tokens=6, temperature=0.0,
                                seed=1))[0]
        assert a.token_count == b.token_count

    def test_speaker_conditioned_prompt(self, model):
        emb = np.random.RandomState(0).randn(16).astype(np.float32)
        r = list(model.generate("hi", max_new_tokens=6, seed=0,
                                speaker_embedding=emb))[0]
        assert r.token_count <= 6

    def test_batch_generate(self, model):
        outs = list(model.batch_generate(["a", "b"], max_new_tokens=4,
                                         seed=0))
        assert [o.sequence_idx for o in outs] == [0, 1]

    def test_batch_rejects_str(self, model):
        with pytest.raises(TypeError):
            list(model.batch_generate("not a list"))

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["zonos2"] == "zonos2"


class TestSanitize:
    def test_chunked_linear_reshape(self, model):
        w = {"layers.0.attention.wkv.weight": np.zeros((2, 16, 32)),
             "layers.0.feed_forward.w_in.weight": np.zeros((2, 48, 32))}
        out = model.sanitize(w)
        assert out["layers.0.attention.wkv.weight"].shape == (32, 32)
        assert out["layers.0.feed_forward.w_in.weight"].shape == (96, 32)
