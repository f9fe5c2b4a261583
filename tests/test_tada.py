"""TADA: gray code, schedules, codec, generation modes (tiny config)."""

import jax
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.tada import Model, ModelConfig
from mlx_audio_tpu.tts.models.tada.codec import segment_attention_mask
from mlx_audio_tpu.tts.models.tada.tada import (
    align_text_tokens,
    build_time_schedule,
    gray_bits_to_int,
    int_to_gray_bits,
    normalize_text,
    scheduled_cfg,
)


class TestHelpers:
    def test_gray_round_trip(self):
        for n in (0, 1, 7, 128, 255):
            assert gray_bits_to_int(int_to_gray_bits(n, 8)) == n

    def test_time_schedules(self):
        for sched in ("cosine", "logsnr", "linear"):
            t = build_time_schedule(8, sched)
            assert len(t) == 9
            assert t[0] == pytest.approx(0.0) and t[-1] == pytest.approx(1.0)
            assert (np.diff(t) >= 0).all()

    def test_scheduled_cfg(self):
        assert scheduled_cfg(1.6, 0.5, "constant") == 1.6
        assert scheduled_cfg(1.6, 1.0, "linear") == pytest.approx(1.0)
        assert scheduled_cfg(1.6, 0.0, "cosine") == pytest.approx(1.6)

    def test_normalize_text(self):
        out = normalize_text('he said: "yes" -- ok…')
        assert '"' not in out and ":" not in out
        assert out[0].isupper()

    def test_segment_mask_v2(self):
        import jax.numpy as jnp

        tm = jnp.asarray([[0, 1, 0, 1, 0]], jnp.int32)
        mask = np.asarray(segment_attention_mask(tm, "v2"))[0]
        # blocks: [0,1], [2,3], [4]; v2 = same or previous block
        assert not mask[0, 0]      # same block
        assert not mask[2, 0]      # previous block visible
        assert mask[0, 2]          # future block hidden
        assert mask[4, 0]          # two blocks back hidden

    def test_align_monotonic(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(50, 30).astype(np.float32)
        toks = np.array([3, 7, 11, 19])
        pos, mask = align_text_tokens(logits, toks, 24000, 24000)
        assert (np.diff(pos) > 0).all()
        assert mask.sum() == len(np.unique(pos))


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        vocab_size=300, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, acoustic_dim=16, num_time_classes=16,
        shift_acoustic=2, head_layers=2, head_ffn_ratio=2.0,
        decoder_hidden_dim=24, decoder_d_model=4, decoder_embed_dim=16,
        decoder_strides=[2, 2], decoder_num_attn_layers=1,
        decoder_num_attn_heads=4, decoder_attn_dim_feedforward=48,
        encoder_hidden_dim=24, encoder_embed_dim=16, encoder_strides=[2, 2],
        encoder_num_attn_layers=1, encoder_num_attn_heads=4,
        encoder_attn_dim_feedforward=48)
    m = Model(cfg).init_and_bind()

    class Tok:
        bos_token_id = 1

        def encode(self, s, **kwargs):
            return [10 + (ord(c) % 200) for c in s]

        def convert_tokens_to_ids(self, t):
            return {"<|eot_id|>": 5, "<|start_header_id|>": 6,
                    "<|end_header_id|>": 7,
                    "<|finetune_right_pad_id|>": 8}.get(t, 9)

    m._tokenizer = Tok()
    return m


class TestGenerate:
    def test_zero_shot(self, model):
        r = list(model.generate("hi there", max_tokens=16,
                                num_flow_matching_steps=4))
        assert r[0].samples > 0
        assert r[0].sample_rate == 24000

    def test_voice_clone(self, model):
        model.init_encoder_params(jax.random.PRNGKey(1))
        ref = np.random.RandomState(0).randn(4800).astype(np.float32) * 0.1
        r = list(model.generate("more", ref_audio=ref, ref_text="prev",
                                max_tokens=20, num_flow_matching_steps=4))
        assert r[0].samples > 0

    def test_speed_control_two_pass(self, model):
        r = list(model.generate("fast", max_tokens=12,
                                num_flow_matching_steps=4,
                                speed_up_factor=1.5))
        assert r[0].samples > 0

    def test_no_cfg_path(self, model):
        r = list(model.generate("plain", max_tokens=10,
                                num_flow_matching_steps=4,
                                acoustic_cfg_scale=1.0))
        assert r[0].samples > 0

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["tada"] == "tada"
