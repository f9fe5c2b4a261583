"""Qwen3-TTS voice cloning (ICL), instruct prompts, and batch_generate.

Tiny-config tests covering reference qwen3_tts.py:506-668 (ICL prompt),
:2074 (CustomVoice), :2151 (VoiceDesign), :1659 (batch_generate), plus the
speech-tokenizer encoder (Mimi stack) and ECAPA speaker encoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig
from mlx_audio_tpu.tts.models.qwen3_tts.speaker_encoder import (
    init_speaker_encoder,
    speaker_encoder_forward,
    speaker_mel,
)
from mlx_audio_tpu.tts.models.qwen3_tts.speech_tokenizer import (
    encoder_mimi_config,
)

TINY_ENCODER_CFG = dict(
    hidden_size=16, num_filters=4, num_residual_layers=1,
    upsampling_ratios=[4, 3], kernel_size=3, residual_kernel_size=3,
    last_kernel_size=3, num_attention_heads=2, num_hidden_layers=1,
    intermediate_size=32, sliding_window=16, num_quantizers=4,
    codebook_size=64, codebook_dim=8, sampling_rate=24000,
    frame_rate=24000 / (4 * 3 * 2))

TINY_SPK_CFG = dict(
    mel_dim=128, enc_dim=32, enc_channels=[8, 8, 8, 16],
    enc_kernel_sizes=[3, 3, 3, 1], enc_dilations=[1, 2, 3, 1],
    enc_attention_channels=8, enc_res2net_scale=4, enc_se_channels=8)


def tiny_cfg(**over):
    d = dict(
        talker_config=dict(
            vocab_size=300, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, num_code_groups=4, text_hidden_size=48,
            text_vocab_size=500, codec_eos_token_id=280, codec_think_id=284,
            codec_nothink_id=285, codec_think_bos_id=286,
            codec_think_eos_id=287, codec_pad_id=278, codec_bos_id=279,
            code_predictor_config=dict(
                vocab_size=256, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=8, num_code_groups=4),
        ),
        tokenizer_config=dict(
            encoder_config=TINY_ENCODER_CFG,
            encoder_valid_num_quantizers=4,
            decoder_config=dict(
                latent_dim=32, codebook_dim=16, codebook_size=256,
                decoder_dim=64, hidden_size=24, intermediate_size=48,
                head_dim=8, num_attention_heads=3, num_hidden_layers=2,
                num_key_value_heads=3, num_quantizers=4,
                num_semantic_quantizers=1, sliding_window=16,
                upsample_rates=[4, 3], upsampling_ratios=[2, 2])),
        speaker_encoder_config=TINY_SPK_CFG,
    )
    d.update(over)
    return ModelConfig(**d)


class FakeTokenizer:
    def encode(self, text):
        # 3-token role prefix, body, 5-token (or 2-token) template tail are
        # what the slicing relies on; emit one id per character so lengths
        # track the string.
        return [(ord(c) % 400) for c in text]


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_cfg()).init_and_bind()
    # attach encoder + speaker-encoder params the way a checkpoint load would
    from mlx_audio_tpu.codec.models.mimi.mimi import Mimi

    enc = Mimi(encoder_mimi_config(TINY_ENCODER_CFG))
    m.params["speech_tokenizer"]["encoder"] = enc.init_params(
        jax.random.PRNGKey(1))
    m.params["speaker_encoder"] = init_speaker_encoder(
        jax.random.PRNGKey(2), m.config.speaker_encoder_config)
    m.tokenizer = FakeTokenizer()
    return m


class TestSpeakerEncoder:
    def test_embedding_shape(self, model):
        cfg = model.config.speaker_encoder_config
        mels = jnp.asarray(np.random.RandomState(0).randn(2, 50, cfg.mel_dim),
                           jnp.float32)
        emb = speaker_encoder_forward(model.params["speaker_encoder"], cfg,
                                      mels)
        assert emb.shape == (2, cfg.enc_dim)
        assert np.isfinite(np.asarray(emb)).all()

    def test_speaker_mel_shape(self):
        mel = speaker_mel(np.random.RandomState(1).randn(24000))
        assert mel.shape[0] == 1 and mel.shape[2] == 128

    def test_extract_speaker_embedding(self, model):
        emb = model.extract_speaker_embedding(
            np.random.RandomState(2).randn(4800).astype(np.float32))
        assert emb.shape == (1, model.config.speaker_encoder_config.enc_dim)


class TestRefEncoder:
    def test_encode_ref_audio_codes(self, model):
        codes = model.encode_ref_audio(
            np.random.RandomState(0).randn(24 * 100).astype(np.float32))
        assert codes.shape[0] == 1 and codes.shape[1] == 4
        assert codes.shape[2] >= 1
        c = np.asarray(codes)
        assert (c >= 0).all() and (c < 64).all()


class TestICL:
    def test_prepare_icl_inputs_layout(self, model):
        ref_audio = np.random.RandomState(0).randn(2400).astype(np.float32)
        embeds, trailing, pad, ref_codes = model.prepare_icl_inputs(
            "hello world", ref_audio, "reference words")
        d = model.tcfg.hidden_size
        assert embeds.ndim == 3 and embeds.shape[2] == d
        # trailing in ICL mode is just the pad embed
        assert trailing.shape == (1, 1, d)
        ref_len = np.asarray(ref_codes).shape[-1]
        # role(3) + prefix(5 w/ speaker) + text(+eos) + bos + ref codec frames
        assert embeds.shape[1] > ref_len + 3

    def test_generate_icl_end_to_end(self, model):
        ref_audio = np.random.RandomState(1).randn(2400).astype(np.float32)
        results = list(model.generate(
            "hi there", ref_audio=ref_audio, ref_text="ref text",
            temperature=0.0, max_tokens=6))
        assert len(results) == 1
        assert results[0].samples > 0
        assert np.isfinite(np.asarray(results[0].audio)).all()

    def test_icl_ref_cache_reused(self, model):
        ref_audio = np.random.RandomState(3).randn(2400).astype(np.float32)
        def entries():
            return [k for k in model._jit_cache
                    if isinstance(k, tuple) and k
                    and k[0] == "icl_ref" and k[1] == "same ref"]

        model.prepare_icl_inputs("one", ref_audio, "same ref")
        n_before = len(entries())
        model.prepare_icl_inputs("two", ref_audio, "same ref")
        assert n_before == len(entries()) == 1

    def test_ref_audio_without_ref_text_uses_xvector(self, model):
        results = list(model.generate(
            "hello", ref_audio=np.random.RandomState(4).randn(2400)
            .astype(np.float32), temperature=0.0, max_tokens=4))
        assert len(results) == 1

    def test_ref_audio_without_speaker_encoder_raises(self):
        m = Model(tiny_cfg()).init_and_bind()
        m.tokenizer = FakeTokenizer()
        with pytest.raises(ValueError, match="speaker encoder"):
            list(m.generate("hello",
                            ref_audio=np.zeros(2400, np.float32),
                            max_tokens=4))


class TestInstructModes:
    def test_instruct_prepended(self, model):
        base, _, _ = model.prepare_inputs(text="hello")
        instr, _, _ = model.prepare_inputs(text="hello", instruct="angry")
        assert instr.shape[1] > base.shape[1]

    def test_custom_voice_requires_model_type(self, model):
        with pytest.raises(ValueError, match="custom_voice"):
            list(model.generate_custom_voice("hi", speaker="vivian"))

    def test_voice_design_path(self):
        m = Model(tiny_cfg(tts_model_type="voice_design")).init_and_bind()
        m.tokenizer = FakeTokenizer()
        out = list(m.generate_voice_design(
            "hello", instruct="a deep calm voice", temperature=0.0,
            max_tokens=4))
        assert len(out) == 1 and out[0].samples >= 0


class TestBatchGenerate:
    def test_batch_generate_order_and_shapes(self, model):
        results = list(model.batch_generate(
            ["first text", "second slightly longer text", "third"],
            temperature=0.0, max_tokens=6))
        assert [r.sequence_idx for r in results] == [0, 1, 2]
        for r in results:
            assert r.sample_rate == model.sample_rate
            assert np.isfinite(np.asarray(r.audio)).all()

    def test_batch_matches_single_greedy(self, model):
        """Greedy batch rows equal the serial greedy generation."""
        text = "parity check"
        single = list(model.generate(text, temperature=0.0, max_tokens=6))
        batch = list(model.batch_generate([text], temperature=0.0,
                                          max_tokens=6))
        a = np.asarray(single[-1].audio)
        b = np.asarray(batch[0].audio)
        # the serial path rounds generation up to chunk boundaries, so
        # lengths may differ; the decoded prefix must agree
        n = min(len(a), len(b))
        assert n >= 4 * model.total_upsample
        np.testing.assert_allclose(a[:n], b[:n], atol=2e-3)


class TestEncoderSanitize:
    def test_hf_encoder_keys_map_to_mimi_tree(self, model):
        """Reference-named encoder checkpoint keys land on real leaves of
        the Mimi encode-path tree."""
        from mlx_audio_tpu.model import _leaf_paths

        enc_tree = model.params["speech_tokenizer"]["encoder"]
        valid = set("speech_tokenizer.encoder." + p
                    for p in _leaf_paths(enc_tree))
        hf = {
            "encoder.encoder.layers.0.conv.weight": np.zeros((4, 1, 3)),
            "encoder.encoder.layers.0.conv.bias": np.zeros(4),
            "encoder.encoder.layers.1.block.1.conv.weight":
                np.zeros((2, 4, 3)),
            "encoder.encoder.layers.1.block.3.conv.weight":
                np.zeros((4, 2, 1)),
            "encoder.encoder.layers.3.conv.weight": np.zeros((8, 4, 8)),
            "encoder.encoder_transformer.layers.0.self_attn.q_proj.weight":
                np.zeros((16, 16)),
            "encoder.encoder_transformer.layers.0.self_attn.k_proj.weight":
                np.zeros((16, 16)),
            "encoder.encoder_transformer.layers.0.self_attn.v_proj.weight":
                np.zeros((16, 16)),
            "encoder.encoder_transformer.layers.0.self_attn.o_proj.weight":
                np.zeros((16, 16)),
            "encoder.encoder_transformer.layers.0.mlp.fc1.weight":
                np.zeros((32, 16)),
            "encoder.encoder_transformer.layers.0.input_layernorm.weight":
                np.zeros(16),
            "encoder.encoder_transformer.layers.0.self_attn_layer_scale"
            ".scale": np.zeros(16),
            "encoder.downsample.conv.weight": np.zeros((16, 16, 4)),
            "encoder.quantizer.semantic_residual_vector_quantizer."
            "input_proj.weight": np.zeros((8, 16, 1)),
            "encoder.quantizer.acoustic_residual_vector_quantizer.vq."
            "layers.0.codebook.cluster_usage": np.ones(64),
            "encoder.quantizer.acoustic_residual_vector_quantizer.vq."
            "layers.0.codebook.embed_sum": np.ones((64, 8)),
        }
        out = Model._sanitize_ref_encoder(hf)
        assert out, "no keys mapped"
        for k in out:
            assert k in valid, f"mapped key not in mimi tree: {k}"
