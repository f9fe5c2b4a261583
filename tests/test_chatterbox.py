"""Chatterbox: T3 CFG decode, s3gen flow, voice encoder, glue."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.chatterbox.chatterbox import (
    Model, ModelConfig, drop_invalid_tokens, punc_norm)
from mlx_audio_tpu.tts.models.chatterbox.s3gen.flow import (S3GenConfig,
                                                            S3Token2Wav)
from mlx_audio_tpu.tts.models.chatterbox.s3gen.hifigan import HiFTConfig
from mlx_audio_tpu.tts.models.chatterbox.s3gen.matcha import DecoderConfig
from mlx_audio_tpu.tts.models.chatterbox.s3gen.xvector import \
    CAMPPlusConfig
from mlx_audio_tpu.tts.models.chatterbox.t3 import T3, T3Config
from mlx_audio_tpu.tts.models.chatterbox.voice_encoder import VoiceEncoder


def _t3_cfg():
    return T3Config(text_tokens_dict_size=64, start_text_token=1,
                    stop_text_token=0, speech_tokens_dict_size=40,
                    start_speech_token=32, stop_speech_token=33,
                    max_text_tokens=128, max_speech_tokens=128,
                    speech_cond_prompt_len=8, speaker_embed_size=256,
                    hidden_size=16, num_hidden_layers=1,
                    intermediate_size=32, num_attention_heads=2,
                    num_key_value_heads=2, head_dim=8,
                    perceiver_tokens=4, perceiver_heads=2)


def _s3gen_cfg():
    cp = CAMPPlusConfig(feat_dim=16, embedding_size=12, growth_rate=4,
                        bn_size=2, init_channels=8, m_channels=8)
    cp.block_layers = (2, 2, 2)
    return S3GenConfig(
        input_size=16, output_size=8, spk_embed_dim=12, vocab_size=32,
        num_blocks=1, num_up_blocks=1, up_stride=2, pre_lookahead_len=3,
        attention_heads=2, linear_units=32, n_timesteps=2,
        decoder=DecoderConfig(in_channels=32, out_channels=8,
                              channels=(16,), attention_head_dim=8,
                              n_blocks=1, num_mid_blocks=1, num_heads=2),
        hift=HiFTConfig(in_channels=8, base_channels=16, nb_harmonics=2,
                        upsample_rates=[4, 3],
                        upsample_kernel_sizes=[8, 7],
                        source_resblock_kernel_sizes=[7, 7],
                        source_resblock_dilation_sizes=[[1, 3], [1, 3]],
                        resblock_kernel_sizes=[3],
                        resblock_dilation_sizes=[[1, 3]]),
        campplus=cp)


class _FakeTok:
    def text_to_tokens(self, text):
        return np.asarray([[min(ord(c), 30) for c in text][:12]],
                          np.int32)


class _FakeS3Tok:
    def encode(self, audio):
        n = max(1, len(np.asarray(audio).reshape(-1)) // 640)
        return (np.arange(n) % 32).astype(np.int32)


def _model():
    cfg = ModelConfig(t3_config=_t3_cfg(), s3gen_config=_s3gen_cfg())
    m = Model(cfg).init_and_bind()
    m.tokenizer = _FakeTok()
    m._s3_tokenizer = _FakeS3Tok()
    return m


class TestText:
    def test_punc_norm(self):
        assert punc_norm("") .startswith("You need")
        assert punc_norm("hello  world") == "Hello world."
        assert punc_norm("a…b") == "A, b."

    def test_drop_invalid_tokens(self):
        x = np.asarray([32, 5, 6, 7, 39, 33, 9])
        out = drop_invalid_tokens(x, 32, 33)
        # between SOS and EOS; 39 >= vocab 6561? no -- vocab filter uses
        # SPEECH_VOCAB_SIZE; here all < 6561 so kept
        np.testing.assert_array_equal(out, [5, 6, 7, 39])


class TestT3:
    def test_inference_emits_tokens(self):
        t3 = T3(_t3_cfg()).init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        toks = t3.inference(rs.randn(256).astype(np.float32),
                            np.asarray([[1, 5, 6, 0]], np.int32),
                            cond_prompt_tokens=np.arange(8)
                            .astype(np.int32),
                            max_new_tokens=16, temperature=0.0,
                            cfg_weight=0.5)
        assert 0 < len(toks) <= 16
        assert all(0 <= t < 40 for t in toks)

    def test_cfg_weight_changes_output(self):
        t3 = T3(_t3_cfg()).init(jax.random.PRNGKey(1))
        rs = np.random.RandomState(1)
        spk = rs.randn(256).astype(np.float32)
        text = np.asarray([[1, 9, 8, 0]], np.int32)
        a = t3.inference(spk, text, max_new_tokens=12, temperature=0.0,
                         cfg_weight=0.0)
        b = t3.inference(spk, text, max_new_tokens=12, temperature=0.0,
                         cfg_weight=2.0)
        assert a != b


class TestS3Gen:
    def test_token2wav_shapes(self):
        g = S3Token2Wav(_s3gen_cfg()).init(jax.random.PRNGKey(2))
        rs = np.random.RandomState(2)
        ref24 = (rs.randn(24000) * 0.1).astype(np.float32)
        ref_tokens = (np.arange(24) % 32).astype(np.int32)
        ref = g.embed_ref(ref24, ref_tokens)
        assert ref["prompt_feat"].shape[1] == \
            ref["prompt_token"].shape[1] * 2
        wav = g(np.arange(10).astype(np.int32), ref, n_timesteps=2)
        # 10 tokens * ratio 2 mel frames * 48 samples/frame
        assert wav.shape == (10 * 2 * 48,)
        assert np.isfinite(wav).all()


class TestVoiceEncoder:
    def test_embed_is_unit_norm(self):
        ve = VoiceEncoder().init(jax.random.PRNGKey(3))
        rs = np.random.RandomState(3)
        emb = np.asarray(ve.embeds_from_wavs(
            [rs.randn(32000).astype(np.float32)]))
        assert emb.shape == (1, 256)
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)


class TestEndToEnd:
    def test_generate_with_ref_audio(self):
        m = _model()
        rs = np.random.RandomState(4)
        ref = (rs.randn(24000) * 0.1).astype(np.float32)
        r = list(m.generate("Hello there friend",
                            ref_audio=ref, audio_prompt_sr=24000,
                            max_tokens=12, temperature=0.0,
                            n_timesteps=2, seed=0))[0]
        assert r.samples > 0
        assert r.sample_rate == 24000

    def test_no_conds_errors(self):
        m = _model()
        with pytest.raises(ValueError, match="conditionals"):
            list(m.generate("hi", max_tokens=4))


class TestSanitize:
    def test_component_routing(self):
        m = Model(ModelConfig(t3_config=_t3_cfg(),
                              s3gen_config=_s3gen_cfg()))
        out = m.sanitize({
            "t3.tfmr.layers.0.self_attn.q_proj.weight":
                jnp.ones((16, 16)),
            "ve.lstm.weight_ih_l0": jnp.ones((64, 16)),
            "s3gen.flow.decoder.estimator.mid_blocks.0.0.block1.block"
            ".0.weight": jnp.ones((16, 32, 3)),
            "s3gen.flow.decoder.estimator.mid_blocks.0.1.0.attn1.to_q"
            ".weight": jnp.ones((16, 16)),
            "gen.prompt_feat": jnp.ones((1, 4, 8)),
        })
        assert "t3.tfmr.model.layers.0.self_attn.q_proj.weight" in out
        assert "ve.lstm.layers.0.weight_ih" in out
        assert out["s3gen.flow.decoder.estimator.mid_blocks_0.resnet"
                   ".block1.conv.conv.weight"].shape == (3, 32, 16)
        assert "s3gen.flow.decoder.estimator.mid_blocks_0.transformer_0"\
            ".attn.query_proj.weight" in out
        assert not any(k.startswith("gen.") for k in out)
