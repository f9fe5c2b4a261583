"""Tiny-config tests for sesame (CSM), kitten_tts, and ecapa_tdnn LID."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_configs import TINY_VOCAB


class TestSesame:
    @pytest.fixture(scope="class")
    def model(self):
        from mlx_audio_tpu.tts.models.sesame import Model, ModelConfig

        cfg = ModelConfig(
            text_vocab_size=128, audio_vocab_size=40, audio_num_codebooks=4,
            backbone_config=dict(hidden_size=32, num_hidden_layers=2,
                                 intermediate_size=64, num_attention_heads=4,
                                 num_key_value_heads=2, head_dim=8),
            depth_decoder_config=dict(hidden_size=24, num_hidden_layers=1,
                                      intermediate_size=48,
                                      num_attention_heads=4,
                                      num_key_value_heads=2, head_dim=8))
        return Model(cfg).init_and_bind()

    def test_generates_code_frames(self, model):
        res = list(model.generate(text_ids=np.arange(5, 20), temperature=0.8,
                                  max_audio_length_ms=2000))
        codes = res[0].prompt["codes"]
        assert codes.ndim == 2 and codes.shape[1] == 4
        assert (codes < 40).all() and (codes >= 0).all()

    def test_greedy_deterministic(self, model):
        r1 = list(model.generate(text_ids=np.arange(5, 15), temperature=0.0,
                                 max_audio_length_ms=1600))[0]
        r2 = list(model.generate(text_ids=np.arange(5, 15), temperature=0.0,
                                 max_audio_length_ms=1600))[0]
        np.testing.assert_array_equal(r1.prompt["codes"], r2.prompt["codes"])

    def test_torchtune_sanitize_roundtrip(self, model):
        """Real sesame/csm-1b weights use torchtune naming; sanitize must
        remap them onto this tree exactly (golden: same arrays under
        torchtune names reproduce the same generation)."""
        from mlx_audio_tpu.tts.models.sesame import Model
        from mlx_audio_tpu.utils import flatten, unflatten

        inv = {}
        for k, w in flatten(model.params).items():
            tk = (k.replace(".self_attn.", ".attn.")
                   .replace(".o_proj.", ".output_proj.")
                   .replace(".mlp.gate_proj.", ".mlp.w1.")
                   .replace(".mlp.down_proj.", ".mlp.w2.")
                   .replace(".mlp.up_proj.", ".mlp.w3.")
                   .replace(".input_layernorm.weight", ".sa_norm.scale")
                   .replace(".post_attention_layernorm.weight",
                            ".mlp_norm.scale"))
            if tk in ("backbone.norm.weight", "decoder.norm.weight"):
                tk = tk.replace(".weight", ".scale")
            inv[tk] = np.asarray(w)
        m2 = Model(model.config)
        m2.bind(unflatten({k: jnp.asarray(v)
                           for k, v in m2.sanitize(inv).items()}),
                strict=True)
        r1 = list(model.generate(text_ids=np.arange(5, 15), temperature=0.0,
                                 max_audio_length_ms=1600))[0]
        r2 = list(m2.generate(text_ids=np.arange(5, 15), temperature=0.0,
                              max_audio_length_ms=1600))[0]
        np.testing.assert_array_equal(r1.prompt["codes"], r2.prompt["codes"])

    def test_voice_clone_context_changes_output(self, model):
        ctx = np.random.RandomState(0).randint(0, 40, (6, 4))
        r1 = list(model.generate(text_ids=np.arange(5, 15), temperature=0.0,
                                 context_frames=ctx,
                                 max_audio_length_ms=1600))[0]
        r2 = list(model.generate(text_ids=np.arange(5, 15), temperature=0.0,
                                 max_audio_length_ms=1600))[0]
        assert (r1.prompt["codes"].shape != r2.prompt["codes"].shape or
                (r1.prompt["codes"] != r2.prompt["codes"]).any())

    def test_prompt_layout(self, model):
        tokens, mask = model.build_prompt(np.asarray([1, 2, 3]),
                                          np.zeros((2, 4), np.int32))
        assert tokens.shape == (1, 5, 5)
        # audio context rows have audio slots masked-in, text slot off
        assert mask[0, 0, :4].all() and not mask[0, 0, 4]
        # text rows are the reverse
        assert mask[0, 2, 4] and not mask[0, 2, :4].any()


class TestKittenTTS:
    def test_generate_with_npz_voices(self, tmp_path):
        from mlx_audio_tpu.tts.models.kitten_tts import Model, ModelConfig

        cfg = ModelConfig(
            istftnet=dict(resblock_kernel_sizes=[3], upsample_rates=[4, 4],
                          upsample_initial_channel=16,
                          resblock_dilation_sizes=[[1, 3, 5]],
                          upsample_kernel_sizes=[8, 8],
                          gen_istft_n_fft=12, gen_istft_hop_size=3),
            hidden_dim=32, max_conv_dim=24, max_dur=50, n_layer=2, n_mels=20,
            n_token=len(TINY_VOCAB) + 1, style_dim=16,
            text_encoder_kernel_size=5, asr_res_dim=8,
            plbert=dict(num_hidden_layers=2, num_attention_heads=2,
                        hidden_size=24, intermediate_size=32,
                        max_position_embeddings=128, embedding_size=12,
                        dropout=0.0),
            vocab=TINY_VOCAB, model_path=str(tmp_path),
            speed_priors={"carol": 1.2})
        np.savez(tmp_path / "voices.npz",
                 carol=np.random.RandomState(0).randn(1, 32).astype(np.float32))
        m = Model(cfg).init_and_bind()
        assert m.get_supported_speakers() == ["carol"]
        results = list(m.generate("Hello world.", voice="carol"))
        assert len(results) == 1
        assert results[0].samples > 0
        assert np.isfinite(np.asarray(results[0].audio)).all()
        # tail shaping (reference kitten_tts.py:516-521): trailing silence
        # appended, faded end
        tailed = list(m.generate("Hello world.", voice="carol",
                                 tail_silence_ms=100, fade_out_ms=50))[0]
        a = np.asarray(tailed.audio)
        n_sil = int(0.1 * m.config.sample_rate)
        assert len(a) >= n_sil and np.abs(a[-n_sil // 2:]).max() == 0.0
        # crossfaded multi-chunk output stays finite and joins chunks
        multi = list(m.generate("one. two. three. four. five. six.",
                                voice="carol", chunk_size=10,
                                crossfade_ms=10))
        assert len(multi) >= 2
        for r in multi:
            assert np.isfinite(np.asarray(r.audio)).all()

    def test_fake_quant_identity_on_constant(self):
        from mlx_audio_tpu.tts.models.kitten_tts.kitten_tts import (
            fake_quant_dynamic_u8,
        )

        x = jnp.zeros((4, 4))
        np.testing.assert_allclose(np.asarray(fake_quant_dynamic_u8(x)), 0.0)
        y = jnp.asarray(np.random.RandomState(0).randn(100).astype(np.float32))
        out = np.asarray(fake_quant_dynamic_u8(y))
        # quantization error bounded by one step
        step = (max(float(y.max()), 0) - min(float(y.min()), 0)) / 255.0
        assert np.abs(out - np.asarray(y)).max() <= step


class TestLidEcapa:
    def test_predict_topk(self):
        from mlx_audio_tpu.lid.models.ecapa_tdnn import Model, ModelConfig

        cfg = ModelConfig(channels=32, embedding_dim=16,
                          attention_channels=8, res2net_scale=4,
                          se_channels=8, classifier_hidden_dim=16,
                          num_classes=5,
                          id2label={"0": "en: English", "1": "fr: French",
                                    "2": "de: German", "3": "es: Spanish",
                                    "4": "zh: Chinese"})
        m = Model(cfg).init_and_bind()
        audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
        preds = m.predict(audio, top_k=3)
        assert len(preds) == 3
        assert all(isinstance(l, str) and 0 <= p <= 1 for l, p in preds)
        assert preds[0][1] >= preds[1][1] >= preds[2][1]
        assert preds[0][0] in {"en", "fr", "de", "es", "zh"}
