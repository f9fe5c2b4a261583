"""Spark-TTS: tiny-config Model tests (LM decode + BiCodec round trip).

Covers reference spark.py prompt assembly, the compiled sampled decode, the
controllable-voice path, and loader registration (ADVICE r1: 'spark' was
registered but unloadable).
"""

import jax
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.spark import (
    BiCodec,
    BiCodecConfig,
    Model,
    ModelConfig,
)
from mlx_audio_tpu.tts.models.spark.spark import (
    GENDER_MAP,
    LEVELS_MAP,
    STOP_TOKEN_ID,
)


def tiny_lm_cfg():
    return ModelConfig(
        hidden_size=32, num_hidden_layers=2, intermediate_size=64,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        vocab_size=400, tie_word_embeddings=True, eos_token_id=399)


def tiny_bicodec_cfg():
    return BiCodecConfig.from_dict(dict(
        mel_params=dict(sample_rate=16000, n_fft=64, win_length=64,
                        hop_length=32, num_mels=16, mel_fmin=10.0),
        encoder=dict(input_channels=24, vocos_dim=16,
                     vocos_intermediate_dim=32, vocos_num_layers=2,
                     out_channels=24, sample_ratios=(1, 1)),
        quantizer=dict(input_dim=24, codebook_size=64, codebook_dim=4),
        prenet=dict(input_channels=24, vocos_dim=16,
                    vocos_intermediate_dim=32, vocos_num_layers=2,
                    out_channels=24, condition_dim=24,
                    sample_ratios=(1, 1)),
        postnet=dict(input_channels=24, vocos_dim=16,
                     vocos_intermediate_dim=32, vocos_num_layers=2,
                     out_channels=24, sample_ratios=(1, 1)),
        decoder=dict(input_channel=24, channels=16, rates=(4, 2),
                     kernel_sizes=(8, 4)),
        speaker_encoder=dict(input_dim=16, out_dim=24, latent_dim=8,
                             token_num=4, fsq_levels=(4, 4, 4),
                             fsq_num_quantizers=1, ecapa_channels=16),
        ref_segment_duration=0.05, latent_hop_length=32))


class FakeTokenizer:
    """Deterministic char-level tokenizer; decodes generated ids into
    bicodec_semantic pieces so the regex-extraction path is exercised."""

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 380 for c in text][:300]

    def decode(self, ids, skip_special_tokens=False):
        return "".join(f"<|bicodec_semantic_{i % 64}|>" for i in ids)


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_lm_cfg()).init_and_bind()
    m.tokenizer = FakeTokenizer()
    m.bicodec = BiCodec(tiny_bicodec_cfg()).init_and_bind()
    return m


class TestPrompt:
    def test_control_prompt(self):
        p = Model.process_prompt_control("female", "low", "high", "hi")
        assert "<|task_controllable_tts|>" in p
        assert f"<|gender_{GENDER_MAP['female']}|>" in p
        assert f"<|pitch_label_{LEVELS_MAP['low']}|>" in p
        assert f"<|speed_label_{LEVELS_MAP['high']}|>" in p
        assert p.index("<|start_content|>") < p.index("<|end_content|>")

    def test_control_prompt_validates(self):
        with pytest.raises(AssertionError):
            Model.process_prompt_control("robot", "low", "high", "hi")


class TestGenerate:
    def test_controllable_generate(self, model):
        # control path: global tokens come from the generated text itself;
        # FakeTokenizer only emits semantic pieces, so inject globals by
        # using the clone path instead. Here we check the decode machinery
        # produces tokens and stops within max_tokens.
        fn = model._decode_fn(64, 8, 0.0, 50, 1.0, 1.3)
        ids = np.zeros((1, 64), np.int32)
        ids[0, :5] = [1, 2, 3, 4, 5]
        toks, count = fn(model.params, np.asarray(ids), np.int32(5),
                         jax.random.PRNGKey(0))
        assert toks.shape == (8,)
        assert 0 <= int(count) <= 8

    def test_clone_generate_end_to_end(self, model):
        ref = np.random.RandomState(0).randn(1600).astype(np.float32) * 0.1

        def fake_tokenize(ref_audio):
            return np.zeros((1, 4), np.int32), np.ones((1, 6), np.int32)

        model.tokenize_ref = fake_tokenize
        results = list(model.generate(
            "hello world", ref_audio=ref, ref_text="reference",
            temperature=0.0, max_tokens=6, seed=1))
        assert len(results) == 1
        r = results[0]
        assert r.samples > 0 and r.sample_rate == 16000
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_split_pattern_segments(self, model):
        model.tokenize_ref = lambda ra: (np.zeros((1, 4), np.int32),
                                         np.ones((1, 3), np.int32))
        results = list(model.generate(
            "one\ntwo", ref_audio=np.zeros(100, np.float32), ref_text="r",
            temperature=0.0, max_tokens=4))
        assert [r.segment_idx for r in results] == [0, 1]


class TestBiCodecRoundtrip:
    def test_tokenize_detokenize_shapes(self):
        bc = BiCodec(tiny_bicodec_cfg()).init_and_bind()
        feat = np.random.RandomState(0).randn(1, 8, 24).astype(np.float32)
        ref = np.random.RandomState(1).randn(1, 512).astype(np.float32)
        glob, sem = bc.tokenize(feat, ref)
        assert glob.shape[0] == 1 and sem.shape == (1, 8)
        wav = bc.detokenize(sem, glob)
        assert wav.shape[0] == 1 and wav.shape[1] == 8 * 4 * 2
        assert np.isfinite(wav).all()


class TestLoaderRegistration:
    def test_spark_resolves_to_model_class(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, mt = get_model_class(
            model_type="spark", category="tts",
            model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model") and hasattr(module, "ModelConfig")

    def test_wav2vec_hidden_states_collection(self):
        from mlx_audio_tpu.stt.models.wav2vec.wav2vec import (
            ModelConfig as W2VConfig,
            init_wav2vec2,
            wav2vec2_forward,
        )
        import jax.numpy as jnp

        cfg = W2VConfig(hidden_size=16, num_hidden_layers=3,
                        num_attention_heads=2, intermediate_size=32,
                        conv_dim=(8, 8), conv_kernel=(3, 3),
                        conv_stride=(2, 2), num_feat_extract_layers=2)
        params = init_wav2vec2(jax.random.PRNGKey(0), cfg)
        wave = jnp.asarray(np.random.RandomState(0).randn(1, 64),
                           jnp.float32)
        out = wav2vec2_forward(params, cfg, wave, jnp.asarray([64]),
                               collect_hidden=True)
        assert len(out) == 3
        x, n, hidden = out
        assert len(hidden) == cfg.num_hidden_layers + 1
        assert hidden[1].shape == x.shape
