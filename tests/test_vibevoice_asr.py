"""VibeVoice-ASR: causal tokenizer encoder, prompt/splice, decode, JSON
parsing, sanitize, registry."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.vibevoice_asr import Model, ModelConfig
from mlx_audio_tpu.stt.models.vibevoice_asr.vibevoice_asr import (
    speech_token_count,
    tokenizer_encode,
)


def tiny_cfg():
    tok = dict(vae_dim=8, encoder_n_filters=4, encoder_ratios=[4, 2],
               encoder_depths="1-1-2")
    return ModelConfig.from_dict(dict(
        acoustic_tokenizer_config=dict(tok),
        semantic_tokenizer_config=dict(tok, vae_dim=12),
        decoder_config=dict(vocab_size=151700, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=4,
                            num_key_value_heads=2)))


class FakeTok:
    eos_token_id = 151645

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True):
        return "".join(m["content"] for m in messages)

    def encode(self, text):
        import re
        ids = []
        for piece in re.split(r"(<\|[a-z_]+\|>)", text):
            if piece == "<|object_ref_start|>":
                ids.append(151646)
            elif piece == "<|object_ref_end|>":
                ids.append(151647)
            elif piece == "<|box_start|>":
                ids.append(151648)
            else:
                ids.extend(ord(c) % 1000 for c in piece[:120])
        return ids

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_cfg()).init_and_bind()
    m.tokenizer = FakeTok()
    return m


class TestEncoder:
    def test_token_count_and_shape(self, model):
        import jax.numpy as jnp

        wav = np.random.RandomState(0).randn(1, 100).astype(np.float32)
        out = tokenizer_encode(
            model.params["acoustic_tokenizer"]["encoder"],
            model.config.acoustic, jnp.asarray(wav))
        # hop = 4*2 = 8 -> ceil(100/8) = 13
        assert out.shape == (1, speech_token_count(100, [4, 2]), 8)
        assert out.shape[1] == 13

    def test_causal_bucket_invariance(self, model):
        """Right bucket padding must not change the valid token prefix
        (the whole pyramid is causal)."""
        import jax.numpy as jnp

        rng = np.random.RandomState(1)
        wav = rng.randn(1, 64).astype(np.float32)
        a = np.asarray(tokenizer_encode(
            model.params["acoustic_tokenizer"]["encoder"],
            model.config.acoustic, jnp.asarray(wav)))
        padded = np.zeros((1, 128), np.float32)
        padded[:, :64] = wav
        b = np.asarray(tokenizer_encode(
            model.params["acoustic_tokenizer"]["encoder"],
            model.config.acoustic, jnp.asarray(padded)))
        n = speech_token_count(64, [4, 2])
        np.testing.assert_allclose(b[:, :n], a[:, :n], atol=1e-5)

    def test_combined_features_dim(self, model):
        wav = np.random.RandomState(2).randn(200).astype(np.float32)
        feats = model.encode_speech(wav)
        assert feats.shape == (speech_token_count(200, [4, 2]), 32)


class TestPrompt:
    def test_speech_pad_positions(self, model):
        ids = model._build_prompt_ids(5, 1.23, None)
        assert ids.count(151648) == 5
        assert 151646 in ids and 151647 in ids

    def test_context_included(self, model):
        ids_a = model._build_prompt_ids(2, 1.0, None)
        ids_b = model._build_prompt_ids(2, 1.0, "two speakers")
        assert ids_a != ids_b


class TestGenerate:
    def test_end_to_end(self, model):
        wav = np.random.RandomState(3).randn(400).astype(np.float32) * 0.1
        out = model.generate(wav, max_tokens=5)
        assert isinstance(out.text, str)
        assert out.generation_tokens <= 5

    def test_rep_penalty_variant_compiles(self, model):
        wav = np.random.RandomState(4).randn(400).astype(np.float32) * 0.1
        out = model.generate(wav, max_tokens=4, repetition_penalty=1.3)
        assert out.generation_tokens <= 4

    def test_stream_transcribe(self, model):
        wav = np.random.RandomState(5).randn(400).astype(np.float32) * 0.1
        toks = list(model.stream_transcribe(wav, max_tokens=3))
        assert len(toks) <= 3


class TestParsing:
    def test_parse_json_block(self):
        text = ('```json\n[{"Start time": 0.0, "End time": 1.5, '
                '"Speaker ID": 1, "Content": "hi"}]\n```')
        segs = Model.parse_transcription(text)
        assert segs == [{"start": 0.0, "end": 1.5, "speaker_id": 1,
                         "text": "hi"}]

    def test_parse_bare_object(self):
        segs = Model.parse_transcription(
            'prefix {"Start": 1, "End": 2, "Content": "x"} suffix')
        assert segs[0]["text"] == "x"

    def test_parse_garbage(self):
        assert Model.parse_transcription("no json here") == []


class TestSanitize:
    def test_key_remaps(self, model):
        out = model.sanitize({
            "model.acoustic_tokenizer.encoder.downsample_layers.0.0.conv"
            ".conv.weight": np.zeros((4, 1, 7), np.float32),
            "model.acoustic_tokenizer.encoder.stages.0.0.mixer.conv.conv"
            ".conv.weight": np.zeros((4, 1, 7), np.float32),
            "model.acoustic_tokenizer.encoder.head.conv.conv.weight":
                np.zeros((8, 16, 7), np.float32),
            "model.acoustic_tokenizer.decoder.x.weight":
                np.zeros((2, 2, 2), np.float32),
            "model.language_model.layers.0.self_attn.q_proj.weight":
                np.zeros((32, 32), np.float32),
            "model.lm_head.weight": np.zeros((100, 32), np.float32)})
        assert out["acoustic_tokenizer.encoder.downsample_layers.0.conv"
                   ".weight"].shape == (7, 1, 4)
        assert "acoustic_tokenizer.encoder.stages.0.0.mixer.conv.conv" \
            ".weight" in out
        assert out["acoustic_tokenizer.encoder.head.conv.weight"].shape \
            == (7, 16, 8)
        assert not any("decoder" in k for k in out)
        assert "language_model.model.layers.0.self_attn.q_proj.weight" \
            in out
        assert "language_model.lm_head.weight" in out


class TestRegistry:
    def test_resolves(self):
        from mlx_audio_tpu.stt.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="vibevoice_asr",
                                    category="stt",
                                    model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model")
