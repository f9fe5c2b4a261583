"""Voxtral TTS (tiny config): sanitizer, acoustic FM head, codec, AR loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.voxtral_tts import Model, ModelConfig
from mlx_audio_tpu.tts.models.voxtral_tts.text_preprocess import (
    sanitize_tts_input_text_for_demo,
    verbalize_currency,
    verbalize_number,
)
from mlx_audio_tpu.tts.models.voxtral_tts.voxtral_tts import (
    acoustic_decode_frame,
    audio_decode,
)


def _cfg():
    return ModelConfig(
        dim=32, n_layers=2, head_dim=8, hidden_dim=64, n_heads=4,
        n_kv_heads=2, vocab_size=128, semantic_codebook_size=64,
        acoustic_codebook_size=5, n_acoustic_codebook=6, num_codebooks=7,
        acoustic_dim=32, acoustic_n_layers=1, acoustic_head_dim=8,
        acoustic_hidden_dim=64, acoustic_n_heads=4, acoustic_n_kv_heads=2,
        tokenizer_dim=16, tokenizer_hidden_dim=32, tokenizer_n_heads=2,
        tokenizer_n_kv_heads=2, tokenizer_head_dim=8,
        tokenizer_patch_size=4, tokenizer_patch_proj_kernel_size=3,
        tokenizer_semantic_dim=8, tokenizer_acoustic_dim=6,
        tokenizer_decoder_transformer_lengths_str="1,1",
        tokenizer_decoder_convs_kernels_str="3,4",
        tokenizer_decoder_convs_strides_str="1,2")


class FakeSpeechTok:
    def encode_speech(self, text, voice):
        base = [1] + [5 + (ord(c) % 40) for c in text][:20]
        return base + [24, 24, 24, 25]  # audio tokens + begin_audio


@pytest.fixture(scope="module")
def model():
    m = Model(_cfg()).init_and_bind()
    m.tokenizer = FakeSpeechTok()
    return m


class TestPreprocess:
    def test_terminal_punct_added(self):
        assert sanitize_tts_input_text_for_demo("hello").endswith(".")

    def test_currency(self):
        assert verbalize_currency("$1.50") == "one dollar and fifty cents"
        assert verbalize_currency("$3") == "three dollars"

    def test_year(self):
        assert verbalize_number("1985") == "nineteen eighty-five"
        assert verbalize_number("2023") == "twenty twenty-three"

    def test_markdown_stripped(self):
        out = sanitize_tts_input_text_for_demo("# Title\n- a [x](http://u)")
        assert "#" not in out and "http" not in out

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            sanitize_tts_input_text_for_demo("​")


class TestAcousticHead:
    def test_frame_codes_ranges(self, model):
        cfg = model.config
        h = jnp.zeros((1, cfg.dim))
        codes = acoustic_decode_frame(
            model.params["acoustic_transformer"], cfg, h,
            jax.random.PRNGKey(0))
        codes = np.asarray(codes)
        assert codes.shape == (1, 1 + cfg.n_acoustic_codebook)
        assert codes[0, 0] >= 1  # empty_audio masked out
        assert (codes[0, 1:] >= 2).all()
        assert (codes[0, 1:] <= cfg.acoustic_codebook_size + 1).all()

    def test_global_offsets_disjoint(self, model):
        off = model._global_offsets()
        cfg = model.config
        assert off[0] == 0
        assert off[1] == cfg.semantic_codebook_size + 2
        assert np.all(np.diff(off[1:]) == cfg.acoustic_codebook_size + 2)
        assert off[-1] + cfg.acoustic_codebook_size + 2 <= \
            cfg.audio_embedding_size


class TestCodec:
    def test_decode_shape(self, model):
        cfg = model.config
        codes = np.full((1, 8, 7), 2, np.int32)
        wav = audio_decode(model.params["audio_tokenizer"], cfg,
                           jnp.asarray(codes))
        # strides 1,2 -> 2x upsample; patch 4 -> 8 samples/frame
        assert wav.shape == (1, 8 * cfg.samples_per_frame)

    def test_causal_bucketing_matches_exact(self, model):
        cfg = model.config
        rng = np.random.RandomState(0)
        codes = np.concatenate(
            [rng.randint(2, 6, (1, 6, 1)), rng.randint(2, 7, (1, 6, 6))],
            axis=2).astype(np.int32)
        exact = np.asarray(audio_decode(model.params["audio_tokenizer"],
                                        cfg, jnp.asarray(codes)))[0]
        buck = model.decode_audio_codes(codes[0])
        np.testing.assert_allclose(buck, exact[:len(buck)], atol=2e-4)


class TestGenerate:
    def test_generate_audio(self, model):
        res = list(model.generate("hello there", voice="casual_male",
                                  max_tokens=12, seed=0))
        assert len(res) == 1
        r = res[0]
        assert r.sample_rate == 24000
        assert r.samples == r.token_count * model.config.samples_per_frame
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_deterministic(self, model):
        a = list(model.generate("abc", max_tokens=6, seed=7))[0]
        b = list(model.generate("abc", max_tokens=6, seed=7))[0]
        np.testing.assert_allclose(np.asarray(a.audio),
                                   np.asarray(b.audio), atol=1e-5)

    def test_voice_embedding_splice(self, model):
        model._voice_embeddings["casual_male"] = \
            np.ones((3, model.config.dim), np.float32) * 0.5
        ids = np.asarray([1, 5, 24, 24, 25], np.int32)
        emb = np.asarray(model._build_input_embeddings(ids, "casual_male"))
        np.testing.assert_allclose(emb[0, 2], 0.5)
        np.testing.assert_allclose(emb[0, 3], 0.5)
        assert not np.allclose(emb[0, 1], 0.5)
        del model._voice_embeddings["casual_male"]

    def test_requires_tokenizer(self):
        m = Model(_cfg()).init_and_bind()
        with pytest.raises(RuntimeError):
            list(m.generate("hi"))

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["voxtral_tts"] == "voxtral_tts"


class TestSanitize:
    def test_layer_and_weightnorm_remap(self, model):
        w = {
            "layers.0.attention.wq.weight": np.zeros((16, 32)),
            "layers.0.feed_forward.w1.weight": np.zeros((64, 32)),
            "tok_embeddings.weight": np.zeros((128, 32)),
            "output.weight": np.zeros((128, 32)),
            "audio_tokenizer.decoder_blocks.0.conv."
            "parametrizations.weight.original0": np.ones((16, 1, 1)) * 2,
            "audio_tokenizer.decoder_blocks.0.conv."
            "parametrizations.weight.original1":
                np.random.RandomState(0).randn(16, 14, 3),
        }
        out = model.sanitize(w)
        assert "language_model.model.layers.0.self_attn.q_proj.weight" \
            in out
        assert "language_model.model.layers.0.mlp.gate_proj.weight" in out
        assert "language_model.model.embed_tokens.weight" in out
        assert "output.weight" not in out  # tied
        folded = out["audio_tokenizer.decoder_blocks.0.conv.weight"]
        assert folded.shape == (16, 14, 3)
        norms = np.linalg.norm(np.asarray(folded).reshape(16, -1), axis=1)
        np.testing.assert_allclose(norms, 2.0, atol=1e-5)
