"""LongCat AudioDiT (tiny config): UMT5, DiT flow, VAE, CFG/APG paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.longcat_audiodit import Model, ModelConfig
from mlx_audio_tpu.tts.models.longcat_audiodit.longcat_audiodit import (
    TextEncoderConfig,
    approx_duration,
    normalize_text,
    umt5_encode,
)
from mlx_audio_tpu.tts.models.longcat_audiodit.vae import (
    VaeConfig,
    vae_decode,
    vae_encode,
)


class FakeTok:
    def __call__(self, texts, padding="longest", return_tensors="np"):
        ids = [[3 + (ord(c) % 60) for c in t][:24] for t in texts]
        ln = max(len(i) for i in ids)
        return {
            "input_ids": np.asarray(
                [i + [0] * (ln - len(i)) for i in ids], np.int32),
            "attention_mask": np.asarray(
                [[1] * len(i) + [0] * (ln - len(i)) for i in ids],
                np.int32),
        }


def _cfg():
    return ModelConfig(
        dit_dim=32, dit_depth=2, dit_heads=4, dit_ff_mult=2.0,
        dit_text_dim=16, repa_dit_layer=1, latent_dim=8,
        latent_hop=16, max_wav_duration=4.0,
        vae_config=dict(channels=4, c_mults=[2, 4], strides=[4, 4],
                        latent_dim=8, encoder_latent_dim=16,
                        downsampling_ratio=16),
        text_encoder_config=dict(vocab_size=100, d_model=16, d_kv=4,
                                 d_ff=32, num_layers=2, num_heads=4))


@pytest.fixture(scope="module")
def model():
    m = Model(_cfg()).init_and_bind()
    m.tokenizer = FakeTok()
    return m


class TestText:
    def test_normalize(self):
        assert normalize_text('Hello  "World"') == "hello world"

    def test_duration_heuristic(self):
        en = approx_duration("hello world" * 4)
        zh = approx_duration("你好世界" * 4)
        assert zh > en > 0
        assert approx_duration("x" * 10000, max_duration=5.0) == 5.0

    def test_umt5_shapes(self, model):
        cfg = model.config.text_encoder_config
        ids = jnp.asarray([[1, 2, 3, 4]])
        am = jnp.ones((1, 4), jnp.float32)
        last, initial = umt5_encode(model.params["text_encoder"], cfg,
                                    ids, am)
        assert last.shape == (1, 4, 16) and initial.shape == (1, 4, 16)

    def test_encode_text_bucketed(self, model):
        cond, am = model.encode_text(np.asarray([[1, 2, 3]], np.int32),
                                     np.ones((1, 3), np.float32))
        assert cond.shape[1] == 32  # first bucket
        assert am.sum() == 3


class TestVae:
    def test_roundtrip_shapes(self, model):
        cfg = model.config.vae_config
        wav = jnp.zeros((1, 64, 1))
        lat = vae_encode(model.params["vae"], cfg, wav,
                         jax.random.PRNGKey(0))
        assert lat.shape == (1, 64 // 16, 8)
        out = vae_decode(model.params["vae"], cfg, lat)
        assert out.shape == (1, 64, 1)

    def test_encode_prompt_audio_offsets(self, model):
        # 40 samples -> pad to 48 (hop 16) + 3*16 tail -> 6 frames - 3 off
        lat, dur = model.encode_prompt_audio(
            np.zeros(40, np.float32), seed=0)
        assert dur == 3 and lat.shape == (1, 3, 8)


class TestGenerate:
    def test_generate_cfg(self, model):
        res = list(model.generate("hello world test", steps=3,
                                  cfg_strength=2.0, seed=1))
        assert len(res) == 1
        r = res[0]
        assert r.sample_rate == 24000
        assert r.samples == r.token_count * 16
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_generate_apg(self, model):
        r = list(model.generate("hello", steps=3, cfg_strength=2.0,
                                guidance_method="apg", seed=2))[0]
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_generate_no_guidance(self, model):
        r = list(model.generate("hi there", steps=3, cfg_strength=0.0,
                                seed=0))[0]
        assert r.samples > 0

    def test_voice_clone_inpaint(self, model):
        ref = np.random.RandomState(0).randn(64).astype(np.float32) * 0.1
        r = list(model.generate("target text", ref_audio=ref,
                                ref_text="reference", steps=3, seed=0))[0]
        assert r.samples > 0

    def test_streaming_chunks(self, model):
        chunks = list(model.generate("streaming test sentence here now",
                                     steps=3, stream=True,
                                     chunk_seconds=0.002,
                                     overlap_seconds=0.001, seed=0))
        assert len(chunks) >= 1
        assert chunks[-1].is_final_chunk
        total = sum(c.samples for c in chunks)
        ns = list(model.generate("streaming test sentence here now",
                                 steps=3, seed=0))[0]
        assert total == ns.samples

    def test_deterministic(self, model):
        a = list(model.generate("abc def", steps=3, seed=5))[0]
        b = list(model.generate("abc def", steps=3, seed=5))[0]
        np.testing.assert_allclose(np.asarray(a.audio),
                                   np.asarray(b.audio), atol=1e-5)

    def test_requires_tokenizer(self):
        m = Model(_cfg()).init_and_bind()
        with pytest.raises(RuntimeError):
            list(m.generate("x"))

    def test_registry(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING

        assert MODEL_REMAPPING["audiodit"] == "longcat_audiodit"


class TestSanitize:
    def test_weight_norm_and_t5_remap(self, model):
        w = {
            "vae.decoder.layers.1.layers.1.weight_v":
                np.random.RandomState(0).randn(8, 4, 8),  # convT (in,out,K)
            "vae.decoder.layers.1.layers.1.weight_g": np.ones((8, 1, 1)),
            "vae.encoder.layers.0.weight_v":
                np.random.RandomState(1).randn(8, 1, 7),  # conv (out,in,K)
            "vae.encoder.layers.0.weight_g": np.ones((8, 1, 1)),
            "text_encoder.encoder.block.0.layer.0.SelfAttention.q.weight":
                np.zeros((16, 16)),
            "transformer.blocks.0.self_attn.to_out.0.weight":
                np.zeros((32, 32)),
            "transformer.text_conv_layer.0.dwconv.weight":
                np.zeros((32, 1, 7)),
        }
        out = model.sanitize(w)
        assert out["vae.encoder.layers.0.weight"].shape == (7, 1, 8)
        assert "text_encoder.block.0.SelfAttention.q.weight" in out
        assert "transformer.blocks.0.self_attn.to_out.weight" in out
        assert out["transformer.text_conv_layer.0.dwconv_weight"
                   ].shape == (7, 1, 32)
