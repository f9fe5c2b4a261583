"""Chatterbox-Turbo: GPT2 T3 decode, conditioning, end-to-end glue."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.chatterbox_turbo import (
    GPT2Config,
    Model,
    ModelConfig,
    T3Turbo,
    T3TurboConfig,
)
from mlx_audio_tpu.tts.models.chatterbox_turbo.gpt2 import (
    gpt2_forward,
    init_gpt2,
    init_gpt2_caches,
)
from test_chatterbox import _FakeS3Tok, _FakeTok, _s3gen_cfg


def _t3_cfg():
    return T3TurboConfig(
        text_tokens_dict_size=64, start_text_token=1, stop_text_token=0,
        speech_tokens_dict_size=40, start_speech_token=32,
        stop_speech_token=33, speech_cond_prompt_len=8,
        speaker_embed_size=256,
        gpt2=dict(vocab_size=64, n_positions=512, n_embd=16, n_layer=2,
                  n_head=2))


def _model():
    cfg = ModelConfig(t3_config=_t3_cfg(), s3gen_config=_s3gen_cfg())
    m = Model(cfg).init_and_bind()
    m.tokenizer = _FakeTok()
    m._s3_tokenizer = _FakeS3Tok()
    return m


@pytest.fixture(scope="module")
def model():
    return _model()


class TestGPT2:
    def test_cached_decode_matches_full(self):
        cfg = GPT2Config(vocab_size=32, n_positions=64, n_embd=16,
                         n_layer=2, n_head=2)
        p = init_gpt2(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 16))
        full, _ = gpt2_forward(p, cfg, x)
        caches = init_gpt2_caches(cfg, 1, 32)
        pad = jnp.where(jnp.arange(32)[None] < 6, 0.0, -jnp.inf)
        h, caches = gpt2_forward(p, cfg, jnp.pad(
            x[:, :6], ((0, 0), (0, 0), (0, 0))), caches, 0, mask=pad)
        outs = [h[:, :6]]
        for i in range(6, 10):
            h, caches = gpt2_forward(p, cfg, x[:, i:i + 1], caches, i)
            outs.append(h)
        step = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(step), np.asarray(full),
                                   atol=1e-4)


class TestT3Turbo:
    def test_inference_stops_and_shapes(self, model):
        hp = model.config.t3_config
        toks = model.t3.inference_turbo(
            np.zeros((1, 256), np.float32),
            np.asarray([[1, 5, 6, 0]], np.int32),
            cond_prompt_tokens=np.zeros((1, 4), np.int32),
            temperature=0.0, max_gen_len=12, seed=0)
        assert toks.ndim == 1 and len(toks) <= 12
        assert (toks != hp.stop_speech_token).all()

    def test_deterministic_greedy(self, model):
        kw = dict(temperature=0.0, max_gen_len=10, seed=0)
        a = model.t3.inference_turbo(np.zeros((1, 256), np.float32),
                                     np.asarray([[1, 9, 0]]), **kw)
        b = model.t3.inference_turbo(np.zeros((1, 256), np.float32),
                                     np.asarray([[1, 9, 0]]), **kw)
        np.testing.assert_array_equal(a, b)


class TestGenerate:
    def test_generate_end_to_end(self, model):
        sr = 24000
        ref = np.random.RandomState(0).randn(6 * sr).astype(np.float32) * 0.1
        results = list(model.generate("hello turbo world", ref_audio=ref,
                                      temperature=0.0, max_new_tokens=12,
                                      n_timesteps=2))
        assert len(results) == 1
        r = results[0]
        assert r.sample_rate == 24000 and r.samples > 0
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_stream_matches_offline(self, model):
        sr = 24000
        ref = np.random.RandomState(1).randn(6 * sr).astype(np.float32) * 0.1
        conds = model.prepare_conditionals(ref, sr)
        off = list(model.generate("stream parity", conds=conds,
                                  temperature=0.0, max_new_tokens=24,
                                  n_timesteps=2, seed=3))
        st = list(model.generate("stream parity", conds=conds,
                                 temperature=0.0, max_new_tokens=24,
                                 n_timesteps=2, seed=3, stream=True,
                                 streaming_interval=0.4))
        offline = np.asarray(off[0].audio)
        streamed = np.concatenate([np.asarray(r.audio) for r in st])
        assert streamed.shape == offline.shape
        # early samples are frozen at emit time while offline refines them
        # with full bidirectional context -> approximate match (chunk
        # boundaries carry the largest refinement error)
        diff = np.abs(streamed - offline)
        assert float(np.quantile(diff, 0.99)) < 5e-3
        # the final chunk is decoded with full context: exact on the tail
        tail = len(np.asarray(st[-1].audio))
        np.testing.assert_allclose(streamed[-tail:], offline[-tail:],
                                   atol=1e-5)

    def test_missing_conds_raises(self, model):
        with pytest.raises(ValueError, match="No conditionals"):
            list(model.generate("hi", temperature=0.0))


class TestSanitize:
    def test_torch_conv1d_layout_detected(self, model):
        hp = model.config.t3_config
        d = hp.gpt2.n_embd
        w = {"t3.tfmr.h.0.attn.c_attn.weight":
             np.zeros((d, 3 * d), np.float32),
             "t3.tfmr.h.0.attn.c_proj.weight":
             np.zeros((d, d), np.float32),
             "t3.tfmr.h.0.mlp.c_fc.weight":
             np.zeros((d, 4 * d), np.float32)}
        out = model.sanitize(w)
        assert out["t3.tfmr.h.0.attn.c_attn.weight"].shape == (3 * d, d)
        assert out["t3.tfmr.h.0.mlp.c_fc.weight"].shape == (4 * d, d)

    def test_mlx_layout_passthrough(self, model):
        hp = model.config.t3_config
        d = hp.gpt2.n_embd
        w = {"t3.tfmr.h.0.attn.c_attn.weight":
             np.zeros((3 * d, d), np.float32)}
        out = model.sanitize(w)
        assert out["t3.tfmr.h.0.attn.c_attn.weight"].shape == (3 * d, d)


class TestRegistry:
    def test_resolves(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        module, _ = get_model_class(model_type="chatterbox_turbo",
                                    category="tts",
                                    model_remapping=MODEL_REMAPPING)
        assert hasattr(module, "Model")
