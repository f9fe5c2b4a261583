"""SAM-Audio: tiny-config separation tests (text-guided flow-matching ODE).

Covers reference sts/models/sam_audio — DiT forward, T5 conditioning,
separate / separate_long crossfade / separate_streaming parity, anchors.
"""

import jax
import numpy as np
import pytest

from mlx_audio_tpu.sts.models.sam_audio import Model, ModelConfig
from mlx_audio_tpu.sts.models.sam_audio.dit import (
    TransformerConfig,
    dit_forward,
    init_dit,
)
from mlx_audio_tpu.sts.models.sam_audio.t5 import (
    T5Config,
    init_t5_encoder,
    t5_encode,
)


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        in_channels=6 * 8,
        audio_codec=dict(encoder_dim=4, encoder_rates=[2, 4],
                         latent_dim=16, decoder_dim=8, decoder_rates=[4, 2],
                         codebook_dim=8, sample_rate=16000),
        text_encoder=dict(vocab_size=64, d_model=16, d_kv=4, d_ff=32,
                          num_layers=2, num_heads=4, dim=16),
        transformer=dict(dim=32, n_heads=4, n_layers=2, context_dim=32,
                         out_channels=16, ffn_exp=2,
                         frequency_embedding_dim=16),
        num_anchors=3, anchor_embedding_dim=8))


class FakeT5Tok:
    def __call__(self, texts, truncation=True, max_length=512,
                 padding="longest", return_tensors="np"):
        ids = [[(ord(c) % 60) + 1 for c in t[:12]] + [1] for t in texts]
        n = max(len(i) for i in ids)
        input_ids = np.zeros((len(ids), n), np.int32)
        mask = np.zeros((len(ids), n), np.int32)
        for r, row in enumerate(ids):
            input_ids[r, :len(row)] = row
            mask[r, :len(row)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_cfg()).init_and_bind()
    m.tokenizer = FakeT5Tok()
    return m


class TestComponents:
    def test_t5_encode_shapes_and_mask(self):
        cfg = T5Config(vocab_size=32, d_model=16, d_kv=4, d_ff=32,
                       num_layers=2, num_heads=4)
        p = init_t5_encoder(jax.random.PRNGKey(0), cfg)
        ids = np.random.RandomState(0).randint(1, 32, (2, 10))
        mask = np.ones((2, 10), np.int32)
        mask[1, 6:] = 0
        out = t5_encode(p, cfg, np.asarray(ids), np.asarray(mask))
        assert out.shape == (2, 10, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_dit_forward_shapes(self):
        cfg = TransformerConfig(dim=32, n_heads=4, n_layers=2,
                                context_dim=32, out_channels=16,
                                ffn_exp=2, frequency_embedding_dim=16)
        p = init_dit(jax.random.PRNGKey(0), cfg)
        x = np.random.RandomState(0).randn(2, 12, 32).astype(np.float32)
        t = np.asarray([0.1, 0.5], np.float32)
        mem = np.random.RandomState(1).randn(2, 5, 32).astype(np.float32)
        out = dit_forward(p, cfg, np.asarray(x), np.asarray(t),
                          memory=np.asarray(mem))
        assert out.shape == (2, 12, 16)
        assert np.isfinite(np.asarray(out)).all()


class TestSeparate:
    def test_separate_shapes(self, model):
        sr = model.sample_rate
        audio = np.random.RandomState(0).randn(1, 1, sr // 4) \
            .astype(np.float32) * 0.1
        res = model.separate(audio, ["a dog barking"],
                             ode_opt={"step_size": 0.5, "method": "euler"})
        assert len(res.target) == 1 and len(res.residual) == 1
        assert res.target[0].shape == res.residual[0].shape
        assert abs(res.target[0].shape[0] - sr // 4) <= model.hop_length
        assert np.isfinite(res.target[0]).all()

    def test_midpoint_vs_euler_differ(self, model):
        audio = np.random.RandomState(1).randn(1, 1, 2048) \
            .astype(np.float32) * 0.1
        r1 = model.separate(audio, ["speech"],
                            ode_opt={"step_size": 0.5, "method": "euler"},
                            seed=3)
        r2 = model.separate(audio, ["speech"],
                            ode_opt={"step_size": 0.5, "method": "midpoint"},
                            seed=3)
        assert not np.allclose(r1.target[0], r2.target[0])

    def test_deterministic_given_seed(self, model):
        audio = np.random.RandomState(2).randn(1, 1, 2048) \
            .astype(np.float32) * 0.1
        r1 = model.separate(audio, ["speech"], seed=5,
                            ode_opt={"step_size": 0.5, "method": "euler"})
        r2 = model.separate(audio, ["speech"], seed=5,
                            ode_opt={"step_size": 0.5, "method": "euler"})
        np.testing.assert_allclose(r1.target[0], r2.target[0], atol=1e-5)

    def test_invalid_step_size_raises(self, model):
        with pytest.raises(ValueError):
            model.separate(np.zeros((1, 1, 512), np.float32), ["x"],
                           ode_opt={"step_size": 2.0})

    def test_anchors_change_output(self, model):
        sr = model.sample_rate
        audio = np.random.RandomState(3).randn(1, 1, 4096) \
            .astype(np.float32) * 0.1
        base = model.separate(audio, ["speech"], seed=1,
                              ode_opt={"step_size": 0.5, "method": "euler"})
        anch = model.separate(audio, ["speech"], seed=1,
                              anchors=[[("+", 0.0, 0.1)]],
                              ode_opt={"step_size": 0.5, "method": "euler"})
        # gate init is 0 -> tanh(0)=0, so anchors are a no-op at init;
        # bump the gate to verify the path is wired through
        model.params["embed_anchors"]["gate"] = \
            model.params["embed_anchors"]["gate"] + 1.0
        anch2 = model.separate(audio, ["speech"], seed=1,
                               anchors=[[("+", 0.0, 0.1)]],
                               ode_opt={"step_size": 0.5, "method": "euler"})
        model.params["embed_anchors"]["gate"] = \
            model.params["embed_anchors"]["gate"] - 1.0
        np.testing.assert_allclose(base.target[0], anch.target[0],
                                   atol=1e-5)
        assert not np.allclose(base.target[0], anch2.target[0])


class TestLongAndStreaming:
    def test_long_matches_streaming_concat(self, model):
        sr = model.sample_rate
        audio = np.random.RandomState(4).randn(1, 1, sr) \
            .astype(np.float32) * 0.1
        opt = {"step_size": 0.5, "method": "euler"}
        long_res = model.separate_long(audio, ["speech"],
                                       chunk_seconds=0.3,
                                       overlap_seconds=0.1, ode_opt=opt,
                                       seed=7)
        stream = list(model.separate_streaming(
            audio, ["speech"], chunk_seconds=0.3, overlap_seconds=0.1,
            ode_opt=opt, seed=7))
        assert len(stream) >= 2
        t_cat = np.concatenate([c[0] for c in stream], axis=0)
        np.testing.assert_allclose(t_cat, long_res.target[0], atol=1e-5)

    def test_short_audio_single_pass(self, model):
        audio = np.random.RandomState(5).randn(1, 1, 1024) \
            .astype(np.float32) * 0.1
        res = model.separate_long(audio, ["speech"], chunk_seconds=1.0,
                                  ode_opt={"step_size": 0.5,
                                           "method": "euler"})
        assert len(res.target) == 1


class TestServerRouting:
    def test_sam_audio_separations_endpoint(self, model):
        """/v1/audio/separations routes sam_audio models through the
        text-guided separate_long path (reference server.py:788-795)."""
        import asyncio
        import base64
        import io

        async def go():
            import aiohttp
            from aiohttp.test_utils import TestClient, TestServer

            from mlx_audio_tpu import audio_io
            from mlx_audio_tpu.server import AudioServer

            server = AudioServer()
            server.provider._models["sam-tiny"] = model

            async def _noload(name, category=None):
                m = server.provider._models.get(name)
                if m is None:
                    raise FileNotFoundError(name)
                return m

            server.provider.load = _noload
            wav = io.BytesIO()
            audio_io.write(wav, np.random.RandomState(0)
                           .randn(4096).astype(np.float32) * 0.1, 16000)
            async with TestClient(TestServer(server.app)) as client:
                form = aiohttp.FormData()
                form.add_field("file", wav.getvalue(), filename="a.wav")
                form.add_field("model", "sam-tiny")
                form.add_field("description", "a dog barking")
                form.add_field("steps", "2")
                form.add_field("method", "euler")
                r = await client.post("/v1/audio/separations", data=form)
                assert r.status == 200, await r.text()
                data = await r.json()
                assert data["sample_rate"] == model.sample_rate
                tgt, sr = audio_io.read(
                    io.BytesIO(base64.b64decode(data["target"])))
                assert sr == model.sample_rate and len(tgt) > 0
                assert np.isfinite(tgt).all()
            server.broker.stop_and_join()

        asyncio.run(go())
