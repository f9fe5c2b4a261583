"""Higgs Audio v2: dual-FFN routing, delay state machine, RAS, streaming."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.higgs_audio import (
    HiggsAudioServer,
    Model,
    ModelConfig,
)
from mlx_audio_tpu.tts.models.higgs_audio.higgs_audio import (
    apply_delay_pattern,
    higgs_forward,
    revert_delay_pattern,
)


def tiny_cfg():
    return ModelConfig.from_dict(dict(
        text_config=dict(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         intermediate_size=64, vocab_size=300,
                         rope_theta=500000.0,
                         rope_scaling={"rope_type": "llama3", "factor": 8.0,
                                       "low_freq_factor": 1.0,
                                       "high_freq_factor": 4.0,
                                       "original_max_position_embeddings":
                                           8192}),
        audio_num_codebooks=4, audio_codebook_size=64,
        audio_stream_bos_id=64, audio_stream_eos_id=65))


class FakeTok:
    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 290 for c in text][:80]


class FakeCodec:
    """Deterministic fake: encode -> ramp codes; decode -> one sample/frame
    scaled by code sum."""

    def encode(self, audio):
        n = max(2, np.asarray(audio).size // 1920)
        return np.tile(np.arange(n) % 60, (4, 1)).T[None]  # (1, T, K)

    def decode(self, codes):
        c = np.asarray(codes)[0]          # (K, T)
        return np.repeat(c.sum(axis=0).astype(np.float32) / 240.0, 16)


@pytest.fixture(scope="module")
def model():
    m = Model(tiny_cfg()).init_and_bind()
    m.tokenizer = FakeTok()
    m.codec = FakeCodec()
    return m


class TestDelayPattern:
    def test_roundtrip(self):
        codes = np.arange(20).reshape(4, 5).astype(np.int32)
        delayed = apply_delay_pattern(codes, bos=64, eos=65)
        assert delayed.shape == (4, 8)
        rec = revert_delay_pattern(delayed)
        np.testing.assert_array_equal(rec, codes)

    def test_delay_diagonals(self):
        codes = np.ones((3, 4), np.int32)
        d = apply_delay_pattern(codes, bos=9, eos=8)
        assert (d[1, :1] == 9).all() and (d[2, :2] == 9).all()
        assert d[0, -2:].tolist() == [8, 8]


class TestDualFFN:
    def test_mask_routes_paths(self, model):
        """Same input through text vs audio mask gives different outputs
        (independent MLPs/norms), same shapes."""
        cfg = model.config
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 6, 32).astype(np.float32))
        h_text, _ = higgs_forward(model.params, cfg, x,
                                  jnp.zeros((1, 6), bool), None, 0)
        h_audio, _ = higgs_forward(model.params, cfg, x,
                                   jnp.ones((1, 6), bool), None, 0)
        assert h_text.shape == h_audio.shape == (1, 6, 32)
        assert not np.allclose(np.asarray(h_text), np.asarray(h_audio))


class TestGenerate:
    def test_smart_voice_end_to_end(self, model):
        out = list(model.generate("hello world", temperature=0.0,
                                  max_new_frames=12, seed=0))
        assert len(out) == 1
        r = out[0]
        assert r.sample_rate == 24000
        codes = r.prompt["codes"]
        assert codes.shape[0] == 4
        # delay ramp means >= K frames before any EOS can complete
        assert r.samples == codes.shape[1] * 16

    def test_voice_clone_prompt_mask(self, model):
        ref = np.random.RandomState(1).randn(5760).astype(np.float32)
        embeds, mask = model.build_prompt("target", ref_audio=ref,
                                          ref_text="reference words")
        m = np.asarray(mask[0])
        assert m.any() and not m.all()
        # audio span is contiguous
        on = np.flatnonzero(m)
        assert (np.diff(on) == 1).all()
        assert embeds.shape[1] == m.shape[0]

    def test_voice_clone_generate(self, model):
        ref = np.random.RandomState(2).randn(5760).astype(np.float32)
        out = list(model.generate("hi", ref_audio=ref, ref_text="r",
                                  temperature=0.0, max_new_frames=10))
        assert out[0].samples >= 0

    def test_stream_overlap_add(self, model):
        chunks = list(model.generate("streaming test sentence",
                                     temperature=0.0, max_new_frames=24,
                                     stream=True, streaming_interval=0.24,
                                     seed=3))
        assert len(chunks) >= 1
        assert chunks[-1].is_final_chunk
        total = np.concatenate([np.asarray(c.audio) for c in chunks])
        off = list(model.generate("streaming test sentence",
                                  temperature=0.0, max_new_frames=24,
                                  fade_in_ms=0.0, fade_out_ms=0.0,
                                  seed=3))
        offline = np.asarray(off[0].audio)
        # overlap-add re-decode converges to the offline audio
        assert abs(len(total) - len(offline)) <= 16 * 2
        n = min(len(total), len(offline))
        np.testing.assert_allclose(total[:n], offline[:n], atol=2e-2)


class TestServer:
    def test_server_reference_cache(self, model):
        srv = HiggsAudioServer(model)
        srv.prepare_reference(
            np.random.RandomState(4).randn(5760).astype(np.float32),
            "ref text")
        r = srv.generate("served text", temperature=0.0, max_new_frames=8)
        assert r.sample_rate == 24000
        srv.clear_reference()
        assert srv._reference is None

    def test_server_stream(self, model):
        srv = HiggsAudioServer(model)
        chunks = list(srv.generate_stream_overlap_add(
            "short", temperature=0.0, max_new_frames=10))
        assert chunks and chunks[-1].is_final_chunk


class TestRegistry:
    def test_resolves_v2_and_v3(self):
        from mlx_audio_tpu.tts.utils import MODEL_REMAPPING
        from mlx_audio_tpu.utils import get_model_class

        m2, _ = get_model_class(model_type="higgs_audio", category="tts",
                                model_remapping=MODEL_REMAPPING)
        assert m2.__name__.endswith("higgs_audio")
        m3, _ = get_model_class(model_type="higgs_audio_v3",
                                category="tts",
                                model_remapping=MODEL_REMAPPING)
        assert m3.__name__.endswith("higgs_audio_v3")
