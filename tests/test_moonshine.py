"""Moonshine ASR: HF-torch parity, bucket invariance, compiled decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.stt.models.moonshine import Model, ModelConfig
from mlx_audio_tpu.stt.models.moonshine.moonshine import (encoder_forward,
                                                          encoder_frames,
                                                          greedy_decode,
                                                          init_moonshine)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_config():
    from transformers import MoonshineConfig
    return MoonshineConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        encoder_num_hidden_layers=2, decoder_num_hidden_layers=2,
        encoder_num_attention_heads=4, decoder_num_attention_heads=4,
        encoder_num_key_value_heads=4, decoder_num_key_value_heads=4,
        max_position_embeddings=128, decoder_start_token_id=1,
        eos_token_id=2, bos_token_id=1, attention_dropout=0.0)


def _our_config(hf):
    return ModelConfig(
        vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
        intermediate_size=hf.intermediate_size,
        encoder_num_hidden_layers=hf.encoder_num_hidden_layers,
        decoder_num_hidden_layers=hf.decoder_num_hidden_layers,
        encoder_num_attention_heads=hf.encoder_num_attention_heads,
        decoder_num_attention_heads=hf.decoder_num_attention_heads,
        encoder_num_key_value_heads=hf.encoder_num_key_value_heads,
        decoder_num_key_value_heads=hf.decoder_num_key_value_heads,
        max_position_embeddings=hf.max_position_embeddings,
        partial_rotary_factor=hf.partial_rotary_factor,
        rope_theta=hf.rope_theta,
        decoder_start_token_id=hf.decoder_start_token_id,
        eos_token_id=hf.eos_token_id,
        tie_word_embeddings=True)


@pytest.fixture(scope="module")
def pair():
    from transformers import MoonshineForConditionalGeneration
    torch.manual_seed(0)
    hf = MoonshineForConditionalGeneration(_hf_config()).eval()
    m = Model(_our_config(hf.config))
    from mlx_audio_tpu.utils import unflatten
    flat = m.sanitize({k: v.detach().numpy()
                       for k, v in hf.state_dict().items()})
    m.bind(unflatten({k: jnp.asarray(v) for k, v in flat.items()}))
    return hf, m


class TestParity:
    def test_encoder_matches_hf(self, pair):
        hf, m = pair
        wave = torch.randn(1, 3200) * 0.1
        with torch.no_grad():
            ref = hf.model.encoder(wave).last_hidden_state.numpy()
        ours, n = encoder_forward(m.params, m.config,
                                  jnp.asarray(wave.numpy()),
                                  jnp.asarray([3200]))
        f = int(n[0])
        assert f == ref.shape[1] == encoder_frames(3200)
        np.testing.assert_allclose(np.asarray(ours)[:, :f], ref, atol=2e-4)

    def test_generate_tokens_match_hf(self, pair):
        hf, m = pair
        wave = (torch.randn(1, 3200) * 0.1).numpy()
        with torch.no_grad():
            ref = hf.generate(torch.from_numpy(wave), max_new_tokens=16,
                              do_sample=False)[0].numpy().tolist()
        # HF output: [start] + generated (+ eos)
        ref_gen = [t for t in ref[1:] if t != m.config.eos_token_id]

        b = 16000
        pad = np.zeros((1, b), np.float32)
        pad[0, :3200] = wave[0]
        enc, frames = encoder_forward(m.params, m.config, jnp.asarray(pad),
                                      jnp.asarray([3200]))
        tokens, count = greedy_decode(m.params, m.config, enc, frames, 16)
        got = np.asarray(tokens)[: int(count)].tolist()
        assert got == ref_gen

    def test_bucket_invariance(self, pair):
        _, m = pair
        rng = np.random.RandomState(0)
        wave = rng.randn(2700).astype(np.float32) * 0.1
        tight = np.zeros((1, 3000), np.float32)
        tight[0, :2700] = wave
        padded = np.zeros((1, 9000), np.float32)
        padded[0, :2700] = wave
        e1, n1 = encoder_forward(m.params, m.config, jnp.asarray(tight),
                                 jnp.asarray([2700]))
        e2, n2 = encoder_forward(m.params, m.config, jnp.asarray(padded),
                                 jnp.asarray([2700]))
        f = int(n1[0])
        assert f == int(n2[0])
        np.testing.assert_allclose(np.asarray(e1)[:, :f],
                                   np.asarray(e2)[:, :f], atol=1e-4)


class TestGenerate:
    def test_generate_end_to_end(self, pair):
        _, m = pair
        out = m.generate(np.random.RandomState(1)
                         .randn(4000).astype(np.float32) * 0.1,
                         max_tokens=8)
        assert isinstance(out.text, str)
        assert out.generation_tokens <= 8
        assert out.total_time > 0

    def test_eos_stops_decode(self, pair):
        _, m = pair
        cfg = m.config
        enc = jnp.zeros((1, 10, cfg.hidden_size))
        frames = jnp.asarray([10])
        tokens, count = greedy_decode(m.params, cfg, enc, frames, 12)
        assert int(count) <= 12
        kept = np.asarray(tokens)[: int(count)]
        assert (kept != cfg.eos_token_id).all()


class TestSanitize:
    def test_conv_layout_and_prefix(self):
        m = Model(ModelConfig(hidden_size=8, intermediate_size=16,
                              encoder_num_hidden_layers=1,
                              decoder_num_hidden_layers=1,
                              encoder_num_attention_heads=2,
                              decoder_num_attention_heads=2, vocab_size=16))
        w = {"model.encoder.conv1.weight": jnp.ones((8, 1, 127)),
             "model.encoder.conv2.weight": jnp.ones((16, 8, 7)),
             "proj_out.weight": jnp.ones((16, 8))}
        out = m.sanitize(w)
        assert out["encoder.conv1.weight"].shape == (127, 1, 8)
        assert out["encoder.conv2.weight"].shape == (7, 8, 16)
        assert "proj_out.weight" not in out  # tied embeddings
        # already-converted passes through
        again = m.sanitize(out)
        assert again["encoder.conv1.weight"].shape == (127, 1, 8)
