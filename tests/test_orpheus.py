"""Orpheus llama TTS (model_type "llama"): code interleave, prompt framing,
parse, SNAC streaming decode, compiled generate loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.tts.models.llama.orpheus import (
    CODE_OFFSET, EOH, EOS_SPEECH, EOT, SOA, SOH, SOS, Model, ModelConfig,
    flat_codes_to_layers, layers_to_flat_codes)


class FakeTok:
    eos_token_id = 128001

    def encode(self, text):
        return [ord(c) % 100 + 10 for c in text]


def _tiny_snac():
    from mlx_audio_tpu.codec.models.snac import SNAC
    from mlx_audio_tpu.codec.models.snac import ModelConfig as SnacConfig

    cfg = SnacConfig(
        sampling_rate=24000, encoder_dim=16, encoder_rates=[2, 2],
        decoder_dim=32, decoder_rates=[2, 2], attn_window_size=None,
        codebook_size=4096, codebook_dim=8, vq_strides=[4, 2, 1],
        noise=True, depthwise=True)
    return SNAC(cfg).init_and_bind()


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(hidden_size=32, num_hidden_layers=2,
                      intermediate_size=64, num_attention_heads=4,
                      num_key_value_heads=2, vocab_size=CODE_OFFSET + 7 * 4096,
                      rope_theta=10000.0)
    m = Model(cfg).init_and_bind()
    m._tokenizer = FakeTok()
    m._codec = _tiny_snac()
    return m


class TestCodes:
    def test_interleave_roundtrip(self):
        rng = np.random.RandomState(0)
        layers = [rng.randint(0, 4096, (1, 5)),
                  rng.randint(0, 4096, (1, 10)),
                  rng.randint(0, 4096, (1, 20))]
        flat = layers_to_flat_codes(layers)
        assert flat.shape == (35,)
        back = flat_codes_to_layers(flat)
        for a, b in zip(layers, back):
            np.testing.assert_array_equal(a, b)

    def test_slot_offsets(self):
        # frame [a, b, c, d, e, f, g] carries slot offsets k*4096
        # (reference llama.py:108-129)
        layers = [np.array([[7]]), np.array([[1, 2]]),
                  np.array([[3, 4, 5, 6]])]
        flat = layers_to_flat_codes(layers)
        np.testing.assert_array_equal(
            flat, [7, 1 + 4096, 3 + 2 * 4096, 4 + 3 * 4096,
                   2 + 4 * 4096, 5 + 5 * 4096, 6 + 6 * 4096])

    def test_parse_codes_crops_after_last_sos(self):
        codes = list(range(CODE_OFFSET, CODE_OFFSET + 14))
        toks = [SOH, 42, EOT, EOH, SOA, SOS] + codes + [EOS_SPEECH]
        out = Model.parse_codes(toks)
        np.testing.assert_array_equal(out, np.arange(14))
        # a second SOS later wins; trailing partial frame is trimmed
        toks2 = toks + [SOS] + codes[:10]
        out2 = Model.parse_codes(toks2)
        np.testing.assert_array_equal(out2, np.arange(7))


class TestPrompt:
    def test_plain_and_voice(self, model):
        ids = model.prepare_input_ids("hi")
        assert ids[0] == SOH and list(ids[-2:]) == [EOT, EOH]
        v = model.prepare_input_ids("hi", voice="tara")
        # voice prefix "tara: " lengthens the text section
        assert len(v) == len(ids) + len("tara: ")

    def test_zeroprompt_layout(self, model):
        ref_audio = np.random.RandomState(0).randn(16 * 20).astype(np.float32)
        zp = model.prepare_zeroprompt(ref_audio, "ref")
        assert zp[0] == SOH and zp[-2:] == [EOS_SPEECH, 128262]
        i = zp.index(SOS)
        assert zp[i - 1] == SOA
        codes = np.asarray(zp[i + 1:-2]) - CODE_OFFSET
        assert len(codes) % 7 == 0 and (codes >= 0).all()
        # voiced prompt with zeroprompt prepends it verbatim
        ids = model.prepare_input_ids("hi", voice=None, zeroprompt=zp)
        assert list(ids[:len(zp)]) == zp


class TestSnacStream:
    def test_stream_matches_total_length(self):
        # noise=False: the decoder's noise branch draws shape-dependent
        # randomness, which precludes exact stream/offline parity (the
        # reference has the same property)
        from mlx_audio_tpu.codec.models.snac import SNAC
        from mlx_audio_tpu.codec.models.snac import ModelConfig as SnacConfig

        snac = SNAC(SnacConfig(
            sampling_rate=24000, encoder_dim=16, encoder_rates=[2, 2],
            decoder_dim=32, decoder_rates=[2, 2], attn_window_size=None,
            codebook_size=4096, codebook_dim=8, vq_strides=[4, 2, 1],
            noise=False, depthwise=True)).init_and_bind()
        rng = np.random.RandomState(1)
        full = [rng.randint(0, 4096, (1, 8)), rng.randint(0, 4096, (1, 16)),
                rng.randint(0, 4096, (1, 32))]
        offline = np.asarray(snac.decode([jnp.asarray(x) for x in full]))
        # two streamed halves (frames 0-3 / 4-7 on the coarse layer)
        c1 = [full[0][:, :4], full[1][:, :8], full[2][:, :16]]
        c2 = [full[0][:, 4:], full[1][:, 8:], full[2][:, 16:]]
        a1, ctx = snac.decode_stream([jnp.asarray(x) for x in c1])
        a2, ctx2 = snac.decode_stream([jnp.asarray(x) for x in c2], ctx,
                                      context_frames=8)
        assert a1.shape[1] + a2.shape[1] == offline.shape[1]
        # first call without context decodes standalone
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(snac.decode(
                [jnp.asarray(x) for x in c1])), atol=1e-6)
        # second call == decode(context + new) minus the context samples
        # (reference snac.py:132-155), with per-layer stride-adjusted context
        combined = [np.concatenate([c1[0][:, -2:], c2[0]], axis=1),
                    np.concatenate([c1[1][:, -4:], c2[1]], axis=1),
                    np.concatenate([c1[2][:, -8:], c2[2]], axis=1)]
        ref2 = np.asarray(snac.decode([jnp.asarray(x) for x in combined]))
        np.testing.assert_allclose(np.asarray(a2),
                                   ref2[:, 8 * snac.hop_length:], atol=1e-6)
        # context carried forward is the tail of the new codes
        for c, n in zip(ctx2, c2):
            np.testing.assert_array_equal(np.asarray(c),
                                          n[:, -min(8, n.shape[1]):])


class TestGenerate:
    def test_offline_generate(self, model):
        outs = list(model.generate("hello world", voice="tara",
                                   max_tokens=40, temperature=0.8, seed=0))
        assert len(outs) == 1
        r = outs[0]
        assert r.samples > 0 and r.sample_rate == 24000
        assert np.isfinite(np.asarray(r.audio)).all()

    def test_streaming_generate(self, model):
        outs = list(model.generate("hello world streaming test",
                                   voice=None, max_tokens=60, stream=True,
                                   streaming_interval=0.1, seed=1))
        assert len(outs) >= 1
        total = sum(r.samples for r in outs)
        assert total > 0
        for r in outs:
            assert np.isfinite(np.asarray(r.audio)).all()

    def test_segments_split(self, model):
        outs = list(model.generate("one\ntwo", max_tokens=20, seed=2))
        assert {r.segment_idx for r in outs} == {0, 1}
