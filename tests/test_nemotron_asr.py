"""Nemotron ASR: chunked-limited mask, compiled RNNT, chunk chaining."""

import numpy as np
import jax
import jax.numpy as jnp

from mlx_audio_tpu.stt.models.nemotron_asr import Model, ModelConfig
from mlx_audio_tpu.stt.models.nemotron_asr.nemotron_asr import (
    chunked_limited_mask, decode_pieces, detected_language, greedy_rnnt,
    nemo_log_mel, subsampled_length)


def _vocab():
    v = ["<unk>", "<en-US>", "<de-DE>"]
    v += ["▁" + w for w in ("the", "cat", "sat", "ok.")]
    v += list("abcdefgh")
    return v


def _cfg():
    vocab = _vocab()
    return ModelConfig.from_dict(dict(
        model_type="nemotron_asr",
        preprocessor=dict(features=16, n_fft=256, window_size=0.016,
                          window_stride=0.01),
        encoder=dict(feat_in=16, n_layers=1, d_model=16, n_heads=2,
                     subsampling_factor=4, subsampling_conv_channels=4,
                     conv_kernel_size=5,
                     att_context_size=[[8, 1]]),
        prompt=dict(num_prompts=4, prompt_hidden=8,
                    prompt_dictionary={"auto": 0, "en-US": 1}),
        decoder=dict(pred_hidden=8, pred_rnn_layers=1,
                     vocab_size=len(vocab)),
        joint=dict(joint_hidden=8, encoder_hidden=16, pred_hidden=8,
                   num_classes=len(vocab)),
        vocabulary=vocab,
        default_att_context_size=[8, 1], max_symbols=4))


def _tiny():
    return Model(_cfg()).init_and_bind()


class TestMask:
    def test_chunked_limited_structure(self):
        m = chunked_limited_mask(8, 4, 1)
        # chunk size 2, 2 left chunks visible
        assert m[0, 0] and m[0, 1]          # own chunk incl. look-ahead
        assert not m[0, 2]                  # no future chunk
        assert m[5, 0]                      # within left context
        assert not m[7, 0]                  # chunk 3 can't see chunk 0

    def test_subsampled_length(self):
        # causal formula: floor(n/2)+1 per stage
        assert int(subsampled_length(100, 2)) == (100 // 2 + 1) // 2 + 1


class TestTokenizer:
    def test_decode_strips_specials_and_lang(self):
        v = _vocab()
        toks = [1, 3, 4, 0, 6]              # <en-US> the cat <unk> ok.
        assert decode_pieces(toks, v) == " the cat ok."
        assert detected_language(toks, v) == "en-US"


class TestEncoder:
    def test_bucket_exactness(self):
        """Padded mel bucket == tight bucket for valid frames (validity
        mask + re-zeroing + causal convs)."""
        m = _tiny()
        cfg = m.config
        rs = np.random.RandomState(0)
        mel = rs.randn(1, 90, 16).astype(np.float32)
        from mlx_audio_tpu.stt.models.nemotron_asr.nemotron_asr import \
            encode
        f_tight = np.asarray(encode(m.params, cfg, jnp.asarray(mel),
                                    jnp.int32(90), (8, 1), jnp.int32(0)))
        padded = np.zeros((1, 128, 16), np.float32)
        padded[:, :90] = mel
        f_pad = np.asarray(encode(m.params, cfg, jnp.asarray(padded),
                                  jnp.int32(90), (8, 1), jnp.int32(0)))
        n = int(subsampled_length(90, 2))
        np.testing.assert_allclose(f_pad[:, :n], f_tight[:, :n],
                                   atol=2e-5)

    def test_prompt_changes_output(self):
        m = _tiny()
        from mlx_audio_tpu.stt.models.nemotron_asr.nemotron_asr import \
            encode
        mel = jnp.zeros((1, 64, 16))
        a = np.asarray(encode(m.params, m.config, mel, jnp.int32(64),
                              (8, 1), jnp.int32(0)))
        b = np.asarray(encode(m.params, m.config, mel, jnp.int32(64),
                              (8, 1), jnp.int32(1)))
        assert not np.allclose(a, b)


class TestGreedy:
    def test_rnnt_emits_and_respects_cap(self):
        m = _tiny()
        cfg = m.config
        rs = np.random.RandomState(1)
        feats = jnp.asarray(rs.randn(1, 12, 16).astype(np.float32))
        pd = cfg.decoder
        h = jnp.zeros((1, 1, 8))
        c = jnp.zeros_like(h)
        toks, tms, h2, c2, last = greedy_rnnt(
            m.params, cfg, feats, jnp.int32(12), h, c,
            jnp.int32(pd.vocab_size))
        arr = np.asarray(toks)
        n = int((arr >= 0).sum())
        assert n <= 12 * cfg.max_symbols
        # times are monotone for emitted tokens
        t = np.asarray(tms)[arr >= 0]
        assert (np.diff(t) >= 0).all()

    def test_chunk_chaining_matches_full(self):
        """Carrying (h, c, last) across feature chunks == one full pass
        when the encoder features are identical."""
        m = _tiny()
        cfg = m.config
        rs = np.random.RandomState(2)
        feats = jnp.asarray(rs.randn(1, 16, 16).astype(np.float32))
        pd = cfg.decoder
        z = jnp.zeros((1, 1, 8))
        blank = jnp.int32(pd.vocab_size)
        t_full, _, _, _, _ = greedy_rnnt(m.params, cfg, feats,
                                         jnp.int32(16), z, z, blank)
        t1, _, h, c, last = greedy_rnnt(m.params, cfg, feats[:, :8],
                                        jnp.int32(8), z, z, blank)
        t2, _, _, _, _ = greedy_rnnt(m.params, cfg, feats[:, 8:],
                                     jnp.int32(8), h, c, last)
        full = np.asarray(t_full)
        full = full[full >= 0]
        parts = np.concatenate([np.asarray(t1)[np.asarray(t1) >= 0],
                                np.asarray(t2)[np.asarray(t2) >= 0]])
        np.testing.assert_array_equal(full, parts)


class TestGenerate:
    def test_end_to_end(self):
        m = _tiny()
        rs = np.random.RandomState(3)
        out = m.generate(rs.randn(16000).astype(np.float32))
        assert isinstance(out.text, str)
        assert out.total_time > 0

    def test_stream_cumulative(self):
        m = _tiny()
        rs = np.random.RandomState(4)
        results = list(m.stream_generate(
            rs.randn(32000).astype(np.float32), chunk_duration=1.0))
        assert len(results) >= 2       # 201 mel frames -> 3 x 100-chunks
        # cumulative: later text extends earlier
        assert results[1].text.startswith(results[0].text[:4]) or \
            results[0].text == ""


class TestSanitize:
    def test_lstm_and_conv_layouts(self):
        m = Model(_cfg())
        out = m.sanitize({
            "decoder.prediction.dec_rnn.lstm.0.Wx": jnp.ones((32, 8)),
            "decoder.prediction.dec_rnn.lstm.0.Wh": jnp.ones((32, 8)),
            "decoder.prediction.dec_rnn.lstm.0.bias": jnp.ones((32,)),
            "encoder.pre_encode.conv.0.weight": jnp.ones((4, 3, 3, 1)),
            "encoder.layers.0.conv.depthwise_conv.weight":
                jnp.ones((16, 5, 1)),
        })
        assert "decoder.prediction.dec_rnn.lstm.0.weight_ih" in out
        assert "decoder.prediction.dec_rnn.lstm.0.bias_ih" in out
        assert out["encoder.pre_encode.conv.0.weight"].shape \
            == (3, 3, 1, 4)
        assert out["encoder.layers.0.conv.depthwise_conv.weight"].shape \
            == (5, 1, 16)

    def test_converted_passthrough(self):
        m = _tiny()
        from mlx_audio_tpu.utils import flatten
        flat = flatten(m.params)
        again = m.sanitize(flat)
        assert set(again) == set(flat)
        for k in flat:
            assert again[k].shape == flat[k].shape, k
