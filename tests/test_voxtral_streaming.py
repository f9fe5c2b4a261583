"""Voxtral streaming session: ring caches, conv history, offline parity."""

import base64
import json

import numpy as np
import jax
import jax.numpy as jnp

from mlx_audio_tpu.ops.kvcache import KVCache, ring_mask, ring_update
from mlx_audio_tpu.stt.models.voxtral_realtime import Model, ModelConfig
from mlx_audio_tpu.stt.models.voxtral_realtime.streaming import (
    ENC_CHUNK, VoxtralStreamingSession, encoder_stream_step)
from mlx_audio_tpu.stt.models.voxtral_realtime.voxtral_realtime import (
    TekkenTokenizer, _pad_audio_streaming, conv_stem, encoder_layers,
    voxtral_mel)


def _cfg():
    return ModelConfig.from_dict(dict(
        model_type="voxtral_realtime",
        encoder_args=dict(dim=16, n_layers=1, n_heads=2, head_dim=8,
                          hidden_dim=32, n_kv_heads=2, sliding_window=48,
                          downsample_factor=4,
                          audio_encoding_args=dict(num_mel_bins=16)),
        decoder=dict(dim=16, n_layers=1, n_heads=2, n_kv_heads=2,
                     head_dim=8, hidden_dim=32, vocab_size=64,
                     ada_rms_norm_t_cond_dim=4),
        transcription_delay_ms=160, n_left_pad_tokens=2))


def _tiny(tmp_path):
    m = Model(_cfg()).init_and_bind()
    vocab = [{"token_bytes": base64.b64encode((c + " ").encode()).decode()}
             for c in "abcdefghij"]
    p = tmp_path / "tekken.json"
    p.write_text(json.dumps({
        "vocab": vocab, "config": {"default_num_special_tokens": 40},
        "special_tokens": [{"rank": 1}, {"rank": 2}, {"rank": 32}]}))
    m._tokenizer = TekkenTokenizer(str(p))
    return m


class TestRingCache:
    def test_ring_matches_full_attention(self):
        """Chunked ring-cache attention == full band-masked attention."""
        rs = np.random.RandomState(0)
        T, W, CAP, H, D = 96, 24, 48, 2, 4   # cap >= window + chunk
        k = jnp.asarray(rs.randn(1, T, H, D).astype(np.float32))
        v = jnp.asarray(rs.randn(1, T, H, D).astype(np.float32))
        q = jnp.asarray(rs.randn(1, T, H, D).astype(np.float32))
        from mlx_audio_tpu.ops.attention import attention
        qi = np.arange(T)[:, None]
        kj = np.arange(T)[None, :]
        full_mask = jnp.asarray(np.where(
            (kj <= qi) & (qi - kj < W), 0.0, -np.inf))[None, None]
        ref = np.asarray(attention(q, k, v, mask=full_mask))
        cache = KVCache.init(1, CAP, H, D, dtype=jnp.float32)
        outs = []
        S = 16
        for s0 in range(0, T, S):
            cache = ring_update(cache, k[:, s0:s0 + S], v[:, s0:s0 + S],
                                jnp.int32(s0))
            m = ring_mask(CAP, W, jnp.int32(s0), jnp.int32(S), S)
            outs.append(np.asarray(attention(q[:, s0:s0 + S], cache.k,
                                             cache.v, mask=m)))
        np.testing.assert_allclose(np.concatenate(outs, 1), ref,
                                   atol=1e-5)

    def test_ring_mask_unwritten_blocked(self):
        m = np.asarray(ring_mask(8, 4, jnp.int32(0), jnp.int32(3), 3))
        assert np.isneginf(m[0, 0, 0, 3:]).all()     # unwritten slots
        assert m[0, 0, 2, 2] == 0.0                  # own position


class TestStreamedEncoder:
    def test_chunked_ring_equals_offline(self, tmp_path):
        m = _tiny(tmp_path)
        e = m.config.encoder_args
        rs = np.random.RandomState(1)
        T = 160
        conv = jnp.asarray(rs.randn(1, T, e.dim).astype(np.float32) * 0.1)
        ref = np.asarray(encoder_layers(m.params["encoder"], e, conv,
                                        jnp.int32(T)))
        caches = [KVCache.init(1, 128, e.n_heads, e.head_dim,
                               dtype=jnp.float32)
                  for _ in range(e.n_layers)]
        outs = []
        for s0 in range(0, T, ENC_CHUNK):
            n = min(ENC_CHUNK, T - s0)
            x = np.zeros((1, ENC_CHUNK, e.dim), np.float32)
            x[0, :n] = np.asarray(conv)[0, s0:s0 + n]
            y, caches = encoder_stream_step(
                m.params["encoder"], e, jnp.asarray(x), caches,
                jnp.int32(s0), jnp.int32(n))
            outs.append(np.asarray(y)[0, :n])
        got = np.concatenate(outs, 0)
        np.testing.assert_allclose(got, ref[0], atol=2e-5)


class TestSessionParity:
    def test_adapter_frames_match_offline(self, tmp_path):
        m = _tiny(tmp_path)
        rs = np.random.RandomState(2)
        audio = rs.randn(16000).astype(np.float32)
        n_delay = 2  # 160 ms
        padded = _pad_audio_streaming(audio, 2, (n_delay + 1) + 10)
        offline, n_audio = m.encode(padded)

        sess = m.create_streaming_session()
        for i in range(0, len(audio), 3000):   # uneven feeds
            sess.feed(audio[i:i + 3000])
        sess.close()
        while not sess.done and sess._n_adapter < n_audio:
            sess.step(max_decode_tokens=0)
            if sess._flushed and sess._n_adapter >= n_audio:
                break
        got = sess._adapter_cat()
        assert got.shape[0] >= n_audio
        np.testing.assert_allclose(got[:n_audio], offline[0],
                                   rtol=2e-3, atol=2e-4)

    def test_session_text_matches_offline(self, tmp_path):
        m = _tiny(tmp_path)
        rs = np.random.RandomState(3)
        audio = rs.randn(16000).astype(np.float32)
        off = m.generate(audio, max_tokens=256)
        sess = m.create_streaming_session(max_tokens=256)
        sess.feed(audio)
        sess.close()
        deltas, finals = [], []
        for _ in range(500):
            for ev in sess.step(max_decode_tokens=8):
                (deltas if ev.kind == "delta" else finals).append(ev.text)
            if sess.done:
                break
        assert sess.done
        assert "".join(deltas).strip() == off.text.strip()
        # shared StreamingEvent protocol: exactly one final event carrying
        # the full transcript, and session.text agrees (server.py finalize)
        assert finals == ["".join(deltas)]
        assert sess.text == "".join(deltas)

    def test_incremental_feed_same_as_bulk(self, tmp_path):
        m = _tiny(tmp_path)
        rs = np.random.RandomState(4)
        audio = rs.randn(12000).astype(np.float32)

        def run(feeds):
            s = m.create_streaming_session(max_tokens=128)
            for f in feeds:
                s.feed(f)
            s.close()
            out = []
            for _ in range(300):
                out.extend(e.text for e in s.step(max_decode_tokens=4)
                           if e.kind == "delta")
                if s.done:
                    break
            return "".join(out)

        bulk = run([audio])
        tiny = run([audio[i:i + 777] for i in range(0, len(audio), 777)])
        assert bulk == tiny

    def test_sessions_share_model_level_jit_cache(self, tmp_path):
        """/v1/realtime opens a session per turn; the jitted programs must
        be shared at the model level so turn N+1 pays zero re-tracing."""
        m = _tiny(tmp_path)
        s1 = m.create_streaming_session(max_tokens=64)
        s1.feed(np.zeros(8000, np.float32))
        s1.close()
        for _ in range(100):
            s1.step(max_decode_tokens=4)
            if s1.done:
                break
        keys = set(m._stream_fns)
        assert keys, "first session compiled nothing"
        s2 = m.create_streaming_session(max_tokens=64)
        assert s2._fns is m._stream_fns
        s2.feed(np.zeros(8000, np.float32))
        s2.close()
        for _ in range(100):
            s2.step(max_decode_tokens=4)
            if s2.done:
                break
        assert set(m._stream_fns) == keys, "second session re-traced"
