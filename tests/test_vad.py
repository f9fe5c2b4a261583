"""Silero VAD + realtime turn-detection tests (synthetic, no weights)."""

import numpy as np
import jax
import pytest

from mlx_audio_tpu.realtime_vad import (
    ServerVadConfig,
    StreamingVad,
    TurnDetectionError,
    TurnDetector,
    TurnEventKind,
    parse_turn_detection,
)
from mlx_audio_tpu.vad.models.silero_vad import Model, ModelConfig


@pytest.fixture(scope="module")
def vad():
    return Model(ModelConfig()).init_and_bind()


class TestSileroModel:
    def test_feed_shapes_and_state(self, vad):
        chunk = np.random.RandomState(0).randn(512).astype(np.float32) * 0.1
        prob, state = vad.feed(chunk)
        assert prob.shape == (1, 1)
        assert 0.0 <= float(prob[0, 0]) <= 1.0
        prob2, state2 = vad.feed(chunk, state)
        assert state2.context.shape == (1, 64)

    def test_streaming_matches_offline(self, vad):
        """The scan (offline) path must equal chunkwise feed (streaming)."""
        audio = np.random.RandomState(1).randn(512 * 5).astype(np.float32) * 0.3
        offline = vad.predict_proba(audio, 16000)
        state = None
        streamed = []
        for i in range(5):
            p, state = vad.feed(audio[i * 512:(i + 1) * 512], state)
            streamed.append(float(p[0, 0]))
        np.testing.assert_allclose(offline, streamed, atol=1e-5)

    def test_8k_branch(self, vad):
        chunk = np.zeros(256, np.float32)
        prob, state = vad.feed(chunk, sample_rate=8000)
        assert prob.shape == (1, 1)

    def test_wrong_chunk_size_raises(self, vad):
        with pytest.raises(ValueError):
            vad.feed(np.zeros(100, np.float32))

    def test_generate_output(self, vad):
        audio = np.random.RandomState(2).randn(16000).astype(np.float32) * 0.1
        out = vad.generate(audio, 16000)
        assert out.sample_rate == 16000
        assert out.probabilities.shape[0] == 32  # ceil(16000/512) = 32


class TestTimestampExtraction:
    def test_hysteresis_logic(self):
        from mlx_audio_tpu.vad.models.silero_vad.silero_vad import (
            _probs_to_timestamps,
        )

        # 20 chunks: speech in chunks 3-10, silence elsewhere
        probs = np.zeros(20)
        probs[3:11] = 0.9
        out = _probs_to_timestamps(probs, 20 * 512, 16000, 0.5, 250, 100, 0,
                                   False)
        assert len(out) == 1
        assert out[0]["start"] == 3 * 512
        # short blip below min duration is dropped
        probs2 = np.zeros(20)
        probs2[5] = 0.9
        out2 = _probs_to_timestamps(probs2, 20 * 512, 16000, 0.5, 250, 100, 0,
                                    False)
        assert out2 == []

    def test_padding_merges_segments(self):
        from mlx_audio_tpu.vad.models.silero_vad.silero_vad import (
            _probs_to_timestamps,
        )

        probs = np.zeros(40)
        probs[2:12] = 0.9
        probs[14:24] = 0.9
        out = _probs_to_timestamps(probs, 40 * 512, 16000, 0.5, 100, 50, 100,
                                   False)
        # generous padding merges the two segments
        assert len(out) == 1


class TestTurnDetector:
    CFG = ServerVadConfig(threshold=0.5, prefix_padding_ms=300,
                          silence_duration_ms=500)

    def test_start_stop_cycle(self):
        det = TurnDetector(self.CFG)
        frame = 32.0
        events = []
        for p in [0.1, 0.2, 0.9, 0.9, 0.9]:
            events += det.push(p, frame)
        assert [e.kind for e in events] == [TurnEventKind.SPEECH_STARTED]
        assert det.in_speech
        # ~500ms of silence -> stop
        for _ in range(16):
            events += det.push(0.1, frame)
        assert events[-1].kind == TurnEventKind.SPEECH_STOPPED
        assert not det.in_speech

    def test_prefix_padding_applied(self):
        det = TurnDetector(self.CFG)
        for _ in range(20):
            det.push(0.0, 32.0)
        ev = det.push(0.9, 32.0)
        # start = elapsed - frame - prefix = 21*32 - 32 - 300
        assert ev[0].audio_ms == 21 * 32 - 32 - 300

    def test_silence_resets_on_speech(self):
        det = TurnDetector(self.CFG)
        det.push(0.9, 32.0)
        for _ in range(10):
            det.push(0.1, 32.0)  # 320 ms < 500 ms
        assert det.in_speech
        det.push(0.9, 32.0)  # speech resets silence
        for _ in range(10):
            det.push(0.1, 32.0)
        assert det.in_speech  # still < 500ms since reset

    def test_parse_turn_detection(self):
        assert parse_turn_detection(None) is None
        cfg = parse_turn_detection({"type": "server_vad", "threshold": 0.7})
        assert cfg.threshold == 0.7
        with pytest.raises(TurnDetectionError):
            parse_turn_detection({"type": "semantic_vad"})
        with pytest.raises(TurnDetectionError):
            parse_turn_detection({"type": "bogus"})


class _FakeVad:
    """Scripted-probability VAD implementing the Silero streaming protocol."""

    def __init__(self, probs):
        self.probs = list(probs)
        self.i = 0

    def initial_state(self, sample_rate=16000):
        return None

    def feed(self, chunk, state, sample_rate=16000):
        p = self.probs[min(self.i, len(self.probs) - 1)]
        self.i += 1
        return np.asarray([[p]]), state


class TestStreamingVad:
    def test_frame_buffering_and_events(self):
        probs = [0.1] * 3 + [0.9] * 5 + [0.0] * 30
        sv = StreamingVad(_FakeVad(probs), ServerVadConfig())
        events = []
        # feed in odd-sized pieces to exercise buffering
        audio = np.zeros(512 * 38, np.float32)
        for off in range(0, len(audio), 700):
            events += sv.process(audio[off: off + 700])
        kinds = [e.kind for e in events]
        assert kinds == [TurnEventKind.SPEECH_STARTED,
                         TurnEventKind.SPEECH_STOPPED]
