"""Voice-pipeline orchestration tests with scripted components (no weights).

Covers the reference voice_pipeline.py behaviors: VAD hysteresis, full
turn flow, smart-turn early endpointing (:1148-1162), echo-correlation
barge-in rejection (:544-565,711), and real barge-in cancellation."""

import numpy as np
import pytest

from mlx_audio_tpu.sts.audio_player import AudioOutputStream
from mlx_audio_tpu.sts.voice_pipeline import (
    LocalLLMResponseEngine,
    SileroVoiceActivityDetector,
    SmartTurnEndpointDetector,
    VadConfig,
    VoicePipeline,
)


class ScriptedVad:
    """Silero protocol fake with per-call scripted probabilities."""

    def __init__(self, probs):
        self.probs = list(probs)
        self.i = 0

    def initial_state(self, sample_rate=16000):
        return None

    def feed(self, chunk, state, sample_rate=16000):
        p = self.probs[min(self.i, len(self.probs) - 1)]
        self.i += 1
        return np.asarray([[p]]), state


class FakeSTT:
    def generate(self, audio, **kw):
        from mlx_audio_tpu.stt.models.base import STTOutput

        return STTOutput(text=f"turn of {len(audio)} samples")


class FakeTTS:
    sample_rate = 16000

    class _R:
        def __init__(self, audio):
            self.audio = audio

    def generate(self, text, **kw):
        yield self._R(np.ones(2400, np.float32) * 0.1)
        yield self._R(np.ones(2400, np.float32) * 0.2)


class FakeSmartTurn:
    """predict_endpoint protocol fake with a scripted verdict."""

    def __init__(self, complete=True, probability=0.9):
        self.complete = complete
        self.probability = probability
        self.calls = 0

    def predict_endpoint(self, audio, sample_rate=None, threshold=None):
        from dataclasses import dataclass

        @dataclass
        class Out:
            prediction: int
            probability: float

        self.calls += 1
        return Out(prediction=int(self.complete), probability=self.probability)


def frames(n, amp=0.0):
    return np.full(512 * n, amp, np.float32)


class TestVadHysteresis:
    def test_start_stop(self):
        vad = SileroVoiceActivityDetector(
            ScriptedVad([0.1] * 3 + [0.9] * 5 + [0.1] * 40),
            VadConfig(min_silence_ms=600))
        events = []
        for _ in range(48):
            _, started, stopped, _ = vad.process(np.zeros(512, np.float32))
            if started:
                events.append("start")
            if stopped:
                events.append("stop")
        assert events == ["start", "stop"]

    def test_candidate_fires_before_stop(self):
        vad = SileroVoiceActivityDetector(
            ScriptedVad([0.9] * 3 + [0.1] * 40),
            VadConfig(min_silence_ms=600, candidate_silence_ms=120))
        seen = []
        for _ in range(40):
            _, started, stopped, cand = vad.process(
                np.zeros(512, np.float32))
            if cand:
                seen.append("candidate")
            if stopped:
                seen.append("stop")
        assert seen == ["candidate", "stop"]


class TestPipelineTurn:
    def _make(self, probs, smart_turn=None, clock=None, **vad_kw):
        events = []
        kw = dict(min_silence_ms=300)
        kw.update(vad_kw)
        p = VoicePipeline(
            vad_model=ScriptedVad(probs),
            stt_model=FakeSTT(),
            tts_model=FakeTTS(),
            smart_turn_model=smart_turn,
            on_event=lambda kind, data: events.append((kind, data)),
            vad_config=VadConfig(**kw),
            clock=clock,
        )
        return p, events

    def test_full_turn_flow(self):
        probs = [0.0] * 2 + [0.9] * 10 + [0.0] * 30
        p, events = self._make(probs)
        p.feed_audio(frames(42, 0.1))
        kinds = [k for k, _ in events]
        assert "speech_started" in kinds
        assert "speech_stopped" in kinds
        assert "transcription" in kinds
        assert "response" in kinds
        resp = [d for k, d in events if k == "response"][0]
        assert resp["text"].startswith("You said:")
        chunk = p.fetch_speech(timeout=1.0)
        assert chunk is not None and len(chunk) == 2400
        p.shutdown()

    def test_smart_turn_ends_turn_early(self):
        """Semantic endpoint fires at candidate_silence, well before the
        600 ms VAD stop."""
        st = FakeSmartTurn(complete=True)
        probs = [0.0] * 2 + [0.9] * 10 + [0.0] * 10
        p, events = self._make(probs, smart_turn=st,
                               min_silence_ms=10_000,  # VAD alone never stops
                               candidate_silence_ms=96)
        p.feed_audio(frames(22, 0.1))
        kinds = [k for k, _ in events]
        assert st.calls == 1
        assert "endpoint_candidate" in kinds
        assert "speech_stopped" in kinds     # early, smart-turn driven
        assert "transcription" in kinds
        p.shutdown()

    def test_smart_turn_incomplete_keeps_listening(self):
        st = FakeSmartTurn(complete=False)
        probs = [0.0] * 2 + [0.9] * 10 + [0.0] * 10
        p, events = self._make(probs, smart_turn=st,
                               min_silence_ms=10_000,
                               candidate_silence_ms=96)
        p.feed_audio(frames(22, 0.1))
        kinds = [k for k, _ in events]
        assert st.calls == 1
        assert "speech_stopped" not in kinds
        p.shutdown()

    def test_short_noise_ignored(self):
        probs = [0.0] * 40
        p, events = self._make(probs)
        p.feed_audio(frames(40))
        assert events == []
        p.shutdown()

    def test_llm_echo_fallback(self):
        eng = LocalLLMResponseEngine(None)
        assert eng.generate("hi", []) == "You said: hi"


class TestEchoBargeIn:
    def _scripted_clock(self):
        t = {"now": 100.0}

        def clock():
            return t["now"]

        return t, clock

    def test_echo_suppressed_not_barge_in(self):
        """Mic input that correlates with our own just-played TTS output is
        rejected as echo, not treated as barge-in."""
        t, clock = self._scripted_clock()
        # turn 1 then "speech" again right after playback
        probs = [0.0] * 2 + [0.9] * 10 + [0.0] * 12 + [0.9] * 4 + [0.0] * 10
        p, events = self._make_with_clock(probs, clock)
        # feed turn 1 (produces TTS into the output queue)
        p.feed_audio(frames(24, 0.1))
        # playback happens now: pull the chunk, stamping output history
        chunk = p.fetch_speech(timeout=1.0)
        assert chunk is not None
        # echo arrives delayed by ~100 ms: make the mic input BE the output
        echo = chunk[: 512 * 10].astype(np.float32)
        t["now"] += 0.100
        p._preroll = echo[:-512]  # recent mic context = the echo itself
        p.feed_audio(echo[-512 * 4:])
        kinds = [k for k, _ in events]
        assert "echo_suppressed" in kinds
        assert "barge_in" not in kinds
        p.shutdown()

    def test_uncorrelated_speech_barges_in(self):
        t, clock = self._scripted_clock()
        probs = [0.0] * 2 + [0.9] * 10 + [0.0] * 12 + [0.9] * 6 + [0.0] * 10
        p, events = self._make_with_clock(probs, clock)
        p.feed_audio(frames(24, 0.1))
        chunk = p.fetch_speech(timeout=1.0)
        assert chunk is not None
        t["now"] += 0.100
        rng = np.random.RandomState(0)
        p._preroll = rng.randn(512 * 6).astype(np.float32)
        p.feed_audio(rng.randn(512 * 4).astype(np.float32))
        kinds = [k for k, _ in events]
        assert "barge_in" in kinds
        assert "echo_suppressed" not in kinds
        p.shutdown()

    def _make_with_clock(self, probs, clock):
        events = []
        p = VoicePipeline(
            vad_model=ScriptedVad(probs),
            stt_model=FakeSTT(),
            tts_model=FakeTTS(),
            on_event=lambda kind, data: events.append((kind, data)),
            vad_config=VadConfig(min_silence_ms=300,
                                 ignore_playback_echo_ms=500,
                                 echo_correlation_threshold=0.55),
            clock=clock,
        )
        return p, events


class TestAudioOutputStream:
    def test_playback_state_and_history(self):
        t = {"now": 10.0}
        s = AudioOutputStream(16000, clock=lambda: t["now"])
        assert not s.playback_state()["player_playing"]
        s.queue_audio(np.ones(1600, np.float32))
        assert s.playback_state()["player_playing"]
        chunk = s.fetch_chunk()
        assert chunk is not None and chunk.size == 1600
        # within the chunk's play window -> still considered playing
        st = s.playback_state()
        assert st["last_output_age_ms"] < 0  # chunk still "sounding"

    def test_echo_correlation_detects_own_output(self):
        t = {"now": 10.0}
        s = AudioOutputStream(16000, clock=lambda: t["now"])
        rng = np.random.RandomState(0)
        sig = np.cumsum(rng.randn(4800)).astype(np.float32)  # aperiodic
        sig /= np.abs(sig).max()
        s.queue_audio(sig)
        s.fetch_chunk()  # played at t=10.0 s
        # mic hears output[0..200ms] with a 100 ms echo path: those mic
        # samples END at 10.0 + 0.1 + 0.2 = 10.3 s wall clock
        res = s.echo_correlation(
            sig[:3200], input_sample_rate=16000,
            input_end_ms=10300.0,
            min_delay_ms=0.0, max_delay_ms=300.0, step_ms=25.0)
        assert res["correlation"] > 0.8
        assert res["delay_ms"] == pytest.approx(100.0, abs=25.0)

    def test_echo_correlation_rejects_noise(self):
        t = {"now": 10.0}
        s = AudioOutputStream(16000, clock=lambda: t["now"])
        s.queue_audio(np.sin(2 * np.pi * 220 * np.arange(4800) / 16000)
                      .astype(np.float32))
        s.fetch_chunk()
        t["now"] += 0.15
        noise = np.random.RandomState(1).randn(3200).astype(np.float32)
        res = s.echo_correlation(
            noise, input_sample_rate=16000,
            input_end_ms=t["now"] * 1000.0,
            min_delay_ms=0.0, max_delay_ms=300.0, step_ms=25.0)
        assert res["correlation"] < 0.5
