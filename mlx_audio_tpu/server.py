"""OpenAI-compatible REST + WebSocket audio server (aiohttp).

Parity: /root/reference/mlx_audio/server.py (2116 LoC on FastAPI): endpoints
`POST /v1/audio/speech` :932, `/v1/audio/transcriptions` :994 (json/text/
verbose_json/srt/vtt), model management :876-929, `/v1/audio/voices` :960,
`WS /v1/audio/transcriptions/realtime` :1224, OpenAI-Realtime-compatible
`WS /v1/realtime` :1549 (server_vad turn detection, pre-roll flush,
session.update protocol), ModelProvider cache :92, execution adapters
:271-820. FastAPI is unavailable in this environment, so the HTTP layer is
aiohttp; the request/response schemas are unchanged.

All device work flows through the single-threaded InferenceBroker
(server_inference.py) exactly like the reference.
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import os
import queue
import time
import uuid
from typing import Any, Dict, List, Optional

import numpy as np

from . import audio_io
from .realtime_vad import (
    VAD_SAMPLE_RATE,
    ServerVadConfig,
    StreamingVad,
    TurnDetectionError,
    TurnEventKind,
    parse_turn_detection,
)
from .server_inference import (
    BaseModelExecutionAdapter,
    InferenceBroker,
    InferenceRequest,
)
from .voice_store import VoiceStore, VoiceStoreError

try:
    from aiohttp import WSMsgType, web
except ImportError as e:  # pragma: no cover
    raise ImportError("The server requires aiohttp (bundled in this env)") from e


# ---------------------------------------------------------------------------
# Model provider (reference server.py:92-242)
# ---------------------------------------------------------------------------


class ModelProvider:
    """Loads and caches models by (name, category).

    MLX_AUDIO_TPU_TENSOR_PARALLEL=N (or the server's --tensor-parallel
    flag) makes every load TP-shard over an N-way mesh axis — the
    scale-out path the single-device reference lacks (SURVEY §2.10)."""

    def __init__(self, tensor_parallel: Optional[int] = None):
        self._models: Dict[str, Any] = {}
        self._lock = asyncio.Lock()
        env_tp = os.environ.get("MLX_AUDIO_TPU_TENSOR_PARALLEL")
        self.tensor_parallel = tensor_parallel or (
            int(env_tp) if env_tp else None)

    def loaded(self) -> List[str]:
        return sorted(self._models)

    def get_cached(self, name: str):
        return self._models.get(name)

    async def load(self, name: str, category: Optional[str] = None):
        async with self._lock:
            if name in self._models:
                return self._models[name]
            from .utils import load_model

            kwargs: Dict[str, Any] = {}
            if category:
                kwargs["category"] = category
            if self.tensor_parallel and self.tensor_parallel > 1:
                kwargs["tensor_parallel"] = self.tensor_parallel
            model = await asyncio.to_thread(load_model, name, **kwargs)
            self._models[name] = model
            return model

    def unload(self, name: str) -> bool:
        return self._models.pop(name, None) is not None


# ---------------------------------------------------------------------------
# TTS execution adapter (reference server.py:423-754)
# ---------------------------------------------------------------------------


class TTSExecutionAdapter(BaseModelExecutionAdapter):
    """Runs model.generate on the broker thread, emitting encoded chunks.

    Capability sniffing via inspect.signature mirrors the reference
    (server.py:497-526): only kwargs the model's generate() accepts are
    forwarded.
    """

    max_batch_size = int(os.environ.get("MLX_AUDIO_TTS_MAX_BATCH_SIZE", "1"))

    def __init__(self, provider: ModelProvider):
        self.provider = provider

    # -- continuous batching routing (reference server.py:565-664) ----------

    def supports_continuous_batch(self, request) -> bool:
        model = self.provider.get_cached(request.model_name)
        checker = getattr(model, "supports_tts_continuous_batch", None)
        return bool(checker and checker())

    def continuous_batch_key(self, request) -> Any:
        return None

    def create_continuous_batch_session(self, request):
        from .tts.continuous import TTSBatchOptions

        model = self.provider.get_cached(request.model_name)
        kw = request.normalized_kwargs
        opts = TTSBatchOptions(
            max_batch_size=int(os.environ.get(
                "MLX_AUDIO_TTS_MAX_BATCH_SIZE", "4")),
            temperature=float(kw.get("temperature", 0.9)),
            top_k=int(kw.get("top_k", 50)),
            max_tokens=int(kw.get("max_tokens", 1200)),
            streaming_interval=float(kw.get("streaming_interval", 2.0)))
        sess = model.create_tts_batch_session(opts)
        # compile + allocate before the first real request joins (the
        # broker keeps the session alive across requests)
        warm = getattr(sess, "warmup", None)
        if callable(warm):
            try:
                warm()
            except Exception:  # warmup is best-effort; requests still run
                pass
        return sess

    def run_serial(self, request: InferenceRequest) -> None:
        import inspect

        model = self.provider.get_cached(request.model_name)
        if model is None:
            raise ValueError(f"Model not loaded: {request.model_name}")
        kwargs = dict(request.normalized_kwargs)
        text = request.payload
        sig = inspect.signature(model.generate).parameters
        has_var = any(p.kind == inspect.Parameter.VAR_KEYWORD
                      for p in sig.values())
        if not has_var:
            kwargs = {k: v for k, v in kwargs.items() if k in sig}
        for result in model.generate(text, **kwargs):
            if request.cancel_event.is_set():
                break
            audio = np.asarray(result.audio)
            if audio.size:
                request.emit_data({
                    "audio": audio,
                    "sample_rate": result.sample_rate,
                    "is_final": getattr(result, "is_final_chunk", False),
                })
        request.emit_done()


class STTExecutionAdapter(BaseModelExecutionAdapter):
    def __init__(self, provider: ModelProvider):
        self.provider = provider

    def run_serial(self, request: InferenceRequest) -> None:
        import inspect

        model = self.provider.get_cached(request.model_name)
        if model is None:
            raise ValueError(f"Model not loaded: {request.model_name}")
        kwargs = dict(request.normalized_kwargs)
        stream = bool(kwargs.pop("stream", False))
        sig = inspect.signature(model.generate).parameters
        has_var = any(p.kind == inspect.Parameter.VAR_KEYWORD
                      for p in sig.values())
        if not has_var:
            kwargs = {k: v for k, v in kwargs.items() if k in sig}
        if stream and "stream" in sig:
            # chunked transcription (reference server.py:1060-1092 consumes
            # the model's streamed deltas)
            for chunk in model.generate(request.payload, stream=True,
                                        **kwargs):
                if request.cancel_event.is_set():
                    break
                request.emit_data(chunk)
            request.emit_done()
            return
        output = model.generate(request.payload, **kwargs)
        request.emit_data(output)
        request.emit_done()


class SeparationExecutionAdapter(BaseModelExecutionAdapter):
    """Source separation on the broker thread (reference server.py:756-821).

    The reference adapter is sam_audio-specific; here any STS model exposing
    `separate(audio)` works (mel_band_roformer today). target = the model's
    separated stem; residual = input - target."""

    def __init__(self, provider: ModelProvider):
        self.provider = provider

    def run_serial(self, request: InferenceRequest) -> None:
        import base64

        model = self.provider.get_cached(request.model_name)
        if model is None:
            raise ValueError(f"Model not loaded: {request.model_name}")
        if not hasattr(model, "separate"):
            raise ValueError(
                f"Model {request.model_name} has no separate() API")
        if getattr(getattr(model, "config", None), "model_type", "") \
                == "sam_audio":
            self._run_sam_audio(request, model)
            return
        audio, sr = request.payload
        target_sr = getattr(getattr(model, "config", None), "sample_rate",
                            sr)
        x = np.asarray(audio, np.float32)
        if x.ndim == 1:
            x = np.stack([x, x])
        elif x.shape[0] != 2 and x.shape[-1] == 2:
            x = x.T
        if sr != target_sr:
            from .utils import resample_audio
            x = np.stack([np.asarray(resample_audio(ch, sr, target_sr))
                          for ch in x])
        result = model.separate(x)
        target = np.asarray(result.vocals, np.float32)
        residual = x[:, : target.shape[1]] - target

        def b64(a):
            return base64.b64encode(
                _encode_wav(a.T, result.sample_rate)).decode()

        request.emit_data({"target": b64(target), "residual": b64(residual),
                           "sample_rate": result.sample_rate})
        request.emit_done()

    def _run_sam_audio(self, request: InferenceRequest, model) -> None:
        """Text-guided separation via sam_audio.separate_long
        (reference server.py:788-795)."""
        import base64

        audio, sr = request.payload
        kw = request.normalized_kwargs
        x = np.asarray(audio, np.float32)
        if x.ndim > 1:
            x = x.mean(axis=0)
        target_sr = model.sample_rate
        if sr != target_sr:
            from .utils import resample_audio

            x = np.asarray(resample_audio(x, sr, target_sr))
        steps = max(int(kw.get("steps", 16)), 1)
        res = model.separate_long(
            x[None, None], [kw.get("description", "speech")],
            ode_opt={"step_size": 1.0 / steps,
                     "method": kw.get("method", "midpoint")})

        def b64(a):
            return base64.b64encode(
                _encode_wav(np.asarray(a, np.float32).reshape(-1),
                            target_sr)).decode()

        request.emit_data({"target": b64(res.target[0]),
                           "residual": b64(res.residual[0]),
                           "sample_rate": target_sr})
        request.emit_done()


# ---------------------------------------------------------------------------
# Server app
# ---------------------------------------------------------------------------


def _encode_wav(audio: np.ndarray, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    audio_io.write(buf, audio, sample_rate, format="wav")
    return buf.getvalue()


async def _drain_handle(handle, timeout: float = 600.0):
    """Async-iterate broker result chunks (reference :834-871 poll loop)."""
    loop = asyncio.get_event_loop()
    deadline = time.time() + timeout
    while True:
        try:
            chunk = await asyncio.to_thread(handle.result_queue.get, True, 1.0)
        except queue.Empty:
            if time.time() > deadline:
                handle.cancel()
                raise TimeoutError("inference timed out")
            continue
        if chunk.kind == "error":
            raise chunk.error
        if chunk.kind == "done":
            return
        yield chunk.payload


class AudioServer:
    def __init__(self, tensor_parallel: Optional[int] = None):
        self.provider = ModelProvider(tensor_parallel=tensor_parallel)
        self.broker = InferenceBroker()
        self.broker.register_adapter("tts", TTSExecutionAdapter(self.provider))
        self.broker.register_adapter("stt", STTExecutionAdapter(self.provider))
        self.broker.register_adapter(
            "separation", SeparationExecutionAdapter(self.provider))
        self.voices = VoiceStore()
        self.app = web.Application(
            client_max_size=512 * 1024 * 1024,
            middlewares=[_cors_middleware])
        self._routes()

    def _routes(self):
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/v1/models", self.list_models)
        r.add_post("/v1/models", self.load_model_ep)
        r.add_delete("/v1/models", self.unload_model_body_ep)
        r.add_delete("/v1/models/{model_id:.*}", self.unload_model_ep)
        r.add_get("/v1/audio/voices", self.list_voices)
        r.add_post("/v1/audio/voices", self.save_voice)
        r.add_get("/v1/audio/voices/{name}", self.get_voice)
        r.add_delete("/v1/audio/voices/{name}", self.delete_voice)
        r.add_post("/v1/audio/speech", self.tts_speech)
        r.add_post("/v1/audio/transcriptions", self.stt_transcribe)
        r.add_post("/v1/audio/separations", self.separations)
        r.add_get("/v1/audio/transcriptions/realtime", self.ws_transcriptions)
        r.add_get("/v1/realtime", self.ws_realtime)
        # Studio UI (reference server.py:1946-1981 spawns `npm run dev`;
        # here the buildless SPA in ui/static is served in-process)
        r.add_get("/", self.ui_index)
        r.add_get("/ui/{path:.*}", self.ui_static)

    # -- studio UI -----------------------------------------------------------

    async def ui_index(self, request):
        from .ui import ui_static_dir

        return web.FileResponse(ui_static_dir() / "index.html")

    async def ui_static(self, request):
        from .ui import ui_static_dir

        base = ui_static_dir().resolve()
        target = (base / request.match_info["path"]).resolve()
        if not str(target).startswith(str(base)) or not target.is_file():
            return web.json_response({"error": "not found"}, status=404)
        return web.FileResponse(target)

    # -- basic -------------------------------------------------------------

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def list_models(self, request):
        return web.json_response({
            "object": "list",
            "data": [{"id": m, "object": "model"} for m in
                     self.provider.loaded()],
        })

    async def load_model_ep(self, request):
        body = await request.json()
        name = body.get("model")
        if not name:
            return web.json_response({"error": "missing 'model'"}, status=400)
        try:
            await self.provider.load(name)
        except Exception as e:
            return web.json_response({"error": str(e)}, status=404)
        return web.json_response({"id": name, "object": "model"})

    async def unload_model_ep(self, request):
        name = request.match_info["model_id"]
        if not self.provider.unload(name):
            return web.json_response({"error": f"model not loaded: {name}"},
                                     status=404)
        return web.json_response({"deleted": True, "id": name})

    async def unload_model_body_ep(self, request):
        """DELETE /v1/models with {'model': name} body or ?model= query
        (reference server.py:910)."""
        name = request.query.get("model")
        if not name:
            try:
                body = await request.json()
                name = body.get("model")
            except Exception:
                name = None
        if not name:
            return web.json_response({"error": "missing 'model'"},
                                     status=400)
        if not self.provider.unload(name):
            return web.json_response({"error": f"model not loaded: {name}"},
                                     status=404)
        return web.json_response({"deleted": True, "id": name})

    async def list_voices(self, request):
        """Aggregate voices of loaded TTS models (reference :960-993)."""
        voices = {}
        for name in self.provider.loaded():
            model = self.provider.get_cached(name)
            model_voices = []
            path = getattr(getattr(model, "config", None), "model_path", "")
            vdir = os.path.join(str(path), "voices") if path else ""
            if vdir and os.path.isdir(vdir):
                model_voices = sorted(
                    os.path.splitext(f)[0] for f in os.listdir(vdir)
                    if f.endswith((".safetensors", ".npy")))
            if hasattr(model, "get_supported_speakers"):
                model_voices += model.get_supported_speakers()
            voices[name] = model_voices
        return web.json_response({"voices": voices,
                                  "custom": self.voices.list()})

    async def save_voice(self, request):
        """POST /v1/audio/voices — save a named reference voice.

        Body: {"name": str, "audio": base64 wav/encoded bytes,
        "ref_text": optional transcript}. The stored voice is then usable
        in any speech request as ref_audio="voice:<name>". Goes beyond the
        reference Studio's static library (ui/components/voice-library.tsx
        hardcodes its list client-side).
        """
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"},
                                     status=400)
        name, audio_b64 = body.get("name"), body.get("audio")
        if not name or not audio_b64:
            return web.json_response(
                {"error": "'name' and 'audio' (base64) are required"},
                status=400)
        try:
            raw = base64.b64decode(audio_b64, validate=True)
            wav, sr = audio_io.read(io.BytesIO(raw), dtype="float32")
        except Exception:
            return web.json_response(
                {"error": "audio is not valid base64-encoded audio"},
                status=400)
        try:
            meta = self.voices.save(name, wav, sr,
                                    ref_text=body.get("ref_text"))
        except VoiceStoreError as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response(meta, status=201)

    async def get_voice(self, request):
        """GET /v1/audio/voices/{name} — replay a stored voice (WAV)."""
        name = request.match_info["name"]
        try:
            path = self.voices.wav_path(name)
        except VoiceStoreError as e:
            return web.json_response({"error": str(e)}, status=400)
        if not path.is_file():
            return web.json_response(
                {"error": f"no saved voice named {name!r}"}, status=404)
        return web.FileResponse(path,
                                headers={"Content-Type": "audio/wav"})

    async def delete_voice(self, request):
        name = request.match_info["name"]
        try:
            found = self.voices.delete(name)
        except VoiceStoreError as e:
            return web.json_response({"error": str(e)}, status=400)
        if not found:
            return web.json_response(
                {"error": f"no saved voice named {name!r}"}, status=404)
        return web.json_response({"deleted": name})

    # -- TTS ----------------------------------------------------------------

    async def tts_speech(self, request):
        """POST /v1/audio/speech (reference :932-959)."""
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"},
                                     status=400)
        text = body.get("input")
        model_name = body.get("model")
        if not text or not model_name:
            return web.json_response(
                {"error": "'model' and 'input' are required"}, status=400)
        response_format = body.get("response_format", "wav")
        if response_format not in ("wav", "pcm"):
            return web.json_response(
                {"error": f"unsupported response_format: {response_format} "
                          "(this build encodes wav/pcm natively; compressed "
                          "formats require ffmpeg)"}, status=400)
        stream = bool(body.get("stream", False))
        kwargs = {}
        # full reference SpeechRequest field set (server.py:167-186); the
        # broker adapter signature-filters per model
        for k in ("voice", "speed", "lang_code", "language", "temperature",
                  "top_p", "top_k", "repetition_penalty", "max_tokens",
                  "seed", "instruct", "gender", "pitch", "ref_text",
                  "streaming_interval"):
            if body.get(k) is not None:
                kwargs[k] = body[k]
        if stream:
            kwargs["stream"] = True

        # preflight load so failures become clean HTTP errors (reference :243)
        try:
            await self.provider.load(model_name, category="tts")
        except Exception as e:
            return web.json_response({"error": str(e)}, status=404)

        # ref_audio: "voice:<name>" from the voice library, a server-local
        # path (reference server.py:600-611), or base64-encoded audio bytes
        # -> waveform at the model's sample rate
        ref_audio = body.get("ref_audio")
        if ref_audio:
            model = self.provider.get_cached(model_name)
            target_sr = getattr(model, "sample_rate", 24000)
            voice_name = self.voices.resolve_ref(ref_audio)
            if voice_name is not None:
                try:
                    kwargs["ref_audio"] = self.voices.load(
                        voice_name, sample_rate=target_sr)
                    stored_text = self.voices.meta(voice_name).get(
                        "ref_text")
                    if stored_text and "ref_text" not in kwargs:
                        kwargs["ref_text"] = stored_text
                except VoiceStoreError as e:
                    return web.json_response({"error": str(e)}, status=404)
                ref_audio = None
        if ref_audio:
            try:
                if os.path.exists(ref_audio):
                    from .utils import load_audio

                    wav = np.asarray(load_audio(ref_audio,
                                                sample_rate=target_sr))
                else:
                    raw = base64.b64decode(ref_audio, validate=True)
                    wav, sr = audio_io.read(io.BytesIO(raw),
                                            dtype="float32")
                    if wav.ndim > 1:
                        wav = wav.mean(axis=1)
                    if sr != target_sr:
                        from .utils import resample_audio

                        wav = np.asarray(
                            resample_audio(wav, sr, target_sr))
                kwargs["ref_audio"] = wav
            except Exception:
                return web.json_response(
                    {"error": f"reference audio not found or undecodable: "
                              f"{str(ref_audio)[:80]}"}, status=404)

        handle = self.broker.submit(endpoint_kind="tts",
                                    model_name=model_name, payload=text,
                                    normalized_kwargs=kwargs, stream=stream)
        if stream:
            # peek the first payload so the sample rate can ride a header
            # (progressive PCM playback in a client needs it before audio)
            gen = _drain_handle(handle)
            first = None
            try:
                first = await gen.__anext__()
            except StopAsyncIteration:
                return web.json_response({"error": "no audio generated"},
                                         status=500)
            except Exception as e:
                return web.json_response({"error": str(e)}, status=500)
            resp = web.StreamResponse(headers={
                "Content-Type": "audio/wav" if response_format == "wav"
                else "application/octet-stream",
                "Transfer-Encoding": "chunked",
                "X-Sample-Rate": str(first.get("sample_rate", 24000))})
            await resp.prepare(request)

            async def _emit(payload):
                audio = payload["audio"]
                if response_format == "pcm":
                    pcm = np.clip(np.round(audio * 32768.0), -32768,
                                  32767).astype("<i2").tobytes()
                    await resp.write(pcm)
                else:
                    await resp.write(
                        _encode_wav(audio, payload["sample_rate"]))

            try:
                await _emit(first)
                async for payload in gen:
                    await _emit(payload)
            except Exception as e:
                await resp.write(json.dumps({"error": str(e)}).encode())
            await resp.write_eof()
            return resp

        chunks, rate = [], 24000
        try:
            async for payload in _drain_handle(handle):
                chunks.append(payload["audio"])
                rate = payload["sample_rate"]
        except Exception as e:
            return web.json_response({"error": str(e)}, status=500)
        if not chunks:
            return web.json_response({"error": "no audio generated"},
                                     status=500)
        audio = np.concatenate(chunks)
        if response_format == "pcm":
            body_bytes = np.clip(np.round(audio * 32768.0), -32768,
                                 32767).astype("<i2").tobytes()
            ct = "application/octet-stream"
        else:
            body_bytes = _encode_wav(audio, rate)
            ct = "audio/wav"
        return web.Response(body=body_bytes, content_type=ct)

    # -- STT ----------------------------------------------------------------

    async def stt_transcribe(self, request):
        """POST /v1/audio/transcriptions (reference :994-1108)."""
        reader = await request.multipart() if request.content_type.startswith(
            "multipart/") else None
        fields: Dict[str, Any] = {}
        audio_bytes = None
        if reader is not None:
            async for part in reader:
                if part.name == "file":
                    audio_bytes = await part.read(decode=False)
                else:
                    fields[part.name] = (await part.read(decode=False)).decode()
        else:
            body = await request.json()
            fields = dict(body)
            if "file" in fields:
                audio_bytes = base64.b64decode(fields.pop("file"))
        if audio_bytes is None:
            return web.json_response({"error": "missing audio 'file'"},
                                     status=400)
        model_name = fields.get("model")
        if not model_name:
            return web.json_response({"error": "missing 'model'"}, status=400)
        response_format = fields.get("response_format", "json")

        try:
            await self.provider.load(model_name, category="stt")
        except Exception as e:
            return web.json_response({"error": str(e)}, status=404)

        audio, sr = audio_io.read(io.BytesIO(audio_bytes), dtype="float32")
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        if sr != 16000:
            from .utils import resample_audio

            audio = resample_audio(audio, sr, 16000)
        # full reference TranscriptionRequest field set (server.py:189-201);
        # the adapter signature-filters, so model-specific knobs are safe
        def _truthy(v):
            return str(v).lower() in ("1", "true", "yes", "on")

        kwargs = {}
        for k, cast in (("language", str), ("temperature", float),
                        ("max_tokens", int), ("chunk_duration", float),
                        ("frame_threshold", int), ("context", str),
                        ("prefill_step_size", int), ("text", str),
                        ("prompt", str), ("initial_prompt", str),
                        ("word_timestamps", _truthy),
                        ("timestamp_granularities", str)):
            v = fields.get(k)
            if v not in (None, ""):
                try:
                    kwargs[k] = cast(v)
                except (TypeError, ValueError):
                    pass
        stream_flag = _truthy(fields.get("stream", False))
        if stream_flag:
            kwargs["stream"] = True

        handle = self.broker.submit(endpoint_kind="stt",
                                    model_name=model_name, payload=audio,
                                    normalized_kwargs=kwargs,
                                    stream=stream_flag)

        if response_format == "ndjson":
            # native streaming transport (reference server.py:1014-1018):
            # one JSON object per line as the model emits them
            resp = web.StreamResponse(headers={
                "Content-Type": "application/x-ndjson",
                "Transfer-Encoding": "chunked"})
            await resp.prepare(request)
            try:
                async for payload in _drain_handle(handle):
                    line = {"text": payload.text}
                    if getattr(payload, "segments", None):
                        line["segments"] = payload.segments
                    if getattr(payload, "language", None):
                        line["language"] = payload.language
                    await resp.write(
                        (json.dumps(line) + "\n").encode())
            except Exception as e:
                await resp.write(
                    (json.dumps({"error": str(e)}) + "\n").encode())
            await resp.write_eof()
            return resp

        output = None
        try:
            async for payload in _drain_handle(handle):
                if output is None:
                    output = payload
                else:  # streamed chunks: accumulate text + segments
                    output.text = (output.text or "") + (payload.text or "")
                    if getattr(payload, "segments", None):
                        segs = list(output.segments or [])
                        segs.extend(payload.segments)
                        output.segments = segs
        except Exception as e:
            return web.json_response({"error": str(e)}, status=500)

        if response_format == "text":
            return web.Response(text=output.text.strip(),
                                content_type="text/plain")
        if response_format in ("srt", "vtt"):
            from .stt.generate import save_as_srt, save_as_vtt
            import tempfile
            from pathlib import Path

            with tempfile.TemporaryDirectory() as td:
                p = Path(td) / f"t.{response_format}"
                (save_as_srt if response_format == "srt" else save_as_vtt)(
                    output, p)
                return web.Response(text=p.read_text(),
                                    content_type="text/plain")
        if response_format == "verbose_json":
            return web.json_response({
                "task": "transcribe",
                "language": output.language,
                "text": output.text,
                "segments": output.segments,
            })
        return web.json_response({"text": output.text})

    async def separations(self, request):
        """POST /v1/audio/separations (reference server.py:1109-1146):
        multipart {file, model, description, method, steps} -> JSON with
        base64 target/residual WAVs + sample_rate."""
        form = await request.post()
        upload = form.get("file")
        if upload is None:
            return web.json_response({"error": "missing file"}, status=400)
        model_name = form.get("model", os.environ.get(
            "MLX_AUDIO_SEPARATION_MODEL", ""))
        if not model_name:
            return web.json_response({"error": "no model specified"},
                                     status=400)
        try:
            await self.provider.load(model_name, category="sts")
        except Exception as e:
            return web.json_response({"error": str(e)}, status=404)
        data = upload.file.read()
        audio, sr = audio_io.read(io.BytesIO(data))
        if audio.ndim > 1:
            audio = audio.T          # (channels, samples)
        handle = self.broker.submit(
            endpoint_kind="separation", model_name=model_name,
            payload=(audio, sr),
            normalized_kwargs={
                "description": form.get("description", "speech"),
                "method": form.get("method", "midpoint"),
                "steps": int(form.get("steps", 16)),
            })
        async for payload in _drain_handle(handle):
            return web.json_response(payload)
        return web.json_response({"error": "no result"}, status=500)

    # -- WS: realtime transcription (reference :1224-1460) ------------------

    async def ws_transcriptions(self, request):
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        model_name = request.query.get(
            "model", os.environ.get("MLX_AUDIO_REALTIME_MODEL", ""))
        if not model_name:
            await ws.send_json({"type": "error",
                                "error": "no model specified"})
            await ws.close()
            return ws
        try:
            model = await self.provider.load(model_name, category="stt")
        except Exception as e:
            await ws.send_json({"type": "error", "error": str(e)})
            await ws.close()
            return ws

        buffer = np.zeros(0, np.float32)
        async for msg in ws:
            if msg.type == WSMsgType.BINARY:
                pcm = np.frombuffer(msg.data, dtype="<i2").astype(
                    np.float32) / 32768.0
                buffer = np.concatenate([buffer, pcm])
            elif msg.type == WSMsgType.TEXT:
                data = json.loads(msg.data)
                if data.get("type") == "commit" and len(buffer) > 1600:
                    audio = buffer
                    buffer = np.zeros(0, np.float32)
                    out = await asyncio.to_thread(model.generate, audio)
                    await ws.send_json({"type": "transcription",
                                        "text": out.text.strip()})
                elif data.get("type") == "close":
                    break
        await ws.close()
        return ws

    # -- WS: OpenAI realtime (reference :1549-1936) --------------------------

    async def ws_realtime(self, request):
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        session_id = f"sess_{uuid.uuid4().hex[:16]}"
        model_name = request.query.get(
            "model", os.environ.get("MLX_AUDIO_REALTIME_MODEL", ""))
        model = None
        if model_name:
            try:
                model = await self.provider.load(model_name, category="stt")
            except Exception as e:
                await ws.send_json({"type": "error", "error": {
                    "message": str(e)}})
                await ws.close()
                return ws

        vad_config: Optional[ServerVadConfig] = ServerVadConfig()
        svad: Optional[StreamingVad] = None
        vad_model_name = os.environ.get("MLX_AUDIO_VAD_MODEL", "")
        if vad_model_name:
            try:
                vad_model = await self.provider.load(vad_model_name,
                                                     category="vad")
                svad = StreamingVad(vad_model, vad_config)
            except Exception:
                svad = None

        audio_buf = np.zeros(0, np.float32)
        preroll = np.zeros(0, np.float32)
        feeding = svad is None  # no VAD -> manual commit mode
        item_id = 0
        # prefer true streaming sessions when the model supports the
        # feed/step/close protocol (reference server.py:1611); forward
        # transcription_delay_ms only to sessions that declare it
        # (reference :1458-1480, MLX_AUDIO_REALTIME_TRANSCRIPTION_DELAY_MS)
        make_session = getattr(model, "create_streaming_session", None)
        session = None
        if callable(make_session):
            delay_raw = os.getenv("MLX_AUDIO_REALTIME_TRANSCRIPTION_DELAY_MS")
            session_kwargs = {}
            if delay_raw:
                import inspect

                try:
                    sig = inspect.signature(make_session).parameters
                    if "transcription_delay_ms" in sig or any(
                            p.kind == inspect.Parameter.VAR_KEYWORD
                            for p in sig.values()):
                        session_kwargs["transcription_delay_ms"] = \
                            int(delay_raw)
                except (TypeError, ValueError):
                    pass
            session = make_session(**session_kwargs)

        await ws.send_json({
            "type": "session.created",
            "session": {"id": session_id, "model": model_name,
                        "turn_detection": vad_config.to_dict()
                        if vad_config else None},
        })

        async def drain_session_deltas():
            nonlocal session
            if session is None:
                return
            events = await asyncio.to_thread(session.step)
            for ev in events:
                if ev.kind == "delta":
                    await ws.send_json({
                        "type": "conversation.item."
                                "input_audio_transcription.delta",
                        "delta": ev.text,
                    })

        async def finalize_turn():
            nonlocal audio_buf, item_id, session
            item_id += 1
            # OpenAI Realtime protocol: commit acknowledgement + item
            # creation precede the transcription events (reference
            # server.py:1678,1804)
            await ws.send_json({
                "type": "input_audio_buffer.committed",
                "item_id": f"item_{item_id}",
            })
            await ws.send_json({
                "type": "conversation.item.added",
                "item": {"id": f"item_{item_id}", "type": "message",
                         "role": "user"},
            })
            if session is not None:
                session.close()
                final_text = session.text
                while not session.done:
                    events = await asyncio.to_thread(session.step)
                    for ev in events:
                        if ev.kind == "final":
                            final_text = ev.text
                await ws.send_json({
                    "type": "conversation.item."
                            "input_audio_transcription.completed",
                    "item_id": f"item_{item_id}",
                    "transcript": final_text.strip(),
                })
                session = make_session() if callable(make_session) else None
                audio_buf = np.zeros(0, np.float32)
                return
            if model is None or len(audio_buf) < 1600:
                audio_buf = np.zeros(0, np.float32)
                return
            audio = audio_buf
            audio_buf = np.zeros(0, np.float32)
            out = await asyncio.to_thread(model.generate, audio)
            await ws.send_json({
                "type":
                    "conversation.item.input_audio_transcription.completed",
                "item_id": f"item_{item_id}",
                "transcript": out.text.strip(),
            })

        async for msg in ws:
            if msg.type != WSMsgType.TEXT:
                continue
            try:
                event = json.loads(msg.data)
            except json.JSONDecodeError:
                await ws.send_json({"type": "error", "error": {
                    "message": "invalid JSON"}})
                continue
            etype = event.get("type")
            if etype == "session.update":
                td = event.get("session", {}).get("turn_detection", "missing")
                if td != "missing":
                    try:
                        vad_config = parse_turn_detection(td)
                    except TurnDetectionError as e:
                        await ws.send_json({"type": "error", "error": {
                            "message": str(e)}})
                        continue
                    if vad_config is None:
                        svad, feeding = None, True
                    elif svad is not None:
                        svad = StreamingVad(svad._vad, vad_config)
                await ws.send_json({"type": "session.updated",
                                    "session": {"id": session_id}})
            elif etype == "input_audio_buffer.append":
                pcm = np.frombuffer(
                    base64.b64decode(event.get("audio", "")),
                    dtype="<i2").astype(np.float32) / 32768.0
                if svad is not None:
                    events = await asyncio.to_thread(svad.process, pcm)
                    for ev in events:
                        if ev.kind == TurnEventKind.SPEECH_STARTED:
                            feeding = True
                            if session is not None and len(preroll):
                                session.feed(preroll)
                            else:
                                audio_buf = np.concatenate([audio_buf,
                                                            preroll])
                            preroll = np.zeros(0, np.float32)
                            await ws.send_json({
                                "type": "input_audio_buffer.speech_started",
                                "audio_start_ms": ev.audio_ms})
                        elif ev.kind == TurnEventKind.SPEECH_STOPPED:
                            await ws.send_json({
                                "type": "input_audio_buffer.speech_stopped",
                                "audio_end_ms": ev.audio_ms})
                            await finalize_turn()
                            feeding = False
                    if feeding:
                        if session is not None:
                            session.feed(pcm)
                            await drain_session_deltas()
                        else:
                            audio_buf = np.concatenate([audio_buf, pcm])
                    else:
                        # keep pre-roll so speech onsets aren't clipped
                        keep = int(VAD_SAMPLE_RATE * 0.5)
                        preroll = np.concatenate([preroll, pcm])[-keep:]
                else:
                    if session is not None:
                        session.feed(pcm)
                        await drain_session_deltas()
                    else:
                        audio_buf = np.concatenate([audio_buf, pcm])
            elif etype == "input_audio_buffer.commit":
                await finalize_turn()
            elif etype == "input_audio_buffer.clear":
                audio_buf = np.zeros(0, np.float32)
                await ws.send_json({"type": "input_audio_buffer.cleared"})
            elif etype == "session.close":
                break
        await ws.close()
        return ws


@web.middleware
async def _cors_middleware(request, handler):
    """MLX_AUDIO_ALLOWED_ORIGINS CORS bridge (reference server.py:140)."""
    allowed = os.environ.get("MLX_AUDIO_ALLOWED_ORIGINS", "*")
    origin = request.headers.get("Origin")
    if request.method == "OPTIONS":
        resp = web.Response(status=204)
    else:
        resp = await handler(request)
    if origin and (allowed == "*"
                   or origin in [o.strip() for o in allowed.split(",")]):
        resp.headers["Access-Control-Allow-Origin"] = \
            origin if allowed != "*" else "*"
        resp.headers["Access-Control-Allow-Methods"] = \
            "GET, POST, DELETE, OPTIONS"
        resp.headers["Access-Control-Allow-Headers"] = \
            "Content-Type, Authorization"
    return resp


def create_app(tensor_parallel: Optional[int] = None) -> web.Application:
    return AudioServer(tensor_parallel=tensor_parallel).app


def main(argv=None):
    # CLI flags bridge to the same env vars the reference uses
    # (reference server.py:2015-2113)
    parser = argparse.ArgumentParser(description="mlx_audio_tpu server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--tensor-parallel", type=int, default=None,
                        help="TP-shard every loaded model over N devices")
    parser.add_argument("--allowed-origins", nargs="+", default=None,
                        help="CORS origins (MLX_AUDIO_ALLOWED_ORIGINS)")
    parser.add_argument("--realtime-model", type=str, default=None,
                        help="Default model for /v1/realtime "
                             "(MLX_AUDIO_REALTIME_MODEL)")
    parser.add_argument("--realtime-transcription-delay-ms", type=int,
                        default=None,
                        help="Streaming transcription delay override "
                             "(MLX_AUDIO_REALTIME_TRANSCRIPTION_DELAY_MS)")
    parser.add_argument("--vad-model", type=str, default=None,
                        help="VAD model for server turn detection "
                             "(MLX_AUDIO_VAD_MODEL)")
    parser.add_argument("--tts-max-batch-size", type=int, default=None,
                        help="Continuous-batch slot count "
                             "(MLX_AUDIO_TTS_MAX_BATCH_SIZE)")
    parser.add_argument("--realtime", action="store_true",
                        help="Accepted for reference compatibility; "
                             "/v1/realtime is always served")
    parser.add_argument("--start-ui", action="store_true",
                        help="Accepted for reference compatibility; the "
                             "studio UI is always served at /")
    args = parser.parse_args(argv)
    _bridge_cli_env(args)
    print(f"Studio UI available at http://{args.host}:{args.port}/")
    web.run_app(create_app(tensor_parallel=args.tensor_parallel),
                host=args.host, port=args.port)


def _bridge_cli_env(args) -> None:
    if args.allowed_origins:
        os.environ["MLX_AUDIO_ALLOWED_ORIGINS"] = ",".join(
            args.allowed_origins)
    if args.realtime_model:
        os.environ["MLX_AUDIO_REALTIME_MODEL"] = args.realtime_model
    if args.realtime_transcription_delay_ms is not None:
        os.environ["MLX_AUDIO_REALTIME_TRANSCRIPTION_DELAY_MS"] = str(
            args.realtime_transcription_delay_ms)
    if args.vad_model:
        os.environ["MLX_AUDIO_VAD_MODEL"] = args.vad_model
    if args.tts_max_batch_size is not None:
        os.environ["MLX_AUDIO_TTS_MAX_BATCH_SIZE"] = str(
            args.tts_max_batch_size)


if __name__ == "__main__":
    main()
