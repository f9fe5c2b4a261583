"""Scripted voice-assistant round trip through sts.voice_pipeline.

Headless equivalent of `python -m mlx_audio.sts.voice_pipeline` (reference
voice_pipeline.py CLI): feed a WAV as the "microphone", run
VAD -> STT -> LLM -> TTS, and write the assistant's spoken reply.
A real deployment swaps feed_audio/fetch_speech for live audio I/O.
"""

import argparse

import numpy as np

from mlx_audio_tpu import audio_io
from mlx_audio_tpu.sts.voice_pipeline import VoicePipeline


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="16 kHz mono WAV of the user's utterance")
    p.add_argument("--vad-model", required=True, help="silero_vad dir")
    p.add_argument("--stt-model", required=True, help="STT model dir")
    p.add_argument("--tts-model", required=True, help="TTS model dir")
    p.add_argument("--smart-turn-model", default=None,
                   help="optional smart_turn dir for semantic endpointing")
    p.add_argument("--voice", default=None)
    p.add_argument("--output", default="reply.wav")
    args = p.parse_args()

    from mlx_audio_tpu.stt.utils import load_model as load_stt
    from mlx_audio_tpu.tts.utils import load_model as load_tts
    from mlx_audio_tpu.vad.utils import load_model as load_vad

    events = []
    pipeline = VoicePipeline(
        vad_model=load_vad(args.vad_model),
        stt_model=load_stt(args.stt_model),
        tts_model=load_tts(args.tts_model),
        tts_voice=args.voice,
        smart_turn_model=(load_vad(args.smart_turn_model)
                          if args.smart_turn_model else None),
        on_event=lambda kind, data: events.append((kind, data)),
    )

    audio, sr = audio_io.read(args.input, dtype="float32")
    if sr != 16000:
        from mlx_audio_tpu.utils import resample_audio

        audio = resample_audio(audio, sr, 16000)
    # stream the file in 30 ms frames like a microphone, then silence so
    # the VAD closes the turn
    frame = 480
    stream = np.concatenate([np.asarray(audio, np.float32),
                             np.zeros(16000, np.float32)])
    for i in range(0, len(stream), frame):
        pipeline.feed_audio(stream[i: i + frame])

    chunks = []
    while True:
        speech = pipeline.fetch_speech(timeout=5.0)
        if speech is None:
            break
        chunks.append(speech)
    for kind, data in events:
        if kind in ("transcription", "response"):
            print(f"{kind}: {data.get('text', '')}")
    if chunks:
        out = np.concatenate(chunks)
        out_sr = pipeline.audio_output.sample_rate
        audio_io.write(args.output, out, out_sr)
        print(f"wrote {args.output} ({len(out) / out_sr:.2f}s)")
    else:
        print("no speech produced (check VAD thresholds)")


if __name__ == "__main__":
    main()
