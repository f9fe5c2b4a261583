"""Live lockstep transcription with voxtral_realtime.

Equivalent of the reference's streaming_transcription.py: feed audio in
small chunks and print text deltas as the 12.5 Hz lockstep decoder emits
them. Here the "microphone" is a WAV file replayed in 80 ms chunks so the
demo runs headless.
"""

import argparse

import numpy as np

from mlx_audio_tpu.stt.utils import load_audio, load_model


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("audio", help="path to a WAV file to replay as a stream")
    p.add_argument("--model", required=True,
                   help="voxtral_realtime model dir")
    p.add_argument("--chunk-ms", type=int, default=80)
    args = p.parse_args()

    model = load_model(args.model)
    session = model.create_streaming_session()  # feed/step/close/done
    sr = session.input_sample_rate
    audio = np.asarray(load_audio(args.audio, sample_rate=sr), np.float32)

    chunk = int(sr * args.chunk_ms / 1000)
    for start in range(0, len(audio), chunk):
        session.feed(audio[start: start + chunk])
        for ev in session.step():
            if ev.kind == "delta":
                print(ev.text, end="", flush=True)
    session.close()
    while not session.done:
        for ev in session.step():
            if ev.kind == "delta":
                print(ev.text, end="", flush=True)
    print()


if __name__ == "__main__":
    main()
