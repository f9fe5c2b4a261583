"""Synthesize speech with any TTS family and save a WAV.

Equivalent of the reference's minimal TTS snippets (README quickstart) on the
TPU stack. Prints per-segment RTF/token stats from GenerationResult.
"""

import argparse

from mlx_audio_tpu.tts.generate import generate_audio


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   help="local model dir (or HF repo id with network)")
    p.add_argument("--text", default="The quick brown fox jumps over "
                                     "the lazy dog.")
    p.add_argument("--voice", default=None)
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--output", default="output.wav")
    args = p.parse_args()

    from pathlib import Path

    out = Path(args.output)
    results = generate_audio(
        text=args.text, model_path=args.model, voice=args.voice,
        speed=args.speed, output_path=str(out.parent or "."),
        file_prefix=out.stem, audio_format=(out.suffix or ".wav")[1:],
        join_audio=True, verbose=True)
    for r in results:
        print(f"segment {r.segment_idx}: {r.audio_duration} audio, "
              f"RTF {r.real_time_factor:.3f}, "
              f"{r.token_count} tokens")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
