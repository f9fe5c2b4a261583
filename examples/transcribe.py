"""Transcribe an audio file with any STT family.

Equivalent of the reference's medasr_transcribe.py / qwen3_asr_transcription.py
demos, generalized over the registry: whisper, parakeet, cohere_asr,
qwen3_asr, canary, voxtral, ... all load through the same path.
"""

import argparse

from mlx_audio_tpu.stt.generate import generate_transcription


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("audio", help="path to the audio file")
    p.add_argument("--model", required=True,
                   help="local model dir (or HF repo id with network)")
    p.add_argument("--format", default="txt",
                   choices=["txt", "srt", "vtt", "json"])
    p.add_argument("--output", default=None,
                   help="write the transcript here (stdout otherwise)")
    p.add_argument("--language", default=None)
    args = p.parse_args()

    kwargs = {}
    if args.language:
        kwargs["language"] = args.language
    output = generate_transcription(
        model_path=args.model, audio=args.audio,
        output_path=args.output, format=args.format, **kwargs)
    if args.output is None:
        print(output.text.strip())


if __name__ == "__main__":
    main()
