"""Voice cloning with Qwen3-TTS ICL (in-context learning).

Equivalent of the reference's higgs_audio_clone_demo.py /
omnivoice_clone_demo.py: give a short reference clip (+ its transcript)
and synthesize new text in that voice. Works with any family whose
generate() takes ref_audio/ref_text (qwen3_tts, chatterbox, spark,
higgs_audio, ...).
"""

import argparse

from mlx_audio_tpu.tts.generate import generate_audio


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="TTS model dir")
    p.add_argument("--ref-audio", required=True,
                   help="3-30 s reference clip of the target voice")
    p.add_argument("--ref-text", default=None,
                   help="transcript of the reference clip (auto-STT'd "
                        "via --stt-model when omitted)")
    p.add_argument("--stt-model", default=None,
                   help="STT model dir used to transcribe --ref-audio "
                        "when --ref-text is omitted")
    p.add_argument("--text", default="Cloning a voice takes only a few "
                                     "seconds of reference audio.")
    p.add_argument("--output", default="cloned.wav")
    args = p.parse_args()

    results = generate_audio(
        text=args.text, model_path=args.model,
        ref_audio=args.ref_audio, ref_text=args.ref_text,
        stt_model=args.stt_model, output_path=args.output,
        join_audio=True, verbose=True)
    print(f"wrote {args.output} "
          f"({sum(r.samples for r in results)} samples)")


if __name__ == "__main__":
    main()
