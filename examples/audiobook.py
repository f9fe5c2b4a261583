"""Chapterized audiobook generation from a long text file.

Python equivalent of the reference's bible-audiobook TypeScript app: split a
long text into chapters/paragraphs, synthesize each with a consistent voice,
and write one WAV per chapter plus a joined master file.
"""

import argparse
import re
from pathlib import Path

import numpy as np

from mlx_audio_tpu import audio_io
from mlx_audio_tpu.tts.utils import load_model


def split_chapters(text: str):
    """Split on markdown-style headings or CHAPTER markers; fall back to
    ~2000-char paragraph groups."""
    parts = re.split(r"\n(?=#+\s|CHAPTER\b|Chapter\b)", text)
    parts = [p.strip() for p in parts if p.strip()]
    if len(parts) > 1:
        return parts
    # no headings: group paragraphs
    paras = [p.strip() for p in text.split("\n\n") if p.strip()]
    chapters, cur = [], ""
    for p in paras:
        if len(cur) + len(p) > 2000 and cur:
            chapters.append(cur)
            cur = p
        else:
            cur = f"{cur}\n\n{p}" if cur else p
    if cur:
        chapters.append(cur)
    return chapters


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("textfile", help="UTF-8 text file (the book)")
    p.add_argument("--model", required=True, help="TTS model dir")
    p.add_argument("--voice", default=None)
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--outdir", default="audiobook")
    p.add_argument("--pause-s", type=float, default=0.6,
                   help="silence inserted between chapters in the master")
    args = p.parse_args()

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    text = Path(args.textfile).read_text(encoding="utf-8")
    chapters = split_chapters(text)
    print(f"{len(chapters)} chapters")

    model = load_model(args.model)
    sr = int(model.sample_rate)
    master = []
    pause = np.zeros(int(args.pause_s * sr), np.float32)
    for i, chapter in enumerate(chapters, 1):
        segs = []
        kwargs = {"speed": args.speed}
        if args.voice:
            kwargs["voice"] = args.voice
        for r in model.generate(chapter, **kwargs):
            segs.append(np.asarray(r.audio, np.float32))
        audio = np.concatenate(segs) if segs else np.zeros(0, np.float32)
        path = outdir / f"chapter_{i:03d}.wav"
        audio_io.write(str(path), audio, sr)
        print(f"  {path} ({len(audio) / sr:.1f}s)")
        master.append(audio)
        master.append(pause)
    audio_io.write(str(outdir / "book.wav"), np.concatenate(master), sr)
    print(f"wrote {outdir / 'book.wav'}")


if __name__ == "__main__":
    main()
