"""STT transcription CLI + output writers.

Parity: /root/reference/mlx_audio/stt/generate.py (generate_transcription
:243, txt/srt/vtt/json writers :146-236, streaming accumulation :293-332).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Optional


def _fmt_ts(seconds: float, vtt: bool = False) -> str:
    ms = int(round(seconds * 1000))
    h, ms = divmod(ms, 3_600_000)
    m, ms = divmod(ms, 60_000)
    s, ms = divmod(ms, 1000)
    sep = "." if vtt else ","
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{ms:03d}"


def save_as_txt(output: "STTOutput", path: Path) -> None:
    path.write_text(output.text.strip() + "\n", encoding="utf-8")


def save_as_srt(output, path: Path) -> None:
    lines = []
    for i, seg in enumerate(output.segments or [], start=1):
        lines.append(str(i))
        lines.append(f"{_fmt_ts(seg['start'])} --> {_fmt_ts(seg['end'])}")
        lines.append(seg["text"].strip())
        lines.append("")
    path.write_text("\n".join(lines), encoding="utf-8")


def save_as_vtt(output, path: Path) -> None:
    lines = ["WEBVTT", ""]
    for seg in output.segments or []:
        lines.append(
            f"{_fmt_ts(seg['start'], vtt=True)} --> {_fmt_ts(seg['end'], vtt=True)}")
        lines.append(seg["text"].strip())
        lines.append("")
    path.write_text("\n".join(lines), encoding="utf-8")


def save_as_json(output, path: Path) -> None:
    payload = {
        "text": output.text,
        "segments": output.segments,
        "language": output.language,
    }
    path.write_text(json.dumps(payload, indent=2, ensure_ascii=False),
                    encoding="utf-8")


_WRITERS = {"txt": save_as_txt, "srt": save_as_srt, "vtt": save_as_vtt,
            "json": save_as_json}


def generate_transcription(
    model_path: str,
    audio: str,
    output_path: Optional[str] = None,
    format: str = "txt",
    model=None,
    verbose: bool = True,
    **generate_kwargs,
):
    """Load an STT model, transcribe `audio`, optionally write the result.

    Returns the STTOutput (reference stt/generate.py:243-385).
    """
    from .utils import load_model

    if model is None:
        if verbose:
            print(f"Loading model: {model_path}")
        model = load_model(model_path)

    from ..utils import maybe_profile

    start = time.time()
    with maybe_profile():
        output = model.generate(audio, **generate_kwargs)
    wall = time.time() - start

    if verbose:
        print("=" * 10)
        print(output.text.strip())
        print("=" * 10)
        print(f"Language: {output.language}")
        print(f"Prompt: {output.prompt_tokens} tokens, "
              f"{output.prompt_tps:.2f} tokens-per-sec")
        print(f"Generation: {output.generation_tokens} tokens, "
              f"{output.generation_tps:.2f} tokens-per-sec")
        print(f"Total time: {wall:.2f}s")

    if output_path is not None:
        fmt = format.lower()
        if fmt not in _WRITERS:
            raise ValueError(
                f"Unsupported output format: {format} "
                f"(choose from {sorted(_WRITERS)})")
        path = Path(output_path)
        if path.suffix == "":
            path = path / f"transcription.{fmt}"
        path.parent.mkdir(parents=True, exist_ok=True)
        _WRITERS[fmt](output, path)
        if verbose:
            print(f"✅ Transcription saved to {path}")
    return output


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Transcribe audio to text")
    parser.add_argument("--model", type=str,
                        default="mlx-community/whisper-large-v3-turbo")
    parser.add_argument("--audio", type=str, required=True)
    parser.add_argument("--output_path", type=str, default=None)
    parser.add_argument("--format", type=str, default="txt",
                        choices=["txt", "srt", "vtt", "json"])
    parser.add_argument("--language", type=str, default=None)
    parser.add_argument("--task", type=str, default="transcribe",
                        choices=["transcribe", "translate"])
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--initial_prompt", type=str, default=None)
    parser.add_argument("--word_timestamps", action="store_true")
    parser.add_argument("--verbose", action=argparse.BooleanOptionalAction,
                        default=True)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    generate_transcription(
        model_path=args.model,
        audio=args.audio,
        output_path=args.output_path,
        format=args.format,
        language=args.language,
        task=args.task,
        temperature=args.temperature,
        initial_prompt=args.initial_prompt,
        word_timestamps=args.word_timestamps,
        verbose=args.verbose,
    )


if __name__ == "__main__":
    main()
