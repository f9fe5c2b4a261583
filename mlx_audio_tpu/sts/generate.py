"""STS generation CLI (enhancement / separation / voice conversion).

Parity: /root/reference/mlx_audio/sts/generate.py (146 LoC — load model,
process input audio, write output).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def generate_sts(
    model_path: str,
    audio: str,
    output_path: str = "output.wav",
    model=None,
    verbose: bool = True,
    **kwargs,
):
    from .. import audio_io
    from .utils import load_model

    if model is None:
        if verbose:
            print(f"Loading model: {model_path}")
        model = load_model(model_path)

    start = time.time()
    result = model.generate(audio, **kwargs)
    wall = time.time() - start

    if isinstance(result, dict):
        out = np.asarray(result.get("audio"))
        sr = result.get("sample_rate",
                        getattr(model, "sample_rate", 24000))
    else:
        out = np.asarray(result.audio if hasattr(result, "audio")
                         else result)
        sr = getattr(result, "sample_rate",
                     getattr(model, "sample_rate", 24000))
    audio_io.write(output_path, out.reshape(-1), int(sr))
    if verbose:
        print(f"✅ Output saved to {output_path} ({wall:.2f}s)")
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(description="Speech-to-speech processing")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--audio", type=str, required=True)
    parser.add_argument("--output_path", type=str, default="output.wav")
    parser.add_argument("--verbose", action=argparse.BooleanOptionalAction,
                        default=True)
    args = parser.parse_args(argv)
    generate_sts(args.model, args.audio, args.output_path,
                 verbose=args.verbose)


if __name__ == "__main__":
    main()
