"""Text-guided source separation with SAM-Audio.

"Extract the <description> from this mix" — reference parity:
sam_audio.separate / separate_long (sts/models/sam_audio/model.py) behind
the same API the server's /v1/audio/separations endpoint uses.
"""

import argparse

import numpy as np

from mlx_audio_tpu import audio_io
from mlx_audio_tpu.sts.utils import load_model


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="mixture WAV")
    p.add_argument("--model", required=True, help="sam_audio model dir")
    p.add_argument("--description", default="speech",
                   help="what to extract, in words")
    p.add_argument("--steps", type=int, default=16,
                   help="flow-ODE integration steps")
    p.add_argument("--method", default="midpoint",
                   choices=["euler", "midpoint"])
    p.add_argument("--target", default="target.wav")
    p.add_argument("--residual", default="residual.wav")
    args = p.parse_args()

    model = load_model(args.model)
    audio, sr = audio_io.read(args.input, dtype="float32")
    if audio.ndim > 1:
        audio = audio.mean(axis=-1)
    out_sr = int(model.sample_rate)
    if sr != out_sr:
        from mlx_audio_tpu.utils import resample_audio

        audio = resample_audio(audio, sr, out_sr)

    result = model.separate_long(
        np.asarray(audio, np.float32)[None, None], [args.description],
        ode_opt={"step_size": 1.0 / args.steps, "method": args.method})
    audio_io.write(args.target,
                   np.asarray(result.target[0], np.float32).reshape(-1),
                   out_sr)
    audio_io.write(args.residual,
                   np.asarray(result.residual[0], np.float32).reshape(-1),
                   out_sr)
    print(f"wrote {args.target} + {args.residual}")


if __name__ == "__main__":
    main()
