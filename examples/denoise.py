"""Speech enhancement (denoise) with DeepFilterNet or MossFormer2-SE.

Equivalent of the reference's examples/denoise/ fixture pair: read a noisy
WAV, write the enhanced version.
"""

import argparse

import numpy as np

from mlx_audio_tpu import audio_io
from mlx_audio_tpu.sts.utils import load_model


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="noisy WAV")
    p.add_argument("--model", required=True,
                   help="deepfilternet or mossformer2_se model dir")
    p.add_argument("--output", default="enhanced.wav")
    args = p.parse_args()

    model = load_model(args.model)
    sr = int(getattr(model, "sample_rate", 48000))
    audio, in_sr = audio_io.read(args.input, dtype="float32")
    if audio.ndim > 1:
        audio = audio.mean(axis=-1)
    if in_sr != sr:
        from mlx_audio_tpu.utils import resample_audio

        audio = resample_audio(audio, in_sr, sr)

    if hasattr(model, "enhance"):
        out = model.enhance(np.asarray(audio, np.float32))
    else:
        out = model.enhance_array(np.asarray(audio, np.float32))
    audio_io.write(args.output, np.asarray(out, np.float32), sr)
    print(f"wrote {args.output} ({len(out) / sr:.2f}s at {sr} Hz)")


if __name__ == "__main__":
    main()
