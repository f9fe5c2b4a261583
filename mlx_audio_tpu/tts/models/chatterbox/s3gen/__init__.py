from .hifigan import (HiFTGenerator, apply_f0_predictor, hift_decode,
                      hift_generate, init_f0_predictor, init_hift)
from .mel import mel_spectrogram

__all__ = ["HiFTGenerator", "hift_generate", "hift_decode", "init_hift",
           "init_f0_predictor", "apply_f0_predictor", "mel_spectrogram"]
