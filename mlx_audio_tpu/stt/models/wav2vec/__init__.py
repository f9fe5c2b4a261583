from .wav2vec import (ModelConfig, feature_lengths, init_wav2vec2,
                      sanitize_wav2vec2, wav2vec2_forward)

__all__ = ["ModelConfig", "feature_lengths", "init_wav2vec2",
           "sanitize_wav2vec2", "wav2vec2_forward"]
