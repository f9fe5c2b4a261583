from .s3 import (Model, ModelConfig, S3Tokenizer, S3TokenizerV2,
                 log_mel_spectrogram, s3_encode)

__all__ = ["Model", "ModelConfig", "S3Tokenizer", "S3TokenizerV2",
           "log_mel_spectrogram", "s3_encode"]
