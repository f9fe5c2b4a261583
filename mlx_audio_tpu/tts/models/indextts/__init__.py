from .indextts import GPTConfig, Model, ModelConfig, log_mel_spectrogram

__all__ = ["Model", "ModelConfig", "GPTConfig", "log_mel_spectrogram"]
