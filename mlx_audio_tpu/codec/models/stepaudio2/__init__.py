from .stepaudio2 import Model, ModelConfig, StepAudio2Token2Wav

__all__ = ["Model", "ModelConfig", "StepAudio2Token2Wav"]
