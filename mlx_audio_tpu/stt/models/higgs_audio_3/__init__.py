from .higgs_audio_3 import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
