from .higgs_audio_v3 import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
