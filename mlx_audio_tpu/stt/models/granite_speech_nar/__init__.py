from .granite_speech_nar import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
