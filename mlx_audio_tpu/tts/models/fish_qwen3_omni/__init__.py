from .fish_speech import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
