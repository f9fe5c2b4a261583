from .chatterbox import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
