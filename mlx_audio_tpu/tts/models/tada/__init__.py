from .tada import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
