from .parakeet import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
