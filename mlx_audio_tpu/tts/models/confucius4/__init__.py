from .confucius4 import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
