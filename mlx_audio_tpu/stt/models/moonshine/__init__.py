from .moonshine import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
