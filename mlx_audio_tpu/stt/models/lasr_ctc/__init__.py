from .lasr import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
