from .bailingmm import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
