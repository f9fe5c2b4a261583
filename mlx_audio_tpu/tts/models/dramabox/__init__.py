from .dramabox import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
