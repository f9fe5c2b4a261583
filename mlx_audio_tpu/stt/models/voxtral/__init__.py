from .voxtral import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
