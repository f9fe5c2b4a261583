from .melotts import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
