from .glmasr import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
