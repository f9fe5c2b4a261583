from .longcat_audiodit import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
