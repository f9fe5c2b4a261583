from .vocos import Model, ModelConfig, Vocos

__all__ = ["Vocos", "Model", "ModelConfig"]
