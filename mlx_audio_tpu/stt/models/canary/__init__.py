from .canary import CanaryTokenizer, Model, ModelConfig

__all__ = ["CanaryTokenizer", "Model", "ModelConfig"]
