from .config import ModelArgs
from .voxcpm import Model, ModelConfig

__all__ = ["Model", "ModelConfig", "ModelArgs"]
