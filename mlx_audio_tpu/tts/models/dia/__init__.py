from .config import DiaConfig
from .config import DiaConfig as ModelConfig
from .dia import Model

__all__ = ["DiaConfig", "ModelConfig", "Model"]
