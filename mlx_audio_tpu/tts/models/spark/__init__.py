from .bicodec import BiCodec
from .config import BiCodecConfig, ModelConfig
from .spark import Model

__all__ = ["Model", "ModelConfig", "BiCodec", "BiCodecConfig"]
