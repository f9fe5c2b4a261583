from .irodori_tts import Model, ModelConfig
from .model import IrodoriDiTConfig, SamplerConfig

__all__ = ["Model", "ModelConfig", "IrodoriDiTConfig", "SamplerConfig"]
