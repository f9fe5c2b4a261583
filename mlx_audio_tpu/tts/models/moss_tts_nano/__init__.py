from .config import GPT2Config, ModelConfig
from .moss_tts_nano import Model

__all__ = ["Model", "ModelConfig", "GPT2Config"]
