from .config import AudioEncoderConfig, ModelConfig, TextConfig
from .qwen3_asr import Model, StreamingResult

__all__ = ["Model", "ModelConfig", "AudioEncoderConfig", "TextConfig",
           "StreamingResult"]
