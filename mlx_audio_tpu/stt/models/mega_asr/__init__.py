from .lora import apply_deltas, load_lora_adapter, load_lora_factors
from .mega_asr import Model, ModelConfig
from .router import AudioQualityRouter

__all__ = ["Model", "ModelConfig", "AudioQualityRouter", "apply_deltas",
           "load_lora_factors", "load_lora_adapter"]
