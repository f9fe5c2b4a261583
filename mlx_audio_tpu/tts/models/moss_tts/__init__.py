from .config import ModelConfig, Qwen3LMConfig
from .moss_tts import Model
from .processor import (
    MossTTSDelayProcessor,
    MossTTSLocalProcessor,
    MossTTSLocalV15Processor,
    apply_de_delay_pattern,
    apply_delay_pattern,
)

__all__ = ["Model", "ModelConfig", "Qwen3LMConfig",
           "MossTTSDelayProcessor", "MossTTSLocalProcessor",
           "MossTTSLocalV15Processor", "apply_delay_pattern",
           "apply_de_delay_pattern"]
