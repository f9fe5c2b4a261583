from .llama import (decode_step, init_caches, init_llama, llama_forward,
                    logits_from_hidden)
from .llama import Model as BackboneModel
from .llama import ModelConfig as BackboneConfig
# the loadable family model (model_type "llama") is the Orpheus token-TTS
from .orpheus import Model, ModelConfig

__all__ = ["Model", "ModelConfig", "BackboneModel", "BackboneConfig",
           "init_llama", "init_caches", "llama_forward",
           "logits_from_hidden", "decode_step"]
