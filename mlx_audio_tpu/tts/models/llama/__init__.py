from .llama import Model, ModelConfig, decode_step, init_llama, llama_forward

__all__ = ["Model", "ModelConfig", "init_llama", "llama_forward", "decode_step"]
