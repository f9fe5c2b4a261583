from .qwen2_audio import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
