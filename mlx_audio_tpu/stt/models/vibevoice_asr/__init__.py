from .vibevoice_asr import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
