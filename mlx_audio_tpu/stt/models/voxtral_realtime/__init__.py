from .voxtral_realtime import Model, ModelConfig, TekkenTokenizer

__all__ = ["Model", "ModelConfig", "TekkenTokenizer"]
