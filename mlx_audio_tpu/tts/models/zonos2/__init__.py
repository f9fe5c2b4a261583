from .model import Model, ModelConfig, Zonos2Config

__all__ = ["Model", "ModelConfig", "Zonos2Config"]
