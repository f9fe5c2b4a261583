from .sesame import Model, ModelConfig, Segment

__all__ = ["Model", "ModelConfig", "Segment"]
