from .bigvgan import BigVGAN, Model, ModelConfig

__all__ = ["BigVGAN", "Model", "ModelConfig"]
