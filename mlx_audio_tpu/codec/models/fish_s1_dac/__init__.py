from .fish_s1_dac import DAC, Model, ModelConfig

__all__ = ["DAC", "Model", "ModelConfig"]
