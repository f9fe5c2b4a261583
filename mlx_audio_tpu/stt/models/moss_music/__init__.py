from .moss_music import Model, ModelConfig, conv3_downsample_len

__all__ = ["Model", "ModelConfig", "conv3_downsample_len"]
