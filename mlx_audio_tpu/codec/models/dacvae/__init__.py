from .dacvae import DACVAE, Model, ModelConfig

__all__ = ["DACVAE", "Model", "ModelConfig"]
