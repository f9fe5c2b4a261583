from .config import MelRoFormerConfig
from .model import (BandLayout, MelRoFormer, MelRoFormerResult, Model,
                    mel_roformer_forward)

ModelConfig = MelRoFormerConfig     # loader convention

__all__ = ["MelRoFormerConfig", "ModelConfig", "MelRoFormer",
           "MelRoFormerResult", "Model", "BandLayout",
           "mel_roformer_forward"]
