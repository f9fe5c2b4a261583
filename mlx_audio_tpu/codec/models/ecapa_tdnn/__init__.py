from .ecapa_tdnn import EcapaTdnnConfig, ecapa_backbone, init_ecapa_backbone

__all__ = ["EcapaTdnnConfig", "ecapa_backbone", "init_ecapa_backbone"]
