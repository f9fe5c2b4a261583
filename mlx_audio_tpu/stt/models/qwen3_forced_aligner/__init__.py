"""Qwen3-ForcedAligner shim (reference stt/models/qwen3_forced_aligner/
__init__.py — thin reuse of the qwen3_asr alignment stack)."""

from ..qwen3_asr.forced_aligner import (
    ForceAlignProcessor,
    ForcedAlignItem,
    ForcedAlignResult,
    ForcedAlignerConfig as ModelConfig,
    ForcedAlignerModel as Model,
)

__all__ = ["Model", "ModelConfig", "ForcedAlignItem", "ForcedAlignResult",
           "ForceAlignProcessor"]
