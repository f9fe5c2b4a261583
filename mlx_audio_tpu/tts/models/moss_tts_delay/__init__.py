"""Alias family: `moss_tts_delay` checkpoints load the shared MOSS-TTS model
(parity: reference tts/models/moss_tts_delay/__init__.py)."""

from ..moss_tts import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
