from .moss_transcribe_diarize import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
