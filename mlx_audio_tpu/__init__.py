"""mlx_audio_tpu — a TPU-native audio inference framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of Blaizzy/mlx-audio (see SURVEY.md)
designed TPU-first: fused Pallas/XLA feature extraction, KV-cached autoregressive
decoding inside compiled XLA while-loops, explicit streaming conv state, and
jax.sharding-based parallelism.

Import hygiene mirrors the reference (/root/reference/mlx_audio/__init__.py):
`mlx_audio_tpu.dsp` and `mlx_audio_tpu.audio_io` must be importable without
pulling in any task package (tts/stt/...).
"""

from .version import __version__

__all__ = ["__version__", "load_model"]


def load_model(*args, **kwargs):
    """Category-auto-detecting model loader (lazy import of the heavy machinery).

    Mirrors the reference surface `mlx_audio.utils.load_model`
    (/root/reference/mlx_audio/utils.py:754-898).
    """
    from .utils import load_model as _load_model

    return _load_model(*args, **kwargs)
