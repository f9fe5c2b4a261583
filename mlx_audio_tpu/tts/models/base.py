"""TTS result schema and shared helpers.

Parity: /root/reference/mlx_audio/tts/models/base.py (GenerationResult :72,
BatchGenerationResult :89, adjust_speed :37). Telemetry fields double as the
de-facto benchmark harness (SURVEY.md §5.1, §6).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def format_duration(seconds: float) -> str:
    hours = int(seconds // 3600)
    mins = int((seconds % 3600) // 60)
    secs = int(seconds % 60)
    ms = int((seconds % 1) * 1000)
    return f"{hours:02d}:{mins:02d}:{secs:02d}.{ms:03d}"


def peak_memory_gb() -> float:
    """Best-effort live-buffer telemetry (reference reports mx.get_peak_memory)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 1e9
    except Exception:
        pass
    return 0.0


@dataclass
class GenerationResult:
    audio: jnp.ndarray
    samples: int
    sample_rate: int
    segment_idx: int
    token_count: int
    audio_duration: str
    real_time_factor: float
    prompt: dict
    audio_samples: dict
    processing_time_seconds: float
    peak_memory_usage: float
    is_streaming_chunk: bool = False
    is_final_chunk: bool = False


@dataclass
class BatchGenerationResult:
    audio: jnp.ndarray
    sequence_idx: int
    samples: int
    sample_rate: int
    token_count: int
    audio_duration: str
    processing_time_seconds: float
    peak_memory_usage: float
    is_streaming_chunk: bool = False
    is_final_chunk: bool = False


def adjust_speed(audio, speed_factor: float):
    """Resample-based speed change (reference base.py:37-68)."""
    audio = jnp.asarray(audio)
    old_len = audio.shape[0]
    new_len = int(old_len / speed_factor)
    new_idx = jnp.linspace(0, old_len - 1, new_len)
    lo = jnp.floor(new_idx).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, old_len - 1)
    w = new_idx - lo
    if audio.ndim == 1:
        return (1 - w) * audio[lo] + w * audio[hi]
    return (1 - w)[:, None] * audio[lo] + w[:, None] * audio[hi]
