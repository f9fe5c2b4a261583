"""TPU compute ops: attention, KV caches, sampling, RoPE, quantized matmul.

The shared kernel library under every model family (SURVEY.md §7 P3) —
the TPU-native replacement for the reference's reliance on mlx_lm's
KVCache/sampling utilities (e.g. /root/reference/mlx_audio/tts/models/
qwen3_tts/continuous_batching.py:10, tts/utils.py:227-228).
"""

from .attention import attention, decode_attention
from .kvcache import KVCache, kv_update
from .rope import apply_rope, rope_freqs
from .sampling import make_sampler, sample_categorical, top_k_top_p_filter

__all__ = [
    "attention", "decode_attention",
    "KVCache", "kv_update",
    "apply_rope", "rope_freqs",
    "make_sampler", "sample_categorical", "top_k_top_p_filter",
]
