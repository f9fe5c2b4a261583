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

__all__ = ["__version__", "load_model", "enable_compilation_cache"]

_COMPILE_CACHE_ENABLED = False


def enable_compilation_cache(cache_dir=None):
    """Point JAX at a persistent on-disk compilation cache.

    Cold-start compiles of the AR decode steppers run minutes on TPU
    (BENCH_r01: 227 s for one Qwen3-TTS config); the persistent cache makes
    every process after the first load compiled binaries from disk instead.
    Called automatically by `load_model` / the task loaders; override the
    location with MLX_AUDIO_TPU_COMPILE_CACHE (set to "0"/"off" to disable).
    """
    global _COMPILE_CACHE_ENABLED
    if _COMPILE_CACHE_ENABLED:
        return
    import os

    env = os.environ.get("MLX_AUDIO_TPU_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "false", "none"):
        _COMPILE_CACHE_ENABLED = True
        return
    cache_dir = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "mlx_audio_tpu", "jax_cache")
    try:
        import jax

        if jax.default_backend() == "cpu":
            # CPU compiles are fast, and XLA:CPU AOT cache entries can
            # mismatch host machine features (SIGILL risk) — TPU is the
            # backend where cold compiles run minutes.
            _COMPILE_CACHE_ENABLED = True
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache even sub-second compiles: on a tunneled TPU backend every
        # eager op dispatch (convert_element_type, broadcast_in_dim, ...)
        # pays a ~0.45 s compile round-trip, and a warm process issues ~60
        # of them — just under jax's default 0.5 s write threshold, which
        # silently turned "cached cold start" into ~25 s of tiny recompiles
        # every process. 0.05 s keeps truly-free CPU-style compiles out
        # while capturing everything a TPU round-trip makes expensive.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    _COMPILE_CACHE_ENABLED = True


def load_model(*args, **kwargs):
    """Category-auto-detecting model loader (lazy import of the heavy machinery).

    Mirrors the reference surface `mlx_audio.utils.load_model`
    (/root/reference/mlx_audio/utils.py:754-898).
    """
    from .utils import load_model as _load_model

    return _load_model(*args, **kwargs)
