"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-runnable CI strategy (SURVEY.md §4) — tiny-config
shape tests with no real weights; multi-chip sharding is exercised via
xla_force_host_platform_device_count.
"""

import os
import sys

# MLX_AUDIO_TPU_TEST_BACKEND=tpu runs the suite against the real chip
# (hardware smoke sweeps); default is the virtual 8-device CPU mesh.
_BACKEND = os.environ.get("MLX_AUDIO_TPU_TEST_BACKEND", "cpu").lower()

if _BACKEND != "tpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # XLA:CPU AOT cache hits log a spurious machine-feature-mismatch error
    # for the internal prefer-no-{scatter,gather} pseudo-features even on
    # the same host; silence the spam (real failures still raise).
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's axon sitecustomize re-forces JAX_PLATFORMS=axon, so the
# env var alone is not enough — override through the config API too.
import jax  # noqa: E402

if _BACKEND != "tpu":
    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: XLA:CPU compiles dominate suite
    # wall-clock on this 1-vCPU host; same-host AOT reuse is safe (the
    # library's enable_compilation_cache skips CPU only for portability).
    _cache = os.environ.get(
        "MLX_AUDIO_TPU_TEST_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mlx_audio_tpu",
                     "jax_cache_cpu_tests"))
    if _cache.lower() not in ("0", "off", "none"):
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "requires_weights: requires downloaded or converted real model weights",
    )
