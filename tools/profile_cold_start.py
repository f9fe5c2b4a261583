"""Break down the warm-cache cold start (VERDICT r3 weak #3).

BENCH_r03 measured compile_cached_s=19.2 (target <5) and setup_s=43.2 for
the qwen3_tts first-generate in a fresh process with a warm persistent
compilation cache. This script reproduces that fresh process and times each
piece separately — python imports, backend init, param init, and EVERY jit
compile (with the XLA persistent-cache hit/miss outcome per program) — so
the 19.2 s is attributable.

Run (real TPU): python tools/profile_cold_start.py
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()


def mark(label, t0=None):
    now = time.perf_counter()
    print(f"[{now - T0:7.2f}s] {label}"
          + (f" (+{now - t0:.2f}s)" if t0 is not None else ""), flush=True)
    return now


def main():
    t = mark("start")
    import numpy as np  # noqa: F401

    from mlx_audio_tpu import enable_compilation_cache

    t = mark("mlx_audio_tpu imported", t)
    enable_compilation_cache()
    import jax

    # surface persistent-cache hits/misses per compiled program
    logging.basicConfig(level=logging.WARNING, format="%(message)s")
    for name in ("jax._src.compilation_cache", "jax._src.compiler"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        h = logging.StreamHandler(sys.stdout)
        h.setLevel(logging.DEBUG)
        lg.addHandler(h)
    jax.config.update("jax_explain_cache_misses", True)

    d = jax.devices()
    t = mark(f"jax backend up: {d}", t)

    import bench

    model = bench._qwen3_model()
    t = mark("qwen3 model params initialized (bf16)", t)

    text_ids = np.arange(100, 150)[None]
    t_gen0 = time.perf_counter()
    first_audio = [None]
    samples = 0
    for r in model.generate(text_ids=text_ids, temperature=0.9,
                            max_tokens=60, stream=True,
                            streaming_interval=0.6, seed=0):
        if first_audio[0] is None and r.samples > 0:
            first_audio[0] = time.perf_counter() - t_gen0
            mark(f"FIRST AUDIO at +{first_audio[0]:.2f}s into generate")
        samples += r.samples
    t = mark(f"generate done ({samples} samples)", t)
    print(f"\nTOTAL first-generate: {time.perf_counter() - t_gen0:.2f}s "
          f"(bench gate: <5s); process total "
          f"{time.perf_counter() - T0:.2f}s")


if __name__ == "__main__":
    main()
