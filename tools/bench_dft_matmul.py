"""Measure the small-FFT crossover: XLA's TPU FFT lowering vs DFT-as-matmul.

The Kokoro ISTFTNet head does a 20-point rfft/irfft over ~0.5M frames per
synth. XLA's FFT lowering on TPU is pathological at tiny lengths over huge
frame batches (long compiles, VPU-serialized runtime); the (K, n) basis
matmul spelling (dsp.rdft_pair / irdft_pair) is a bandwidth-bound MXU op.
This script measures both spellings across transform lengths to validate
the `_DFT_MATMUL_MAX` dispatch threshold in dsp.py.

Run (real TPU): python tools/bench_dft_matmul.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, n=10):
    fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    r.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.dsp import irdft_pair, rdft_pair

    rows = 491_520  # ~100 s of audio through the 20/5 ISTFTNet head
    print(f"{'n_fft':>6} {'fwd mm':>9} {'fwd fft':>9} {'inv mm':>9} "
          f"{'inv fft':>9} {'c_mm':>6} {'c_fft':>7}  (ms over "
          f"{rows} frames; c_* = first-call compile s)")
    for n_fft in (20, 64, 128, 256, 512, 1024):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(rows, n_fft).astype(np.float32))
        bins = n_fft // 2 + 1
        re = jnp.asarray(rng.randn(rows, bins).astype(np.float32))
        im = jnp.asarray(rng.randn(rows, bins).astype(np.float32))

        fwd_mm = jax.jit(lambda x: rdft_pair(x, n_fft))
        fwd_fft = jax.jit(lambda x: jnp.fft.rfft(x))
        inv_mm = jax.jit(lambda r, i: irdft_pair(r, i, n_fft))
        inv_fft = jax.jit(lambda r, i: jnp.fft.irfft(
            jax.lax.complex(r, i), n=n_fft, axis=-1))

        t0 = time.perf_counter()
        jax.tree.map(lambda a: a.block_until_ready(), fwd_mm(x))
        c_mm = time.perf_counter() - t0
        t0 = time.perf_counter()
        fwd_fft(x).block_until_ready()
        c_fft = time.perf_counter() - t0

        r = {
            "fwd_mm": timeit(lambda: fwd_mm(x)[0]),
            "fwd_fft": timeit(lambda: fwd_fft(x)),
            "inv_mm": timeit(lambda: inv_mm(re, im)),
            "inv_fft": timeit(lambda: inv_fft(re, im)),
        }
        print(f"{n_fft:>6} {r['fwd_mm']:>9.3f} {r['fwd_fft']:>9.3f} "
              f"{r['inv_mm']:>9.3f} {r['inv_fft']:>9.3f} "
              f"{c_mm:>6.1f} {c_fft:>7.1f}")


if __name__ == "__main__":
    main()
