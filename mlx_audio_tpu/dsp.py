"""Pure audio DSP utilities — no TTS/STT imports, TPU-first.

Functional parity target: /root/reference/mlx_audio/dsp.py (windows :39-94,
stft :369, istft :420, ISTFTCache :592, mel_filters :499 incl. the float64
"precise" path :585-589, BS.1770 loudness :224-365, lfilter :158, Kaldi fbank
suite :732-969). The implementations here are designed fresh for TPU/XLA:

* Framing is expressed as a gather with precomputed static indices; for the
  fused mel path the DFT is a **matmul against a real DFT basis** so the whole
  frame->FFT->|.|^2->mel chain runs on the MXU and fuses under one jit
  (see `log_mel_spectrogram` and `ops/melspec.py` for the Pallas variant).
* Overlap-add (istft) is a **transposed convolution with an identity kernel**
  instead of a scatter-add: scatters serialize on TPU, conv_transpose tiles
  onto the MXU.
* Everything shape-dependent is cached per static config so repeated calls hit
  the jit cache.

All public functions accept numpy or jax arrays and return jax arrays (host
numpy in/out for the numpy-domain loudness utilities, matching the reference).
"""

from __future__ import annotations

import math
import warnings
from functools import lru_cache, partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hanning",
    "hamming",
    "blackman",
    "bartlett",
    "povey",
    "STR_TO_WINDOW_FN",
    "frame_signal",
    "stft",
    "istft",
    "overlap_add",
    "ISTFTCache",
    "mel_filters",
    "log_mel_spectrogram",
    "integrated_loudness",
    "lfilter",
    "normalize_loudness",
    "normalize_peak",
    # Kaldi-compatible features
    "compute_deltas_kaldi",
    "mel_scale_kaldi",
    "inverse_mel_scale_kaldi",
    "get_mel_banks_kaldi",
    "compute_fbank_kaldi",
]


# ---------------------------------------------------------------------------
# Window functions
#
# Computed on host in float64 then cast — bit-stable across backends and free
# at trace time (reference: dsp.py:39-94).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _window_np(kind: str, size: int, periodic: bool) -> np.ndarray:
    denom = size if periodic else size - 1
    n = np.arange(size, dtype=np.float64)
    if kind == "hann":
        w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / denom))
    elif kind == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / denom)
    elif kind == "blackman":
        w = (
            0.42
            - 0.5 * np.cos(2.0 * np.pi * n / denom)
            + 0.08 * np.cos(4.0 * np.pi * n / denom)
        )
    elif kind == "bartlett":
        w = 1.0 - 2.0 * np.abs(n - denom / 2.0) / denom
    elif kind == "povey":
        w = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)) ** 0.85
    else:
        raise ValueError(f"Unknown window kind: {kind}")
    return w.astype(np.float32)


def hanning(size: int, periodic: bool = False) -> jnp.ndarray:
    """Hann window (matches reference dsp.py:40-50 semantics)."""
    return jnp.asarray(_window_np("hann", size, periodic))


def hamming(size: int, periodic: bool = False) -> jnp.ndarray:
    return jnp.asarray(_window_np("hamming", size, periodic))


def blackman(size: int, periodic: bool = False) -> jnp.ndarray:
    return jnp.asarray(_window_np("blackman", size, periodic))


def bartlett(size: int, periodic: bool = False) -> jnp.ndarray:
    return jnp.asarray(_window_np("bartlett", size, periodic))


def povey(size: int, periodic: bool = False) -> jnp.ndarray:
    """Kaldi 'povey' window (hann**0.85)."""
    return jnp.asarray(_window_np("povey", size, periodic))


STR_TO_WINDOW_FN = {
    "hann": hanning,
    "hanning": hanning,
    "hamming": hamming,
    "blackman": blackman,
    "bartlett": bartlett,
    "povey": povey,
}


def _resolve_window(window, win_length: int, n_fft: Optional[int] = None):
    """Resolve a window spec (str | array) and zero-pad it to n_fft if needed."""
    if isinstance(window, str):
        fn = STR_TO_WINDOW_FN.get(window.lower())
        if fn is None:
            raise ValueError(f"Unknown window function: {window}")
        w = fn(win_length)
    else:
        w = jnp.asarray(window)
    if n_fft is not None and w.shape[0] < n_fft:
        w = jnp.concatenate([w, jnp.zeros((n_fft - w.shape[0],), dtype=w.dtype)])
    return w


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice ``x`` (..., T) into overlapping frames (..., num_frames, frame_length).

    Implemented as a static-index gather; XLA lowers this to a strided copy.
    """
    x = jnp.asarray(x)
    t = x.shape[-1]
    num_frames = 1 + (t - frame_length) // hop_length
    if num_frames <= 0:
        raise ValueError(
            f"Input is too short (length={t}) for frame_length={frame_length} "
            f"with hop_length={hop_length}."
        )
    idx = (
        np.arange(num_frames)[:, None] * hop_length
        + np.arange(frame_length)[None, :]
    )
    return jnp.take(x, jnp.asarray(idx), axis=-1)


def _reflect_pad_1d(x: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Reflect-pad the last axis (no edge duplication, torch 'reflect')."""
    prefix = jnp.flip(x[..., 1 : padding + 1], axis=-1)
    suffix = jnp.flip(x[..., -(padding + 1) : -1], axis=-1)
    return jnp.concatenate([prefix, x, suffix], axis=-1)


def _pad_center(x: jnp.ndarray, padding: int, pad_mode: str) -> jnp.ndarray:
    if pad_mode == "constant":
        cfg = [(0, 0)] * (x.ndim - 1) + [(padding, padding)]
        return jnp.pad(x, cfg)
    if pad_mode == "reflect":
        return _reflect_pad_1d(x, padding)
    raise ValueError(f"Invalid pad_mode {pad_mode}")


# ---------------------------------------------------------------------------
# STFT / ISTFT
# ---------------------------------------------------------------------------


def stft(
    x,
    n_fft: int = 800,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Union[str, jnp.ndarray] = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Short-time Fourier transform.

    Matches reference `dsp.stft` (dsp.py:369-417): input (..., T), returns
    complex64 (..., num_frames, n_fft // 2 + 1).
    """
    eager = not isinstance(x, jax.core.Tracer)
    x = jnp.asarray(x)
    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    w = _resolve_window(window, win_length, n_fft)
    if center:
        x = _pad_center(x, n_fft // 2, pad_mode)
    frames = frame_signal(x, n_fft, hop_length)
    if eager and jax.default_backend() != "cpu":
        # Eager complex ops are UNIMPLEMENTED on some TPU runtimes; fuse
        # the rfft in a jit with REAL outputs and assemble complex on host.
        re, im = _rfft_pair(frames * w)
        return np.asarray(re) + 1j * np.asarray(im)
    return jnp.fft.rfft(frames * w)


@jax.jit
def _rfft_pair(frames: jnp.ndarray):
    """Framed rfft with real-valued jit boundaries (complex stays fused)."""
    spec = jnp.fft.rfft(frames)
    return jnp.real(spec), jnp.imag(spec)


@jax.jit
def rfft_power(frames: jnp.ndarray) -> jnp.ndarray:
    """|rfft(frames)|^2 with the complex intermediate fused inside jit —
    safe to call eagerly on TPU runtimes without complex-buffer support."""
    spec = jnp.fft.rfft(frames)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


@jax.jit
def _irfft_pair(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jnp.fft.irfft(jax.lax.complex(re, im), axis=-1)


@partial(jax.jit, static_argnames=("n",))
def irfft_pair(re: jnp.ndarray, im: jnp.ndarray,
               n: Optional[int] = None) -> jnp.ndarray:
    """irfft of (real, imag) parts with the complex value fused in-jit —
    the eager-safe replacement for `jnp.fft.irfft(re + 1j*im)` on TPU
    runtimes without complex-buffer support. Inlines when traced.

    Small transforms (n <= _DFT_MATMUL_MAX, e.g. the 20-point ISTFTNet
    heads) dispatch to an explicit DFT-as-matmul: XLA's TPU FFT lowering
    is pathological at tiny lengths over huge frame batches (multi-minute
    compiles, VPU-serialized runtime), while the (K, n) basis matmul is a
    bandwidth-bound MXU op."""
    nf = 2 * (re.shape[-1] - 1) if n is None else n
    if nf <= _DFT_MATMUL_MAX:
        return irdft_pair(re, im, nf)
    return jnp.fft.irfft(jax.lax.complex(
        re.astype(jnp.float32), im.astype(jnp.float32)), n=n, axis=-1)


# DFT lengths up to this lower to basis matmuls instead of XLA's FFT.
# Crossover measured on v5e (tools/bench_dft_matmul.py): the matmul wins
# on both compile time and runtime well past 256; FFT only catches up for
# long transforms where O(n log n) beats O(n*K) on bandwidth.
_DFT_MATMUL_MAX = 256


@lru_cache(maxsize=None)
def _rdft_bases_np(n_fft: int):
    """Forward real-DFT bases (cos, -sin), each (n_fft, n_fft//2+1) f32.

    Angles are reduced with exact integer modular arithmetic (k*n % n_fft)
    so symmetry zeros (e.g. sin at k = n_fft/2) stay exact."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * ((n * k) % n_fft) / n_fft
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


@lru_cache(maxsize=None)
def _irdft_bases_np(n_fft: int):
    """Inverse real-DFT bases (C, S), each (n_fft//2+1, n_fft) f32, such
    that `re @ C + im @ S` == `np.fft.irfft(re + 1j*im, n_fft)` (even or
    odd n_fft; Hermitian weights 2 on interior bins, 1 on DC/Nyquist)."""
    kk = np.arange(n_fft // 2 + 1)[:, None]
    nn = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * ((kk * nn) % n_fft) / n_fft
    w = np.full((n_fft // 2 + 1, 1), 2.0)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0
    c = (w * np.cos(ang) / n_fft).astype(np.float32)
    s = (-(w * np.sin(ang)) / n_fft).astype(np.float32)
    return c, s


def rdft_pair(frames: jnp.ndarray, n_fft: Optional[int] = None):
    """Forward real DFT via basis matmul: frames (..., n_fft) ->
    (re, im) each (..., n_fft//2+1) f32. MXU-friendly for small n_fft
    (the TPU-native spelling of `jnp.fft.rfft` for ISTFTNet-size heads)."""
    nf = frames.shape[-1] if n_fft is None else n_fft
    cosb, msinb = (jnp.asarray(m) for m in _rdft_bases_np(nf))
    f32 = frames.astype(jnp.float32)
    return f32 @ cosb, f32 @ msinb


def irdft_pair(re: jnp.ndarray, im: jnp.ndarray,
               n: Optional[int] = None) -> jnp.ndarray:
    """Inverse of :func:`rdft_pair`; matches `jnp.fft.irfft(re+1j*im, n)`
    to f32 roundoff as one fused pair of (K, n) matmuls."""
    nf = 2 * (re.shape[-1] - 1) if n is None else n
    c, s = (jnp.asarray(m) for m in _irdft_bases_np(nf))
    return re.astype(jnp.float32) @ c + im.astype(jnp.float32) @ s


def spec_abs(spec) -> jnp.ndarray:
    """Magnitude of an stft() result regardless of where it lives:
    host numpy complex (TPU eager path) or device/tracer complex."""
    if isinstance(spec, np.ndarray):
        return jnp.asarray(np.abs(spec))
    return jnp.abs(spec)


def _identity_oa_kernel(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Anti-diagonal kernel (win_length, win_length, 1) for conv_transpose OA.

    lax.conv_transpose (transpose_kernel=False) spatially flips the kernel, so
    the identity must be pre-flipped for sample c of each frame to land at
    output offset c.
    """
    return jnp.flip(jnp.eye(win_length, dtype=dtype), axis=0)[:, :, None]


@partial(jax.jit, static_argnames=("hop_length", "win_length"))
def overlap_add(frames: jnp.ndarray, hop_length: int, win_length: int) -> jnp.ndarray:
    """Overlap-add frames (..., num_frames, win_length) -> (..., T).

    TPU-first: when hop divides win (the ISTFTNet heads: win 20, hop 5)
    each output sample receives exactly win/hop contributions, so OA is
    win/hop static shifted adds of contiguous reshapes — pure VPU, no
    scatter. Otherwise it falls back to a transposed convolution with an
    identity kernel (MXU) rather than a serialized scatter-add.
    """
    lead = frames.shape[:-2]
    num_frames = frames.shape[-2]
    t = (num_frames - 1) * hop_length + win_length
    if win_length % hop_length == 0:
        fr = frames.reshape((-1, num_frames, win_length))
        out = jnp.zeros((fr.shape[0], t), fr.dtype)
        for j in range(win_length // hop_length):
            slab = fr[:, :, j * hop_length : (j + 1) * hop_length]
            slab = slab.reshape((fr.shape[0], num_frames * hop_length))
            out = out.at[:, j * hop_length : j * hop_length
                         + num_frames * hop_length].add(slab)
        return out.reshape(lead + (t,))
    fr = frames.reshape((-1, num_frames, win_length))
    out = jax.lax.conv_transpose(
        fr,
        _identity_oa_kernel(win_length, frames.dtype),
        strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out[..., 0].reshape(lead + (t,))


@lru_cache(maxsize=None)
def _window_envelope_np(
    window_key, num_frames: int, hop_length: int, win_length: int, squared: bool
) -> np.ndarray:
    """Host-side overlap-added window (or window^2) normalization envelope."""
    w = np.asarray(window_key, dtype=np.float64)
    wn = w * w if squared else w
    t = (num_frames - 1) * hop_length + win_length
    env = np.zeros(t, dtype=np.float64)
    for i in range(num_frames):
        env[i * hop_length : i * hop_length + win_length] += wn
    return env.astype(np.float32)


def _window_envelope(
    w: jnp.ndarray, num_frames: int, hop_length: int, squared: bool
) -> jnp.ndarray:
    key = tuple(np.asarray(w, dtype=np.float64).tolist())
    env = _window_envelope_np(key, num_frames, hop_length, len(key), squared)
    return jnp.asarray(env)


def istft(
    x,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Union[str, jnp.ndarray] = "hann",
    center: bool = True,
    length: Optional[int] = None,
    normalized: bool = False,
) -> jnp.ndarray:
    """Inverse STFT matching reference `dsp.istft` (dsp.py:420-496).

    Args:
        x: complex STFT (num_frames, n_fft // 2 + 1)  [frame-major, like the
           reference's stft output].
        normalized: if True normalize by sum of window^2 (COLA, torch-style);
           else by sum of window.
    """
    # host numpy complex (the eager stft() result on TPU runtimes without
    # complex-buffer support) must NOT be device-put as complex — keep it
    # on host and fuse the irfft via _irfft_pair below
    host_complex = isinstance(x, np.ndarray) and \
        np.issubdtype(np.asarray(x).dtype, np.complexfloating) and \
        jax.default_backend() != "cpu"
    if not host_complex:
        x = jnp.asarray(x)
    if win_length is None:
        win_length = (x.shape[1] - 1) * 2
    if hop_length is None:
        hop_length = win_length // 4

    # Resolve the window on the HOST whenever possible (str / numpy input):
    # the normalization envelope is precomputed in numpy, so istft stays
    # usable inside jit (where jnp constants become tracers).
    w_np = None
    if isinstance(window, str):
        kind = {"hanning": "hann"}.get(window.lower(), window.lower())
        if window.lower() not in STR_TO_WINDOW_FN:
            raise ValueError(f"Unknown window function: {window}")
        w_np = _window_np(kind, win_length + 1, False)[:-1] \
            .astype(np.float32)  # periodic window, reference behavior
    elif isinstance(window, np.ndarray):
        w_np = np.asarray(window, np.float32)
    if w_np is not None and w_np.shape[0] < win_length:
        w_np = np.pad(w_np, (0, win_length - w_np.shape[0]))
    w = jnp.asarray(w_np if w_np is not None else window)
    if w.shape[0] < win_length:
        w = jnp.concatenate([w, jnp.zeros((win_length - w.shape[0],), dtype=w.dtype)])

    num_frames = x.shape[0]
    if host_complex:
        xr = jnp.asarray(np.ascontiguousarray(np.real(x)), jnp.float32)
        xi = jnp.asarray(np.ascontiguousarray(np.imag(x)), jnp.float32)
        frames_time = _irfft_pair(xr, xi)[..., :win_length]
    else:
        frames_time = jnp.fft.irfft(x, axis=-1)[..., :win_length]
    reconstructed = overlap_add(frames_time * w, hop_length, win_length)
    if w_np is not None:
        env = jnp.asarray(_window_envelope_np(
            tuple(w_np.astype(np.float64).tolist()), num_frames, hop_length,
            win_length, normalized))
    else:
        env = _window_envelope(w, num_frames, hop_length, squared=normalized)
    reconstructed = jnp.where(env > 1e-10, reconstructed / env, reconstructed)

    if center and length is None:
        reconstructed = reconstructed[win_length // 2 : -(win_length // 2)]
    if length is not None:
        reconstructed = reconstructed[:length]
    return reconstructed


class ISTFTCache:
    """Vectorized batched inverse STFT with per-config caching.

    API-parity with reference `dsp.ISTFTCache` (dsp.py:592-729): consumes
    (batch, freq, frames) real/imag parts, returns (batch, samples). On TPU the
    overlap-add is a conv_transpose (MXU) and the normalization envelope is
    computed once per (config, num_frames) on host and cached.
    """

    def __init__(self):
        self._jitted = {}

    def istft(
        self,
        real_part: jnp.ndarray,
        imag_part: jnp.ndarray,
        n_fft: int,
        hop_length: int,
        win_length: int,
        window: jnp.ndarray,
        center: bool = True,
        audio_length: Optional[int] = None,
    ) -> jnp.ndarray:
        window = _resolve_window(window, win_length, n_fft)
        num_frames = real_part.shape[-1]
        env = _window_envelope(window, num_frames, hop_length, squared=True)
        env = jnp.maximum(env, 1e-10)

        def _run(re, im, w, envelope):
            spec = jax.lax.complex(re, im)
            frames_time = jnp.fft.irfft(
                jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1
            )
            out = overlap_add(frames_time * w, hop_length, n_fft)
            out = out / envelope
            if center:
                out = out[..., n_fft // 2 :]
            return out

        key = (n_fft, hop_length, win_length, center)
        fn = self._jitted.get(key)
        if fn is None:
            fn = jax.jit(_run)
            self._jitted[key] = fn
        out = fn(real_part, imag_part, window, env)
        if audio_length is not None:
            out = out[..., :audio_length]
        return out

    def clear_cache(self):
        self._jitted.clear()

    def cache_info(self):
        return {"jitted_configs": len(self._jitted)}


# ---------------------------------------------------------------------------
# Mel filterbank
# ---------------------------------------------------------------------------


def _hz_to_mel_np(freq, mel_scale: str):
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        return np.where(
            freq >= min_log_hz, min_log_mel + np.log(freq / min_log_hz) / logstep, mels
        )


def _mel_to_hz_np(mels, mel_scale: str):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )


@lru_cache(maxsize=None)
def _mel_filters_np(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float,
    f_max: Optional[float],
    norm: Optional[str],
    mel_scale: str,
    precise: bool,
) -> np.ndarray:
    """Build the (n_mels, n_fft//2+1) triangular filterbank on host.

    The reference computes float32 by default and float64 when `precise=True`
    (dsp.py:499-589 — the f64 path exists because ~5e-6 drift perturbs CTC
    decode in granite_speech_nar). On host we always build in float64 and, for
    the non-precise path, quantize intermediates to float32 to match the
    reference's float32 arithmetic closely enough for parity tests.
    """
    f_max = f_max or sample_rate / 2
    build_dtype = np.float64 if precise else np.float32

    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs, dtype=build_dtype)

    m_min = float(_hz_to_mel_np(f_min, mel_scale))
    m_max = float(_hz_to_mel_np(f_max, mel_scale))
    m_pts = np.linspace(m_min, m_max, n_mels + 2, dtype=build_dtype)
    f_pts = _mel_to_hz_np(m_pts, mel_scale).astype(build_dtype)

    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]

    down_slopes = (-slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes)).astype(build_dtype)

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :].astype(build_dtype)

    return np.moveaxis(fb, 0, 1).astype(np.float32)


def mel_filters(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0,
    f_max: Optional[float] = None,
    norm: Optional[str] = None,
    mel_scale: str = "htk",
    precise: bool = False,
) -> jnp.ndarray:
    """Triangular mel filterbank, shape (n_mels, n_fft // 2 + 1).

    Parity with reference `dsp.mel_filters` (dsp.py:499-589) including the
    float64 `precise` build path.
    """
    return jnp.asarray(
        _mel_filters_np(
            sample_rate, n_fft, n_mels, float(f_min), f_max, norm, mel_scale, precise
        )
    )


# ---------------------------------------------------------------------------
# Fused log-mel spectrogram (the shared STT/TTS/VAD/LID feature path)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _rdft_basis_np(n_fft: int) -> np.ndarray:
    """Real-DFT basis (n_fft, 2*(n_fft//2+1)): frames @ basis = [Re | Im].

    Expressing the small FFT as a matmul keeps the whole mel pipeline on the
    MXU and lets XLA fuse window/power/mel into one kernel chain — the
    TPU-native alternative to a radix FFT for n_fft <= ~2048.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.concatenate([np.cos(ang), np.sin(ang)], axis=1).astype(np.float32)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "n_mels", "sample_rate", "padding", "log_base", "mel_norm", "mel_scale", "precise", "log_floor_mode"),
)
def _log_mel_impl(
    audio: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    sample_rate: int,
    padding: int,
    log_base: str,
    mel_norm: Optional[str],
    mel_scale: str,
    precise: bool,
    log_floor_mode: str,
) -> jnp.ndarray:
    if padding > 0:
        cfg = [(0, 0)] * (audio.ndim - 1) + [(0, padding)]
        audio = jnp.pad(audio, cfg)
    audio = _pad_center(audio, n_fft // 2, "reflect")
    frames = frame_signal(audio, n_fft, hop_length) * window
    basis = jnp.asarray(_rdft_basis_np(n_fft))
    n_bins = n_fft // 2 + 1
    spec = jnp.dot(frames, basis, precision=jax.lax.Precision.HIGHEST)
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    fb = jnp.asarray(
        _mel_filters_np(sample_rate, n_fft, n_mels, 0.0, None, mel_norm, mel_scale, precise)
    )
    mel = jnp.dot(power, fb.T, precision=jax.lax.Precision.HIGHEST)
    if log_base == "log10_whisper":
        # Whisper-style: clamp, log10, dynamic-range compression
        logspec = jnp.log10(jnp.maximum(mel, 1e-10))
        logspec = jnp.maximum(logspec, logspec.max() - 8.0)
        return (logspec + 4.0) / 4.0
    if log_floor_mode == "clip":
        return jnp.log(jnp.maximum(mel, 1e-5))
    return jnp.log(mel + 1e-6)


def log_mel_spectrogram(
    audio,
    n_fft: int = 400,
    hop_length: int = 160,
    n_mels: int = 80,
    sample_rate: int = 16000,
    padding: int = 0,
    window: Union[str, jnp.ndarray] = "hann",
    periodic_window: bool = True,
    log_base: str = "log10_whisper",
    mel_norm: Optional[str] = None,
    mel_scale: str = "htk",
    precise: bool = False,
    log_floor_mode: str = "clip",
) -> jnp.ndarray:
    """Fused log-mel spectrogram: (..., T) -> (..., frames, n_mels).

    The shared feature front-end for Whisper-style STT, VAD, and LID. The
    whole chain (pad -> frame -> window -> DFT-as-matmul -> power -> mel ->
    log) compiles to a single XLA program dominated by two MXU matmuls.

    Defaults reproduce Whisper's `log_mel_spectrogram`
    (/root/reference/mlx_audio/stt/models/whisper/audio.py:41).
    """
    audio = jnp.asarray(audio, dtype=jnp.float32)
    if isinstance(window, str):
        fn = STR_TO_WINDOW_FN[window.lower()]
        w = fn(n_fft + 1)[:-1] if periodic_window else fn(n_fft)
    else:
        w = jnp.asarray(window)
    return _log_mel_impl(
        audio, w, n_fft, hop_length, n_mels, sample_rate, padding,
        log_base, mel_norm, mel_scale, precise, log_floor_mode,
    )


# ---------------------------------------------------------------------------
# 1-D linear filtering + BS.1770 loudness (host/numpy domain, like reference)
# ---------------------------------------------------------------------------


def lfilter(b, a, data) -> np.ndarray:
    """1-D causal IIR/FIR filter (direct-form II transposed).

    Host-side utility matching reference `dsp.lfilter` (dsp.py:158-200);
    delegates to scipy when available for speed.
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    data = np.asarray(data)
    if data.ndim != 1:
        raise ValueError("dsp.lfilter only supports 1-D input")
    if a.size == 0 or a[0] == 0:
        raise ValueError("filter denominator must have a non-zero leading term")
    if b.size == 0:
        return np.zeros_like(data)
    try:
        from scipy.signal import lfilter as _sp_lfilter

        return _sp_lfilter(b, a, data.astype(np.float64))
    except Exception:
        pass
    b = b / a[0]
    a = a / a[0]
    y = np.empty(data.shape[0], dtype=np.float64)
    state = np.zeros(max(len(a), len(b)) - 1, dtype=np.float64)
    if state.size == 0:
        return b[0] * data
    nb, na, ns = len(b), len(a), state.size
    for i, sample in enumerate(data.astype(np.float64)):
        out = b[0] * sample + state[0]
        for j in range(1, ns):
            ff = b[j] * sample if j < nb else 0.0
            fb = a[j] * out if j < na else 0.0
            state[j - 1] = state[j] + ff - fb
        ff = b[ns] * sample if ns < nb else 0.0
        fb = a[ns] * out if ns < na else 0.0
        state[-1] = ff - fb
        y[i] = out
    return y


def _biquad(gain_db, q, center_freq, rate, kind):
    amp = 10.0 ** (gain_db / 40.0)
    omega = 2.0 * math.pi * center_freq / rate
    alpha = math.sin(omega) / (2.0 * q)
    cw = math.cos(omega)
    if kind == "high_shelf":
        sq = 2.0 * math.sqrt(amp) * alpha
        b0 = amp * ((amp + 1) + (amp - 1) * cw + sq)
        b1 = -2 * amp * ((amp - 1) + (amp + 1) * cw)
        b2 = amp * ((amp + 1) + (amp - 1) * cw - sq)
        a0 = (amp + 1) - (amp - 1) * cw + sq
        a1 = 2 * ((amp - 1) - (amp + 1) * cw)
        a2 = (amp + 1) - (amp - 1) * cw - sq
    elif kind == "high_pass":
        b0 = (1 + cw) / 2
        b1 = -(1 + cw)
        b2 = (1 + cw) / 2
        a0 = 1 + alpha
        a1 = -2 * cw
        a2 = 1 - alpha
    else:
        raise ValueError(f"Unsupported filter type: {kind}")
    return np.array([b0, b1, b2]) / a0, np.array([a0, a1, a2]) / a0


def _k_weight(data: np.ndarray, rate: int) -> np.ndarray:
    out = np.array(data, dtype=np.float64, copy=True)
    hs_b, hs_a = _biquad(4.0, 1 / math.sqrt(2), 1500.0, rate, "high_shelf")
    hp_b, hp_a = _biquad(0.0, 0.5, 38.0, rate, "high_pass")
    for ch in range(out.shape[1]):
        out[:, ch] = lfilter(hs_b, hs_a, out[:, ch])
        out[:, ch] = lfilter(hp_b, hp_a, out[:, ch])
    return out


def integrated_loudness(
    data: np.ndarray,
    rate: int,
    block_size: float = 0.400,
    overlap: float = 0.75,
) -> float:
    """Integrated loudness in LUFS per ITU-R BS.1770 (K-weighting + gating).

    Parity with reference `dsp.integrated_loudness` (dsp.py:224-340); the
    per-block mean-square here is vectorized with a cumulative sum instead of
    the reference's double loop.
    """
    data = np.asarray(data)
    if not np.issubdtype(data.dtype, np.floating):
        raise ValueError("Data must be floating point.")
    if data.ndim == 2 and data.shape[1] > 5:
        raise ValueError("Audio must have five channels or less.")
    if data.shape[0] < block_size * rate:
        raise ValueError("Audio must have length greater than the block size.")

    x = data.reshape(data.shape[0], 1) if data.ndim == 1 else data
    x = _k_weight(x, rate)
    num_ch = x.shape[1]
    gains = np.array([1.0, 1.0, 1.0, 1.41, 1.41])[:num_ch]
    abs_thresh = -70.0
    step = 1.0 - overlap

    dur = x.shape[0] / rate
    num_blocks = int(np.round((dur - block_size) / (block_size * step)) + 1)
    blk = int(block_size * rate)
    csum = np.concatenate(
        [np.zeros((1, num_ch)), np.cumsum(np.square(x), axis=0)], axis=0
    )
    lowers = (block_size * np.arange(num_blocks) * step * rate).astype(np.int64)
    uppers = np.minimum(lowers + blk, x.shape[0])
    ms = (csum[uppers] - csum[lowers]) / (block_size * rate)  # (blocks, ch)

    with np.errstate(divide="ignore", invalid="ignore"):
        block_loud = -0.691 + 10.0 * np.log10(np.sum(ms * gains, axis=1))
    gated = block_loud >= abs_thresh
    with np.errstate(divide="ignore", invalid="ignore"):
        gms = np.array([np.mean(ms[gated, c]) if gated.any() else np.nan for c in range(num_ch)])
        rel_thresh = -0.691 + 10.0 * np.log10(np.sum(gains * gms)) - 10.0
    gated = (block_loud > rel_thresh) & (block_loud > abs_thresh)
    gms = np.nan_to_num(
        np.array([np.mean(ms[gated, c]) if gated.any() else np.nan for c in range(num_ch)])
    )
    with np.errstate(divide="ignore"):
        return float(-0.691 + 10.0 * np.log10(np.sum(gains * gms)))


def normalize_loudness(
    data: np.ndarray, input_loudness: float, target_loudness: float
) -> np.ndarray:
    """Gain audio from measured to target LUFS (reference dsp.py:340-354)."""
    gain = 10.0 ** ((target_loudness - input_loudness) / 20.0)
    out = gain * data
    if np.max(np.abs(out)) >= 1.0:
        warnings.warn("Possible clipped samples in output.")
    return out


def normalize_peak(data: np.ndarray, target_peak_db: float) -> np.ndarray:
    """Normalize audio to target peak dBFS (reference dsp.py:357-365)."""
    gain = 10.0 ** (target_peak_db / 20.0) / np.max(np.abs(data))
    out = gain * data
    if np.max(np.abs(out)) >= 1.0:
        warnings.warn("Possible clipped samples in output.")
    return out


# ---------------------------------------------------------------------------
# Kaldi-compatible features (used by mossformer2_se and friends)
# ---------------------------------------------------------------------------


def mel_scale_kaldi(freq):
    """Hz -> mel, Kaldi formula (reference dsp.py:781)."""
    return 1127.0 * jnp.log(1.0 + jnp.asarray(freq) / 700.0)


def inverse_mel_scale_kaldi(mel_freq):
    """Mel -> Hz, Kaldi formula (reference dsp.py:786)."""
    return 700.0 * (jnp.exp(jnp.asarray(mel_freq) / 1127.0) - 1.0)


def _next_power_of_2(x: int) -> int:
    return 1 if x == 0 else 2 ** (x - 1).bit_length()


@lru_cache(maxsize=None)
def _mel_banks_kaldi_np(
    num_bins: int,
    window_length_padded: int,
    sample_freq: float,
    low_freq: float,
    high_freq: float,
):
    assert num_bins > 3, "Must have at least 3 mel bins"
    assert window_length_padded % 2 == 0
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq += nyquist
    assert (0.0 <= low_freq < nyquist) and (0.0 < high_freq <= nyquist)

    def m(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def im(mel):
        return 700.0 * (np.exp(np.asarray(mel, dtype=np.float64) / 1127.0) - 1.0)

    fft_bin_width = sample_freq / window_length_padded
    mel_low = float(m(low_freq))
    mel_high = float(m(high_freq))
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins, dtype=np.float64)[:, None]
    left = mel_low + bin_idx * mel_delta
    center = mel_low + (bin_idx + 1.0) * mel_delta
    right = mel_low + (bin_idx + 2.0) * mel_delta
    center_freqs = im(center)
    mel = m(fft_bin_width * np.arange(num_fft_bins))[None, :]
    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    bins = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
    return bins, center_freqs.squeeze().astype(np.float32)


def get_mel_banks_kaldi(
    num_bins: int,
    window_length_padded: int,
    sample_freq: float,
    low_freq: float,
    high_freq: float,
):
    """Kaldi mel filterbank (num_bins, n_fft//2) + center freqs.

    Parity with reference dsp.py:819-868.
    """
    bins, cf = _mel_banks_kaldi_np(
        num_bins, window_length_padded, float(sample_freq), float(low_freq), float(high_freq)
    )
    return jnp.asarray(bins), jnp.asarray(cf)


def compute_deltas_kaldi(
    specgram: jnp.ndarray, win_length: int = 5, mode: str = "edge"
) -> jnp.ndarray:
    """Delta coefficients over the time axis (..., freq, time).

    Parity with reference dsp.py:732-778 — but vectorized as a depthwise 1-D
    convolution instead of a Python loop over time steps.
    """
    if win_length < 3:
        raise ValueError(f"win_length should be >= 3, got {win_length}")
    specgram = jnp.asarray(specgram)
    shape = specgram.shape
    x = specgram.reshape(-1, shape[-1])
    n = (win_length - 1) // 2
    denom = float(n * (n + 1) * (2 * n + 1)) / 3.0
    if mode == "edge":
        pad_l = jnp.repeat(x[:, :1], n, axis=1)
        pad_r = jnp.repeat(x[:, -1:], n, axis=1)
        xp = jnp.concatenate([pad_l, x, pad_r], axis=1)
    else:
        xp = jnp.pad(x, [(0, 0), (n, n)])
    # XLA convs are cross-correlations — no kernel flip needed.
    kernel = jnp.arange(-n, n + 1, dtype=xp.dtype) / denom
    out = jax.lax.conv_general_dilated(
        xp[:, None, :],
        kernel[None, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
    )[:, 0, :]
    return out.reshape(shape)


def _get_strided_kaldi(
    waveform: jnp.ndarray, window_size: int, window_shift: int, snip_edges: bool
) -> jnp.ndarray:
    num_samples = waveform.shape[0]
    if snip_edges:
        if num_samples < window_size:
            return jnp.zeros((0, 0))
        m = 1 + (num_samples - window_size) // window_shift
        return frame_signal(waveform, window_size, window_shift)
    m = (num_samples + (window_shift // 2)) // window_shift
    pad = window_size // 2 - window_shift // 2
    if pad > 0:
        pad_left = jnp.flip(waveform[1 : pad + 1])
        pad_right = jnp.flip(waveform)[:pad] if pad > 1 else waveform[-1:]
        waveform = jnp.concatenate([pad_left, waveform, pad_right])
    else:
        waveform = jnp.concatenate([waveform[-pad:], jnp.flip(waveform)])
    needed = (m - 1) * window_shift + window_size
    if waveform.shape[0] < needed:
        waveform = jnp.pad(waveform, (0, needed - waveform.shape[0]), mode="edge")
    return frame_signal(waveform, window_size, window_shift)[:m]


def compute_fbank_kaldi(
    waveform,
    sample_rate: int = 48000,
    win_len: int = 1920,
    win_inc: int = 384,
    num_mels: int = 60,
    win_type: str = "hamming",
    preemphasis: float = 0.97,
    dither: float = 1.0,
    snip_edges: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Kaldi-compatible log mel-filterbank features, (time, num_mels).

    Parity with reference dsp.py:870-969. Dither requires an explicit PRNG
    `key` under JAX; with key=None a fixed seed is used (deterministic).
    """
    waveform = jnp.asarray(waveform, dtype=jnp.float32)
    if waveform.ndim == 2:
        waveform = waveform[0]

    window_shift = int(sample_rate * (win_inc / sample_rate * 1000) * 0.001)
    window_size = int(sample_rate * (win_len / sample_rate * 1000) * 0.001)
    padded = _next_power_of_2(window_size)

    frames = _get_strided_kaldi(waveform, window_size, window_shift, snip_edges)
    if frames.shape[0] == 0:
        return jnp.zeros((0, num_mels))

    if dither != 0.0:
        if key is None:
            key = jax.random.PRNGKey(0)
        frames = frames + jax.random.normal(key, frames.shape) * dither

    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    if preemphasis != 0.0:
        first = frames[:, :1]
        rest = frames[:, 1:] - preemphasis * frames[:, :-1]
        frames = jnp.concatenate([first, rest], axis=1)

    if win_type in ("hamming", "hanning", "povey"):
        w = _window_np({"hanning": "hann"}.get(win_type, win_type), window_size, False)
        frames = frames * jnp.asarray(w)

    if padded != window_size:
        frames = jnp.pad(frames, [(0, 0), (0, padded - window_size)])

    if frames.shape[1] != padded:
        frames = jnp.pad(frames, [(0, 0), (0, padded - frames.shape[1])])
    spectrum = rfft_power(frames)  # complex fused in-jit (TPU-safe eager)
    mel_banks, _ = get_mel_banks_kaldi(
        num_mels, padded, float(sample_rate), low_freq, high_freq
    )
    mel_banks = jnp.pad(mel_banks, [(0, 0), (0, 1)])
    feats = spectrum @ mel_banks.T
    return jnp.log(jnp.maximum(feats, 1e-8))
