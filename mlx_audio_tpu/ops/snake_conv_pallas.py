"""Fused AdaIN + Snake + dilated-conv1d Pallas TPU kernel.

The ISTFTNet generator (tts/models/kokoro/istftnet.py, parity with
reference istftnet.py:341-397) spends its time in residual blocks of the
form

    h = adain(x); h = snake(h); h = conv1d(h, k, dilation)

at audio-adjacent rates (~1M rows x 128/256 channels). Lowered through
XLA each of the three stages is a separate full HBM pass (plus the conv's
unfold re-reads), measured at ~8 ms per stage on v5e — 12x off the
bandwidth bound. This kernel streams x through VMEM once per conv:

    HBM --DMA--> VMEM slab (block + halo rows)
      VPU: h = x*scale + shift            (AdaIN with IN stats folded in)
           h = h + inv_alpha*sin(alpha*h)^2     (Snake, bf16 like the XLA path)
           mask rows outside [0, valid_len)
      MXU: out = sum_j h[j*dil : j*dil+block] @ w[j]   (k shifted dots)
    VMEM --> HBM (blocked out_spec)

Instance-norm statistics are a global reduction over the time axis, so
they stay an XLA one-pass reduce (E[x], E[x^2]) outside the kernel; the
resulting per-(batch, channel) normalize+affine folds into `scale` and
`shift`:  adain(x) = x*scale + shift  with  scale = (1+gamma)*rsqrt(var),
shift = beta - mean*scale.

Weights layout matches nn.layers conv1d: WIO (k, C_in, C_out).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adain_snake_conv1d", "fold_adain", "use_fused_snake_conv"]


def use_fused_snake_conv(x: jnp.ndarray) -> bool:
    """The kernel needs a TPU backend and lane-aligned channels.

    Allowlist, not a cpu-denylist: the pltpu memory spaces / semaphores
    only lower through Mosaic, so a GPU (or any other) backend must take
    the XLA fallback path. 'axon' is a tunnelled TPU and lowers Mosaic."""
    return (jax.default_backend() in ("tpu", "axon")
            and x.ndim == 3 and x.shape[-1] % 128 == 0)


def fold_adain(mean, var, gamma, beta, eps: float = 1e-5):
    """Fold instance-norm stats + AdaIN affine into one scale/shift pair:
    (1+gamma)*(x-mean)*rsqrt(var+eps) + beta == x*scale + shift."""
    r = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = (1.0 + gamma.astype(jnp.float32)) * r
    shift = beta.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return scale, shift


def _slab_height(block_t: int, halo: int) -> int:
    """Rows DMA'd per block: block + both halos, rounded up to the 16-row
    sublane tile (Mosaic requires HBM slice heights aligned to tiling)."""
    return -(-(block_t + 2 * halo) // 16) * 16


def _kernel(valid_ref, x_ref, p_ref, w_ref, o_ref, slab, sem, *,
            k: int, dil: int, block_t: int, halo: int, cdtype):
    i = pl.program_id(1)
    slab_h = _slab_height(block_t, halo)

    pltpu.make_async_copy(
        x_ref.at[pl.program_id(0), pl.ds(i * block_t, slab_h), :],
        slab, sem).start()

    p = p_ref[0]                      # (5, C) f32
    scale = p[0]
    shift = p[1]
    alpha = p[2]
    inv_alpha = p[3]
    bias = p[4]                       # f32, added on the f32 accumulator

    pltpu.make_async_copy(
        x_ref.at[pl.program_id(0), pl.ds(i * block_t, slab_h), :],
        slab, sem).wait()

    vlen = valid_ref[pl.program_id(0), 0]
    c = slab.shape[-1]
    # AdaIN affine + Snake in f32 on the VPU (Mosaic has no bf16 sin);
    # rows outside the valid span zero out so the conv sees the same zero
    # padding XLA's 'same' pads do.
    xb = slab[:].astype(jnp.float32)
    h = xb * scale[None, :] + shift[None, :]
    h = h + inv_alpha[None, :] * jnp.sin(alpha[None, :] * h) ** 2
    g = jax.lax.broadcasted_iota(jnp.int32, (slab_h, c), 0) + i * block_t
    h = jnp.where((g >= halo) & (g < halo + vlen), h, 0.0).astype(cdtype)

    acc = jnp.zeros((block_t, c), jnp.float32)
    for j in range(k):
        acc = acc + jnp.dot(h[j * dil : j * dil + block_t, :], w_ref[j],
                            preferred_element_type=jnp.float32)
    t = jax.lax.broadcasted_iota(jnp.int32, (block_t, c), 0) + i * block_t
    o_ref[0] = jnp.where(t < vlen, acc + bias[None, :], 0.0).astype(
        o_ref.dtype)


@partial(jax.jit, static_argnames=("dilation", "block_t", "interpret"))
def adain_snake_conv1d(
    x: jnp.ndarray,            # (B, T, C) activation
    scale: jnp.ndarray,        # (B, C) f32 — folded IN*(1+gamma)
    shift: jnp.ndarray,        # (B, C) f32 — folded beta - mean*scale
    alpha: jnp.ndarray,        # (C,) snake alpha
    w: jnp.ndarray,            # (k, C, C) WIO conv weight
    bias: Optional[jnp.ndarray] = None,   # (C,)
    *,
    dilation: int = 1,
    valid_len: Optional[jnp.ndarray] = None,  # (B,) i32; None -> all T
    block_t: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """conv1d(snake(x*scale + shift), w, padding='same', dilation) + bias.

    Rows at/after `valid_len` are zeroed both entering the conv and in the
    output (the generator's `_mask` semantics). Returns (B, T, C) in
    x.dtype.
    """
    b, t, c = x.shape
    k = w.shape[0]
    halo = (k - 1) // 2 * dilation
    nb = -(-t // block_t)
    t_pad = nb * block_t
    cdtype = x.dtype

    # left pad = exact halo (tap arithmetic); right pad covers the last
    # block's tile-aligned slab DMA.
    slab_h = _slab_height(block_t, halo)
    right = (t_pad - t) + (slab_h - block_t - halo)
    xp = jnp.pad(x, ((0, 0), (halo, right), (0, 0)))
    alpha_f = alpha.astype(jnp.float32).reshape(-1)
    inv_alpha = 1.0 / alpha_f
    bias_f = (jnp.zeros((c,), jnp.float32) if bias is None
              else bias.astype(jnp.float32).reshape(-1))
    params = jnp.stack([
        scale.astype(jnp.float32),
        shift.astype(jnp.float32),
        jnp.broadcast_to(alpha_f, (b, c)),
        jnp.broadcast_to(inv_alpha, (b, c)),
        jnp.broadcast_to(bias_f, (b, c)),
    ], axis=1)                                    # (B, 5, C)
    # (B, 1) rather than (B,): Mosaic requires rank-1 blocks to cover the
    # whole array. The whole (B, 1) array lives in SMEM (unblocked spec —
    # a (1, 1) block fails Mosaic's tiling check for B > 1) and the kernel
    # picks its row by program_id.
    if valid_len is None:
        vlen = jnp.full((b, 1), t, jnp.int32)
    else:
        vlen = valid_len.astype(jnp.int32).reshape(b, 1)

    out = pl.pallas_call(
        partial(_kernel, k=k, dil=dilation, block_t=block_t, halo=halo,
                cdtype=cdtype),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 5, c), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((k, c, c), lambda bb, ii: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_t, c), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), cdtype),
        scratch_shapes=[
            pltpu.VMEM((slab_h, c), cdtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(vlen, xp, params, w.astype(cdtype))
    return out[:, :t, :]
