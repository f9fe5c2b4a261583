"""Piecewise rational-quadratic spline flows (VITS SDP).

Parity: reference tts/models/melotts/transforms.py — unconstrained
linear-tail spline (:50-98), monotonic rational quadratic spline
(:100-211) following Durkan et al. Neural Spline Flows.

Implemented with fully vectorized jnp ops (one-hot bin gather instead of
host-side searchsorted) so the SDP flows trace into a single XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def piecewise_rational_quadratic_transform(
        inputs: Array, unnormalized_widths: Array,
        unnormalized_heights: Array, unnormalized_derivatives: Array,
        inverse: bool = False, tails: str = "linear",
        tail_bound: float = 5.0):
    if tails != "linear":
        raise NotImplementedError(tails)
    return unconstrained_rational_quadratic_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=inverse, tail_bound=tail_bound)


def unconstrained_rational_quadratic_spline(
        inputs: Array, unnormalized_widths: Array,
        unnormalized_heights: Array, unnormalized_derivatives: Array,
        inverse: bool = False, tail_bound: float = 5.0):
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # pad derivatives so boundary derivative == 1 (linear tails)
    constant = jnp.log(jnp.exp(1.0 - DEFAULT_MIN_DERIVATIVE) - 1.0)
    d = jnp.pad(unnormalized_derivatives,
                [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
                constant_values=constant)

    out_in, logdet_in = rational_quadratic_spline(
        jnp.clip(inputs, -tail_bound, tail_bound), unnormalized_widths,
        unnormalized_heights, d, inverse=inverse,
        left=-tail_bound, right=tail_bound, bottom=-tail_bound,
        top=tail_bound)
    outputs = jnp.where(inside, out_in, inputs)
    logabsdet = jnp.where(inside, logdet_in, 0.0)
    return outputs, logabsdet


def rational_quadratic_spline(
        inputs: Array, unnormalized_widths: Array,
        unnormalized_heights: Array, unnormalized_derivatives: Array,
        inverse: bool = False, left: float = -1.0, right: float = 1.0,
        bottom: float = -1.0, top: float = 1.0,
        min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
        min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
        min_derivative: float = DEFAULT_MIN_DERIVATIVE):
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths,
                        [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights,
                         [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bins = cumheights if inverse else cumwidths
    # bin index: number of bin edges (excluding the last) <= input
    idx = jnp.sum((bins[..., :-1] <= inputs[..., None]).astype(jnp.int32),
                  axis=-1) - 1
    idx = jnp.clip(idx, 0, num_bins - 1)
    onehot = jax.nn.one_hot(idx, num_bins, dtype=inputs.dtype)

    def pick(v):
        return jnp.sum(v * onehot, axis=-1)

    in_cumwidths = pick(cumwidths[..., :-1])
    in_widths = pick(widths)
    in_cumheights = pick(cumheights[..., :-1])
    in_heights = pick(heights)
    delta = in_heights / in_widths
    in_derivs = pick(derivatives[..., :-1])
    in_derivs_p1 = pick(derivatives[..., 1:])

    if inverse:
        a = ((inputs - in_cumheights) *
             (in_derivs + in_derivs_p1 - 2 * delta) + in_heights *
             (delta - in_derivs))
        b = (in_heights * in_derivs - (inputs - in_cumheights) *
             (in_derivs + in_derivs_p1 - 2 * delta))
        c = -delta * (inputs - in_cumheights)
        disc = b * b - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
        outputs = root * in_widths + in_cumwidths
        theta_1m = root * (1 - root)
        denom = delta + (in_derivs + in_derivs_p1 - 2 * delta) * theta_1m
        deriv_num = delta ** 2 * (
            in_derivs_p1 * root ** 2 + 2 * delta * theta_1m +
            in_derivs * (1 - root) ** 2)
        logabsdet = -(jnp.log(deriv_num) - 2 * jnp.log(denom))
        return outputs, logabsdet

    theta = (inputs - in_cumwidths) / in_widths
    theta_1m = theta * (1 - theta)
    numerator = in_heights * (delta * theta ** 2 + in_derivs * theta_1m)
    denom = delta + (in_derivs + in_derivs_p1 - 2 * delta) * theta_1m
    outputs = in_cumheights + numerator / denom
    deriv_num = delta ** 2 * (
        in_derivs_p1 * theta ** 2 + 2 * delta * theta_1m +
        in_derivs * (1 - theta) ** 2)
    logabsdet = jnp.log(deriv_num) - 2 * jnp.log(denom)
    return outputs, logabsdet
