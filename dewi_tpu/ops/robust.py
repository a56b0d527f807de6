"""Robust-statistics kernels: median / MAD / quantiles as fused XLA ops.

The reference computes these per signal key with numpy over Python dict rows
(reference scorer.py:18-26, robust.py:21-28, local_weights.py:17-26).  Here
the whole fit is one jitted computation over an ``[N, K]`` column matrix —
one sort per column on-device, no host round trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAD_CONSISTENCY = 1.4826  # MAD -> sigma for a normal distribution
MAD_FLOOR = 1e-8


@jax.jit
def median_mad(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-column median and MAD of an ``[N, K]`` matrix.

    MAD is floored at ``1e-8`` exactly when it is zero, matching the
    reference's ``median(...) or 1e-8`` fit-time semantics
    (reference scorer.py:23-25).
    """
    x = x.astype(jnp.float32)
    med = jnp.median(x, axis=0)
    mad = jnp.median(jnp.abs(x - med[None, :]), axis=0)
    mad = jnp.where(mad == 0.0, MAD_FLOOR, mad)
    return med, mad


@jax.jit
def robust_z(x: jax.Array, med: jax.Array, mad: jax.Array) -> jax.Array:
    """``z = (x - med) / (1.4826 * mad)`` broadcast over rows."""
    return (x - med) / (MAD_CONSISTENCY * mad)


@jax.jit
def local_weights_kernel(s: jax.Array) -> jax.Array:
    """Per-token/per-patch surprisal -> positive weights.

    Robust z (with additive ``+1e-8`` MAD epsilon — the reference's
    local_weights.py:21 uses ``mad + eps``, unlike the scorer's ``or eps``),
    clip to ±5, then softplus via ``log1p(exp(z))``.
    """
    s = s.astype(jnp.float32)
    med = jnp.median(s)
    mad = jnp.median(jnp.abs(s - med)) + MAD_FLOOR
    z = (s - med) / (MAD_CONSISTENCY * mad)
    z = jnp.clip(z, -5.0, 5.0)
    return jnp.log1p(jnp.exp(z))


@partial(jax.jit, static_argnames=("axis",))
def quantiles(x: jax.Array, qs: jax.Array, axis: int = -1) -> jax.Array:
    """Linear-interpolation quantiles, matching ``np.quantile`` defaults."""
    return jnp.quantile(x.astype(jnp.float32), qs, axis=axis)


@jax.jit
def masked_mean_and_quantiles(
    values: jax.Array, mask: jax.Array, qs: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Row-wise mean and quantiles of ``values [B, T]`` under ``mask [B, T]``.

    Used for padded/bucketed per-token surprisal batches: padding positions
    are excluded from both the mean and the quantile estimate.  Quantiles use
    the same linear interpolation as ``np.quantile`` computed on the sorted
    valid prefix of each row (invalid entries are sorted to the tail with
    ``+inf`` and never touched by the gather).
    """
    values = values.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    raw_counts = jnp.sum(mask, axis=1)
    counts = jnp.maximum(raw_counts, 1.0)
    mean = jnp.sum(values * mask, axis=1) / counts

    big = jnp.float32(jnp.finfo(jnp.float32).max)
    sorted_vals = jnp.sort(jnp.where(mask > 0, values, big), axis=1)
    # Linear interpolation index per (row, q): pos = q * (n - 1)
    pos = qs[None, :] * (counts[:, None] - 1.0)  # [B, Q]
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    v_lo = jnp.take_along_axis(sorted_vals, lo, axis=1)
    v_hi = jnp.take_along_axis(sorted_vals, hi, axis=1)
    q_vals = v_lo + frac * (v_hi - v_lo)
    # Rows with no valid entries report 0 (never the +inf sort sentinel).
    empty = (raw_counts == 0.0)[:, None]
    return mean, jnp.where(empty, 0.0, q_vals)
