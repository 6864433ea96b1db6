"""Variance stream filters for the KF measurement covariance.

TPU-native replacement for the reference's host-side smoothing
(max-sliding-window: svn-icp/include/core/SignalSmoother.h:32-59;
mean window over the covariance buffer: OdometryPipeline.cpp:798-810).
Both are expressed as fixed-size ring buffers living inside the jitted
pipeline state, so filtering costs one masked reduction — no deque, no host.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VarianceRings(NamedTuple):
    """Ring buffers over per-dimension variances [W,6] + fill counters."""

    mean_ring: jax.Array    # [W_mean,6] raw (unscaled) ICP variances
    max_ring: jax.Array     # [W_max,6] scaled ICP variances
    count: jax.Array        # scalar int32 frames pushed so far


def create(mean_window: int = 20, max_window: int = 10, dtype=jnp.float32) -> VarianceRings:
    return VarianceRings(
        mean_ring=jnp.zeros((mean_window, 6), dtype),
        max_ring=jnp.zeros((max_window, 6), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def push(rings: VarianceRings, raw_var: jax.Array, scaled_var: jax.Array) -> VarianceRings:
    """Append this frame's variances (overwrite oldest slot)."""
    wm = rings.mean_ring.shape[0]
    wx = rings.max_ring.shape[0]
    i_mean = rings.count % wm
    i_max = rings.count % wx
    return VarianceRings(
        mean_ring=rings.mean_ring.at[i_mean].set(raw_var),
        max_ring=rings.max_ring.at[i_max].set(scaled_var),
        count=rings.count + 1,
    )


def mean_filtered(rings: VarianceRings) -> jax.Array:
    """Mean of the last `W_mean` raw variances (ref: cov_smoother,
    OdometryPipeline.cpp:798-810 — averages over min(count, window))."""
    wm = rings.mean_ring.shape[0]
    n = jnp.minimum(rings.count, wm)
    slot = jnp.arange(wm, dtype=jnp.int32)
    filled = slot < n
    total = jnp.sum(jnp.where(filled[:, None], rings.mean_ring, 0.0), axis=0)
    return total / jnp.maximum(n, 1).astype(rings.mean_ring.dtype)


def max_filtered(rings: VarianceRings) -> jax.Array:
    """Max over the last `W_max` scaled variances (ref: MaxSlidingWindow,
    SignalSmoother.h:32-59)."""
    wx = rings.max_ring.shape[0]
    n = jnp.minimum(rings.count, wx)
    slot = jnp.arange(wx, dtype=jnp.int32)
    filled = slot < n
    return jnp.max(jnp.where(filled[:, None], rings.max_ring, -jnp.inf), axis=0)
