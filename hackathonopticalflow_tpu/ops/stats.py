"""Robust reduction statistics.

The reference filters flow vectors with full-frame median / 99th-percentile
reductions (pathfinder_viewer.py:173, DenseOF.py:228) and computes 256-bin
histograms (Operations.py:218). These are the single-device versions; the
distributed (tiled) counterparts live in parallel/quantile.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def median(x: jnp.ndarray) -> jnp.ndarray:
    """np.median parity (average of middle pair for even N)."""
    return jnp.median(x)


def percentile(x: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.percentile parity (linear interpolation)."""
    return jnp.percentile(x, q)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over elements where mask is True (static shape; sorts with
    +inf padding). Needed because jit pipelines carry fixed-size point sets
    with validity masks instead of ragged arrays."""
    n = jnp.sum(mask)
    vals = jnp.sort(jnp.where(mask, x, jnp.inf))
    hi = jnp.clip((n // 2).astype(jnp.int32), 0, x.shape[0] - 1)
    lo = jnp.clip(hi - (1 - n % 2), 0, x.shape[0] - 1)
    return 0.5 * (vals[lo] + vals[hi])


def masked_percentile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.percentile(x[mask], q) with static shapes."""
    n = jnp.sum(mask)
    vals = jnp.sort(jnp.where(mask, x, jnp.inf))
    pos = (q / 100.0) * (n - 1).astype(jnp.float32)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, x.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    take_hi = jnp.where(hi < n, vals[hi], vals[jnp.clip(n - 1, 0, x.shape[0] - 1)])
    return vals[lo] * (1 - frac) + take_hi * frac


def histogram256(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.calcHist parity for uint8 data: 256 bins over [0, 256)."""
    xi = jnp.clip(x.astype(jnp.int32), 0, 255).reshape(-1)
    return jnp.zeros((256,), jnp.int32).at[xi].add(1)
