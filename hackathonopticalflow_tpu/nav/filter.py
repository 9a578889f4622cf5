"""Robust statistical filtering of normalized flow magnitudes.

Viewer variant (pathfinder_viewer.py:173):
    keep  median(m) * 1.0 < m < percentile(m, 99)
DenseOF prototype variant (DenseOF.py:228):
    keep  m > median(m) * 1.2
Surviving vectors mark danger points (close obstacles).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import FilterParams
from ..ops.stats import median, percentile, masked_median, masked_percentile


def robust_mask(modulus: jnp.ndarray, params: FilterParams = FilterParams()) -> jnp.ndarray:
    """Boolean keep-mask over magnitudes (np.median/np.percentile parity)."""
    lo = median(modulus) * params.median_factor
    mask = modulus > lo
    if params.upper_percentile is not None:
        mask = mask & (modulus < percentile(modulus, params.upper_percentile))
    return mask


def robust_mask_masked(
    modulus: jnp.ndarray, valid: jnp.ndarray, params: FilterParams = FilterParams()
) -> jnp.ndarray:
    """Variant whose statistics ignore invalid entries (fixed-capacity point
    tables in jit pipelines)."""
    lo = masked_median(modulus, valid) * params.median_factor
    mask = valid & (modulus > lo)
    if params.upper_percentile is not None:
        mask = mask & (modulus < masked_percentile(modulus, valid, params.upper_percentile))
    return mask
