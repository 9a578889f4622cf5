"""Dense Farneback flow — the reference's `calculate_optical_flow`
(DenseOF.py:127-157) as a batch-first jittable op."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import FarnebackParams
from ..ops.farneback import farneback


def farneback_flow(
    prev_gray: jnp.ndarray,
    gray: jnp.ndarray,
    params: FarnebackParams = FarnebackParams(),
) -> jnp.ndarray:
    """(…, H, W) grayscale pair -> (…, H, W, 2) dense flow.

    Leading batch dims are vmapped (one stream per batch row — the
    stream-DP axis in parallel/streams.py)."""
    if prev_gray.ndim == 2:
        return farneback(prev_gray, gray, params)
    fn = lambda a, b: farneback(a, b, params)
    for _ in range(prev_gray.ndim - 2):
        fn = jax.vmap(fn)
    return fn(prev_gray, gray)
