"""Radial (focus-of-expansion) flow-magnitude normalization.

In straight forward flight the optical-flow magnitude grows with distance
from the focus of expansion (frame center under the reference's operating
envelope, README.md:5); the reference compensates by dividing by
5 + sqrt(dist_to_center) and re-scaling by 30 (pathfinder_viewer.py:164-166,
DenseOF.py:200-204). After this, an unusually large magnitude means
"close obstacle", independent of image position.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import NormalizeParams


def radial_normalize(
    modulus: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    half_w: float,
    half_h: float,
    params: NormalizeParams = NormalizeParams(),
) -> jnp.ndarray:
    """modulus / (offset + sqrt(dist_to_center)) * gain, elementwise."""
    dist_center = jnp.sqrt((half_w - x) ** 2 + (half_h - y) ** 2)
    return modulus / (params.offset + jnp.sqrt(dist_center)) * params.gain


def radial_normalize_dense(
    flow: jnp.ndarray, params: NormalizeParams = NormalizeParams()
) -> jnp.ndarray:
    """Dense variant over an (H, W, 2) flow field: returns normalized
    magnitude (H, W) — the dense-flow analog of the grid pipeline."""
    h, w = flow.shape[:2]
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype), indexing="ij"
    )
    m = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    return radial_normalize(m, xs, ys, int(w / 2), int(h / 2), params)
