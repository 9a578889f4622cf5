"""Focus-of-expansion estimation.

The reference hardcodes the FOE at the frame center (its radial
normalization divides by distance-to-center, pathfinder_viewer.py:164).
This module makes the FOE model explicit: under pure forward translation
flow vectors radiate from the FOE e, so each flow vector (p, f) constrains
e to the line through p with direction f. Least squares over all vectors:

    minimize sum_i w_i * || (e - p_i) x f_i / |f_i| ||^2

which is a 2x2 linear solve — a psum-friendly reduction that also works
tiled across devices (parallel/quantile.py pattern).
"""

from __future__ import annotations

import jax.numpy as jnp


def estimate_foe(
    pts: jnp.ndarray,
    flow: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares FOE from sparse flow.

    pts: (N, 2) point positions; flow: (N, 2) flow vectors;
    weights: optional (N,) confidence (e.g. the robust-filter mask).
    Returns (foe_xy (2,), mean squared line distance residual ()).
    """
    f = flow.astype(jnp.float32)
    p = pts.astype(jnp.float32)
    mag = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    d = f / jnp.maximum(mag, eps)
    # normal to the flow direction
    n = jnp.stack([-d[:, 1], d[:, 0]], axis=-1)
    w = jnp.ones(p.shape[0], jnp.float32) if weights is None else weights.astype(jnp.float32)
    w = w * (mag[:, 0] > eps)

    # sum_i w_i (n_i n_i^T) e = sum_i w_i n_i (n_i . p_i)
    nnT = jnp.einsum("n,ni,nj->ij", w, n, n)
    rhs = jnp.einsum("n,ni,n->i", w, n, jnp.sum(n * p, axis=-1))
    A = nnT + eps * jnp.eye(2, dtype=jnp.float32)
    e = jnp.linalg.solve(A, rhs)
    resid = jnp.sum(n * (e[None, :] - p), axis=-1)
    mean_sq = jnp.sum(w * resid * resid) / jnp.maximum(jnp.sum(w), 1.0)
    return e, mean_sq
