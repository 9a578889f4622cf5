"""Frame-to-frame relative pose from tracked feature correspondences.

The north-star extension of the reference's trajectory tracker
(SparseOF.py trajectories are exactly the correspondences this consumes
— SURVEY.md §3.3): an 8-point essential-matrix estimate with a fixed-
round RANSAC scored by Sampson error, followed by the cheirality
disambiguation of the four (R, t) decompositions. Everything is static-
shape jnp (SVD included), so the whole solver jits and vmaps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RelativePose(NamedTuple):
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,) unit norm (monocular scale gauge)
    E: jnp.ndarray  # (3, 3) essential matrix
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32


def _eight_point(p0: jnp.ndarray, p1: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point essential estimate from normalized coords (N, 2)."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    ones = jnp.ones_like(x0)
    # p1^T E p0 = 0, rows of A are kron(p1, p0)
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1
    )
    A = A * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    e = vt[-1].reshape(3, 3)
    # enforce the essential-matrix spectrum (1, 1, 0)
    u, s, vt2 = jnp.linalg.svd(e)
    return u @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ vt2


def _sampson(E: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """Sampson distance of homogeneous normalized correspondences."""
    h0 = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], axis=-1)
    h1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=-1)
    Ex0 = h0 @ E.T  # (N, 3) = E p0
    Etx1 = h1 @ E  # (N, 3) = E^T p1
    num = jnp.sum(h1 * Ex0, axis=-1) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _triangulate_depths(
    R: jnp.ndarray, t: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Midpoint-free two-view depths: solve z1*x1 = z0*R*x0 + t per point.
    Returns (z0, z1)."""
    h0 = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], axis=-1)
    h1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=-1)
    Rx0 = h0 @ R.T
    # least squares in (z0, z1): || z0 * Rx0 - z1 * h1 + t ||^2
    a = jnp.sum(Rx0 * Rx0, axis=-1)
    b = -jnp.sum(Rx0 * h1, axis=-1)
    c = jnp.sum(h1 * h1, axis=-1)
    d = -jnp.sum(Rx0 * t[None, :], axis=-1)
    e = jnp.sum(h1 * t[None, :], axis=-1)
    det = a * c - b * b
    z0 = (c * d - b * e) / jnp.maximum(det, 1e-12)
    z1 = (a * e - b * d) / jnp.maximum(det, 1e-12)
    return z0, z1


def decompose_essential(
    E: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray, w: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pick the (R, t) of the four decompositions with max cheirality
    support (weighted count of positive depths in both views)."""
    u, _, vt = jnp.linalg.svd(E)
    # keep proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    tt = u[:, 2]

    def support(R, t):
        z0, z1 = _triangulate_depths(R, t, p0, p1)
        return jnp.sum(w * ((z0 > 0) & (z1 > 0)))

    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([tt, -tt, tt, -tt])
    scores = jax.vmap(support)(cands_R, cands_t)
    best = jnp.argmax(scores)
    return cands_R[best], cands_t[best]


def estimate_relative_pose(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    ransac_rounds: int = 16,
    sample_size: int = 8,
    inlier_thresh: float = 1e-5,
    seed: int = 0,
) -> RelativePose:
    """Relative pose from normalized correspondences p0 -> p1 (N, 2).

    Fixed-round RANSAC (static shapes): each round fits an 8-point model
    on a random subset, scores by Sampson error; the best model's inliers
    feed a final weighted refit. `inlier_thresh` is in squared normalized
    coords (~(2 px / f)^2 by default for f~500).
    """
    n = p0.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    wv = valid.astype(jnp.float32)

    key = jax.random.PRNGKey(seed)
    # sample only VALID slots (the track table is a fixed-capacity pool —
    # uniform indices would fill most 8-point samples with dead slots and
    # fit degenerate models); categorical over the validity mask keeps
    # static shapes. Duplicates within a sample are possible but rare for
    # live counts >> 8, and merely reduce that round's effective rank.
    logits = jnp.where(valid, 0.0, -1e9)  # finite: all-invalid stays NaN-free
    idx = jax.random.categorical(
        key, logits, shape=(ransac_rounds, sample_size)
    )

    def fit_round(ids):
        w = jnp.zeros((n,), jnp.float32).at[ids].set(1.0) * wv
        E = _eight_point(p0, p1, w)
        d = _sampson(E, p0, p1)
        inl = (d < inlier_thresh) & valid
        return E, jnp.sum(inl)

    Es, scores = jax.vmap(fit_round)(idx)
    best = jnp.argmax(scores)
    E0 = Es[best]
    inl = (_sampson(E0, p0, p1) < inlier_thresh) & valid

    # final refit on inliers
    E = _eight_point(p0, p1, inl.astype(jnp.float32))
    d = _sampson(E, p0, p1)
    inl = (d < inlier_thresh) & valid
    R, t = decompose_essential(E, p0, p1, inl.astype(jnp.float32))
    return RelativePose(R=R, t=t, E=E, inliers=inl, n_inliers=jnp.sum(inl))
