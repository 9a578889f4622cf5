"""Pyramidal LK golden tests vs cv2.calcOpticalFlowPyrLK
(the reference's core kernel, pathfinder_viewer.py:154-158).

EPE budget: BASELINE.json mandates <=0.5 px; the implementation actually
achieves ~1e-3 px on trackable points (fixed-point parity, see ops/lk.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hackathonopticalflow_tpu.core.config import LKParams
from hackathonopticalflow_tpu.core.grid import measurement_grid
from hackathonopticalflow_tpu.ops.lk import pyr_lk

from conftest import requires_cv2, HAVE_CV2

if HAVE_CV2:
    import cv2


def _cv_lk(a, b, pts, params):
    nxt, st, err = cv2.calcOpticalFlowPyrLK(
        a,
        b,
        pts.reshape(-1, 1, 2),
        None,
        winSize=params.win_size,
        maxLevel=params.max_level,
        criteria=(
            cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
            params.max_iters,
            params.eps,
        ),
    )
    return nxt.reshape(-1, 2), st.reshape(-1).astype(bool)


@requires_cv2
@pytest.mark.parametrize("win", [(45, 45), (15, 15)])
def test_lk_golden_grid(frame_pair_small, win):
    a, b = frame_pair_small
    h, w = a.shape
    params = LKParams(win_size=win)
    pts = measurement_grid(h, w, 30)
    cv_next, cv_st = _cv_lk(b, a, pts, params)  # backward, like the viewer
    res = jax.jit(lambda x, y, p: pyr_lk(x, y, p, params))(
        b.astype(np.float32), a.astype(np.float32), pts
    )
    ours = np.asarray(res.next_pts)
    st = np.asarray(res.status)
    assert (st == cv_st).mean() > 0.99
    both = st & cv_st
    epe = np.linalg.norm(ours - cv_next, axis=-1)[both]
    # chaotic far-beyond-window motions can diverge; the bulk must be exact
    assert np.median(epe) < 1e-3
    assert np.percentile(epe, 95) < 0.05
    assert epe.mean() < 0.5


@requires_cv2
def test_lk_fwd_bwd_gated_parity(frame_pair_small):
    """On points passing the reference's own forward-backward gate
    (SparseOF.py:37-38), parity must be near-exact."""
    a, b = frame_pair_small
    h, w = a.shape
    params = LKParams(win_size=(15, 15))
    rng = np.random.RandomState(0)
    pts = np.stack(
        [rng.uniform(8, w - 8, 150), rng.uniform(8, h - 8, 150)], -1
    ).astype(np.float32)
    p1, _ = _cv_lk(a, b, pts, params)
    p0r, _ = _cv_lk(b, a, p1, params)
    good = np.abs(pts - p0r).max(-1) < 1
    if good.sum() < 10:
        pytest.skip("too much motion in fixture for win15")
    ours = np.asarray(
        jax.jit(lambda x, y, p: pyr_lk(x, y, p, params))(
            a.astype(np.float32), b.astype(np.float32), pts
        ).next_pts
    )
    epe = np.linalg.norm(ours - p1, axis=-1)[good]
    assert epe.mean() < 0.05
    assert epe.max() < 0.5


def test_lk_translation_synthetic():
    """Pure translation of a textured synthetic: LK must recover the shift
    (no oracle needed)."""
    rng = np.random.RandomState(1)
    base = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    # smooth it so LK's linearization holds
    k = np.array([1, 4, 6, 4, 1], np.float32)
    k = np.outer(k, k) / 256.0
    img = base
    for _ in range(2):
        img = np.pad(img, 2, mode="reflect")
        img = sum(
            img[i : i + 120 + 0, j : j + 160] * k[i, j]
            for i in range(5)
            for j in range(5)
        )
    shift = (3, 2)  # (dx, dy) integer for exactness
    nxt = np.roll(np.roll(img, shift[1], axis=0), shift[0], axis=1)
    pts = measurement_grid(120, 160, 20)
    # keep points away from the rolled border
    keep = (
        (pts[:, 0] > 20) & (pts[:, 0] < 140) & (pts[:, 1] > 20) & (pts[:, 1] < 100)
    )
    pts = pts[keep]
    res = pyr_lk(jnp.asarray(img), jnp.asarray(nxt), jnp.asarray(pts), LKParams(win_size=(21, 21)))
    flow = np.asarray(res.next_pts) - pts
    ok = np.asarray(res.status)
    assert ok.mean() > 0.9
    err = np.abs(flow[ok] - np.array(shift, np.float32))
    # the bulk must nail the shift; allow stragglers in flat patches
    assert np.median(err) < 0.05
    assert np.percentile(err, 90) < 0.5


def test_points_lanes_matches_v1_kernel():
    """The arbitrary-point lanes path (ops/lk.py points_lanes — the
    round-5 tracker-at-scale kernel) matches the v1 per-point Pallas
    kernel on random points over smooth synthetic motion."""
    import dataclasses

    from hackathonopticalflow_tpu.core.config import TRACKER_LK

    rng = np.random.RandomState(3)
    base = rng.uniform(0, 255, (200, 280)).astype(np.float32)
    k = np.array([1, 4, 6, 4, 1], np.float32)
    k = np.outer(k, k) / 256.0
    img = base
    for _ in range(2):
        img = np.pad(img, 2, mode="reflect")
        img = sum(
            img[i : i + 200, j : j + 280] * k[i, j]
            for i in range(5)
            for j in range(5)
        )
    nxt = np.roll(np.roll(img, 3, axis=0), -4, axis=1)
    pts = np.stack(
        [rng.uniform(12, 268, 150), rng.uniform(12, 188, 150)], -1
    ).astype(np.float32)
    v1 = pyr_lk(jnp.asarray(img), jnp.asarray(nxt), jnp.asarray(pts), TRACKER_LK)
    lanes = pyr_lk(
        jnp.asarray(img), jnp.asarray(nxt), jnp.asarray(pts),
        dataclasses.replace(TRACKER_LK, points_lanes=True),
    )
    assert np.array_equal(np.asarray(v1.status), np.asarray(lanes.status))
    both = np.asarray(v1.status)
    d = np.linalg.norm(
        np.asarray(v1.next_pts) - np.asarray(lanes.next_pts), axis=-1
    )[both]
    # heavily smoothed synthetic = soft gradients, so f32 summation-order
    # differences between the kernels show as ~1e-2 px; on real corpus
    # frames the same comparison reads ~6e-5 px median (round-5 probe)
    assert np.median(d) < 0.02
    assert np.percentile(d, 95) < 0.1
    # both kernels must nail the true (-4, +3) shift
    for r in (v1, lanes):
        flow = (np.asarray(r.next_pts) - pts)[both]
        err = np.abs(flow - np.array([-4.0, 3.0], np.float32))
        assert np.median(err) < 0.05
