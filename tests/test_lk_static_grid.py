"""Static-grid LK path (ops/grid_patch.py + ops/lk_pallas2.py) golden
tests: the grid-anchored kernel must match the exact XLA path and the cv2
oracle on real corpus frames (reference get_flow_lk,
pathfinder_viewer.py:144-193, win 45x45 maxLevel 2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hackathonopticalflow_tpu.core.config import LKParams
from hackathonopticalflow_tpu.core.grid import measurement_grid
from hackathonopticalflow_tpu.ops.grid_patch import (
    extract_grid_slabs,
    extract_grid_templates,
)
from hackathonopticalflow_tpu.ops.lk import pyr_lk
from hackathonopticalflow_tpu.ops.patch import extract_patches_multi, extract_slabs

from conftest import requires_cv2, HAVE_CV2

if HAVE_CV2:
    import cv2


STATIC = LKParams(grid_step=30, use_pallas=True)


def _grid_xy(h, w, step=30):
    pts = measurement_grid(h, w, step)
    return pts, np.unique(pts[:, 0]).astype(int), np.unique(pts[:, 1]).astype(int)


@pytest.mark.parametrize("level", [0, 1, 2])
def test_static_templates_match_dynamic(level):
    """extract_grid_templates == extract_patches_multi at grid positions."""
    rng = np.random.RandomState(level)
    h, w, pad, win = 270, 480, 64, 45
    pts, xs, ys = _grid_xy(h, w)
    planes = jnp.asarray(
        rng.uniform(0, 255, (3, (h >> level) + 2 * pad, (w >> level) + 2 * pad)),
        jnp.float32,
    )
    tl = pts * (1.0 / (1 << level)) - 22.0
    ref = np.asarray(extract_patches_multi(planes, jnp.asarray(tl + pad), win, win))
    ours = np.asarray(extract_grid_templates(planes, xs, ys, level, win, win, pad))
    assert np.abs(ref - ours).max() < 1e-4


@pytest.mark.parametrize("level", [0, 2])
def test_static_slabs_match_dynamic(level):
    rng = np.random.RandomState(level)
    h, w, pad, win = 270, 480, 64, 45
    pts, xs, ys = _grid_xy(h, w)
    plane = jnp.asarray(
        rng.uniform(0, 255, ((h >> level) + 2 * pad, (w >> level) + 2 * pad)).round(),
        jnp.float32,
    )
    mx, my = 41, 40
    slabs, bx, by = extract_grid_slabs(
        plane, xs, ys, level, win, win, mx, my, pad, dtype=jnp.float32
    )
    base = np.stack(np.meshgrid(bx, by, indexing="ij"), -1).reshape(-1, 2)
    # bases are template floor positions minus the margins
    it = np.floor(pts * (1.0 / (1 << level)) - 22.0).astype(int)
    assert np.all(base == it - [mx, my])
    rx = win + 1 + 2 * mx
    ref = np.asarray(extract_slabs(plane, jnp.asarray(base + pad, jnp.int32), rx))
    ry = win + 1 + 2 * my
    assert np.abs(np.asarray(slabs)[:, :ry, :] - ref[:, :ry, :]).max() == 0.0


@pytest.mark.parametrize("kernel", ["blocked", "lanes"])
def test_static_grid_matches_exact_synthetic(kernel):
    """Full pyramid: static-grid kernel == exact XLA path on a smooth
    synthetic shift (no divergent points)."""
    import dataclasses

    rng = np.random.RandomState(0)
    base = rng.uniform(0, 255, (300, 520)).astype(np.float32)
    k = jnp.asarray([0.25, 0.5, 0.25])
    from hackathonopticalflow_tpu.ops.image import sep_conv2d

    sm = base
    for _ in range(4):
        sm = np.asarray(sep_conv2d(jnp.asarray(sm), k, k))
    a = sm[10:280, 20:500]
    b = sm[13:283, 25:505]  # true shift (+5, +3)
    pts, xs, ys = _grid_xy(270, 480)
    params = dataclasses.replace(STATIC, grid_kernel=kernel)
    ref = pyr_lk(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts), LKParams())
    new = pyr_lk(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts), params)
    d = np.linalg.norm(np.asarray(ref.next_pts) - np.asarray(new.next_pts), axis=-1)
    assert d.max() < 0.05
    assert np.array_equal(np.asarray(ref.status), np.asarray(new.status))


def test_lanes_kernel_matches_blocked_synthetic():
    """The points-in-lanes kernel (ops/lk_pallas3.py) matches the blocked
    kernel (ops/lk_pallas2.py) — flow to reduction-order f32 noise
    (different summation layouts), status exactly, err closely — on a
    smooth synthetic shift."""
    import dataclasses

    rng = np.random.RandomState(1)
    base = rng.uniform(0, 255, (300, 520)).astype(np.float32)
    k = jnp.asarray([0.25, 0.5, 0.25])
    from hackathonopticalflow_tpu.ops.image import sep_conv2d

    sm = base
    for _ in range(4):
        sm = np.asarray(sep_conv2d(jnp.asarray(sm), k, k))
    a = sm[10:280, 20:500]
    b = sm[7:277, 24:504]
    pts, xs, ys = _grid_xy(270, 480)
    blk = pyr_lk(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts), STATIC)
    lan = pyr_lk(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts),
        dataclasses.replace(STATIC, grid_kernel="lanes"),
    )
    assert np.array_equal(np.asarray(blk.status), np.asarray(lan.status))
    both = np.asarray(blk.status) & np.asarray(lan.status)
    d = np.abs(np.asarray(blk.next_pts) - np.asarray(lan.next_pts))[both]
    assert d.max() < 1e-4
    assert np.abs(np.asarray(blk.err) - np.asarray(lan.err))[both].max() < 1e-4


@requires_cv2
@pytest.mark.parametrize("kernel", ["blocked", "lanes"])
def test_static_grid_vs_cv2_corpus(frame_pair_small, kernel):
    """cv2 oracle parity on real frames: median EPE at the noise floor,
    danger-mask agreement >= 98% (the reference's own filter stage)."""
    import dataclasses

    a, b = frame_pair_small
    h, w = a.shape
    pts, xs, ys = _grid_xy(h, w)
    new = pyr_lk(
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32), jnp.asarray(pts),
        dataclasses.replace(STATIC, grid_kernel=kernel),
    )
    nxt, st, _ = cv2.calcOpticalFlowPyrLK(
        a, b, pts.reshape(-1, 1, 2), None, winSize=(45, 45), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    nxt = nxt.reshape(-1, 2)
    p = np.asarray(new.next_pts)
    epe = np.linalg.norm(p - nxt, axis=-1)
    # points whose flow exceeds the static slab envelope freeze at their
    # coarse-level estimate (ops/lk_pallas2.py docstring) — the corpus
    # fixture pair has violent motion at 270p, so assert the median (the
    # in-envelope bulk) and the danger-mask agreement (the product
    # metric), not the raw tail
    assert np.median(epe) < 1e-3
    assert np.mean(epe > 0.5) < 0.25

    def mask(endpoints):
        f = endpoints - pts
        m = np.linalg.norm(f, axis=-1)
        dc = np.linalg.norm(pts - [w / 2, h / 2], axis=-1)
        m = m / (5 + np.sqrt(dc)) * 30
        return (np.median(m) < m) & (m < np.percentile(m, 99))

    assert np.mean(mask(p) == mask(nxt)) >= 0.98


def test_rescue_recovers_large_flow():
    """Large-flow rescue (round 5): a uniform shift beyond the static
    slab budget (|flow_x| > ~27 px at level 0) freezes every point
    without the rescue pass; with it the lanes path must match the exact
    XLA path (which has no envelope)."""
    import dataclasses

    rng = np.random.RandomState(2)
    base = rng.uniform(0, 255, (360, 600)).astype(np.float32)
    k = jnp.asarray([0.25, 0.5, 0.25])
    from hackathonopticalflow_tpu.ops.image import sep_conv2d

    sm = base
    for _ in range(4):
        sm = np.asarray(sep_conv2d(jnp.asarray(sm), k, k))
    a = sm[40:310, 50:530]
    b = sm[43:313, 90:570]  # true shift (+40, +3): beyond the L0 budget
    pts, xs, ys = _grid_xy(270, 480)
    exact = pyr_lk(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts), LKParams())
    on = pyr_lk(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts), STATIC)
    off = pyr_lk(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts),
        dataclasses.replace(STATIC, rescue_large=False),
    )
    ok = np.asarray(exact.status)
    d_on = np.linalg.norm(
        np.asarray(on.next_pts) - np.asarray(exact.next_pts), axis=-1
    )[ok]
    # sanity: this shift really is beyond the static level-0 budget
    # (|flow_x| ~> 27 px), so without the rescue every point would
    # freeze at its coarse (level-1) estimate — which on clean synthetic
    # translation is already accurate, so the off-path contrast is only
    # measurable on real frames (see benchmarks/quality_sparse.py); the
    # off-path here just exercises that the legacy extraction still runs
    np.asarray(off.next_pts)
    # with rescue the lanes path matches the exact path at full accuracy
    assert np.median(d_on) < 0.05
    assert np.mean(d_on > 0.5) < 0.02


def test_static_grid_point_order():
    """Grid x-major point order must round-trip through the extractors."""
    h, w = 270, 480
    pts, xs, ys = _grid_xy(h, w)
    idx = np.stack(np.meshgrid(np.arange(len(xs)), np.arange(len(ys)), indexing="ij"), -1)
    flat = idx.reshape(-1, 2)
    recon = np.stack([xs[flat[:, 0]], ys[flat[:, 1]]], axis=-1)
    assert np.array_equal(recon, pts.astype(int))


@requires_cv2
def test_production_config_danger_mask_parity():
    """The round-5 headline claim, pinned: at the PRODUCTION config
    (1080p, grid 30, shipped LKParams defaults incl. the level-0
    rescue), the danger mask agrees with the cv2 pipeline >= 98.5% on a
    violent-motion corpus pair (measured 99.06-99.65% across the corpus,
    BASELINE.md round 5; the round-4 kernel read 96.8-98.0% here)."""
    import os

    clip = "/root/reference/videos/Резкий_поворот_кусты_стена_разбился.mp4"
    if not os.path.exists(clip):
        pytest.skip("corpus missing")
    from hackathonopticalflow_tpu.io.video import read_gray_pair

    a, b = read_gray_pair(clip, 31)
    h, w = a.shape
    assert (h, w) == (1080, 1920)
    pts, xs, ys = _grid_xy(h, w)
    import dataclasses

    new = pyr_lk(
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
        jnp.asarray(pts),
        dataclasses.replace(STATIC, compute_err=False),
    )
    nxt, st, _ = cv2.calcOpticalFlowPyrLK(
        a, b, pts.reshape(-1, 1, 2), None, winSize=(45, 45), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    nxt = nxt.reshape(-1, 2)
    p = np.asarray(new.next_pts)

    def mask(endpoints):
        f = endpoints - pts
        m = np.linalg.norm(f, axis=-1)
        dc = np.linalg.norm(pts - [w / 2, h / 2], axis=-1)
        m = m / (5 + np.sqrt(dc)) * 30
        return (np.median(m) < m) & (m < np.percentile(m, 99))

    agree = np.mean(mask(p) == mask(nxt))
    assert agree >= 0.985
    # status bits must track cv2's
    assert np.mean(np.asarray(new.status) == (st.reshape(-1) > 0)) >= 0.99
