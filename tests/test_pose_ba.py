"""Ego-motion (essential matrix) and windowed BA tests on synthetic scenes
with known ground truth (the north-star extension, SURVEY.md §5.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hackathonopticalflow_tpu.nav.ba import (
    BAState,
    bundle_adjust,
    rodrigues,
    so3_log,
)
from hackathonopticalflow_tpu.nav.camera import Pinhole
from hackathonopticalflow_tpu.nav.pose import estimate_relative_pose
from hackathonopticalflow_tpu.parallel.ba_dist import distributed_bundle_adjust
from hackathonopticalflow_tpu.parallel.mesh import make_mesh

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.asarray(rodrigues(jnp.asarray(axis * angle, jnp.float32)))


def _synthetic_two_view(n=100, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 12, n)], -1
    )
    R = _rot([0.1, 0.9, 0.2], 0.08)
    t = np.array([0.3, -0.1, 0.5])
    t = t / np.linalg.norm(t)
    p0 = X[:, :2] / X[:, 2:3]
    X1 = X @ R.T + t
    p1 = X1[:, :2] / X1[:, 2:3]
    p0 = p0 + rng.normal(0, noise, p0.shape)
    p1 = p1 + rng.normal(0, noise, p1.shape)
    return p0.astype(np.float32), p1.astype(np.float32), R, t, X


def test_relative_pose_exact():
    p0, p1, R, t, _ = _synthetic_two_view(noise=0.0)
    est = estimate_relative_pose(jnp.asarray(p0), jnp.asarray(p1))
    assert int(est.n_inliers) > 90
    np.testing.assert_allclose(np.asarray(est.R), R, atol=1e-3)
    # translation up to scale (unit), same direction
    assert np.dot(np.asarray(est.t), t) > 0.999


def test_relative_pose_noisy_with_outliers():
    p0, p1, R, t, _ = _synthetic_two_view(n=200, noise=5e-4, seed=1)
    # corrupt 20% with gross outliers
    rng = np.random.RandomState(2)
    bad = rng.choice(200, 40, replace=False)
    p1 = p1.copy()
    p1[bad] += rng.uniform(-0.5, 0.5, (40, 2)).astype(np.float32)
    est = estimate_relative_pose(
        jnp.asarray(p0), jnp.asarray(p1), inlier_thresh=5e-5, ransac_rounds=32
    )
    assert int(est.n_inliers) > 100
    # rotation within ~1 degree
    dR = np.asarray(est.R) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.5
    assert np.dot(np.asarray(est.t), t) > 0.99


def test_so3_log_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        w = rng.uniform(-1, 1, 3).astype(np.float32)
        R = rodrigues(jnp.asarray(w))
        w2 = np.asarray(so3_log(R))
        np.testing.assert_allclose(w2, w, atol=1e-5)


def _synthetic_ba(m=4, l=48, noise=2e-3, pose_err=0.03, pt_err=0.15, seed=0, step_scale=1.0):
    """Ground-truth window + perturbed initialization."""
    rng = np.random.RandomState(seed)
    X = np.stack(
        [rng.uniform(-2, 2, l), rng.uniform(-1.5, 1.5, l), rng.uniform(4, 12, l)], -1
    )
    rvecs, tvecs, obs = [], [], []
    for k in range(m):
        w = np.array([0.02, 0.15, 0.01]) * k * step_scale
        t = np.array([0.25, -0.05, 0.4]) * k * step_scale
        R = np.asarray(rodrigues(jnp.asarray(w.astype(np.float32))))
        Xc = X @ R.T + t
        z = Xc[:, :2] / Xc[:, 2:3] + rng.normal(0, noise, (l, 2))
        rvecs.append(w)
        tvecs.append(t)
        obs.append(z)
    mask = np.ones((m, l), bool)
    # perturb everything but pose 0
    rv = np.array(rvecs)
    tv = np.array(tvecs)
    rv[1:] += rng.normal(0, pose_err, rv[1:].shape)
    tv[1:] += rng.normal(0, pose_err, tv[1:].shape)
    X_init = X + rng.normal(0, pt_err, X.shape)
    state = BAState(
        rvecs=jnp.asarray(rv, jnp.float32),
        tvecs=jnp.asarray(tv, jnp.float32),
        points=jnp.asarray(X_init, jnp.float32),
        obs=jnp.asarray(np.stack(obs), jnp.float32),
        mask=jnp.asarray(mask),
    )
    return state, np.array(rvecs), np.array(tvecs), X


def test_bundle_adjust_converges():
    state, rv_true, tv_true, X_true = _synthetic_ba()
    out, stats = jax.jit(lambda s: bundle_adjust(s, iters=15))(state)
    assert float(stats.cost) < float(stats.initial_cost) * 1e-2
    # pose recovery: pose 0 pinned at truth; the monocular scale gauge is
    # anchored to the (perturbed) initial ||t_1||, so compare up to scale
    np.testing.assert_allclose(np.asarray(out.rvecs[1:]), rv_true[1:], atol=1e-2)
    s = np.linalg.norm(tv_true[1]) / np.linalg.norm(np.asarray(out.tvecs[1]))
    np.testing.assert_allclose(s * np.asarray(out.tvecs[1:]), tv_true[1:], atol=2e-2)
    pt_err = np.linalg.norm(s * np.asarray(out.points) - X_true, axis=-1)
    # depth is weakly observable at this baseline; 10% relative is converged
    assert np.median(pt_err / X_true[:, 2]) < 0.1


@needs_8
def test_distributed_ba_matches_single_device():
    state, *_ = _synthetic_ba(l=64)
    mesh = make_mesh((8,), ("tile",))
    out_s, stats_s = bundle_adjust(state, iters=8)
    out_d, stats_d = distributed_bundle_adjust(state, mesh, "tile", iters=8)
    np.testing.assert_allclose(
        np.asarray(out_d.rvecs), np.asarray(out_s.rvecs), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_d.tvecs), np.asarray(out_s.tvecs), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_d.points), np.asarray(out_s.points), atol=1e-3
    )
    assert abs(float(stats_d.cost) - float(stats_s.cost)) < 1e-3 * max(
        float(stats_s.cost), 1.0
    )


@needs_8
def test_ring_ba_matches_single_device():
    """Keyframe-sharded ring BA (parallel/ba_ring.py: ppermute'd whitened
    Schur factors) must agree with the single-device solver."""
    from hackathonopticalflow_tpu.parallel.ba_ring import ring_bundle_adjust

    state, *_ = _synthetic_ba(m=8, l=48)
    mesh = make_mesh((8,), ("win",))
    out_s, stats_s = bundle_adjust(state, iters=8)
    out_r, stats_r = ring_bundle_adjust(state, mesh, "win", iters=8)
    np.testing.assert_allclose(
        np.asarray(out_r.rvecs), np.asarray(out_s.rvecs), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_r.tvecs), np.asarray(out_s.tvecs), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_r.points), np.asarray(out_s.points), atol=1e-3
    )
    assert int(stats_r.n_obs) == int(stats_s.n_obs)


@needs_8
def test_ring_ba_multiple_cams_per_device():
    """Mloc > 1: 16 keyframes over 8 devices, and it still converges."""
    from hackathonopticalflow_tpu.parallel.ba_ring import ring_bundle_adjust

    state, *_ = _synthetic_ba(m=16, l=40, seed=3, step_scale=0.25)
    mesh = make_mesh((8,), ("win",))
    out_s, stats_s = bundle_adjust(state, iters=8)
    out_r, stats_r = ring_bundle_adjust(state, mesh, "win", iters=8)
    np.testing.assert_allclose(
        np.asarray(out_r.rvecs), np.asarray(out_s.rvecs), atol=5e-4
    )
    assert float(stats_r.cost) < float(stats_r.initial_cost) * 0.05
