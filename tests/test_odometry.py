"""Ego-motion odometry glue (nav/odometry.py): synthetic-scene ground
truth for triangulation, scale-propagated pose init, windowed BA
refinement, and multi-window chain stitching — the tracker->BA
integration the north star requires (SURVEY.md §3.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hackathonopticalflow_tpu.nav.ba import rodrigues
from hackathonopticalflow_tpu.nav.metrics import ate_umeyama
from hackathonopticalflow_tpu.nav.odometry import (
    OdometryConfig,
    TrackTable,
    build_window,
    ego_motion_track,
    init_window_poses,
    triangulate,
    window_ba,
)


def _scene(rng, m=6, l=80, noise=5e-4):
    """Forward-moving camera over random landmarks; returns GT + obs."""
    steps = rng.normal([0, 0, 0.4], [0.05, 0.05, 0.05], (m - 1, 3))
    cs = np.concatenate([[np.zeros(3)], np.cumsum(steps, 0)])
    angs = np.cumsum(rng.normal(0, 0.02, (m, 3)), 0)
    angs[0] = 0
    rs = np.stack([np.asarray(rodrigues(jnp.asarray(a, jnp.float32))) for a in angs])
    x = rng.uniform([-3, -2, 4], [3, 2, 12], (l, 3))
    obs = np.zeros((m, l, 2), np.float32)
    for k in range(m):
        pc = (rs[k] @ (x - cs[k]).T).T
        obs[k] = pc[:, :2] / pc[:, 2:3]
    obs += rng.normal(0, noise, obs.shape).astype(np.float32)
    mask = np.ones((m, l), bool)
    return cs, rs, x, obs, mask


def _centers(rv, tv):
    rs = np.stack([np.asarray(rodrigues(jnp.asarray(r))) for r in rv])
    return np.stack([-(rs[k].T @ tv[k]) for k in range(len(rv))])


def test_triangulate_exact():
    rng = np.random.RandomState(0)
    cs, rs, x, obs, mask = _scene(rng, noise=0.0)
    rvecs = jnp.asarray(
        np.stack([np.asarray(jax.vmap(lambda r: r)(jnp.zeros((1, 3))))[0] for _ in rs])
    )
    # use ground-truth poses: world->cam t = -R C
    from hackathonopticalflow_tpu.nav.ba import so3_log

    rv = np.stack([np.asarray(so3_log(jnp.asarray(r))) for r in rs])
    tv = np.stack([-(rs[k] @ cs[k]) for k in range(len(rs))])
    pts = np.asarray(
        triangulate(jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(rv), jnp.asarray(tv))
    )
    assert np.abs(pts - x).max() < 1e-2


def test_window_ba_improves_on_raw_chain():
    rng = np.random.RandomState(1)
    cs, rs, x, obs, mask = _scene(rng)
    mask[rng.randint(0, len(rs), 40), rng.randint(0, x.shape[0], 40)] = False
    rv, tv, stats = window_ba(obs, mask, OdometryConfig())
    assert stats["cost"] <= stats["cost0"] * 1.01
    ate_raw = ate_umeyama(_centers(stats["raw_rvecs"], stats["raw_tvecs"]), cs)["rmse"]
    ate_ba = ate_umeyama(_centers(rv, tv), cs)["rmse"]
    span = np.linalg.norm(cs[-1] - cs[0])
    assert ate_ba < 0.05 * span
    assert ate_ba <= ate_raw * 1.05  # BA must not regress the init


def test_scale_propagation():
    """Unequal GT step lengths must be recovered by the scale votes (a
    naive unit-step chain cannot represent them)."""
    rng = np.random.RandomState(2)
    m, l = 5, 100
    steps = np.array([[0, 0, 0.2], [0, 0, 0.8], [0, 0, 0.4], [0, 0, 1.2]])
    cs = np.concatenate([[np.zeros(3)], np.cumsum(steps, 0)])
    rs = np.stack([np.eye(3)] * m)
    x = rng.uniform([-3, -2, 4], [3, 2, 12], (l, 3))
    obs = np.zeros((m, l, 2), np.float32)
    for k in range(m):
        pc = x - cs[k]
        obs[k] = pc[:, :2] / pc[:, 2:3]
    mask = np.ones((m, l), bool)
    rv, tv, pts3 = init_window_poses(
        obs, mask, OdometryConfig(scale_votes=True)
    )
    c = _centers(rv, tv)
    # compare step-length RATIOS (global scale is the monocular gauge)
    gt_ratio = np.linalg.norm(np.diff(cs, axis=0), axis=-1)
    got_ratio = np.linalg.norm(np.diff(c, axis=0), axis=-1)
    gt_ratio /= gt_ratio[0]
    got_ratio /= got_ratio[0]
    assert np.abs(gt_ratio - got_ratio).max() < 0.05


def test_build_window_masks_slot_reuse():
    """A slot reused by a new track mid-window must be excluded at the
    earlier keyframes (births differ)."""
    f, t = 7, 3
    pos = np.zeros((f, t, 2), np.float32)
    alive = np.ones((f, t), bool)
    birth = np.zeros((f, t), np.int32)
    birth[3:, 1] = 3  # slot 1 re-seeded at frame 3
    birth[5:, 2] = 5  # slot 2 re-seeded at frame 5: 1 keyframe obs only
    table = TrackTable(pos=pos, alive=alive, birth=birth)
    kf = np.array([0, 3, 6])
    _, mask = build_window(table, kf, OdometryConfig())
    assert mask[:, 0].all()  # stable slot fully observed
    # re-seeded track: excluded before its birth, kept at kf 3 and 6
    assert not mask[0, 1] and mask[1, 1] and mask[2, 1]
    # a track with a single keyframe observation is useless for BA
    assert not mask[:, 2].any()


def test_ego_motion_track_synthetic_clip():
    """End-to-end on rendered frames of a textured plane under forward
    motion: the recovered chain must be near-straight forward motion."""
    rng = np.random.RandomState(3)
    from hackathonopticalflow_tpu.core.config import (
        FeatureParams,
        LKParams,
        TrackerParams,
    )
    from hackathonopticalflow_tpu.nav.camera import Pinhole
    from hackathonopticalflow_tpu.ops.image import sep_conv2d

    h, w, f = 180, 320, 13
    tex = rng.uniform(0, 255, (h * 3, w * 3)).astype(np.float32)
    k = jnp.asarray([0.25, 0.5, 0.25])
    for _ in range(2):
        tex = np.asarray(sep_conv2d(jnp.asarray(tex), k, k))
    # zoom-in sequence approximates forward motion toward a fronto plane
    frames = []
    for i in range(f):
        s = 1.0 + 0.012 * i
        hh, ww = int(h * 1.5 / s), int(w * 1.5 / s)
        y0 = (tex.shape[0] - hh) // 2
        x0 = (tex.shape[1] - ww) // 2
        crop = tex[y0 : y0 + hh, x0 : x0 + ww]
        yy = (np.linspace(0, hh - 1, h)).astype(int)
        xx = (np.linspace(0, ww - 1, w)).astype(int)
        frames.append(crop[np.ix_(yy, xx)])
    frames = np.stack(frames).astype(np.uint8)
    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=96,
        features=FeatureParams(max_corners=48, quality_level=0.05, max_candidates=256),
    )
    cam = Pinhole.from_fov(w, h, 90.0)
    res = ego_motion_track(
        frames, params, cam, OdometryConfig(window=4, kf_stride=3, overlap=2)
    )
    assert len(res.centers) >= 4
    # forward (z) motion dominates; direction consistent across the chain
    d = np.diff(res.centers, axis=0)
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
    assert np.abs(d[:, 2]).mean() > 0.9
