"""Ego-motion odometry glue (nav/odometry.py): synthetic-scene ground
truth for triangulation, scale-propagated pose init, windowed BA
refinement, and multi-window chain stitching — the tracker->BA
integration the north star requires (SURVEY.md §3.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_cv2

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


def test_select_keyframes_stretches_on_high_floor():
    """The adaptive selector must pick longer strides when the clip's
    single-frame residual floor is high (rotation/blur noise) and short
    ones when parallax accumulates cleanly above a low floor."""
    from hackathonopticalflow_tpu.nav.camera import Pinhole
    from hackathonopticalflow_tpu.nav.odometry import select_keyframes

    rng = np.random.RandomState(0)
    f, t = 40, 64
    cam = Pinhole.from_fov(320, 180, 90.0)

    def table_for(noise_px, parallax_px_per_frame):
        base = rng.uniform([40, 40], [280, 140], (t, 2)).astype(np.float32)
        pos = np.zeros((f, t, 2), np.float32)
        # radial expansion from center ~ forward-motion parallax; noise
        # models the per-frame track jitter floor
        ctr = np.array([160.0, 90.0])
        d = base - ctr
        dn = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-6)
        for i in range(f):
            pos[i] = (
                base
                + dn * parallax_px_per_frame * i
                + rng.normal(0, noise_px, (t, 2))
            )
        alive = np.ones((f, t), bool)
        birth = np.zeros((f, t), np.int32)
        return TrackTable(pos=pos, alive=alive, birth=birth)

    cfg = OdometryConfig()
    clean = select_keyframes(table_for(0.3, 1.5), cam, cfg)
    noisy = select_keyframes(table_for(3.0, 1.5), cam, cfg)
    assert np.median(np.diff(clean)) <= np.median(np.diff(noisy))
    assert np.diff(noisy).max() <= cfg.kf_max_stride
    assert np.diff(clean).min() >= cfg.kf_min_stride


@requires_cv2
@pytest.mark.parametrize(
    "clip", ["CLIP_BUILDINGS", "CLIP_CORRIDOR"], ids=["buildings", "corridor"]
)
def test_ba_beats_pair_chain_real_clip(clip):
    """ATE regression (VERDICT r3 item 5): at the SHIPPED defaults
    (adaptive keyframes, unit-step init, Huber BA) the windowed-BA chain
    must match or beat the keyframe-pair essential chain on BOTH corpus
    clips, gauged against the cv2-composed oracle on identical
    correspondences. Measured at this scale (90f @480x270): buildings
    pair 0.21 -> BA 0.08; corridor pair 0.04 -> BA 0.015."""
    import os

    import conftest
    from hackathonopticalflow_tpu.core.config import (
        FeatureParams,
        LKParams,
        TrackerParams,
    )
    from hackathonopticalflow_tpu.nav.camera import Pinhole
    from hackathonopticalflow_tpu.nav.metrics import ate_umeyama
    from hackathonopticalflow_tpu.nav.odometry import (
        collect_tracks,
        select_keyframes,
    )
    from hackathonopticalflow_tpu.nav.pose import estimate_relative_pose

    path = getattr(conftest, clip)
    if not os.path.exists(path):
        pytest.skip("corpus missing")
    import cv2

    w, h, n = 480, 270, 90
    cap = cv2.VideoCapture(path)
    cap.set(cv2.CAP_PROP_POS_FRAMES, 10)
    frames = []
    for _ in range(n):
        ok, f = cap.read()
        assert ok
        frames.append(
            cv2.resize(
                cv2.cvtColor(f, cv2.COLOR_BGR2GRAY), (w, h),
                interpolation=cv2.INTER_AREA,
            )
        )
    cap.release()
    frames = np.stack(frames)

    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=128,
        features=FeatureParams(
            max_corners=60, quality_level=0.1, max_candidates=512
        ),
    )
    cam = Pinhole.from_fov(w, h, 155.0)
    K = np.array(
        [[cam.fx, 0, w / 2.0], [0, cam.fy, h / 2.0], [0, 0, 1.0]]
    )
    table = collect_tracks(frames, params)
    cfg = OdometryConfig(
        inlier_thresh=cam.sq_norm_thresh(1.0),
        max_reproj=3.0 / cam.fx,
        huber_delta=2.0 / cam.fx,
    )
    kf = select_keyframes(table, cam, cfg)

    def chain(poses):
        Rwc, C = np.eye(3), np.zeros(3)
        out = [C.copy()]
        for R, t in poses:
            C = C + Rwc @ (-R.T @ t)
            Rwc = Rwc @ R.T
            out.append(C.copy())
        return np.stack(out)

    def unit_gauge(c):
        steps = np.diff(c, axis=0)
        nn = np.linalg.norm(steps, axis=-1, keepdims=True)
        dirs = np.where(nn > 1e-12, steps / np.maximum(nn, 1e-12), steps)
        return np.concatenate([c[:1] * 0, np.cumsum(dirs, axis=0)], axis=0)

    orc, ours = [], []
    for a, b in zip(kf[:-1], kf[1:]):
        ok = (
            table.alive[a]
            & table.alive[b]
            & (table.birth[a] == table.birth[b])
        )
        p0 = np.ascontiguousarray(table.pos[a][ok])
        p1 = np.ascontiguousarray(table.pos[b][ok])
        E, inl = cv2.findEssentialMat(
            p0, p1, K, method=cv2.RANSAC, prob=0.999, threshold=1.0
        )
        _n, R_o, t_o, _m = cv2.recoverPose(E, p0, p1, K, mask=inl)
        orc.append((R_o, t_o.reshape(3)))
        rp = estimate_relative_pose(
            cam.normalize(jnp.asarray(table.pos[a])),
            cam.normalize(jnp.asarray(table.pos[b])),
            jnp.asarray(ok),
            inlier_thresh=cam.sq_norm_thresh(1.0),
        )
        ours.append((np.asarray(rp.R), np.asarray(rp.t).reshape(3)))
    oracle_c = chain(orc)
    pair_c = chain(ours)
    res = ego_motion_track(frames, params, cam, cfg, table=table)

    k = min(len(res.centers), len(oracle_c))
    g_or = unit_gauge(oracle_c[:k])
    span = float(np.linalg.norm(g_or - g_or.mean(0), axis=-1).max())
    pair_g = ate_umeyama(unit_gauge(pair_c[:k]), g_or)["rmse"] / span
    ba_g = ate_umeyama(unit_gauge(res.centers[:k]), g_or)["rmse"] / span
    # BA must not lose to the pair chain (small tolerance for jitter),
    # and must stay in the regime the r4 measurement established
    assert ba_g <= pair_g * 1.10 + 0.01, (ba_g, pair_g)
    assert ba_g < 0.15, ba_g


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
