"""Trajectory/pose accuracy vs the cv2-composed oracle on a real flight
clip (the BASELINE.json "trajectory ATE" metric, scaled down for CPU).

The oracle is a literal transcription of the reference tracker loop
(SparseOF.py:31-73) run with cv2; our functional tracker must keep/kill
the same tracks and place surviving heads at the same positions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hackathonopticalflow_tpu.core.config import (
    FeatureParams,
    LKParams,
    TrackerParams,
)
from hackathonopticalflow_tpu.flow.tracker import _heads, init_tracker, track_step

from conftest import requires_cv2, HAVE_CV2, CLIP_CORRIDOR

if HAVE_CV2:
    import cv2


@requires_cv2
def test_tracker_heads_match_cv2_oracle():
    import os

    if not os.path.exists(CLIP_CORRIDOR):
        pytest.skip("corpus missing")
    cap = cv2.VideoCapture(CLIP_CORRIDOR)
    cap.set(cv2.CAP_PROP_POS_FRAMES, 20)
    frames = []
    for _ in range(8):
        ok, f = cap.read()
        assert ok
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        frames.append(cv2.resize(g, (480, 270), interpolation=cv2.INTER_AREA))
    cap.release()

    # ---- oracle: literal SparseOF loop ----
    lk = dict(
        winSize=(15, 15),
        maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    fp = dict(maxCorners=20, qualityLevel=0.3, minDistance=10, blockSize=7)
    trajectories = []
    for idx in range(len(frames)):
        if idx > 0 and trajectories:
            img0, img1 = frames[idx - 1], frames[idx]
            p0 = np.float32([t[-1] for t in trajectories]).reshape(-1, 1, 2)
            p1, _s, _e = cv2.calcOpticalFlowPyrLK(img0, img1, p0, None, **lk)
            p0r, _s, _e = cv2.calcOpticalFlowPyrLK(img1, img0, p1, None, **lk)
            d = abs(p0 - p0r).reshape(-1, 2).max(-1)
            good = d < 1
            new_tr = []
            for tr, (x, y), ok in zip(trajectories, p1.reshape(-1, 2), good):
                if not ok:
                    continue
                tr.append((x, y))
                if len(tr) > 40:
                    del tr[0]
                new_tr.append(tr)
            trajectories = new_tr
        if idx % 5 == 0:
            mask = np.full_like(frames[idx], 255)
            for x, y in [np.int32(t[-1]) for t in trajectories]:
                cv2.circle(mask, (x, y), 5, 0, -1)
            p = cv2.goodFeaturesToTrack(frames[idx], mask=mask, **fp)
            if p is not None:
                for x, y in np.float32(p).reshape(-1, 2):
                    trajectories.append([(x, y)])
    oracle_heads = np.array([t[-1] for t in trajectories], np.float32)

    # ---- ours ----
    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=64,
        features=FeatureParams(max_corners=20, max_candidates=256),
    )
    step = jax.jit(lambda s, a, b: track_step(s, a, b, params))
    state = init_tracker(params)
    prev = frames[0]
    # reference detects on frame 0 before any tracking; our step handles
    # detection inside, fed with identical frames
    state = step(state, jnp.asarray(prev, jnp.float32), jnp.asarray(prev, jnp.float32))
    for idx in range(1, len(frames)):
        state = step(
            state,
            jnp.asarray(frames[idx - 1], jnp.float32),
            jnp.asarray(frames[idx], jnp.float32),
        )
    alive = np.asarray(state.alive)
    ours_heads = np.asarray(_heads(state))[alive]

    # every oracle head must have one of our heads within 1.5 px, and the
    # track counts must agree closely
    assert abs(len(ours_heads) - len(oracle_heads)) <= max(
        2, 0.2 * len(oracle_heads)
    )
    d = np.linalg.norm(oracle_heads[:, None] - ours_heads[None, :], axis=-1)
    match = (d.min(axis=1) < 1.5).mean()
    assert match > 0.85, (match, len(oracle_heads), len(ours_heads))
    # matched heads: sub-0.1 px agreement on average (ATE proxy)
    matched = d.min(axis=1)[d.min(axis=1) < 1.5]
    assert matched.mean() < 0.25


@requires_cv2
def test_pose_chain_ate_bound_real_clip():
    """Trajectory-LEVEL regression bound (VERDICT r1 item 8): our tracker
    + essential-pose chain over a real-clip window must stay within 30%
    of the oracle trajectory's span (Umeyama-aligned RMSE). The round-1
    RANSAC defects (dead-slot sampling, focal-blind inlier gate) put this
    at 37-57% — this test pins the fix."""
    import os

    if not os.path.exists(CLIP_CORRIDOR):
        pytest.skip("corpus missing")
    from hackathonopticalflow_tpu.nav.camera import Pinhole
    from hackathonopticalflow_tpu.nav.metrics import ate_umeyama
    from hackathonopticalflow_tpu.nav.pose import estimate_relative_pose

    w, h, n = 480, 270, 40
    cap = cv2.VideoCapture(CLIP_CORRIDOR)
    cap.set(cv2.CAP_PROP_POS_FRAMES, 10)
    frames = []
    for _ in range(n):
        ok, f = cap.read()
        assert ok
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        frames.append(cv2.resize(g, (w, h), interpolation=cv2.INTER_AREA))
    cap.release()
    frames = np.stack(frames)

    cam = Pinhole.from_fov(w, h, 155.0)
    f_px = cam.fx
    K = np.array([[f_px, 0, w / 2.0], [0, f_px, h / 2.0], [0, 0, 1.0]])

    def chain(poses):
        Rwc, C = np.eye(3), np.zeros(3)
        out = [C.copy()]
        for R, t in poses:
            C = C + Rwc @ (-R.T @ t)
            Rwc = Rwc @ R.T
            out.append(C.copy())
        return np.stack(out)

    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=128,
        features=FeatureParams(max_corners=60, quality_level=0.1, max_candidates=512),
    )
    step = jax.jit(lambda s, a, b: track_step(s, a, b, params))
    state = init_tracker(params)
    f0 = jnp.asarray(frames[0], jnp.float32)
    state = step(state, f0, f0)

    lkd = dict(
        winSize=(15, 15), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    ours_poses, oracle_poses = [], []
    for idx in range(1, n):
        prev_heads = _heads(state)
        prev_alive = np.asarray(state.alive)
        state = step(
            state,
            jnp.asarray(frames[idx - 1], jnp.float32),
            jnp.asarray(frames[idx], jnp.float32),
        )
        heads = _heads(state)
        valid = np.asarray(state.alive) & prev_alive
        if valid.sum() < 8:
            ours_poses.append((np.eye(3), np.zeros(3)))
            oracle_poses.append((np.eye(3), np.zeros(3)))
            continue
        rp = estimate_relative_pose(
            cam.normalize(prev_heads), cam.normalize(heads),
            jnp.asarray(valid), inlier_thresh=cam.sq_norm_thresh(1.0),
        )
        ours_poses.append((np.asarray(rp.R), np.asarray(rp.t).reshape(3)))
        p0 = np.ascontiguousarray(np.asarray(prev_heads)[valid])
        p1 = np.ascontiguousarray(np.asarray(heads)[valid])
        E, inl = cv2.findEssentialMat(
            p0, p1, K, method=cv2.RANSAC, prob=0.999, threshold=1.0
        )
        if E is None or E.shape != (3, 3):
            oracle_poses.append(ours_poses[-1])
            continue
        _n, R_o, t_o, _m = cv2.recoverPose(E, p0, p1, K, mask=inl)
        oracle_poses.append((R_o, t_o.reshape(3)))

    ours_c = chain(ours_poses)
    oracle_c = chain(oracle_poses)
    span = float(np.linalg.norm(oracle_c - oracle_c.mean(0), axis=-1).max())
    ate = ate_umeyama(ours_c, oracle_c)
    # round-3 bound (VERDICT r2 item 5): measured ~0.07-0.09 on this
    # window across rounds; 0.15 catches a ~2x drift regression
    assert ate["rmse"] / span < 0.15, (ate["rmse"], span)
