"""Trajectory ATE vs the cv2-composed oracle on a real flight clip — the
BASELINE.json "ATE on flight clips" metric.

Both pipelines run feature tracking -> per-pair essential-matrix pose ->
unit-translation pose chaining (monocular scale gauge) on the same
frames:

- ours: flow/tracker.py (Shi-Tomasi + fwd-bwd LK, the SparseOF.py:22-92
  re-design) + nav/pose.py estimate_relative_pose (8-pt RANSAC +
  cheirality);
- oracle: the literal cv2 loop (calcOpticalFlowPyrLK fwd/bwd, d < 1 px
  gate) + cv2.findEssentialMat/recoverPose.

ATE is Umeyama-aligned RMSE between the two unit-step camera-center
chains (nav/metrics.py). Per-step scale is gauge-fixed identically in
both, so the number measures geometric agreement of the pose chains.
Forced to CPU: this is an accuracy metric, and the TPU relay admits one
process at a time. Prints one JSON line per clip to stdout.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VIDEO_DIR = "/root/reference/videos"
# round 5 (VERDICT r4 item 7): the FULL corpus — rounds 2-4 recorded ATE
# on only the two structured clips; the violent-crash clips complete the
# table (windows capped by clip length/decodability)
CLIPS = [
    ("здания_дверь_колонны_перекрытия.mp4", 150),
    ("Тёмный_коридор_колонны .mp4", 110),
    ("Резкий_поворот_кусты_стена_разбился.mp4", 150),
    ("Стены_вокруг_куст_стена_на_пути9.mp4", 150),
]
W, H = 640, 360
FOV_DEG = 155.0


def load(path: str, n: int, start: int = 10) -> np.ndarray | None:
    import cv2

    cap = cv2.VideoCapture(path)
    cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    frames = []
    for _ in range(n):
        ok, f = cap.read()
        if not ok:
            break
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        frames.append(cv2.resize(g, (W, H), interpolation=cv2.INTER_AREA))
    cap.release()
    return np.stack(frames) if len(frames) >= 16 else None


def chain(poses):
    """[(R, t)] with x_cur = R x_prev + t, |t| = 1 -> (N+1, 3) centers."""
    Rwc = np.eye(3)
    C = np.zeros(3)
    out = [C.copy()]
    for R, t in poses:
        C = C + Rwc @ (-R.T @ t)
        Rwc = Rwc @ R.T
        out.append(C.copy())
    return np.stack(out)


def run_oracle(frames: np.ndarray, K: np.ndarray):
    import cv2

    lk = dict(
        winSize=(15, 15),
        maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    fp = dict(maxCorners=60, qualityLevel=0.1, minDistance=10, blockSize=7)
    trajectories = []
    poses = []
    for idx in range(len(frames)):
        if idx > 0 and trajectories:
            img0, img1 = frames[idx - 1], frames[idx]
            p0 = np.float32([t[-1] for t in trajectories]).reshape(-1, 1, 2)
            p1, _s, _e = cv2.calcOpticalFlowPyrLK(img0, img1, p0, None, **lk)
            p0r, _s, _e = cv2.calcOpticalFlowPyrLK(img1, img0, p1, None, **lk)
            d = abs(p0 - p0r).reshape(-1, 2).max(-1)
            good = d < 1
            prev_pts = p0.reshape(-1, 2)[good]
            cur_pts = p1.reshape(-1, 2)[good]
            if len(prev_pts) >= 8:
                E, inl = cv2.findEssentialMat(
                    prev_pts, cur_pts, K, method=cv2.RANSAC, prob=0.999, threshold=1.0
                )
                _n, R, t, _m = cv2.recoverPose(E, prev_pts, cur_pts, K, mask=inl)
                poses.append((R, t.reshape(3)))
            else:
                poses.append((np.eye(3), np.zeros(3)))
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
            import cv2 as _cv2

            mask = np.full_like(frames[idx], 255)
            for x, y in [np.int32(t[-1]) for t in trajectories]:
                _cv2.circle(mask, (x, y), 5, 0, -1)
            p = _cv2.goodFeaturesToTrack(frames[idx], mask=mask, **fp)
            if p is not None:
                for x, y in np.float32(p).reshape(-1, 2):
                    trajectories.append([(x, y)])
    return chain(poses)


def run_ours(frames: np.ndarray):
    from hackathonopticalflow_tpu.core.config import (
        FeatureParams,
        LKParams,
        TrackerParams,
    )
    from hackathonopticalflow_tpu.flow.tracker import (
        _heads,
        init_tracker,
        track_step,
    )
    from hackathonopticalflow_tpu.nav.camera import Pinhole
    from hackathonopticalflow_tpu.nav.pose import estimate_relative_pose

    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=128,
        features=FeatureParams(
            max_corners=60, quality_level=0.1, max_candidates=512
        ),
    )
    cam = Pinhole.from_fov(W, H, FOV_DEG)
    step = jax.jit(lambda s, a, b: track_step(s, a, b, params))

    @jax.jit
    def pose_step(prev_heads, state):
        heads = _heads(state)
        # tracks that survived this step with >= 2 points correspond
        valid = state.alive & (state.length >= 2)
        p0 = cam.normalize(prev_heads)
        p1 = cam.normalize(heads)
        rp = estimate_relative_pose(
            p0, p1, valid, inlier_thresh=cam.sq_norm_thresh(1.0)
        )
        return rp.R, rp.t, jnp.sum(valid)

    state = init_tracker(params)
    f0 = jnp.asarray(frames[0], jnp.float32)
    state = step(state, f0, f0)  # seed detections on frame 0
    poses = []
    for idx in range(1, len(frames)):
        prev_heads = _heads(state)
        state = step(
            state,
            jnp.asarray(frames[idx - 1], jnp.float32),
            jnp.asarray(frames[idx], jnp.float32),
        )
        R, t, n = pose_step(prev_heads, state)
        if int(n) >= 8:
            poses.append((np.asarray(R), np.asarray(t)))
        else:
            poses.append((np.eye(3), np.zeros(3)))
    return chain(poses)


def pose_step_diagnostics(frames: np.ndarray, K: np.ndarray):
    """Per-step rotation/translation-direction disagreement between our
    pose chain and the cv2 oracle chain (VERDICT round-1 item 8: a causal
    breakdown of where trajectory drift comes from)."""
    import cv2

    from hackathonopticalflow_tpu.core.config import (
        FeatureParams,
        LKParams,
        TrackerParams,
    )
    from hackathonopticalflow_tpu.flow.tracker import _heads, init_tracker, track_step
    from hackathonopticalflow_tpu.nav.camera import Pinhole
    from hackathonopticalflow_tpu.nav.pose import estimate_relative_pose

    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=128,
        features=FeatureParams(max_corners=60, quality_level=0.1, max_candidates=512),
    )
    cam = Pinhole.from_fov(W, H, FOV_DEG)
    step = jax.jit(lambda s, a, b: track_step(s, a, b, params))
    state = init_tracker(params)
    f0 = jnp.asarray(frames[0], jnp.float32)
    state = step(state, f0, f0)
    rot_errs, dir_errs, inliers = [], [], []
    lk = dict(
        winSize=(15, 15), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    for idx in range(1, len(frames)):
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
            continue
        rp = estimate_relative_pose(
            cam.normalize(prev_heads),
            cam.normalize(heads),
            jnp.asarray(valid),
            inlier_thresh=cam.sq_norm_thresh(1.0),
        )
        # oracle pose from the same correspondences
        p0 = np.asarray(prev_heads)[valid]
        p1 = np.asarray(heads)[valid]
        E, inl = cv2.findEssentialMat(
            p0, p1, K, method=cv2.RANSAC, prob=0.999, threshold=1.0
        )
        if E is None or E.shape != (3, 3):
            continue
        _n, R_o, t_o, _m = cv2.recoverPose(E, p0, p1, K, mask=inl)
        R_d = np.asarray(rp.R) @ R_o.T
        ang = np.degrees(
            np.arccos(np.clip((np.trace(R_d) - 1) / 2, -1.0, 1.0))
        )
        cosd = np.clip(
            np.dot(np.asarray(rp.t).ravel(), t_o.ravel())
            / (np.linalg.norm(rp.t) * np.linalg.norm(t_o) + 1e-12),
            -1.0,
            1.0,
        )
        rot_errs.append(ang)
        dir_errs.append(np.degrees(np.arccos(abs(cosd))))
        inliers.append(int(rp.n_inliers))
    return {
        "rot_deg_med": float(np.median(rot_errs)),
        "rot_deg_p90": float(np.percentile(rot_errs, 90)),
        "tdir_deg_med": float(np.median(dir_errs)),
        "tdir_deg_p90": float(np.percentile(dir_errs, 90)),
        "inliers_med": float(np.median(inliers)),
        "steps": len(rot_errs),
    }


def run_ba(frames: np.ndarray):
    """Keyframed ego-motion with windowed BA (nav/odometry.py), both
    window-init variants from ONE tracking pass: scale-vote init and
    unit-step init. Returns (kf_idx, {variant: (ba_centers, raw_centers)})."""
    import dataclasses

    from hackathonopticalflow_tpu.core.config import (
        FeatureParams,
        LKParams,
        TrackerParams,
    )
    from hackathonopticalflow_tpu.nav.camera import Pinhole
    from hackathonopticalflow_tpu.nav.odometry import (
        OdometryConfig,
        collect_tracks,
        ego_motion_track,
    )

    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=128,
        features=FeatureParams(max_corners=60, quality_level=0.1, max_candidates=512),
    )
    cam = Pinhole.from_fov(W, H, FOV_DEG)
    table = collect_tracks(frames, params)
    out = {}
    kf_idx = None
    for name, votes in (("votes", True), ("unit", False)):
        res = ego_motion_track(
            frames, params, cam,
            OdometryConfig(scale_votes=votes), table=table,
        )
        kf_idx = res.kf_idx
        out[name] = (res.centers, res.raw_centers)
    return kf_idx, out, table, cam


def unit_gauge(centers: np.ndarray) -> np.ndarray:
    """Renormalize every chain step to unit length, keeping directions.

    The oracle gauges each per-step translation to unit length (monocular
    scale is unobservable), so chains that recover TRUE relative step
    scales are penalized by construction; the per-frame comparison in
    this benchmark already gauge-fixes both sides identically. Applying
    the same gauge to the keyframe chains isolates what BA can actually
    improve against this oracle: step directions and rotations."""
    steps = np.diff(centers, axis=0)
    n = np.linalg.norm(steps, axis=-1, keepdims=True)
    dirs = np.where(n > 1e-12, steps / np.maximum(n, 1e-12), steps)
    return np.concatenate(
        [centers[:1] * 0, np.cumsum(dirs, axis=0)], axis=0
    )


def main():
    from hackathonopticalflow_tpu.nav.metrics import ate_umeyama

    f = (W / 2.0) / np.tan(np.radians(FOV_DEG) / 2.0)
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    for name, n in CLIPS:
        path = os.path.join(VIDEO_DIR, name)
        if not os.path.exists(path):
            log("missing clip", name)
            continue
        frames = load(path, n)
        if frames is None:
            log("decode failed", name)
            continue
        # cv2-composed ego-motion chain, TIMED: the CPU x1 for the
        # "ego-motion end-to-end" row (VERDICT r4 weak #5 — every flow
        # path has a CPU fps row; this gives the north-star chain one).
        # The chain is tracking + per-pair essential pose; our TPU e2e
        # row (nav/odometry.ego_motion_track) additionally runs windowed
        # BA, i.e. strictly more work.
        import time as _time

        t0 = _time.perf_counter()
        oracle = run_oracle(frames, K)
        cpu_wall = _time.perf_counter() - t0
        cpu_fps = (len(frames) - 1) / max(cpu_wall, 1e-9)
        log(f"{name}: cv2 ego-motion chain {cpu_fps:.2f} fps CPU ({cpu_wall:.1f}s)")
        ours = run_ours(frames)
        ate = ate_umeyama(ours, oracle)
        # scale-free: RMSE relative to the oracle trajectory's span
        span = float(
            np.linalg.norm(oracle - oracle.mean(0), axis=-1).max() + 1e-9
        )
        # keyframed windowed-BA track vs the oracle sampled at keyframes
        ba_rel = raw_kf_rel = ba_unit_rel = raw_unit_rel = None
        pair_rel = pair_g_rel = ba_g_rel = raw_g_rel = None
        try:
            from hackathonopticalflow_tpu.nav.camera import Pinhole  # noqa: F401

            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from diag_odometry import chain_keyframe_pairs

            kf_idx, variants, table, cam = run_ba(frames)
            oracle_kf = oracle[kf_idx]
            span_kf = float(
                np.linalg.norm(oracle_kf - oracle_kf.mean(0), axis=-1).max() + 1e-9
            )
            oracle_g = unit_gauge(oracle_kf)
            span_g = float(
                np.linalg.norm(oracle_g - oracle_g.mean(0), axis=-1).max() + 1e-9
            )
            rels = {}
            for vname, (ba_c, raw_c) in variants.items():
                ate_ba = ate_umeyama(ba_c, oracle_kf)
                ate_raw_kf = ate_umeyama(raw_c, oracle_kf)
                rels[vname] = (
                    round(ate_raw_kf["rmse"] / span_kf, 4),
                    round(ate_ba["rmse"] / span_kf, 4),
                )
                log(
                    f"{name}: keyframe chain [{vname}] ATE raw "
                    f"{ate_raw_kf['rmse']:.4f} -> BA {ate_ba['rmse']:.4f} "
                    f"(rel span {rels[vname][0]} -> {rels[vname][1]})"
                )
            raw_kf_rel, ba_rel = rels["votes"]
            raw_unit_rel, ba_unit_rel = rels["unit"]
            # direction-only comparison: both sides step-gauged to unit —
            # the oracle's own convention (monocular scale unobservable)
            pair_c = chain_keyframe_pairs(table, kf_idx, cam)
            pair_rel = round(ate_umeyama(pair_c, oracle_kf)["rmse"] / span_kf, 4)
            pair_g_rel = round(
                ate_umeyama(unit_gauge(pair_c), oracle_g)["rmse"] / span_g, 4
            )
            ba_c, raw_c = variants["unit"]
            ba_g_rel = round(
                ate_umeyama(unit_gauge(ba_c), oracle_g)["rmse"] / span_g, 4
            )
            raw_g_rel = round(
                ate_umeyama(unit_gauge(raw_c), oracle_g)["rmse"] / span_g, 4
            )
            log(
                f"{name}: step-gauged rel span — pair {pair_g_rel} "
                f"raw {raw_g_rel} BA {ba_g_rel} (ungauged pair {pair_rel})"
            )
        except Exception as e:
            log(f"{name}: BA track failed: {type(e).__name__}: {e}")
        diag = pose_step_diagnostics(frames, K)
        log(f"{name}: per-step diag {diag}")
        print(
            json.dumps(
                {
                    "metric": "trajectory_ate_rmse",
                    "clip": name,
                    "frames": int(len(frames)),
                    "value": round(ate["rmse"], 4),
                    "unit": "unit-steps",
                    "rel_span": round(ate["rmse"] / span, 4),
                    "ba_rel_span": ba_rel,
                    "raw_kf_rel_span": raw_kf_rel,
                    "ba_unit_rel_span": ba_unit_rel,
                    "raw_unit_rel_span": raw_unit_rel,
                    "pair_rel_span": pair_rel,
                    "pair_gauged_rel": pair_g_rel,
                    "ba_gauged_rel": ba_g_rel,
                    "raw_gauged_rel": raw_g_rel,
                    "step_rot_deg_med": round(diag["rot_deg_med"], 3),
                    "step_tdir_deg_med": round(diag["tdir_deg_med"], 3),
                    "cpu_chain_fps": round(cpu_fps, 2),
                }
            ),
            flush=True,
        )
        log(f"{name}: ATE rmse {ate['rmse']:.4f} mean {ate['mean']:.4f} "
            f"max {ate['max']:.4f} span {span:.2f}")


if __name__ == "__main__":
    main()
