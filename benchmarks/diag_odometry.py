"""Diagnose the keyframed ego-motion chain (nav/odometry.py) against the
per-frame chain on a real clip. Caches the tracker table + oracle chain
in /tmp so the odometry math can be iterated without re-running tracking.

Chains compared (all Umeyama-ATE'd vs the cv2 oracle at keyframes):
  A. per-frame essential chain sampled at keyframes (run_ours of
     benchmarks/bench_ate.py — the round-1 baseline, rel ~0.09-0.17);
  B. direct keyframe-pair essential chain (stride-3 pairs, unit steps,
     no windows) — isolates keyframe-pair pose quality;
  C. windowed raw chain (init_window_poses + stitching);
  D. windowed BA chain.
Diagnostic tool; not the driver bench.
"""

from __future__ import annotations

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
W, H, FOV = 640, 360, 155.0


def load(name: str, n: int, start: int = 10) -> np.ndarray:
    import cv2

    cap = cv2.VideoCapture(os.path.join(VIDEO_DIR, name))
    cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    frames = []
    for _ in range(n):
        ok, f = cap.read()
        if not ok:
            break
        frames.append(
            cv2.resize(
                cv2.cvtColor(f, cv2.COLOR_BGR2GRAY), (W, H),
                interpolation=cv2.INTER_AREA,
            )
        )
    cap.release()
    return np.stack(frames)


def get_cached(name: str, n: int):
    """(TrackTable, oracle chain) with /tmp caching."""
    from hackathonopticalflow_tpu.core.config import (
        FeatureParams,
        LKParams,
        TrackerParams,
    )
    from hackathonopticalflow_tpu.nav.odometry import TrackTable, collect_tracks

    tag = f"{name.replace('/', '_').replace(' ', '_')}_{n}_{W}x{H}"
    cache = f"/tmp/diag_odom_{tag}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return (
            TrackTable(pos=z["pos"], alive=z["alive"], birth=z["birth"]),
            z["oracle"],
        )
    frames = load(name, n)
    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=128,
        features=FeatureParams(max_corners=60, quality_level=0.1, max_candidates=512),
    )
    table = collect_tracks(frames, params)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_ate

    f = (W / 2.0) / np.tan(np.radians(FOV) / 2.0)
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    oracle = bench_ate.run_oracle(frames, K)
    np.savez(
        cache, pos=table.pos, alive=table.alive, birth=table.birth, oracle=oracle
    )
    log("cached", cache)
    return table, oracle


def chain_keyframe_pairs(table, kf_idx, cam):
    """Chain B: per-keyframe-pair essential poses, unit steps."""
    from hackathonopticalflow_tpu.nav.pose import estimate_relative_pose

    Rwc = np.eye(3)
    C = np.zeros(3)
    out = [C.copy()]
    for a, b in zip(kf_idx[:-1], kf_idx[1:]):
        # same physical track at both ends: alive at both, same birth
        ok = (
            table.alive[a]
            & table.alive[b]
            & (table.birth[a] == table.birth[b])
        )
        if ok.sum() >= 8:
            rp = estimate_relative_pose(
                cam.normalize(jnp.asarray(table.pos[a])),
                cam.normalize(jnp.asarray(table.pos[b])),
                jnp.asarray(ok),
                inlier_thresh=cam.sq_norm_thresh(1.0),
            )
            R, t = np.asarray(rp.R), np.asarray(rp.t).reshape(3)
        else:
            R, t = np.eye(3), np.zeros(3)
        C = C + Rwc @ (-R.T @ t)
        Rwc = Rwc @ R.T
        out.append(C.copy())
    return np.stack(out)


def main():
    from hackathonopticalflow_tpu.nav.camera import Pinhole
    from hackathonopticalflow_tpu.nav.metrics import ate_umeyama
    from hackathonopticalflow_tpu.nav.odometry import (
        OdometryConfig,
        build_window,
        window_ba,
    )
    import hackathonopticalflow_tpu.nav.odometry as odom

    name = sys.argv[1] if len(sys.argv) > 1 else "Тёмный_коридор_колонны .mp4"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 110
    table, oracle = get_cached(name, n)
    cam = Pinhole.from_fov(W, H, FOV)
    cfg = OdometryConfig(
        inlier_thresh=cam.sq_norm_thresh(1.0),
        max_reproj=3.0 / cam.fx,
        scale_votes=os.environ.get("DIAG_SCALE_VOTES", "1") == "1",
    )
    if cfg.kf_stride is None:
        kf_idx = odom.select_keyframes(table, cam, cfg)
        log(f"adaptive keyframes: {len(kf_idx)} strides "
            f"{np.diff(kf_idx).tolist()}")
    else:
        kf_idx = np.arange(0, len(table.pos), cfg.kf_stride)
    oracle_kf = oracle[kf_idx]
    span = float(np.linalg.norm(oracle_kf - oracle_kf.mean(0), axis=-1).max())

    def rep(tag, centers):
        k = min(len(centers), len(oracle_kf))
        a = ate_umeyama(centers[:k], oracle_kf[:k])
        log(f"{tag:28s} rmse {a['rmse']:8.4f}  rel {a['rmse'] / span:.4f}")

    rep("B keyframe-pair chain", chain_keyframe_pairs(table, kf_idx, cam))

    # C/D: windowed chains via ego_motion_track itself (batched geometry);
    # time the geometry stage (tracking already cached) — the round-3
    # VERDICT's 1.16 fps row is this stage
    import time

    t0 = time.perf_counter()
    res = odom.ego_motion_track(
        np.zeros((len(table.pos), 1, 1), np.uint8), None, cam, cfg,
        table=table,
    )
    dt = time.perf_counter() - t0
    for st, s in zip(res.stats, range(0, len(res.stats))):
        log(
            f"  window {s:3d}: obs {st['n_obs']:4d} cost "
            f"{st['cost0']:.3e}->{st['cost']:.3e}"
        )
    log(
        f"geometry stage: {dt:.2f}s for {len(table.pos)} frames "
        f"({len(table.pos) / dt:.1f} fps, incl. compile on first run)"
    )
    rep("C window raw chain", res.raw_centers)
    rep("D window BA chain", res.centers)


if __name__ == "__main__":
    main()
