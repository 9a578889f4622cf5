"""OdometryConfig sweep for the windowed-BA chain vs the cv2 oracle.

Reuses ONE tracking pass per clip (collect_tracks) and evaluates the
window/Huber/min-obs grid on the keyframe ATE, gauged and ungauged, so
the BA-vs-pair-chain comparison (round-2 VERDICT weak #3) is tuned on
measurements rather than guesses. Prints one line per config to stderr.

Diagnostic tool; not the driver bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import dataclasses

    from bench_ate import CLIPS, FOV_DEG, H, W, load, run_oracle, unit_gauge
    from diag_odometry import chain_keyframe_pairs

    from hackathonopticalflow_tpu.core.config import (
        FeatureParams,
        LKParams,
        TrackerParams,
    )
    from hackathonopticalflow_tpu.nav.camera import Pinhole
    from hackathonopticalflow_tpu.nav.metrics import ate_umeyama
    from hackathonopticalflow_tpu.nav.odometry import (
        OdometryConfig,
        collect_tracks,
        ego_motion_track,
    )

    f = (W / 2.0) / np.tan(np.radians(FOV_DEG) / 2.0)
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=128,
        features=FeatureParams(
            max_corners=60, quality_level=0.1, max_candidates=512
        ),
    )
    cam = Pinhole.from_fov(W, H, FOV_DEG)

    # keep the grid small: each window size is a fresh jit compilation
    # and the 2-CPU host OOMs if caches accumulate (cleared per config)
    stride = int(os.environ.get("HOF_SWEEP_STRIDE", "3"))
    clip_filter = os.environ.get("HOF_SWEEP_CLIP", "")
    grid = []
    for window in (4, 5, 6):
        for huber in (1.0, 2.0):
            grid.append(
                OdometryConfig(window=window, huber_px=huber, kf_stride=stride)
            )

    for name, n in CLIPS:
        path = os.path.join("/root/reference/videos", name)
        if not os.path.exists(path) or clip_filter not in name:
            continue
        frames = load(path, n)
        oracle = run_oracle(frames, K)
        table = collect_tracks(frames, params)
        kf_idx = np.arange(0, len(frames), stride)
        oracle_kf = oracle[kf_idx]
        span_kf = float(
            np.linalg.norm(oracle_kf - oracle_kf.mean(0), axis=-1).max() + 1e-9
        )
        oracle_g = unit_gauge(oracle_kf)
        span_g = float(
            np.linalg.norm(oracle_g - oracle_g.mean(0), axis=-1).max() + 1e-9
        )
        pair_c = chain_keyframe_pairs(table, kf_idx, cam)
        log(
            f"{name}: PAIR rel "
            f"{ate_umeyama(pair_c, oracle_kf)['rmse'] / span_kf:.4f} gauged "
            f"{ate_umeyama(unit_gauge(pair_c), oracle_g)['rmse'] / span_g:.4f}"
        )
        for cfg in grid:
            try:
                jax.clear_caches()
                res = ego_motion_track(frames, params, cam, cfg, table=table)
                k = len(res.centers)
                okf = oracle_kf[:k]
                rel = ate_umeyama(res.centers, okf)["rmse"] / span_kf
                relg = (
                    ate_umeyama(unit_gauge(res.centers), unit_gauge(okf))["rmse"]
                    / span_g
                )
                log(
                    f"{name}: w={cfg.window} huber={cfg.huber_px} "
                    f"obs={cfg.min_track_obs} -> rel {rel:.4f} gauged {relg:.4f}"
                )
            except Exception as e:  # noqa: BLE001
                log(
                    f"{name}: w={cfg.window} huber={cfg.huber_px} "
                    f"obs={cfg.min_track_obs} FAILED {type(e).__name__}: {e}"
                )


if __name__ == "__main__":
    main()
