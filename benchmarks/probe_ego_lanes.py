"""Ego-motion tracking stage with the lanes LK kernel (round-5 cont.).

The ego benchmarks (bench_ate/bench_tracker/probe_ego_steady) run the
tracking stage with the EXACT-path LK (plain LKParams defaults), which
measures 41 fps at 640x360 — while the 1080p tracker scan runs 182 fps
on the points-lanes kernel (BASELINE.md round-5 stage rows). This probe
measures collect_tracks with both paths at the ego workload and checks
the resulting track tables and ego trajectories agree, to decide
whether the ego pipeline should default to the lanes kernel.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np
import jax

from bench_tracker import load, log


def table_agreement(ta, tb, tol=0.5):
    both = ta.alive & tb.alive
    either = ta.alive | tb.alive
    alive_agree = 1.0 - (ta.alive ^ tb.alive).sum() / max(either.sum(), 1)
    d = np.linalg.norm(ta.pos - tb.pos, axis=-1)
    div = (d > tol) & both
    return alive_agree, div.sum() / max(both.sum(), 1), float(
        np.median(d[both])
    )


def main():
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

    clip = "/root/reference/videos/Тёмный_коридор_колонны .mp4"
    log(f"device {jax.devices()[0]}")
    feats = FeatureParams(max_corners=60, quality_level=0.1, max_candidates=512)
    cfgs = {
        "exact": TrackerParams(
            lk=LKParams(win_size=(15, 15)), max_tracks=128, features=feats
        ),
        "lanes": TrackerParams(
            lk=LKParams(
                win_size=(15, 15), use_pallas=True, slab_margin=8,
                points_lanes=True,
            ),
            max_tracks=128,
            features=feats,
        ),
    }
    f2 = load(clip, 110, w=640, h=360)
    cam = Pinhole.from_fov(640, 360, 155.0)

    tables = {}
    for name, p in cfgs.items():
        for i in range(3):
            t0 = time.perf_counter()
            tables[name] = collect_tracks(f2, p)
            dt = time.perf_counter() - t0
            log(f"collect_tracks[{name}] call {i}: {dt:.2f}s "
                f"-> {len(f2) / dt:.2f} fps")

    alive_agree, div, med = table_agreement(tables["exact"], tables["lanes"])
    log(f"table agreement: alive {alive_agree:.4f}, div>0.5px {div:.4f}, "
        f"median dist {med:.4f}px")

    # quality: gauged ATE vs the cv2-composed oracle (bench_ate's
    # round-5 metric — monocular scale unobservable, both sides
    # unit-step-gauged), for BOTH tracking variants
    from bench_ate import FOV_DEG, H, W, run_oracle, unit_gauge

    from hackathonopticalflow_tpu.nav.metrics import ate_umeyama

    f = (W / 2.0) / np.tan(np.radians(FOV_DEG) / 2.0)
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    oracle = run_oracle(f2, K)
    for name, p in cfgs.items():
        for i in range(2):
            t0 = time.perf_counter()
            res = ego_motion_track(
                f2, p, cam, OdometryConfig(), table=tables[name]
            )
            dt = time.perf_counter() - t0
            log(f"geometry[{name}] call {i}: {dt:.2f}s "
                f"-> {len(f2) / dt:.2f} fps")
        oracle_g = unit_gauge(oracle[res.kf_idx])
        span_g = float(
            np.linalg.norm(oracle_g - oracle_g.mean(0), axis=-1).max() + 1e-9
        )
        ba_g = round(
            ate_umeyama(unit_gauge(res.centers), oracle_g)["rmse"] / span_g, 4
        )
        raw_g = round(
            ate_umeyama(unit_gauge(res.raw_centers), oracle_g)["rmse"]
            / span_g,
            4,
        )
        log(f"ATE[{name}] gauged rel-span: raw {raw_g} -> BA {ba_g} "
            f"({len(res.kf_idx)} keyframes)")

    # e2e with lanes
    for i in range(2):
        t0 = time.perf_counter()
        ego_motion_track(f2, cfgs["lanes"], cam, OdometryConfig())
        dt = time.perf_counter() - t0
        log(f"ego e2e[lanes] call {i}: {dt:.2f}s -> {len(f2) / dt:.2f} fps")


if __name__ == "__main__":
    main()
