"""Steady-state re-measure of the ego-motion stages (round 5): call
each stage TWICE in-process so per-shape compiles land in the first
call, and report both — resolves whether the bench_tracker r5 run's low
numbers were relay variance/cold compile or a real regression."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax

from bench_tracker import load, log


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
    ego_params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=128,
        features=FeatureParams(
            max_corners=60, quality_level=0.1, max_candidates=512
        ),
    )
    f2 = load(clip, 110, w=640, h=360)
    cam = Pinhole.from_fov(640, 360, 155.0)

    for i in range(3):
        t0 = time.perf_counter()
        table = collect_tracks(f2, ego_params)
        dt = time.perf_counter() - t0
        log(f"collect_tracks call {i}: {dt:.2f}s -> {len(f2) / dt:.2f} fps")
    for i in range(3):
        t0 = time.perf_counter()
        res = ego_motion_track(
            f2, ego_params, cam, OdometryConfig(), table=table
        )
        dt = time.perf_counter() - t0
        log(f"geometry call {i}: {dt:.2f}s -> {len(f2) / dt:.2f} fps")
    for i in range(2):
        t0 = time.perf_counter()
        res = ego_motion_track(f2, ego_params, cam, OdometryConfig())
        dt = time.perf_counter() - t0
        log(f"ego e2e call {i}: {dt:.2f}s -> {len(f2) / dt:.2f} fps")


if __name__ == "__main__":
    main()
