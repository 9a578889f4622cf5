"""A/B: u8 vs f32 host->device staging for the ego tracking stage.

collect_tracks staged float32 chunks (30 MB per 32-frame 640x360 chunk)
into the relay's degraded post-compile H2D (~45-70 MB/s — BASELINE.md
round 3), so the tracking stage's wall time was mostly transfer, like
the batch runner's streaming path before its round-5 u8 fix. Staging
the source uint8 (7.6 MB) and casting on device is exact (u8->f32).

Passing f32 frames reproduces the old staging byte-for-byte (the cast
was host-side before), so calling collect_tracks with u8 vs f32 input
IS the A/B, in one process/session. Also times ego_motion_track e2e on
the u8 path.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np
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
    f2 = load(clip, 110, w=640, h=360)  # uint8
    f2f = f2.astype(np.float32)
    cam = Pinhole.from_fov(640, 360, 155.0)

    # interleaved A/B, 3 rounds each after a warmup round per arm
    for label, arr in (("u8", f2), ("f32", f2f)):
        t0 = time.perf_counter()
        table = collect_tracks(arr, ego_params)
        log(f"collect_tracks[{label}] warm: {time.perf_counter() - t0:.2f}s")
    tables = {}
    for i in range(3):
        for label, arr in (("u8", f2), ("f32", f2f)):
            t0 = time.perf_counter()
            tables[label] = collect_tracks(arr, ego_params)
            dt = time.perf_counter() - t0
            log(
                f"collect_tracks[{label}] round {i}: {dt:.2f}s "
                f"-> {len(f2) / dt:.2f} fps"
            )
    same = (
        np.array_equal(tables["u8"].pos, tables["f32"].pos)
        and np.array_equal(tables["u8"].alive, tables["f32"].alive)
        and np.array_equal(tables["u8"].birth, tables["f32"].birth)
    )
    log(f"tables identical across staging dtypes: {same}")

    # packed vs 3-leaf history fetch (FETCH_PACKED module toggle): the
    # relay charges a round trip per fetched leaf
    import hackathonopticalflow_tpu.nav.odometry as odo

    fetch_tables = {}
    for label, flag in (("packed", True), ("leaves", False)):
        odo.FETCH_PACKED = flag
        t0 = time.perf_counter()
        collect_tracks(f2, ego_params)
        log(f"collect_tracks[{label}] warm: {time.perf_counter() - t0:.2f}s")
    for i in range(3):
        for label, flag in (("packed", True), ("leaves", False)):
            odo.FETCH_PACKED = flag
            t0 = time.perf_counter()
            fetch_tables[label] = collect_tracks(f2, ego_params)
            dt = time.perf_counter() - t0
            log(
                f"collect_tracks[{label}] round {i}: {dt:.2f}s "
                f"-> {len(f2) / dt:.2f} fps"
            )
    odo.FETCH_PACKED = True
    same = (
        np.array_equal(
            fetch_tables["packed"].pos, fetch_tables["leaves"].pos
        )
        and np.array_equal(
            fetch_tables["packed"].alive, fetch_tables["leaves"].alive
        )
        and np.array_equal(
            fetch_tables["packed"].birth, fetch_tables["leaves"].birth
        )
    )
    log(f"tables identical across fetch modes: {same}")

    for i in range(3):
        t0 = time.perf_counter()
        ego_motion_track(f2, ego_params, cam, OdometryConfig())
        dt = time.perf_counter() - t0
        log(f"ego e2e[u8] call {i}: {dt:.2f}s -> {len(f2) / dt:.2f} fps")


if __name__ == "__main__":
    main()
