"""End-to-end config-3 benchmark: decode -> flow -> normalize/filter ->
danger points over a full corpus clip, ours (chunked headless pathfinder,
apps/pathfinder.py run_chunked) vs a literal CPU transcription of the
reference viewer pipeline (pathfinder_viewer.py:226-361 minus imshow).

Usage:
    python benchmarks/bench_e2e.py          # TPU side (chunked pipeline)
    python benchmarks/bench_e2e.py --cpu    # CPU reference side

Run the two sides in SEPARATE processes (the TPU relay is single-client,
and the CPU measurement must not share the 2-CPU host with a TPU run).
Results go to stderr; BASELINE.md records the pair.
"""

from __future__ import annotations

import sys
import time

CLIP = "/root/reference/videos/здания_дверь_колонны_перекрытия.mp4"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cpu_reference(max_frames: int | None = None) -> float:
    """Literal reference pipeline per frame: BGR decode -> gray -> backward
    grid LK (45x45, 3 levels, 10 iters) -> radial normalize -> median/P99
    mask (pathfinder_viewer.py:144-193) -> danger endpoints. No rendering,
    no imshow — the pure compute path, decode included."""
    import cv2
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from hackathonopticalflow_tpu.core.grid import measurement_grid

    cap = cv2.VideoCapture(CLIP)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    pts = measurement_grid(h, w, 30).reshape(-1, 1, 2)
    ok, frame = cap.read()
    assert ok
    prev = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    n = 0
    t0 = time.perf_counter()
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames and n >= max_frames):
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        nxt, _st, _err = cv2.calcOpticalFlowPyrLK(
            gray, prev, pts, None, winSize=(45, 45), maxLevel=2,
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
        )
        fl = nxt.reshape(-1, 2) - pts.reshape(-1, 2)
        m = np.linalg.norm(fl, axis=-1)
        dc = np.linalg.norm(pts.reshape(-1, 2) - [w / 2, h / 2], axis=-1)
        m = m / (5 + np.sqrt(dc)) * 30
        _good = (np.median(m) < m) & (m < np.percentile(m, 99))
        prev = gray
        n += 1
    dt = time.perf_counter() - t0
    log(f"cpu reference end-to-end: {n} pairs in {dt:.1f}s -> {n / dt:.2f} fps")
    return n / dt


def tpu_chunked(render: bool) -> float:
    sys.path.insert(0, "/root/repo")
    from hackathonopticalflow_tpu.apps.pathfinder import (
        PathfinderApp,
        PathfinderConfig,
    )

    from hackathonopticalflow_tpu.core.config import LKParams

    # the TPU production path: static-grid lanes kernel, err skipped
    # (the reference pipeline never reads err)
    app = PathfinderApp(
        PathfinderConfig(
            video=CLIP,
            lk=LKParams(grid_step=30, use_pallas=True, compute_err=False),
        )
    )
    stats = app.run_batched(
        chunk=24,
        out_path="/tmp/e2e.mp4" if render else None,
        render=render,
    )
    log(f"tpu chunked end-to-end (render={render}): {stats}")
    return stats["fps"]


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        cpu_reference()
    else:
        tpu_chunked(render="--render" in sys.argv)
