"""Sparse grid-LK throughput at 1080p vs the OpenCV CPU viewer pipeline
(the reference's headline path: ~10 FPS on its hackathon laptop,
BASELINE.md). One JSON line on stdout."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.flow.lk_grid import lk_grid_flow

    sys.path.insert(0, "/root/repo")
    from bench import load_frames  # shared corpus loader

    n_pairs = 8
    frames = load_frames(n_pairs, h=1080, w=1920)
    h, w = frames.shape[1:]
    pts = jnp.asarray(measurement_grid(h, w, 30))
    log(f"frames {frames.shape}, {pts.shape[0]} grid points")

    # CPU baseline: full reference pipeline via cv2
    cpu_fps = None
    try:
        import cv2

        t0 = time.perf_counter()
        for i in range(4):
            nxt, _s, _e = cv2.calcOpticalFlowPyrLK(
                frames[i + 1], frames[i], np.asarray(pts).reshape(-1, 1, 2), None,
                winSize=(45, 45), maxLevel=2,
                criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
            )
            flow = nxt.reshape(-1, 2) - np.asarray(pts)
            m = np.linalg.norm(flow, axis=-1)
            dc = np.linalg.norm(np.asarray(pts) - [w / 2, h / 2], axis=-1)
            m = m / (5 + np.sqrt(dc)) * 30
            _ = (np.median(m) < m) & (m < np.percentile(m, 99))
        cpu_fps = 4 / (time.perf_counter() - t0)
        log(f"cpu reference pipeline: {cpu_fps:.2f} fps")
    except Exception as e:
        log("cpu baseline failed:", e)

    dev = jax.device_put(jnp.asarray(frames))

    # Pallas VMEM-iteration kernel (ops/lk_pallas.py); identical numerics
    lk_params = LKParams(use_pallas=True, slab_margin=16)

    @jax.jit
    def run_all(fr):
        frf = fr.astype(jnp.float32)

        def step(carry, i):
            res = lk_grid_flow(frf[i + 1], frf[i], pts, lk=lk_params)
            return carry + jnp.sum(res.modulus), jnp.sum(res.good)

        tot, goods = jax.lax.scan(step, 0.0, jnp.arange(fr.shape[0] - 1))
        return tot, goods

    t0 = time.perf_counter()
    out = run_all(dev)
    _ = float(out[0])
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_all(dev)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    fps = n_pairs / min(times)
    log(f"device {min(times):.3f}s -> {fps:.2f} fps")
    print(
        json.dumps(
            {
                "metric": "sparse_lk_fps_1080p",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / cpu_fps, 2) if cpu_fps else None,
            }
        )
    )


if __name__ == "__main__":
    main()
