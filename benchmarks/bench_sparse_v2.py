"""A/B benchmark: sparse pathfinder pipeline 1080p — v1 Pallas kernel vs
the static-grid v2 kernel (ops/lk_pallas2.py). Diagnostic tool.

Usage: python benchmarks/bench_sparse_v2.py [v1] [v2] [v2f] [v2b64] ...
(no args = run default set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.flow.lk_grid import lk_grid_flow_video

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    h, w, n_pairs = 1080, 1920, 8
    import cv2

    path = "/root/reference/videos/Тёмный_коридор_колонны .mp4"
    cap = cv2.VideoCapture(path)
    cap.set(cv2.CAP_PROP_POS_FRAMES, 30)
    frames = []
    for _ in range(n_pairs + 1):
        ok, f = cap.read()
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2GRAY))
    cap.release()
    frames = np.stack(frames)

    pts_np = measurement_grid(h, w, 30)
    pts = jax.device_put(jnp.asarray(pts_np))
    dev = jax.device_put(jnp.asarray(frames))
    log(f"device {jax.devices()[0]}; {pts_np.shape[0]} pts; {n_pairs} pairs")

    variants = {
        "v1": LKParams(use_pallas=True, slab_margin=16),
        "v2": LKParams(grid_step=30, use_pallas=True, compute_err=False),
        "v2err": LKParams(grid_step=30, use_pallas=True),
        "v2noee": LKParams(
            grid_step=30, use_pallas=True, compute_err=False, early_exit=False
        ),
        "v2b64": LKParams(
            grid_step=30, use_pallas=True, compute_err=False, pallas_block=64
        ),
        "v2b16": LKParams(
            grid_step=30, use_pallas=True, compute_err=False, pallas_block=16
        ),
    }
    variants["v2b48"] = LKParams(
        grid_step=30, use_pallas=True, compute_err=False, pallas_block=48
    )
    # round-3 points-in-lanes kernel (ops/lk_pallas3.py)
    variants["v3"] = LKParams(
        grid_step=30, use_pallas=True, compute_err=False, grid_kernel="lanes"
    )
    variants["v3m7"] = LKParams(
        grid_step=30, use_pallas=True, compute_err=False, grid_kernel="lanes",
        iter_margin=7,
    )
    variants["v3m7t16"] = LKParams(
        grid_step=30, use_pallas=True, compute_err=False, grid_kernel="lanes",
        iter_margin=7, iter_margin_top=16,
    )
    variants["v3err"] = LKParams(grid_step=30, use_pallas=True, grid_kernel="lanes")
    want = sys.argv[1:] or ["v1", "v2", "v2b64"]
    results = {}
    for name in want:
        lk = variants[name]

        @jax.jit
        def run(fr, lk=lk):
            res = lk_grid_flow_video(fr[::-1].astype(jnp.float32), pts, lk=lk)
            return jnp.sum(res.modulus)

        try:
            t0 = time.perf_counter()
            v0 = float(run(dev))
            log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                v = float(run(dev))
                times.append(time.perf_counter() - t0)
            fps = n_pairs / min(times)
            log(f"{name}: {min(times):.3f}s -> {fps:.2f} fps   sum={v:.1f} {times}")
            results[name] = (fps, v)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
    if "v1" in results and "v2" in results:
        log(
            f"checksum v1={results['v1'][1]:.1f} v2={results['v2'][1]:.1f} "
            f"(same order of magnitude expected)"
        )


if __name__ == "__main__":
    main()
