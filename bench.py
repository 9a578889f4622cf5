"""Benchmark: the flagship pathfinder pipeline (grid LK flow -> radial
normalize -> robust filter) at 1080p on one chip, vs the same OpenCV
pipeline on this host's CPU — the reference's headline path
(pathfinder_viewer.py, ~10 fps on its hackathon laptop).

Prints exactly ONE JSON line to stdout:
    {"metric": "sparse_pipeline_fps_1080p", "value": N,
     "unit": "frames/s/chip", "vs_baseline": N / cpu_fps}

Method:
- frames decoded from the reference corpus (synthetic fallback);
- CPU baseline: cv2.calcOpticalFlowPyrLK + the reference's normalize/
  filter math per frame;
- TPU: frames staged on device ONCE (the axon relay makes per-call
  transfers pathological), one jitted lax.scan over all pairs using the
  Pallas VMEM-iteration LK kernel (ops/lk_pallas.py; numerics ~1e-3 px
  vs OpenCV); steady-state time over repeated scans with a scalar host
  readback as the sync barrier.

Secondary numbers (dense Farneback fps, configs) go to stderr and
BASELINE.md; stdout stays machine-readable.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_frames(n_pairs: int, h: int = 1080, w: int = 1920) -> np.ndarray:
    """(n_pairs+1, h, w) uint8 gray frames."""
    try:
        import cv2

        path = "/root/reference/videos/Тёмный_коридор_колонны .mp4"
        cap = cv2.VideoCapture(path)
        frames = []
        cap.set(cv2.CAP_PROP_POS_FRAMES, 30)
        for _ in range(n_pairs + 1):
            ok, frame = cap.read()
            if not ok:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            if gray.shape != (h, w):
                gray = cv2.resize(gray, (w, h), interpolation=cv2.INTER_AREA)
            frames.append(gray)
        cap.release()
        if len(frames) == n_pairs + 1:
            return np.stack(frames)
    except Exception as e:  # pragma: no cover
        log("corpus decode failed, synthetic frames:", e)
    rng = np.random.RandomState(0)
    base = rng.uniform(0, 255, (h + 32, w + 32)).astype(np.float32)
    return np.stack(
        [
            base[8 + t : 8 + t + h, 8 + 2 * t : 8 + 2 * t + w].astype(np.uint8)
            for t in range(n_pairs + 1)
        ]
    )


def cpu_sparse_baseline_fps(frames: np.ndarray, pts: np.ndarray, max_pairs: int = 5):
    """The reference pipeline on this CPU (cv2 LK + normalize + filter)."""
    try:
        import cv2
    except Exception:
        return None
    h, w = frames.shape[1:]
    n = min(max_pairs, len(frames) - 1)
    t0 = time.perf_counter()
    for i in range(n):
        nxt, _s, _e = cv2.calcOpticalFlowPyrLK(
            frames[i + 1], frames[i], pts.reshape(-1, 1, 2), None,
            winSize=(45, 45), maxLevel=2,
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
        )
        fl = nxt.reshape(-1, 2) - pts
        m = np.linalg.norm(fl, axis=-1)
        dc = np.linalg.norm(pts - [w / 2, h / 2], axis=-1)
        m = m / (5 + np.sqrt(dc)) * 30
        _ = (np.median(m) < m) & (m < np.percentile(m, 99))
    return n / (time.perf_counter() - t0)


def main():
    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.flow.lk_grid import lk_grid_flow_video

    n_pairs = 8
    frames = load_frames(n_pairs)
    h, w = frames.shape[1:]
    pts_np = measurement_grid(h, w, 30)
    log(f"frames {frames.shape}, {pts_np.shape[0]} grid points, {jax.devices()[0]}")

    cpu_fps = cpu_sparse_baseline_fps(frames, pts_np)
    log(f"cpu reference pipeline: {cpu_fps:.2f} fps" if cpu_fps else "no cpu baseline")

    pts = jax.device_put(jnp.asarray(pts_np))
    dev = jax.device_put(jnp.asarray(frames))
    lk_params = LKParams(use_pallas=jax.default_backend() == "tpu", slab_margin=16)

    @jax.jit
    def run_all(fr):
        # viewer semantics are backward flow (current -> previous): feed
        # the clip reversed so each step tracks frame t into frame t-1
        res = lk_grid_flow_video(fr[::-1].astype(jnp.float32), pts, lk=lk_params)
        return jnp.sum(res.modulus)

    t0 = time.perf_counter()
    _ = float(run_all(dev))
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run_all(dev))
        times.append(time.perf_counter() - t0)
    fps = n_pairs / min(times)
    log(f"device: {min(times):.3f}s for {n_pairs} pairs -> {fps:.2f} fps; runs={times}")

    vs = fps / cpu_fps if cpu_fps else None
    print(
        json.dumps(
            {
                "metric": "sparse_pipeline_fps_1080p",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
