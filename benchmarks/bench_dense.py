"""Dense Farneback throughput on the real TPU, per warp mode.

Usage: python benchmarks/bench_dense.py [mode ...]   (default: packed pallas)

Measures frames/s at 720p over a jitted lax.scan of frame pairs staged on
device (the axon relay makes per-call transfers pathological — see
CLAUDE.md). Prints one line per mode to stderr and a summary to stdout;
NOT the driver bench (bench.py owns the stdout JSON contract).
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


def load(n_frames: int, h: int = 720, w: int = 1280) -> np.ndarray:
    import cv2

    cap = cv2.VideoCapture("/root/reference/videos/Тёмный_коридор_колонны .mp4")
    cap.set(cv2.CAP_PROP_POS_FRAMES, 30)
    out = []
    for _ in range(n_frames):
        ok, fr = cap.read()
        assert ok
        g = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
        out.append(cv2.resize(g, (w, h), interpolation=cv2.INTER_AREA))
    cap.release()
    return np.stack(out)


def main():
    from hackathonopticalflow_tpu.core.config import FarnebackParams
    from hackathonopticalflow_tpu.flow.dense import farneback_flow

    modes = sys.argv[1:] or ["packed", "pallas"]
    n_pairs = 4
    frames = jax.device_put(jnp.asarray(load(n_pairs + 1), jnp.float32))
    log(f"device {jax.devices()[0]}, frames {frames.shape}")
    results = {}
    for mode in modes:
        params = FarnebackParams(warp_mode=mode)

        @jax.jit
        def run(fr, params=params):
            # scan, not vmap: scalar-prefetch pallas_call doesn't batch
            def step(acc, pair):
                fl = farneback_flow(pair[0], pair[1], params)
                return acc + jnp.sum(jnp.abs(fl)), None

            pairs = jnp.stack([fr[:-1], fr[1:]], axis=1)
            acc, _ = jax.lax.scan(step, jnp.float32(0), pairs)
            return acc

        t0 = time.perf_counter()
        _ = float(run(frames))
        log(f"{mode}: compile+first {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(frames))
            times.append(time.perf_counter() - t0)
        fps = n_pairs / min(times)
        results[mode] = fps
        log(f"{mode}: {min(times):.3f}s / {n_pairs} pairs -> {fps:.2f} fps  {times}")
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
