"""Multi-stream batched pipeline runner — BASELINE.json config 4
("all repo flight videos processed concurrently").

Decodes N videos in lockstep (threaded prefetchers), stacks their frames
into a (B, H, W) device batch sharded over the 'stream' mesh axis, and
runs the grid-LK danger pipeline for all streams in one dispatch per
frame step. Per-stream failure isolation: a stream whose decode ends (or
errors) is masked out while the batch keeps running (SURVEY.md §5.3).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.config import FilterParams, LKParams, NormalizeParams
from ..core.grid import measurement_grid
from ..flow.lk_grid import lk_grid_flow
from ..io.prefetch import FramePrefetcher
from ..parallel.mesh import make_mesh
from ..utils.logging import get_logger

log = get_logger("apps.batch_runner")


@dataclasses.dataclass
class BatchRunnerConfig:
    videos: list[str]
    step: int = 30
    max_frames: int | None = None
    n_devices: int | None = None  # default: all available
    lk: LKParams = LKParams()
    norm: NormalizeParams = NormalizeParams()
    filt: FilterParams = FilterParams()


def run_batch(cfg: BatchRunnerConfig) -> dict:
    b = len(cfg.videos)
    n_dev = cfg.n_devices or min(len(jax.devices()), b)
    while b % n_dev:
        n_dev -= 1
    mesh = make_mesh((n_dev,), ("stream",))
    sharding = NamedSharding(mesh, P("stream", None, None))

    prefetchers = [
        FramePrefetcher(v, max_frames=cfg.max_frames, to_device=False)
        for v in cfg.videos
    ]
    iters = [iter(p) for p in prefetchers]

    first = [next(it, None) for it in iters]
    if any(f is None for f in first):
        raise IOError("a stream has no first frame")
    h, w = first[0].shape
    for f in first:
        if f.shape != (h, w):
            raise ValueError("streams must share resolution for batching")
    pts = jnp.asarray(measurement_grid(h, w, cfg.step))

    pair_fn = lambda a, bb: lk_grid_flow(
        a, bb, pts, lk=cfg.lk, norm=cfg.norm, filt=cfg.filt
    )
    if n_dev == b:
        # one stream per device: vmap partitions cleanly over the mesh
        fn = jax.jit(jax.vmap(pair_fn, in_axes=(0, 0)))
    else:
        # streams share a device and time-multiplex its one core anyway;
        # lax.map keeps per-kernel VMEM at the single-stream footprint
        # (vmapping the lanes Pallas kernel x4 exceeds the 16 MB scoped
        # VMEM limit by ~6% — measured 2026-08-20)
        fn = jax.jit(lambda aa, bb: jax.lax.map(lambda ab: pair_fn(*ab), (aa, bb)))

    prev = np.stack(first).astype(np.float32)
    alive = np.ones(b, bool)
    danger_counts = [[] for _ in range(b)]
    n_steps = 0
    # compile outside the clock (methodology shared with bench.py /
    # run_batched: the recorded number is steady-state throughput), and
    # carry prev ON DEVICE so each step ships one frame batch, not two
    dev_prev = jax.device_put(jnp.asarray(prev), sharding)
    jax.block_until_ready(fn(dev_prev, dev_prev).good)
    t0 = time.time()
    while alive.any():
        cur = prev.copy()
        for i, it in enumerate(iters):
            if not alive[i]:
                continue
            nxt = next(it, None)
            if nxt is None:
                alive[i] = False  # stream ended; keep batch shape, mask results
                log.info("stream %d ended at step %d", i, n_steps)
            else:
                cur[i] = nxt
        if not alive.any():
            break
        dev_cur = jax.device_put(jnp.asarray(cur), sharding)
        res = fn(dev_prev, dev_cur)
        good = np.asarray(res.good)
        for i in range(b):
            if alive[i]:
                danger_counts[i].append(int(good[i].sum()))
        prev = cur
        dev_prev = dev_cur
        n_steps += 1

    wall = time.time() - t0
    total_frames = sum(len(d) for d in danger_counts)
    return {
        "streams": b,
        "devices": n_dev,
        "steps": n_steps,
        "total_frames": total_frames,
        "wall_s": wall,
        "aggregate_fps": total_frames / max(wall, 1e-9),
        "mean_danger_per_stream": [
            float(np.mean(d)) if d else 0.0 for d in danger_counts
        ],
    }


def main(argv=None):
    import argparse, glob

    p = argparse.ArgumentParser(description="multi-stream batched pathfinder")
    p.add_argument("videos", nargs="*", default=None)
    p.add_argument("--corpus", action="store_true", help="use all reference clips")
    p.add_argument("--max-frames", type=int, default=None)
    args = p.parse_args(argv)
    videos = args.videos
    if args.corpus or not videos:
        videos = sorted(glob.glob("/root/reference/videos/*.mp4"))
    cfg = BatchRunnerConfig(
        videos=videos,
        max_frames=args.max_frames,
        # production path: static-grid lanes kernel (vmapped per stream)
        lk=LKParams(grid_step=30, use_pallas=True, compute_err=False),
    )
    print(run_batch(cfg))


if __name__ == "__main__":
    main()
