"""In-context A/B of the aligned DMA carve (round-5 cont.): the 24-pair
1080p production QUALITY config (rescue on), carve_dma off vs on,
interleaved in ONE process so relay drift can't masquerade as a delta
(the CLAUDE.md <5% rule). Also a row for the r4 range-limited config
(rescue off — carve_dma only touches the rescue/points_lanes carves, so
this row should not move) as a drift canary, and an on-device endpoint
identity check between the two quality configs.
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import load_frames
    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.flow.lk_grid import lk_grid_flow_video

    log(f"device: {jax.devices()[0]}")
    n_pairs = 24
    frames = load_frames(n_pairs, 1080, 1920)
    h, w = frames.shape[1:]
    pts = jax.device_put(jnp.asarray(measurement_grid(h, w, 30)))
    dev = jax.device_put(jnp.asarray(frames))

    base = LKParams(
        grid_step=30, use_pallas=True, compute_err=False,
        grid_kernel="lanes",
    )
    cfgs = {
        "quality+dma": dataclasses.replace(base, carve_dma=True),
        "L0L1+dma": dataclasses.replace(
            base, carve_dma=True, rescue_levels=None
        ),
        "ranged(canary)": dataclasses.replace(base, rescue_large=False),
    }
    fns, fulls = {}, {}
    for name, p in cfgs.items():
        def run(fr, p=p):
            res = lk_grid_flow_video(fr[::-1].astype(jnp.float32), pts, lk=p)
            return jnp.sum(res.modulus)

        def full(fr, p=p):
            res = lk_grid_flow_video(fr[::-1].astype(jnp.float32), pts, lk=p)
            return res.raw_next_pts, res.status

        fn = jax.jit(run)
        t0 = time.perf_counter()
        _ = float(fn(dev))
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        fns[name] = fn
        fulls[name] = jax.jit(full)

    results = {k: [] for k in cfgs}
    for rnd in range(4):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            _ = float(fn(dev))  # scalar host readback = sync
            dt = time.perf_counter() - t0
            results[name].append(dt)
            log(f"round {rnd} {name}: {dt*1e3:.1f} ms -> "
                f"{n_pairs/dt:.1f} fps ({dt/n_pairs*1e3:.2f} ms/pair)")

    for name, ts in results.items():
        best = min(ts)
        log(f"BEST {name}: {best/n_pairs*1e3:.2f} ms/pair = "
            f"{n_pairs/best:.1f} fps  {[round(t*1e3) for t in ts]}")




if __name__ == "__main__":
    main()
