"""Dense y-tent utilization lever, measured IN CONTEXT (VERDICT r4
item 3): 24-pair 720p Farneback scan with the warp kernel's y-tent group
granularity at 16 rows (round-3 shape) vs 8 rows (halves the wasted
gathered/blended/tented rows per group at ~1 extra scalar-gated group
dispatch). Standalone stage timings overestimate (the solve-blur lesson,
BASELINE.md round 4) — only the in-context fps counts."""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from hackathonopticalflow_tpu.core.config import FarnebackParams
    from hackathonopticalflow_tpu.flow.dense import farneback_flow_video
    from bench import load_frames

    log(f"device: {jax.devices()[0]}")
    n_pairs = 24
    frames = load_frames(n_pairs, 720, 1280)
    dev = jax.device_put(jnp.asarray(frames, jnp.float32))

    for gr in (16, 8):
        params = dataclasses.replace(FarnebackParams(), warp_group_rows=gr)

        @jax.jit
        def run(fr, params=params):
            return jnp.sum(jnp.abs(farneback_flow_video(fr, params)))

        t0 = time.perf_counter()
        _ = float(run(dev))
        log(f"group_rows={gr}: compile+first {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(run(dev))
            times.append(time.perf_counter() - t0)
        best = min(times)
        log(
            f"group_rows={gr}: {best:.3f}s / {n_pairs} pairs -> "
            f"{n_pairs / best:.2f} fps  {[round(t, 3) for t in times]}"
        )


if __name__ == "__main__":
    main()
