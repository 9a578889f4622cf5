"""TPU cost probe for the init-centered (rescue) sparse design (round 5):
steady-state ms/pair of the 1080p production scan with rescue_large on
vs off (= the round-4 path), same process. Diagnostics to stderr."""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.flow.lk_grid import lk_grid_flow_video
    from bench import load_frames

    log(f"device: {jax.devices()[0]}")
    n_pairs = 24
    frames = load_frames(n_pairs, 1080, 1920)
    h, w = frames.shape[1:]
    pts = jax.device_put(jnp.asarray(measurement_grid(h, w, 30)))
    dev = jax.device_put(jnp.asarray(frames))

    base = LKParams(
        grid_step=30, use_pallas=True, compute_err=False, grid_kernel="lanes"
    )
    for name, lk in [
        ("rescue ON ", base),
        ("rescue OFF", dataclasses.replace(base, rescue_large=False)),
    ]:
        @jax.jit
        def run_all(fr, lk=lk):
            res = lk_grid_flow_video(fr[::-1].astype(jnp.float32), pts, lk=lk)
            return jnp.sum(res.modulus)

        t0 = time.perf_counter()
        _ = float(run_all(dev))
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(run_all(dev))
            times.append(time.perf_counter() - t0)
        best = min(times)
        log(
            f"{name}: {best:.3f}s / {n_pairs} pairs = "
            f"{best / n_pairs * 1e3:.2f} ms/pair -> {n_pairs / best:.2f} fps  "
            f"{[round(t, 3) for t in times]}"
        )


if __name__ == "__main__":
    main()
