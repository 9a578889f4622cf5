"""Per-stage timing of the dense Farneback pipeline on the real TPU.

Usage: python benchmarks/profile_dense.py
Times each stage at 720p level-0 shapes (the dominant level) with a
jitted 8x repeat scan + scalar readback, printing ms/call to stderr.
Diagnostic tool; not the driver bench.
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


_FLOOR = [0.0]  # measured dispatch+readback latency, subtracted from runs


def timeit(name, fn, *args, reps=8):
    @jax.jit
    def run(*a):
        def body(acc, _):
            # thread the carry into the first arg: serializes iterations
            # and defeats XLA loop-invariant hoisting/CSE of fn
            out = fn(a[0] + acc * 1e-30, *a[1:])
            return jnp.sum(jax.tree.leaves(out)[0][..., :1]) * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return acc

    t0 = time.perf_counter()
    _ = float(run(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - _FLOOR[0], 0.0) / reps * 1e3
    log(f"{name:34s} {ms:8.2f} ms/call   (compile {compile_s:.1f}s)")
    return ms


def measure_floor():
    @jax.jit
    def nop(x):
        return jnp.sum(x[..., :1]) * 1e-30

    x = jnp.zeros((8, 8), jnp.float32)
    _ = float(nop(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(nop(x))
        best = min(best, time.perf_counter() - t0)
    _FLOOR[0] = best
    log(f"dispatch+readback floor: {best * 1e3:.1f} ms")


def main():
    from hackathonopticalflow_tpu.core.config import FarnebackParams
    from hackathonopticalflow_tpu.ops import farneback as fbmod_pkg  # noqa
    import importlib

    fb = importlib.import_module("hackathonopticalflow_tpu.ops.farneback")
    from hackathonopticalflow_tpu.ops.image import gaussian_blur, box_sum

    h, w = 720, 1280
    rng = np.random.RandomState(0)
    a = jax.device_put(jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32))
    b = jax.device_put(jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32))
    r0 = jax.jit(lambda x: fb.poly_exp(x, 5, 1.2))(a)
    r1 = jax.jit(lambda x: fb.poly_exp(x, 5, 1.2))(b)
    flow = jax.device_put(
        jnp.asarray(rng.uniform(-3, 3, (h, w, 2)), jnp.float32)
    )
    m = jax.jit(lambda x, y, f: fb.update_matrices(x, y, f, mode="pallas"))(
        r0, r1, flow
    )
    log(f"device {jax.devices()[0]}; level-0 shapes {h}x{w}")
    measure_floor()

    timeit("full farneback (auto/pallas)", lambda x, y: fb.farneback(x, y, FarnebackParams()), a, b)
    timeit("poly_exp n=5", lambda x: fb.poly_exp(x, 5, 1.2), a)
    timeit("update_matrices pallas", lambda x, y, f: fb.update_matrices(x, y, f, mode="pallas"), r0, r1, flow)
    timeit("update_matrices packed", lambda x, y, f: fb.update_matrices(x, y, f, mode="packed"), r0, r1, flow)
    timeit("update_flow_blur win=15", lambda mm: fb.update_flow_blur(mm, 15), m)
    timeit("gaussian_blur 5x5", lambda x: gaussian_blur(x, 5, 1.1), a)
    timeit("box_sum 15", lambda x: box_sum(jnp.broadcast_to(x, (5, h, w)), 15, mode="edge"), a)


if __name__ == "__main__":
    main()
