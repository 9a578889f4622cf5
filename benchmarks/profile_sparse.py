"""Per-stage timing of the sparse LK pipeline on the real TPU.

Usage: python benchmarks/profile_sparse.py
Times pyramid prep, template/slab extraction, and the Pallas iteration
kernel at the 1080p reference configuration. Diagnostic tool; not the
driver bench.
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


_FLOOR = [0.0]


def timeit(name, fn, *args, reps=8):
    @jax.jit
    def run(*a):
        def body(acc, _):
            out = fn(a[0] + acc * 1e-30, *a[1:])
            return jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]) * 1e-30, None

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
    log(f"{name:36s} {ms:8.2f} ms/call   (compile {compile_s:.1f}s)")
    return ms


def measure_floor():
    @jax.jit
    def nop(x):
        return jnp.sum(x.ravel()[:1]) * 1e-30

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
    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.ops.lk import prepare_frame, pyr_lk
    from hackathonopticalflow_tpu.ops.patch import (
        extract_patches_multi,
        extract_slabs,
    )

    h, w = 1080, 1920
    rng = np.random.RandomState(0)
    a = jax.device_put(jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32))
    b = jax.device_put(jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32))
    pts = jax.device_put(jnp.asarray(measurement_grid(h, w, 30)))
    n = pts.shape[0]
    params = LKParams(use_pallas=True, slab_margin=16)
    log(f"device {jax.devices()[0]}; {n} points at {h}x{w}")
    measure_floor()

    timeit("full pyr_lk (pallas path)", lambda x, y, p: pyr_lk(x, y, p, params)[0], a, b, pts)
    timeit("prepare_frame (pyramid+grads)", lambda x: prepare_frame(x, params), a)

    # extraction stages at level-0 shapes
    prep = jax.jit(lambda x: prepare_frame(x, params))(a)
    lvl = jax.tree.leaves(prep)[0]
    img0 = lvl if lvl.ndim == 2 else lvl[0]
    pad = 24
    img_p = jnp.pad(img0, pad)
    tl = jnp.clip(pts - 22.0, 0, None) + pad
    tli = jnp.floor(tl).astype(jnp.int32)
    timeit(
        "extract_patches_multi (3ch, 45x45)",
        lambda im, t: extract_patches_multi(jnp.stack([im, im, im]), t, 45, 45),
        img_p, tl,
    )
    timeit(
        "extract_slabs (79x79)",
        lambda im, t: extract_slabs(im, t, 79),
        img_p, tli,
    )


if __name__ == "__main__":
    main()
