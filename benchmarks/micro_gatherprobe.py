"""Probe: does jnp.take_along_axis (lax.gather) lower inside a Mosaic
TPU kernel on this toolchain, along sublane and/or lane axes?

If the sublane-axis form compiles and is correct, the dense warp kernel
(ops/warp_pallas.py) can replace its row-candidate tent walk with a
single per-lane dynamic row gather; if the lane-axis form works too, the
column walk collapses as well. Diagnostic tool; safe to delete.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(name, build, check):
    try:
        t0 = time.perf_counter()
        out = np.asarray(jax.jit(build)())
        ok = check(out)
        log(f"{name}: {'OK' if ok else 'WRONG'}  ({time.perf_counter() - t0:.1f}s)")
        return ok
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return False


def main():
    log(f"device {jax.devices()[0]}")
    R, L = 32, 128
    data = np.arange(R * L, dtype=np.float32).reshape(R, L)
    # per-lane row indices, varying per lane
    ridx = (np.arange(L) % R).astype(np.int32)

    # 1) sublane-axis gather: out[i, l] = data[(i + ridx[l]) % R, l]
    def build_sub():
        d = jnp.asarray(data)
        idx = (jnp.arange(R)[:, None] + jnp.asarray(ridx)[None, :]) % R

        def kern(d_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=0)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        )(d, idx)

    exp_sub = np.stack(
        [data[(np.arange(R) + ridx[l]) % R, l] for l in range(L)], axis=1
    )
    probe("take_along_axis sublane", build_sub, lambda o: np.array_equal(o, exp_sub))

    # 2) lane-axis gather: out[i, l] = data[i, (l + i) % L]
    def build_lane():
        d = jnp.asarray(data)
        idx = (jnp.arange(L)[None, :] + jnp.arange(R)[:, None]) % L

        def kern(d_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=1)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        )(d, idx)

    exp_lane = np.stack([data[i, (np.arange(L) + i) % L] for i in range(R)])
    probe("take_along_axis lane", build_lane, lambda o: np.array_equal(o, exp_lane))

    # 3) 3-D operand, gather along middle (sublane-tiled) axis
    C = 5
    data3 = np.arange(C * R * L, dtype=np.float32).reshape(C, R, L)

    def build_3d():
        d = jnp.asarray(data3)
        idx = jnp.broadcast_to(
            ((jnp.arange(R)[:, None] + jnp.asarray(ridx)[None, :]) % R)[None],
            (C, R, L),
        )

        def kern(d_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=1)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, R, L), jnp.float32),
        )(d, idx)

    exp3 = np.stack(
        [
            np.stack([data3[c][(np.arange(R) + ridx[l]) % R, l] for l in range(L)], 1)
            for c in range(C)
        ]
    )
    probe("take_along_axis 3d-sublane", build_3d, lambda o: np.array_equal(o, exp3))


if __name__ == "__main__":
    main()
