"""Probe 3: pin down the in-kernel lane gather's constraints.

Hypothesis from probe 2: jnp.take_along_axis(axis=-1) lowers only for
operands exactly 128 lanes wide (a per-vreg lane shuffle), same-shape
idx. Probes: correctness + timing at (R, 128); wider-range selection via
two gathers + select; dtypes; idx clamping semantics; fori_loop use.

Diagnostic tool; safe to delete.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_probe(name, fn):
    try:
        out = fn()
        log(f"{name}: {out}")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")


def timed(build, reps=100):
    @jax.jit
    def run(x):
        def body(acc, _):
            out = build(acc)
            return jnp.sum(out.ravel()[:1].astype(jnp.float32)) * 1e-30, None

        acc, _ = lax.scan(body, jnp.float32(0), None, length=reps)
        return acc

    float(run(jnp.zeros((), jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(jnp.zeros((), jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def main():
    log(f"device {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    R = 480
    data = rng.uniform(0, 255, (R, 128)).astype(np.float32)
    idx = rng.randint(0, 128, (R, 128)).astype(np.int32)

    def g128():
        def kern(d_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=1)

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)
        )(jnp.asarray(data), jnp.asarray(idx))
        return (
            "OK" if np.array_equal(np.asarray(out), np.take_along_axis(data, idx, 1))
            else "WRONG"
        )

    run_probe("gather (480,128) f32 same-shape idx", g128)

    def g128_t(x):
        def kern(x_ref, d_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(
                d_ref[...] + x_ref[0, 0], i_ref[...], axis=1
            )

        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)
        )(x.reshape(1, 1), jnp.asarray(data), jnp.asarray(idx))

    run_probe("time gather (480,128)", lambda: f"{timed(g128_t):.4f} ms")

    def g128x8_t(x):
        """8 chained gathers — amortizes pallas_call overhead."""

        def kern(x_ref, d_ref, i_ref, o_ref):
            a = d_ref[...] + x_ref[0, 0]
            ii = i_ref[...]
            for _ in range(8):
                a = jnp.take_along_axis(a, ii, axis=1)
            o_ref[...] = a

        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)
        )(x.reshape(1, 1), jnp.asarray(data), jnp.asarray(idx))

    run_probe("time 8x gather (480,128)", lambda: f"{timed(g128x8_t):.4f} ms")

    def roll_t(x):
        def kern(x_ref, d_ref, o_ref):
            a = d_ref[...] + x_ref[0, 0]
            for t in (64, 32, 16, 8, 4, 2, 1):
                a = pltpu.roll(a, 128 - t, 1)
            o_ref[...] = a

        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)
        )(x.reshape(1, 1), jnp.asarray(data))

    run_probe("time 7-roll ladder (480,128)", lambda: f"{timed(roll_t):.4f} ms")

    def fma8_t(x):
        """8 fmas on the same shape — the VPU-issue yardstick."""

        def kern(x_ref, d_ref, o_ref):
            a = d_ref[...] + x_ref[0, 0]
            b = d_ref[...]
            for _ in range(8):
                a = a * 1.0001 + b
            o_ref[...] = a

        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)
        )(x.reshape(1, 1), jnp.asarray(data))

    run_probe("time 8x fma (480,128)", lambda: f"{timed(fma8_t):.4f} ms")

    # two-vreg wide selection: select from a 256-wide window via 2 gathers
    data2 = rng.uniform(0, 255, (R, 256)).astype(np.float32)
    idx2 = rng.randint(0, 256, (R, 128)).astype(np.int32)

    def wide():
        def kern(d_ref, i_ref, o_ref):
            d = d_ref[...]
            ii = i_ref[...]
            lo = jnp.take_along_axis(d[:, :128], jnp.clip(ii, 0, 127), axis=1)
            hi = jnp.take_along_axis(
                d[:, 128:], jnp.clip(ii - 128, 0, 127), axis=1
            )
            o_ref[...] = jnp.where(ii < 128, lo, hi)

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)
        )(jnp.asarray(data2), jnp.asarray(idx2))
        return (
            "OK" if np.array_equal(np.asarray(out), np.take_along_axis(data2, idx2, 1))
            else "WRONG"
        )

    run_probe("wide select 256 via 2 gathers", wide)

    # dtypes at 128
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8"), (jnp.int16, "i16"), (jnp.int32, "i32")):

        def dtp(dt=dt):
            d = jnp.asarray(data.astype(dt))

            def kern(d_ref, i_ref, o_ref):
                o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=1)

            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((R, 128), dt)
            )(d, jnp.asarray(idx))
            exp = np.take_along_axis(np.asarray(d), idx, 1)
            return "OK" if np.array_equal(np.asarray(out), exp) else "WRONG"

        run_probe(f"gather {name} (480,128)", dtp)

    # idx arithmetic in-kernel + use inside fori_loop
    def loop128():
        base = np.minimum(idx, 126)

        def kern(d_ref, i_ref, o_ref):
            d = d_ref[...]

            def body(k, acc):
                g = jnp.take_along_axis(d, i_ref[...] + k, axis=1)
                return acc + g

            o_ref[...] = lax.fori_loop(0, 2, body, jnp.zeros((R, 128), jnp.float32))

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)
        )(jnp.asarray(data), jnp.asarray(base))
        exp = np.take_along_axis(data, base, 1) + np.take_along_axis(data, base + 1, 1)
        return "OK" if np.allclose(np.asarray(out), exp) else "WRONG"

    run_probe("gather in fori_loop idx+k", loop128)

    # out-of-range idx semantics (needed to skip clipping): what does
    # idx=130 / -5 return on a 128-wide operand?
    def oob():
        bad = np.array([[130, -5, 127, 0] + [1] * 124], np.int32)
        bad = np.broadcast_to(bad, (8, 128)).copy()
        d8 = data[:8]

        def kern(d_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=1)

        out = np.asarray(
            pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
            )(jnp.asarray(d8), jnp.asarray(bad))
        )
        mod = np.take_along_axis(d8, bad % 128, 1)
        clp = np.take_along_axis(d8, np.clip(bad, 0, 127), 1)
        if np.array_equal(out, mod):
            return "wraps (mod 128)"
        if np.array_equal(out, clp):
            return "clamps"
        return f"other: out[0,:2]={out[0, :2]} vs d8[0,[130%128,-5%128]]"

    run_probe("OOB idx semantics", oob)

    # 3-D operand via leading reshape? (c, R, 128) -> merge to (c*R, 128)
    def merged3d():
        C = 5
        d3 = rng.uniform(0, 255, (C, 96, 128)).astype(np.float32)
        i3 = rng.randint(0, 128, (C * 96, 128)).astype(np.int32)

        def kern(d_ref, i_ref, o_ref):
            d = d_ref[...].reshape(C * 96, 128)
            o_ref[...] = jnp.take_along_axis(d, i_ref[...], axis=1).reshape(
                C, 96, 128
            )

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((C, 96, 128), jnp.float32)
        )(jnp.asarray(d3), jnp.asarray(i3))
        exp = np.take_along_axis(d3.reshape(-1, 128), i3, 1).reshape(C, 96, 128)
        return "OK" if np.array_equal(np.asarray(out), exp) else "WRONG"

    run_probe("3d operand via reshape merge", merged3d)


if __name__ == "__main__":
    main()
