"""Probe 2: cost model + constraints of the in-kernel lane-axis
dynamic gather (jnp.take_along_axis(..., axis=-1)) on this toolchain.

Questions (each probed separately so one failure doesn't hide others):
 1. May idx be NARROWER than the operand (output width < operand width)?
 2. Throughput: gather over (480, 384) f32 vs an equivalent roll ladder.
 3. Does it accept int8 / bfloat16 operands?
 4. idx built in-kernel from iota + a scalar works?
 5. 2-D only confirmed — operand (R, C) with R multiple of 8.

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


def timed(build, reps=50):
    """Median per-call ms of a jitted scan-repeated kernel call."""

    @jax.jit
    def run(x):
        def body(acc, _):
            out = build(x + acc * 1e-30)
            return jnp.sum(out.ravel()[:1]) * 1e-30, None

        acc, _ = lax.scan(body, jnp.float32(0), None, length=reps)
        return acc

    x = jnp.zeros((), jnp.float32)
    float(run(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def main():
    log(f"device {jax.devices()[0]}")
    R, C, W = 480, 384, 128
    rng = np.random.RandomState(0)
    data = rng.uniform(0, 255, (R, C)).astype(np.float32)
    idx_n = rng.randint(0, C - 1, (R, W)).astype(np.int32)
    idx_w = rng.randint(0, C - 1, (R, C)).astype(np.int32)

    # 1) narrow idx
    def narrow():
        def kern(d_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=1)

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32)
        )(jnp.asarray(data), jnp.asarray(idx_n))
        exp = np.take_along_axis(data, idx_n, axis=1)
        return "OK" if np.array_equal(np.asarray(out), exp) else "WRONG"

    run_probe("narrow idx (480,384)->(480,128)", narrow)

    # 2) throughput: full-width gather vs roll ladder
    def g_full(_):
        def kern(d_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=1)

        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32)
        )(jnp.asarray(data), jnp.asarray(idx_w))

    def g_narrow(_):
        def kern(d_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=1)

        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32)
        )(jnp.asarray(data), jnp.asarray(idx_n))

    def ladder7(_):
        def kern(d_ref, o_ref):
            a = d_ref[...]
            for t in (64, 32, 16, 8, 4, 2, 1):
                a = pltpu.roll(a, C - t, 1)
            o_ref[...] = a

        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32)
        )(jnp.asarray(data))

    run_probe("time gather full (480,384)", lambda: f"{timed(g_full):.4f} ms")
    run_probe("time gather narrow (480,384)->(480,128)", lambda: f"{timed(g_narrow):.4f} ms")
    run_probe("time 7-roll ladder (480,384)", lambda: f"{timed(ladder7):.4f} ms")

    # 3) dtypes
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8"), (jnp.int16, "i16")):
        def dt_probe(dt=dt):
            d = jnp.asarray(data.astype(dt))

            def kern(d_ref, i_ref, o_ref):
                o_ref[...] = jnp.take_along_axis(d_ref[...], i_ref[...], axis=1)

            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((R, W), dt)
            )(d, jnp.asarray(idx_n))
            exp = np.take_along_axis(np.asarray(d), idx_n, axis=1)
            return "OK" if np.array_equal(np.asarray(out), exp) else "WRONG"

        run_probe(f"gather {name} operand", dt_probe)

    # 4) idx from in-kernel iota + per-lane base row
    def iota_idx():
        base = rng.randint(0, C - W - 2, (8, W)).astype(np.int32)

        def kern(d_ref, b_ref, o_ref):
            d = d_ref[...]
            b = b_ref[...]
            idx = jnp.broadcast_to(b[:1], (R, W)) + 0 * lax.broadcasted_iota(
                jnp.int32, (R, W), 0
            )
            o_ref[...] = jnp.take_along_axis(d, idx, axis=1)

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32)
        )(jnp.asarray(data), jnp.asarray(base))
        exp = np.take_along_axis(data, np.broadcast_to(base[:1], (R, W)), axis=1)
        return "OK" if np.array_equal(np.asarray(out), exp) else "WRONG"

    run_probe("idx from broadcast+iota", iota_idx)

    # 5) gather inside a fori_loop body (the kernel will loop output rows)
    def in_loop():
        def kern(d_ref, i_ref, o_ref):
            d = d_ref[...]

            def body(k, acc):
                g = jnp.take_along_axis(d, i_ref[...] + k, axis=1)
                return acc + g

            o_ref[...] = lax.fori_loop(0, 2, body, jnp.zeros((R, W), jnp.float32))

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32)
        )(jnp.asarray(data), jnp.asarray(np.minimum(idx_n, C - 3)))
        i2 = np.minimum(idx_n, C - 3)
        exp = np.take_along_axis(data, i2, 1) + np.take_along_axis(data, i2 + 1, 1)
        return "OK" if np.allclose(np.asarray(out), exp) else "WRONG"

    run_probe("gather in fori_loop, idx+k", in_loop)


if __name__ == "__main__":
    main()
