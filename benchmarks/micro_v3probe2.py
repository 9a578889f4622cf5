"""Bisect which structural pattern of ops/lk_pallas3.py crashes the
remote Mosaic compiler (tpu_compile_helper exit 1, 2026-08-20).

Each probe is a minimal kernel exercising ONE pattern the v3 kernel
composes: lane-axis masked rolls, in-kernel concatenate, straight-line
scratch writes, run_scoped scratches, ANY-space manual DMA with major-
vs lane-axis slicing, and scratch reads inside while_loop bodies.
All probes write full (8, 128) blocks (small reduction outputs are a
known SIGABRT) and avoid 16-bit rolls entirely.

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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args):
    try:
        run = jax.jit(fn)
        t0 = time.perf_counter()
        out = run(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
        log(f"{name:52s} ok ({time.perf_counter() - t0:.1f}s)")
        return out
    except Exception as e:  # noqa: BLE001
        log(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return None


def p1_lane_masked_roll(x, m):
    def kernel(m_ref, x_ref, o_ref):
        v = x_ref[:]
        mask = m_ref[0].reshape(1, 1, v.shape[-1])
        for t in (8, 4, 2, 1):
            v = jnp.where((mask & t) != 0, pltpu.roll(v, v.shape[0] - t, 0), v)
            v = jnp.where((mask & t) != 0, pltpu.roll(v, v.shape[1] - t, 1), v)
        o_ref[:] = v

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(m, x)


def p2_concat(x):
    def kernel(x_ref, o_ref):
        a = pltpu.roll(x_ref[:, :16, :], 1, 0)
        b = pltpu.roll(x_ref[:, 16:, :], 2, 0)
        o_ref[:] = jnp.concatenate([a, b], axis=1)

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x)


def p3_scratch_write(x):
    def kernel(x_ref, o_ref, scr):
        for off in (0, 16):
            scr[:, off : off + 16, :] = x_ref[:, off : off + 16, :] * 2.0
        o_ref[:] = scr[...]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM(x.shape, x.dtype)],
    )(x)


def p4_run_scoped(x):
    def kernel(x_ref, o_ref, crop):
        def inner(tmp):
            tmp[...] = x_ref[:] * 3.0
            crop[...] = tmp[...] + 1.0

        pl.run_scoped(inner, tmp=pltpu.VMEM(x.shape, x.dtype))
        o_ref[:] = crop[...]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM(x.shape, x.dtype)],
    )(x)


def p5a_any_dma_major(x):
    """ANY input sliced on the MAJOR axis (warp_pallas pattern)."""
    nb = x.shape[0]

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)

        def inner(buf, sem):
            cp = pltpu.make_async_copy(x_ref.at[i], buf, sem)
            cp.start()
            cp.wait()
            o_ref[:] = buf[...] * 2.0

        pl.run_scoped(
            inner,
            buf=pltpu.VMEM(x.shape[1:], x.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1,) + x.shape[1:], lambda i: (i,) + (0,) * (len(x.shape) - 1)
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def p5b_any_dma_lane(x):
    """ANY input sliced on the LANE axis (the v3 round-1 pattern)."""
    b = 128
    nb = x.shape[-1] // b

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)

        def inner(buf, sem):
            cp = pltpu.make_async_copy(
                x_ref.at[:, :, pl.ds(i * b, b)], buf, sem
            )
            cp.start()
            cp.wait()
            o_ref[:] = buf[...] * 2.0

        pl.run_scoped(
            inner,
            buf=pltpu.VMEM(x.shape[:-1] + (b,), x.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            x.shape[:-1] + (b,), lambda i: (0, 0, i)
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def p6_scratch_read_in_while(x):
    def kernel(x_ref, o_ref, scr):
        scr[...] = x_ref[:] * 2.0

        def cond(c):
            return c[0] < 4

        def body(c):
            i, acc = c
            v = scr[:, :16, :]
            return i + 1, acc + jnp.sum(v, axis=1, keepdims=True) * 1e-30

        _, acc = lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((8, 1, 128), jnp.float32))
        )
        o_ref[:] = x_ref[:] + acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM(x.shape, x.dtype)],
    )(x)


def p7_combo(x):
    """run_scoped DMA -> scratch crop -> while_loop reading the crop with
    chunked masked rolls + concat (the full v3 skeleton, small)."""
    nb = x.shape[0]

    def kernel(m_ref, x_ref, o_ref, crop):
        i = pl.program_id(0)
        mask = m_ref[0].reshape(1, 1, 128)

        def inner(buf, sem):
            cp = pltpu.make_async_copy(x_ref.at[i], buf, sem)
            cp.start()
            cp.wait()
            for off in (0, 16):
                v = buf[:, off : off + 16, :] * 1.0
                v = jnp.where((mask & 1) != 0, pltpu.roll(v, 3, 0), v)
                crop[:, off : off + 16, :] = v

        pl.run_scoped(
            inner,
            buf=pltpu.VMEM(x.shape[1:], x.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

        def cond(c):
            return c[0] < 3

        def body(c):
            j, acc = c
            pieces = []
            for off in (0, 16):
                v = crop[:, off : off + 16, :]
                v = jnp.where((mask & 2) != 0, pltpu.roll(v, 1, 1), v)
                pieces.append(v)
            w = jnp.concatenate(pieces, axis=1)
            return j + 1, acc + w * 1e-30

        _, acc = lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros(x.shape[1:], jnp.float32))
        )
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1,) + x.shape[1:], lambda i: (i,) + (0,) * 3
        ),
        out_shape=jax.ShapeDtypeStruct((nb,) + x.shape[1:], jnp.float32),
        scratch_shapes=[pltpu.VMEM(x.shape[1:], jnp.float32)],
    )(jnp.zeros((nb, 1, 128), jnp.int32) + 3, x)


def main():
    rng = np.random.RandomState(0)
    log(f"device {jax.devices()[0]}")
    x = jnp.asarray(rng.uniform(0, 255, (24, 32, 128)), jnp.float32)
    m = jnp.asarray(rng.randint(0, 16, (1, 128)), jnp.int32)

    out = bench("p1 lane-masked rolls (axes 0,1)", p1_lane_masked_roll, x, m)
    if out is not None:
        ref = np.asarray(x)
        mm = np.asarray(m).reshape(-1)
        for t in (8, 4, 2, 1):
            sel = (mm & t) != 0
            r0 = np.roll(ref, -t, 0)
            ref = np.where(sel[None, None, :], r0, ref)
            r1 = np.roll(ref, -t, 1)
            ref = np.where(sel[None, None, :], r1, ref)
        log(f"   correct: {bool(np.allclose(np.asarray(out), ref))}")
    bench("p2 in-kernel concatenate", p2_concat, x)
    bench("p3 straight-line scratch writes", p3_scratch_write, x)
    bench("p4 run_scoped scratch + handoff", p4_run_scoped, x)
    x4 = jnp.asarray(rng.uniform(0, 255, (4, 24, 32, 128)), jnp.float32)
    bench("p5a ANY DMA, major-axis slice", p5a_any_dma_major, x4)
    x3 = jnp.asarray(rng.uniform(0, 255, (24, 32, 256)), jnp.float32)
    bench("p5b ANY DMA, lane-axis slice", p5b_any_dma_lane, x3)
    bench("p6 scratch read in while_loop", p6_scratch_read_in_while, x)
    bench("p7 combo (v3 skeleton, small)", p7_combo, x4)


if __name__ == "__main__":
    main()
