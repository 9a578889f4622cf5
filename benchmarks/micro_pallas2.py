"""Dispatch-amortized Pallas microbenchmarks (round 2, part 2).

Each kernel repeats its operation many times internally so kernel time
dominates the ~1.7 ms per-call dispatch cost. Measures:
  - per-roll cost (sublane vs lane) on (32, 80, 128)
  - tent-term cost
  - while_loop vs fori_loop per-iteration overhead
  - grid-step overhead (auto-pipelined blocks)
  - quotient-aligned per-point DMA issue rate (the warp_pallas pattern)

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


def bench(name, fn, *args, reps=5):
    try:
        run = jax.jit(lambda *a: fn(*a))
        t0 = time.perf_counter()
        out = run(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = run(*args)
            _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
            best = min(best, time.perf_counter() - t0)
        ms = best / reps * 1e3
        log(f"{name:56s} {ms:9.3f} ms/call (compile {compile_s:.1f}s)")
        return ms
    except Exception as e:
        log(f"{name:56s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None


def repeat_rolls(slabs, oy, n_rolls, axis):
    """n_rolls masked rolls, python-unrolled, on (B, S, C)."""
    s = slabs.shape[axis]

    def kernel(oy_ref, s_ref, o_ref):
        x = s_ref[:]
        o = oy_ref[0].reshape(-1, 1, 1).astype(jnp.int32)
        for k in range(n_rolls):
            t = 1 << (k % 4)
            x = jnp.where((o & t) != 0, pltpu.roll(x, s - t, axis), x)
        o_ref[:] = x

    b = slabs.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, b, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec(slabs.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(slabs.shape, lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(slabs.shape, slabs.dtype),
    )(oy.reshape(1, b, 1).astype(jnp.float32), slabs)


def repeat_tent(slabs, oyf, win, nterms, nrep):
    def kernel(oy_ref, s_ref, o_ref):
        x = s_ref[:]
        o = oy_ref[0].reshape(-1, 1, 1)
        acc = jnp.zeros((x.shape[0], win, x.shape[2]), jnp.float32)
        for r in range(nrep):
            for k in range(nterms):
                w = jnp.maximum(1.0 - jnp.abs(o - float(k + r)), 0.0)
                acc = acc + w * x[:, k : k + win, :]
        o_ref[:] = acc

    b, s, c = slabs.shape
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, b, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec(slabs.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, win, c), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, win, c), jnp.float32),
    )(oyf.reshape(1, b, 1), slabs)


def loop_overhead(x, iters, kind, body_rolls):
    """while/fori loop whose body does body_rolls sublane rolls on x."""

    def kernel(x_ref, o_ref):
        def body_fn(v):
            for _ in range(body_rolls):
                v = pltpu.roll(v, 1, 1) + 1e-7
            return v

        if kind == "fori":
            v = lax.fori_loop(0, iters, lambda j, v: body_fn(v), x_ref[:])
        else:

            def cond(c):
                return c[0] < iters

            def wbody(c):
                return c[0] + 1, body_fn(c[1])

            _, v = lax.while_loop(cond, wbody, (jnp.int32(0), x_ref[:]))
        o_ref[:] = v

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(x.shape, lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec(x.shape, lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def grid_copy(x, nb):
    """trivial per-block copy with grid=(nb,) — grid-step overhead probe."""
    b = x.shape[0] // nb

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((b,) + x.shape[1:], lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((b,) + x.shape[1:], lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def quotient_dma(img, by8, bx128, rows, cols, n):
    """per-point DMAs at quotient-encoded aligned bases (warp_pallas
    pattern: kernel re-multiplies so Mosaic can prove alignment)."""

    def kernel(by_ref, bx_ref, img_ref, out_ref, buf, sem):
        nb = out_ref.shape[0]

        def get(slot, i):
            return pltpu.make_async_copy(
                img_ref.at[
                    pl.ds(by_ref[i] * 8, rows), pl.ds(bx_ref[i] * 128, cols)
                ],
                buf.at[slot],
                sem.at[slot],
            )

        get(0, 0).start()

        def body(i, _):
            slot = lax.rem(i, 2)

            @pl.when(i + 1 < nb)
            def _():
                get(lax.rem(i + 1, 2), i + 1).start()

            get(slot, i).wait()
            out_ref[i] = buf[slot]
            return 0

        lax.fori_loop(0, nb, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, rows, cols), img.dtype),
    )(by8, bx128, img)


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)

    b = 32
    slabs = jax.device_put(jnp.asarray(rng.uniform(0, 255, (b, 80, 128)), jnp.float32))
    oy = jax.device_put(jnp.asarray(rng.randint(0, 13, b), jnp.int32))
    oyf = jax.device_put(jnp.asarray(rng.uniform(0, 12, b), jnp.float32))

    r4 = bench("4 sublane rolls (32,80,128)", lambda s, o: repeat_rolls(s, o, 4, 1), slabs, oy)
    r100 = bench("100 sublane rolls (32,80,128)", lambda s, o: repeat_rolls(s, o, 100, 1), slabs, oy)
    if r4 and r100:
        log(f"  -> per sublane roll+where: {(r100 - r4) / 96 * 1e3:.1f} us")
    l100 = bench("100 lane rolls (32,80,128)", lambda s, o: repeat_rolls(s, o, 100, 2), slabs, oy)
    if r4 and l100:
        log(f"  -> per lane roll+where: {(l100 - r4) / 96 * 1e3:.1f} us")

    t1 = bench("tent 14 terms x1 (32,60,128)", lambda s, o: repeat_tent(s, o, 46, 14, 1), slabs[:, :60, :], oyf)
    t10 = bench("tent 14 terms x10 (32,60,128)", lambda s, o: repeat_tent(s, o, 46, 14, 10), slabs[:, :60, :], oyf)
    if t1 and t10:
        log(f"  -> per tent term (mul+add on (32,46,128)): {(t10 - t1) / (9 * 14) * 1e3:.1f} us")

    x = jax.device_put(jnp.asarray(rng.uniform(0, 1, (32, 48, 128)), jnp.float32))
    w10 = bench("while 10 iters, 2-roll body (32,48,128)", lambda v: loop_overhead(v, 10, "while", 2), x)
    w100 = bench("while 100 iters, 2-roll body", lambda v: loop_overhead(v, 100, "while", 2), x)
    f10 = bench("fori 10 iters, 2-roll body", lambda v: loop_overhead(v, 10, "fori", 2), x)
    f100 = bench("fori 100 iters, 2-roll body", lambda v: loop_overhead(v, 100, "fori", 2), x)
    if w10 and w100:
        log(f"  -> while per-iter: {(w100 - w10) / 90 * 1e3:.1f} us")
    if f10 and f100:
        log(f"  -> fori per-iter: {(f100 - f10) / 90 * 1e3:.1f} us")

    big = jax.device_put(jnp.asarray(rng.uniform(0, 1, (2304, 8, 128)), jnp.float32))
    g1 = bench("grid copy nb=1 (2304,8,128)", lambda v: grid_copy(v, 1), big)
    g72 = bench("grid copy nb=72", lambda v: grid_copy(v, 72), big)
    g288 = bench("grid copy nb=288", lambda v: grid_copy(v, 288), big)
    if g72 and g288:
        log(f"  -> per grid step: {(g288 - g72) / 216 * 1e3:.2f} us")

    img = jax.device_put(jnp.asarray(rng.uniform(0, 255, (1200, 2176)), jnp.float32))
    img_bf = img.astype(jnp.bfloat16)
    n = 2304
    by8 = jax.device_put(jnp.asarray(rng.randint(0, 120, n), jnp.int32))
    bx128 = jax.device_put(jnp.asarray(rng.randint(0, 15, n), jnp.int32))
    d2304 = bench("quotient dma 2304x (64,256) f32", lambda i, y, x_: quotient_dma(i, y, x_, 64, 256, n), img, by8, bx128)
    d288 = bench("quotient dma 288x (64,256) f32", lambda i, y, x_: quotient_dma(i, y, x_, 64, 256, 288), img, by8[:288], bx128[:288])
    bench("quotient dma 2304x (64,256) bf16", lambda i, y, x_: quotient_dma(i, y, x_, 64, 256, n), img_bf, by8, bx128)
    bench("quotient dma 2304x (64,128) f32", lambda i, y, x_: quotient_dma(i, y, x_, 64, 128, n), img, by8, bx128)
    if d2304 and d288:
        log(f"  -> per-DMA marginal: {(d2304 - d288) / (n - 288) * 1e3:.2f} us")


if __name__ == "__main__":
    main()
