"""Microbenchmarks for sparse-LK kernel redesign decisions (round 2).

Measures, on the real TPU:
  1. whether DMA from HBM at UNALIGNED (row, lane) offsets is legal + its cost
  2. per-point DMA issue rate (many small copies, double-buffered)
  3. pltpu.roll cost on (B, S, 128) vs (S, S, B) layouts
  4. lax.while_loop per-iteration overhead at small shapes
  5. masked-where select cost

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


def bench(name, fn, *args, reps=20):
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
        log(f"{name:52s} {ms:9.3f} ms/call (compile {compile_s:.1f}s)")
        return ms
    except Exception as e:
        log(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None


# ---------------------------------------------------------------- 1: unaligned DMA
def unaligned_dma(img, bases_y, bases_x, rows, cols, n):
    """n per-point DMAs from HBM at arbitrary integer offsets."""

    def kernel(by_ref, bx_ref, img_ref, out_ref, buf, sem):
        nb = out_ref.shape[0]

        def get(slot, i):
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(by_ref[i], rows), pl.ds(bx_ref[i], cols)],
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
    )(bases_y, bases_x, img)


# ---------------------------------------------------------------- 3: roll ladders
def roll_ladder_bss(slabs, oy, n_bits, axis):
    """masked roll ladder on (B, S, S) layout."""
    s = slabs.shape[axis]

    def kernel(oy_ref, s_ref, o_ref):
        x = s_ref[:]
        o = oy_ref[0].reshape(-1, 1, 1).astype(jnp.int32)
        for t in [1 << k for k in range(n_bits)]:
            x = jnp.where((o & t) != 0, pltpu.roll(x, s - t, axis), x)
        o_ref[:] = x

    b = slabs.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, b, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec(slabs.shape, lambda i: (0,) * slabs.ndim),
        ],
        out_specs=pl.BlockSpec(slabs.shape, lambda i: (0,) * slabs.ndim),
        out_shape=jax.ShapeDtypeStruct(slabs.shape, slabs.dtype),
    )(oy.reshape(1, b, 1).astype(jnp.float32), slabs)


def tent_rows(slabs, oyf, win, nterms):
    """row tent-select+blend on (B, S, C) -> (B, win, C): sum_k ty_k*slab[:,k:k+win]."""

    def kernel(oy_ref, s_ref, o_ref):
        x = s_ref[:]
        o = oy_ref[0].reshape(-1, 1, 1)
        acc = jnp.zeros((x.shape[0], win, x.shape[2]), jnp.float32)
        for k in range(nterms):
            w = jnp.maximum(1.0 - jnp.abs(o - float(k)), 0.0)
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


def tent_rows_ssb(slabs, oyf, win, nterms):
    """row tent on (S, C, B): points on lanes."""

    def kernel(oy_ref, s_ref, o_ref):
        x = s_ref[:]
        o = oy_ref[0].reshape(1, 1, -1)
        acc = jnp.zeros((win, x.shape[1], x.shape[2]), jnp.float32)
        for k in range(nterms):
            w = jnp.maximum(1.0 - jnp.abs(o - float(k)), 0.0)
            acc = acc + w * x[k : k + win, :, :]
        o_ref[:] = acc

    s, c, b = slabs.shape
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 1, b), lambda i: (0, 0, 0)),
            pl.BlockSpec(slabs.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((win, c, b), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((win, c, b), jnp.float32),
    )(oyf.reshape(1, 1, b), slabs)


# ---------------------------------------------------------------- 4: while loop
def while_overhead(x, iters):
    def kernel(x_ref, o_ref):
        def cond(c):
            return c[0] < iters

        def body(c):
            j, v = c
            return j + 1, v * 1.000001 + 0.000001

        _, v = lax.while_loop(cond, body, (jnp.int32(0), x_ref[:]))
        o_ref[:] = v

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(x.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec(x.shape, lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    img = jax.device_put(jnp.asarray(rng.uniform(0, 255, (1200, 2176)), jnp.float32))
    img_bf = img.astype(jnp.bfloat16)

    n = 2304
    by = jax.device_put(jnp.asarray(rng.randint(0, 1000, n), jnp.int32))
    bx_u = jax.device_put(jnp.asarray(rng.randint(0, 1900, n), jnp.int32))
    bx_a = (bx_u // 128) * 128
    by_a = (by // 8) * 8

    # 1/2: DMA legality + issue rate
    bench("dma 2304x (60,128) f32 aligned", lambda i,y,x: unaligned_dma(i,y,x,60,128,n), img, by_a, bx_a)
    bench("dma 2304x (60,128) f32 unaligned-rows", lambda i,y,x: unaligned_dma(i,y,x,60,128,n), img, by, bx_a)
    bench("dma 2304x (60,128) f32 unaligned-both", lambda i,y,x: unaligned_dma(i,y,x,60,128,n), img, by, bx_u)
    bench("dma 2304x (60,128) bf16 unaligned-both", lambda i,y,x: unaligned_dma(i,y,x,60,128,n), img_bf, by, bx_u)
    bench("dma 2304x (60,64) f32 unaligned-both", lambda i,y,x: unaligned_dma(i,y,x,60,64,n), img, by, bx_u)
    bench("dma 288x (60,128) f32 unaligned", lambda i,y,x: unaligned_dma(i,y,x,60,128,288), img, by[:288], bx_u[:288])

    # 3: roll ladders / tent selects
    b = 32
    slabs = jax.device_put(jnp.asarray(rng.uniform(0, 255, (b, 80, 128)), jnp.float32))
    oy = jax.device_put(jnp.asarray(rng.randint(0, 13, b), jnp.int32))
    oyf = jax.device_put(jnp.asarray(rng.uniform(0, 13, b), jnp.float32))
    bench("roll-ladder 4 bits axis1 (32,80,128)", lambda s,o: roll_ladder_bss(s,o,4,1), slabs, oy)
    bench("roll-ladder 7 bits axis1 (32,80,128)", lambda s,o: roll_ladder_bss(s,o,7,1), slabs, oy)
    bench("roll-ladder 4 bits axis2 (32,80,128)", lambda s,o: roll_ladder_bss(s,o,4,2), slabs, oy)
    bench("tent-rows 14 terms (32,60,128)->(32,46,128)",
          lambda s,o: tent_rows(s,o,46,14), slabs[:, :60, :], oyf)

    b2 = 128
    slabs_t = jax.device_put(jnp.asarray(rng.uniform(0, 255, (60, 60, b2)), jnp.float32))
    oyf2 = jax.device_put(jnp.asarray(rng.uniform(0, 13, b2), jnp.float32))
    bench("tent-rows-ssb 14 terms (60,60,128)->(46,60,128)",
          lambda s,o: tent_rows_ssb(s,o,46,14), slabs_t, oyf2)
    # axis0 roll ladder: measured 1.742 ms/call, 295 s compile - ruled out

    # 4: while loop overhead
    x = jax.device_put(jnp.asarray(rng.uniform(0, 1, (8, 128)), jnp.float32))
    t10 = bench("while_loop 10 iters tiny body", lambda v: while_overhead(v, 10), x)
    t100 = bench("while_loop 100 iters tiny body", lambda v: while_overhead(v, 100), x)
    if t10 and t100:
        log(f"  -> per-iteration overhead ~{(t100 - t10) / 90 * 1e3:.2f} us")


def roll_ladder_ssb_axis0(slabs, oyf):
    """masked roll ladder on axis 0 of (S, C, B) — legality check."""

    def kernel(oy_ref, s_ref, o_ref):
        x = s_ref[:]
        o = oy_ref[0].reshape(1, 1, -1)
        s = x.shape[0]
        for t in (1, 2, 4, 8):
            x = jnp.where((o.astype(jnp.int32) & t) != 0, pltpu.roll(x, s - t, 0), x)
        o_ref[:] = x

    s, c, b = slabs.shape
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 1, b), lambda i: (0, 0, 0)),
            pl.BlockSpec(slabs.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(slabs.shape, lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(slabs.shape, slabs.dtype),
    )(oyf.reshape(1, 1, b), slabs)


if __name__ == "__main__":
    main()
