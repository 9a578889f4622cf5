"""Micro round 2: batched rect carve — find a Pallas DMA formulation
that COMPILES on this relay, and time everything in-graph.

Lessons from micro_carve.py (2026-08-21):
- every timed call from the host pays the ~30-50 ms relay dispatch
  floor, so carve costs must be measured with an IN-GRAPH rep loop and
  a scalar readback;
- the first kernel formulation (lax.fori_loop bodies issuing per-point
  DMAs against a (block,)-semaphore array) crashes the remote compile
  helper (HTTP 500 subprocess exit) for every variant — same failure
  class as lk_pallas3's abandoned manual-DMA form. This probe tries
  four fallback formulations, simplest first:
    v1: grid=(N,), ONE dma per grid step, scalar sem, no loops;
    v2: grid=(N/16,), UNROLLED 16 starts + 16 waits (straight-line,
        16-sem array, no lax loops);
    v3: v2 with provably (8,8)-aligned origins (quotients scaled in
        kernel) and an enlarged rect;
    v4: warp_pallas-style: fori_loop over points with a 2-slot
        double-buffered VMEM scratch + straight-line copy to out.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 2304
RY, RX = 86, 88
H, W = 1222, 2062
REPS = 24


def timed(make_fn, label):
    """make_fn() -> jitted fn(tl) returning a scalar; times one dispatch
    with REPS in-graph carve iterations."""
    try:
        fn, tl = make_fn()
        t0 = time.perf_counter()
        v = float(fn(tl))
        log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s "
            f"(val {v:.1f})")
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(tl))
            times.append(time.perf_counter() - t0)
        best = min(times)
        per = (best - 0.033) / (REPS * N) * 1e6
        log(f"{label}: best {best*1e3:.2f} ms for {REPS}x{N} rects "
            f"-> ~{per:.3f} us/rect (minus 33ms dispatch)")
    except Exception as e:
        log(f"{label} FAILED: {type(e).__name__}: {str(e)[:200]}")


def rep_loop(carve):
    """Wrap carve(tl)->(N,ry,rx) into REPS in-graph iterations with
    varying origins, reduced to one scalar."""

    @jax.jit
    def fn(tl):
        def body(i, acc):
            out = carve(tl + i)
            return acc + out[0, 0, 0] + out[-1, -1, -1]

        return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return fn


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).round(), jnp.float32)
    tl_np = np.stack(
        [rng.randint(0, W - RX - REPS - 8, N),
         rng.randint(0, H - RY - REPS - 8, N)], -1
    ).astype(np.int32)
    tlj = jnp.asarray(tl_np)

    # (a) XLA gather baseline, in-graph
    def make_xla():
        def carve(tl):
            return jax.vmap(
                lambda p: lax.dynamic_slice(img, (p[1], p[0]), (RY, RX))
            )(tl)

        return rep_loop(carve), tlj

    timed(make_xla, "(a) XLA gather")

    # v1: one DMA per grid step, scalar semaphore, no loops
    def make_v1():
        def kernel(xs, ys, img_ref, out_ref, sem):
            i = pl.program_id(0)
            dma = pltpu.make_async_copy(
                img_ref.at[pl.ds(ys[i], RY), pl.ds(xs[i], RX)],
                out_ref, sem,
            )
            dma.start()
            dma.wait()

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, RY, RX), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )
        call = pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((N, RY, RX), jnp.float32),
            interpret=False,
        )

        def carve(tl):
            return call(tl[:, 0], tl[:, 1], img)

        return rep_loop(carve), tlj

    timed(make_v1, "(v1) per-point grid, scalar sem")

    # v2: unrolled 16 starts + 16 waits per grid step
    B2 = 16

    def make_v2():
        def kernel(xs, ys, img_ref, out_ref, sems):
            bi = pl.program_id(0)
            dmas = []
            for j in range(B2):
                dmas.append(pltpu.make_async_copy(
                    img_ref.at[
                        pl.ds(ys[bi * B2 + j], RY),
                        pl.ds(xs[bi * B2 + j], RX),
                    ],
                    out_ref.at[j], sems.at[j],
                ))
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N // B2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((B2, RY, RX), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((B2,))],
        )
        call = pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((N, RY, RX), jnp.float32),
            interpret=False,
        )

        def carve(tl):
            return call(tl[:, 0], tl[:, 1], img)

        return rep_loop(carve), tlj

    timed(make_v2, "(v2) unrolled 16-DMA blocks")

    # v3: v2 with provably 8-aligned origins (quotients, enlarged rect)
    RY3, RX3 = RY + 8, RX + 8

    def make_v3():
        def kernel(xq, yq, img_ref, out_ref, sems):
            bi = pl.program_id(0)
            dmas = []
            for j in range(B2):
                dmas.append(pltpu.make_async_copy(
                    img_ref.at[
                        pl.ds(yq[bi * B2 + j] * 8, RY3),
                        pl.ds(xq[bi * B2 + j] * 8, RX3),
                    ],
                    out_ref.at[j], sems.at[j],
                ))
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N // B2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((B2, RY3, RX3), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((B2,))],
        )
        call = pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((N, RY3, RX3), jnp.float32),
            interpret=False,
        )

        def carve(tl):
            return call(tl[:, 0] // 8, tl[:, 1] // 8, img)

        return rep_loop(carve), tlj

    timed(make_v3, "(v3) unrolled, provably 8-aligned")

    # v4: warp-style — fori over points, 2-slot scratch double buffer,
    # straight-line scratch->out copies via dynamic out index
    def make_v4():
        B4 = 64

        def kernel(xs, ys, img_ref, out_ref, slab2, sem2):
            bi = pl.program_id(0)

            def get_dma(slot, j):
                return pltpu.make_async_copy(
                    img_ref.at[
                        pl.ds(ys[bi * B4 + j], RY),
                        pl.ds(xs[bi * B4 + j], RX),
                    ],
                    slab2.at[slot], sem2.at[slot],
                )

            get_dma(0, 0).start()

            def body(j, c):
                slot = lax.rem(j, 2)

                @pl.when(j + 1 < B4)
                def _():
                    get_dma(lax.rem(j + 1, 2), j + 1).start()

                get_dma(slot, j).wait()
                out_ref[pl.ds(j, 1)] = slab2[slot][None]
                return c

            lax.fori_loop(0, B4, body, 0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N // B4,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((B4, RY, RX), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, RY, RX), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        call = pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((N, RY, RX), jnp.float32),
            interpret=False,
        )

        def carve(tl):
            return call(tl[:, 0], tl[:, 1], img)

        return rep_loop(carve), tlj

    timed(make_v4, "(v4) warp-style double-buffer")


if __name__ == "__main__":
    main()
