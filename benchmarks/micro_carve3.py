"""Micro round 3: isolate WHICH carve-kernel construct the relay's
Mosaic helper can compile.

micro_carve2 results (2026-08-21): XLA gather = 1.34 us/rect in-graph;
v1 died with a REAL verification error — 'DMA source and target shape
mismatch' (dst was the whole (1,RY,RX) block vs (RY,RX) src) — and the
other variants crashed the helper, possibly from the same latent rank
mismatch. This round rank-matches every DMA and bisects:
  w1: per-point grid, dst out_ref.at[0] (rank-matched), scalar sem
  w2: w1 with provably 8-aligned origins (quotients x8 in kernel)
  w3: 8-point blocks, fori body = start+wait on a reused scalar sem
      (serial DMA, DMA-only loop body)
  w4: 8-point blocks, straight-line unrolled 8 starts + 8 waits
Each successful variant is timed in-graph at the rescue rect (86,88)
and the winner re-timed at the tracker template rect (16,16).
"""

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
H, W = 1222, 2062
REPS = 24


def rep_loop(carve):
    @jax.jit
    def fn(tl):
        def body(i, acc):
            out = carve(tl + i)
            return acc + out[0, 0, 0] + out[-1, -1, -1]

        return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return fn


def timed(make_fn, label, n=N):
    try:
        fn, tl, check = make_fn()
        t0 = time.perf_counter()
        v = float(fn(tl))
        log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s "
            f"(val {v:.1f})")
        if check is not None:
            ok = check()
            log(f"{label}: value check {'OK' if ok else 'MISMATCH'}")
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(tl))
            times.append(time.perf_counter() - t0)
        best = min(times)
        per = (best - 0.033) / (REPS * n) * 1e6
        log(f"{label}: best {best*1e3:.2f} ms -> ~{per:.3f} us/rect")
        return True
    except Exception as e:
        log(f"{label} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return False


def make_variant(img, tl_np, ry, rx, form, aligned=False):
    tlj = jnp.asarray(tl_np)
    n = tl_np.shape[0]

    def src(img_ref, xs, ys, idx):
        if aligned:
            return img_ref.at[pl.ds(ys[idx] * 8, ry), pl.ds(xs[idx] * 8, rx)]
        return img_ref.at[pl.ds(ys[idx], ry), pl.ds(xs[idx], rx)]

    if form == "perpoint":
        def kernel(xs, ys, img_ref, out_ref, sem):
            i = pl.program_id(0)
            dma = pltpu.make_async_copy(src(img_ref, xs, ys, i),
                                        out_ref.at[0], sem)
            dma.start()
            dma.wait()

        grid, blk, scratch = (n,), (1, ry, rx), [pltpu.SemaphoreType.DMA(())]
    elif form == "fori":
        B = 8

        def kernel(xs, ys, img_ref, out_ref, sem):
            bi = pl.program_id(0)

            def body(j, c):
                dma = pltpu.make_async_copy(
                    src(img_ref, xs, ys, bi * B + j), out_ref.at[j], sem
                )
                dma.start()
                dma.wait()
                return c

            lax.fori_loop(0, B, body, 0)

        grid, blk, scratch = (n // B,), (B, ry, rx), [
            pltpu.SemaphoreType.DMA(())
        ]
    else:  # unrolled
        B = 8

        def kernel(xs, ys, img_ref, out_ref, sems):
            bi = pl.program_id(0)
            dmas = [
                pltpu.make_async_copy(
                    src(img_ref, xs, ys, bi * B + j), out_ref.at[j],
                    sems.at[j],
                )
                for j in range(B)
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        grid, blk, scratch = (n // B,), (B, ry, rx), [
            pltpu.SemaphoreType.DMA((B,))
        ]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(blk, lambda i, *_: (i, 0, 0)),
        scratch_shapes=scratch,
    )
    call = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n, ry, rx), jnp.float32),
        interpret=False,
    )

    def carve(tl):
        if aligned:
            return call(tl[:, 0] // 8, tl[:, 1] // 8, img)
        return call(tl[:, 0], tl[:, 1], img)

    def check():
        out = np.asarray(carve(tlj))
        base = (tl_np // 8 * 8) if aligned else tl_np
        for k in (0, 7, n - 1):
            x, y = base[k]
            if not np.array_equal(
                out[k], np.asarray(img[y : y + ry, x : x + rx])
            ):
                return False
        return True

    return rep_loop(carve), tlj, check


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).round(), jnp.float32)
    ry, rx = 86, 88
    tl_np = np.stack(
        [rng.randint(0, W - rx - REPS - 8, N),
         rng.randint(0, H - ry - REPS - 8, N)], -1
    ).astype(np.int32)

    ok1 = timed(lambda: make_variant(img, tl_np, ry, rx, "perpoint"),
                "(w1) per-point rank-matched")
    timed(lambda: make_variant(img, tl_np, ry, rx, "perpoint", True),
          "(w2) per-point aligned")
    ok3 = timed(lambda: make_variant(img, tl_np, ry, rx, "fori"),
                "(w3) fori serial DMA")
    timed(lambda: make_variant(img, tl_np, ry, rx, "unrolled"),
          "(w4) unrolled 8-DMA")

    # winner at the tracker-template rect
    if ok3 or ok1:
        form = "fori" if ok3 else "perpoint"
        n2 = 2048
        tl2 = np.stack(
            [rng.randint(0, W - 60, n2), rng.randint(0, H - 60, n2)], -1
        ).astype(np.int32)

        def make_small():
            return make_variant(img, tl2, 16, 16, form)

        timed(make_small, f"(small) {form} 2048x(16,16)", n=n2)

        def make_xla_small():
            def carve(tl):
                return jax.vmap(
                    lambda p: lax.dynamic_slice(img, (p[1], p[0]), (16, 16))
                )(tl)

            return rep_loop(carve), jnp.asarray(tl2), None

        timed(make_xla_small, "(small-xla) gather 2048x(16,16)", n=n2)


if __name__ == "__main__":
    main()
