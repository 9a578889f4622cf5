"""Micro round 4: mirror warp_pallas.py's PROVEN DMA construct exactly.

micro_carve3: every unaligned / 8-aligned-x carve crashes the Mosaic
helper, including a minimal one-DMA-per-grid-step kernel. The one
in-repo kernel that DMAs HBM slices successfully (ops/warp_pallas.py)
differs in exactly two ways: its x offsets are provably 128-ALIGNED
(shipped as quotients, multiplied inside the kernel) and its DMA
destination is a SCRATCH buffer, not a sliced out block. Bisect:
  x1: aligned (y*8, x*128) src, rect (96, 256), dst out_ref.at[0]
  x2: aligned src, dst scratch -> vector-copy to out (warp's pattern)
  x3: (if x1/x2 compile) aligned x*128 but RAW y — is y's proof needed?
  x4: (if x1/x2 compile) rect (96, 216) — non-multiple-of-128 width
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
H, W = 1280, 2176  # multiples of 8/128 with slack for aligned rects
REPS = 24


def rep_loop(carve):
    @jax.jit
    def fn(tl):
        def body(i, acc):
            out = carve(tl + 8 * i)  # keep origins aligned across reps
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
            log(f"{label}: value check "
                f"{'OK' if check() else 'MISMATCH'}")
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


def make(img, tl_np, ry, rx, dst, raw_y=False):
    tlj = jnp.asarray(tl_np)
    n = tl_np.shape[0]

    if dst == "direct":
        def kernel(xq, yq, img_ref, out_ref, sem):
            i = pl.program_id(0)
            y = yq[i] if raw_y else yq[i] * 8
            dma = pltpu.make_async_copy(
                img_ref.at[pl.ds(y, ry), pl.ds(xq[i] * 128, rx)],
                out_ref.at[0], sem,
            )
            dma.start()
            dma.wait()

        scratch = [pltpu.SemaphoreType.DMA(())]
    else:
        def kernel(xq, yq, img_ref, out_ref, slab, sem):
            i = pl.program_id(0)
            y = yq[i] if raw_y else yq[i] * 8
            dma = pltpu.make_async_copy(
                img_ref.at[pl.ds(y, ry), pl.ds(xq[i] * 128, rx)],
                slab, sem,
            )
            dma.start()
            dma.wait()
            out_ref[0] = slab[...]

        scratch = [
            pltpu.VMEM((ry, rx), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, ry, rx), lambda i, *_: (i, 0, 0)),
        scratch_shapes=scratch,
    )
    call = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n, ry, rx), jnp.float32),
        interpret=False,
    )

    def carve(tl):
        yy = tl[:, 1] if raw_y else tl[:, 1] // 8
        return call(tl[:, 0] // 128, yy, img)

    def check():
        out = np.asarray(carve(tlj))
        for k in (0, 5, n - 1):
            x = tl_np[k, 0] // 128 * 128
            y = tl_np[k, 1] if raw_y else tl_np[k, 1] // 8 * 8
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
    tl_np = np.stack(
        [rng.randint(0, W - 512 - 8 * REPS, N),
         rng.randint(0, H - 128 - 8 * REPS, N)], -1
    ).astype(np.int32)

    ok1 = timed(lambda: make(img, tl_np, 96, 256, "direct"),
                "(x1) aligned direct (96,256)")
    ok2 = timed(lambda: make(img, tl_np, 96, 256, "scratch"),
                "(x2) aligned scratch (96,256)")
    if ok1 or ok2:
        dst = "direct" if ok1 else "scratch"
        timed(lambda: make(img, tl_np, 96, 256, dst, raw_y=True),
              f"(x3) raw-y {dst} (96,256)")
        timed(lambda: make(img, tl_np, 96, 216, dst),
              f"(x4) aligned {dst} (96,216)")


if __name__ == "__main__":
    main()
