"""Micro round 5: shape the WORKING aligned DMA carve for the rescue.

micro_carve4: provably (8,128)-aligned carves compile and run at
0.728 us/rect for (96,256) f32 — vs 1.34 us/rect for the XLA gather.
This round shapes it for production:
  y1: (96,128) f32, 2D src — does halving the rect halve the cost?
  y2: (96,128) f32 via the 16-PANEL trick: the source is a (16,Hp,Wq)
      stack of x-shifts at 8-px steps, the kernel picks panel
      r=(x8%128)//8 with a dynamic leading index and a 128-aligned
      column base — every carve origin becomes exactly (y8, x8),
      leaving only <=7 px ladder offsets for the lanes kernel's phase A
  y3: y2 in int8 (the lanes kernel's slab dtype — 4x less traffic;
      does the y*8 alignment proof still satisfy Mosaic for i8 tiles?)
  y4: y3 at the tracker template rect (24,128)
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
H, W = 1280, 2176
REPS = 24


def rep_loop(carve):
    @jax.jit
    def fn(tl):
        def body(i, acc):
            out = carve(tl + 8 * i)
            return acc + out[0, 0, 0].astype(jnp.float32) + out[
                -1, -1, -1
            ].astype(jnp.float32)

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
            log(f"{label}: value check {'OK' if check() else 'MISMATCH'}")
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


def make_2d(img, tl_np, ry, rx):
    tlj = jnp.asarray(tl_np)
    n = tl_np.shape[0]

    def kernel(xq, yq, img_ref, out_ref, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            img_ref.at[pl.ds(yq[i] * 8, ry), pl.ds(xq[i] * 128, rx)],
            out_ref.at[0], sem,
        )
        dma.start()
        dma.wait()

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, ry, rx), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    call = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n, ry, rx), img.dtype),
        interpret=False,
    )

    def carve(tl):
        return call(tl[:, 0] // 128, tl[:, 1] // 8, img)

    return rep_loop(carve), tlj, None


def make_panels(img, tl_np, ry, rx):
    """Panel-stack carve: src (16, Hp, W) x-shifts, 8-px steps."""
    tlj = jnp.asarray(tl_np)
    n = tl_np.shape[0]
    wq = W - 128  # panel width (mult of 128)
    panels = jnp.stack([img[:, 8 * k : 8 * k + wq] for k in range(16)])

    def kernel(pan, xq, yq, img_ref, out_ref, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            img_ref.at[pan[i], pl.ds(yq[i] * 8, ry), pl.ds(xq[i] * 128, rx)],
            out_ref.at[0], sem,
        )
        dma.start()
        dma.wait()

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, ry, rx), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    call = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n, ry, rx), img.dtype),
        interpret=False,
    )

    def carve(tl):
        x8 = tl[:, 0] // 8 * 8
        pan = x8 % 128 // 8
        return call(pan, x8 // 128, tl[:, 1] // 8, panels)

    def check():
        out = np.asarray(carve(tlj))
        for k in (0, 5, n - 1):
            x8 = int(tl_np[k, 0]) // 8 * 8
            y8 = int(tl_np[k, 1]) // 8 * 8
            if not np.array_equal(
                out[k], np.asarray(img[y8 : y8 + ry, x8 : x8 + rx])
            ):
                return False
        return True

    return rep_loop(carve), tlj, check


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).round(), jnp.float32)
    img8 = (img - 128.0).astype(jnp.int8)
    tl_np = np.stack(
        [rng.randint(0, W - 512 - 8 * REPS, N),
         rng.randint(0, H - 256 - 8 * REPS, N)], -1
    ).astype(np.int32)

    timed(lambda: make_2d(img, tl_np, 96, 128), "(y1) 2D f32 (96,128)")
    timed(lambda: make_panels(img, tl_np, 96, 128),
          "(y2) panels f32 (96,128)")
    timed(lambda: make_panels(img8, tl_np, 96, 128),
          "(y3) panels i8 (96,128)")
    timed(lambda: make_panels(img8, tl_np, 24, 128),
          "(y4) panels i8 (24,128)")


if __name__ == "__main__":
    main()
