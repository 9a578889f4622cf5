"""Pallas TPU kernel for batched rectangle gathers (per-point slab carve).

The init-centered rescue carve and the arbitrary-point lanes tracker
both extract one rectangle per point from a frame plane at a
data-dependent origin (ops/patch.py extract_slabs_rect — a
vmap(lax.dynamic_slice)). XLA lowers that to a gather whose TPU
implementation costs ~1.2 us PER SLICE regardless of slice size
(CLAUDE.md relay cost model; benchmarks/probe_rescue2.py): the 2304
production-grid slices alone are +2.8 ms/pair, and the 2048-capacity
tracker row loses to the CPU on ~15 ms/frame of slices
(BASELINE.md round-5 scaling table).

This kernel replaces the gather loop with the TPU's DMA engine: the
rectangle origins are scalar-prefetched to SMEM, and each grid step
issues `block` async HBM->VMEM copies back to back (start-all, then
wait-all — the loop bodies are DMA-only, the one in-kernel-loop form
this toolchain compiles reliably; cf. ops/warp_pallas.py and the
CLAUDE.md Mosaic gotchas). The data volume is identical to the XLA
gather; only the per-slice issue overhead changes.

DMA start offsets: ops/warp_pallas.py ships (8, 128)-aligned bases
because Mosaic must PROVE slice alignment there. Measured on this
toolchain (benchmarks/micro_carve.py, 2026-08-21): arbitrary unaligned
dynamic starts DO compile and copy correctly for f32 planes — the
aligned variant buys nothing — so this kernel takes raw origins.

Reference: cv2.calcOpticalFlowPyrLK's per-point window sampling
(pathfinder_viewer.py:154-158); cf. SURVEY.md section 2.3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xs_ref, ys_ref, img_ref, out_ref, sems, *, ry, rx, block):
    bi = pl.program_id(0)
    chans = len(img_ref.shape) == 3

    def get_dma(j):
        y = ys_ref[bi * block + j]
        x = xs_ref[bi * block + j]
        src = (
            img_ref.at[:, pl.ds(y, ry), pl.ds(x, rx)]
            if chans
            else img_ref.at[pl.ds(y, ry), pl.ds(x, rx)]
        )
        return pltpu.make_async_copy(src, out_ref.at[j], sems.at[j])

    def start(j, c):
        get_dma(j).start()
        return c

    lax.fori_loop(0, block, start, 0)

    def wait(j, c):
        get_dma(j).wait()
        return c

    lax.fori_loop(0, block, wait, 0)


@functools.partial(
    jax.jit, static_argnames=("ry", "rx", "block", "interpret")
)
def gather_rects(
    img: jnp.ndarray,
    tl: jnp.ndarray,
    *,
    ry: int,
    rx: int,
    block: int = 64,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Extract one (ry, rx) rectangle per row of tl from img.

    img: (H, W) plane or (C, H, W) plane stack; tl: (N, 2) int32 [x, y]
    top-left origins, already in img's coordinate frame. The caller
    guarantees every rectangle is in bounds (the LK carve clamps inits
    and sizes its frame pad so this holds — ops/lk.py
    _init_centered_pad). N must be a multiple of `block`. Returns
    (N, ry, rx) or (N, C, ry, rx) in img's dtype.

    Equivalent to ops/patch.py extract_slabs_rect (same values,
    tests/test_carve.py), minus the per-slice gather overhead.
    """
    n = tl.shape[0]
    assert n % block == 0, (n, block)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xs = tl[:, 0].astype(jnp.int32)
    ys = tl[:, 1].astype(jnp.int32)
    blk = (block, ry, rx) if img.ndim == 2 else (block, img.shape[0], ry, rx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(blk, lambda i, *_: (i,) + (0,) * (len(blk) - 1)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((block,))],
    )
    return pl.pallas_call(
        functools.partial(_kernel, ry=ry, rx=rx, block=block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n,) + blk[1:], img.dtype),
        interpret=interpret,
    )(xs, ys, img)
