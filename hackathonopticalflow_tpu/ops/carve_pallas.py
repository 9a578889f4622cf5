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

These kernels replace the gather loop with the TPU's DMA engine: the
rectangle origins are scalar-prefetched to SMEM and each grid step
issues one async HBM->VMEM copy straight into its out block. The data
volume is (nearly) identical to the XLA gather; only the per-slice
issue overhead changes.

DMA start offsets MUST be provably (8, 128)-aligned on this toolchain,
exactly as ops/warp_pallas.py documents: every unaligned or 8-aligned-x
formulation — looped, unrolled, or one DMA per grid step — crashes the
relay's remote Mosaic helper, and a non-multiple-of-128 rect width
crashes it too (benchmarks/micro_carve2/3/4.py, 2026-08-21). The
measured envelope (micro_carve4/5.py):
  - XLA gather:                      1.34 us/rect (any size)
  - aligned DMA, (96, 256) f32:      0.73 us/rect
  - aligned DMA, (96, 128) f32:      0.41 us/rect
  - aligned PANEL DMA, (96,128) i8:  0.248 us/rect
  - aligned PANEL DMA, (24,128) i8:  0.244 us/rect (issue-bound)
`gather_rects` therefore exists in two forms:
  - the generic unaligned form (kept for interpret mode and as the
    documented negative — it cannot compile on this relay);
  - `gather_rects_panels`: origins quantized to (8, 8); the 8-px x
    residue indexes a 16-PANEL stack of x-shifted copies of the plane
    (`build_panels`), so the in-panel column base is 128-aligned and
    provable. The leftover <=7 px offsets per axis are absorbed
    downstream by the lanes kernel's phase-A ladder
    (ops/lk_pallas3.py), which exists for exactly this job.

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


def build_panels(
    img: jnp.ndarray,
    *,
    height: int,
    width: int,
    bias: float = 128.0,
    dtype=jnp.int8,
) -> jnp.ndarray:
    """Build the 16-panel x-shift stack `gather_rects_panels` carves
    from: panel k holds img[:, 8k : 8k + width], zero-padded so every
    panel covers [0, height) x [0, width) regardless of the source's
    true extent. The zero region sits beyond the caller's reflect pad
    and is only ever read by points whose status is already dead
    (ops/lk.py _carve_init_centered docstring).

    bias is subtracted before the dtype cast (the lanes kernel's int8
    slab convention, SLAB_BIAS — exact for u8-quantized pyramid
    levels)."""
    h, w = img.shape
    src = img
    pad_r = max(0, height - h)
    pad_c = max(0, width + 8 * 15 - w)
    if pad_r or pad_c:
        src = jnp.pad(src, ((0, pad_r), (0, pad_c)))
    src = (src - jnp.asarray(bias, img.dtype)).astype(dtype)
    return jnp.stack(
        [src[:height, 8 * k : 8 * k + width] for k in range(16)]
    )


@functools.partial(jax.jit, static_argnames=("ry", "rx", "interpret"))
def gather_rects_panels(
    panels: jnp.ndarray,
    x8: jnp.ndarray,
    y8: jnp.ndarray,
    *,
    ry: int,
    rx: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Extract one (ry, rx) rect per point at 8-ALIGNED origins (x8, y8)
    from a `build_panels` stack, one DMA per point (~0.25 us each).

    panels: (16, Hq, Wq) from build_panels. x8, y8: (N,) int32 origins,
    multiples of 8, in the panel plane's coordinate frame; the caller
    guarantees y8 + ry <= Hq and x8 + rx <= Wq + (x8 % 128 ? 0 : 0) —
    i.e. the 128-aligned in-panel base plus rx stays inside Wq. ry must
    be a multiple of 8 and rx a multiple of 128 (the relay's provable-
    alignment envelope; module docstring)."""
    assert ry % 8 == 0 and rx % 128 == 0, (ry, rx)
    n = x8.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pan = x8 % 128 // 8
    xq = x8 // 128
    yq = y8 // 8

    def kernel(pan_r, xq_r, yq_r, img_ref, out_ref, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            img_ref.at[
                pan_r[i], pl.ds(yq_r[i] * 8, ry), pl.ds(xq_r[i] * 128, rx)
            ],
            out_ref.at[0],
            sem,
        )
        dma.start()
        dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, ry, rx), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ry, rx), panels.dtype),
        interpret=interpret,
    )(pan, xq, yq, panels)


def build_panels_multi(
    imgs: jnp.ndarray, *, height: int, width: int
) -> jnp.ndarray:
    """Multi-plane build_panels: (C, H, W) -> (16, C, height, width)
    x-shift stack in the SOURCE dtype (no bias/quantization — the
    template path needs exact plane values). Zero fill beyond the
    source as in build_panels."""
    c, h, w = imgs.shape
    src = imgs
    pad_r = max(0, height - h)
    pad_c = max(0, width + 8 * 15 - w)
    if pad_r or pad_c:
        src = jnp.pad(src, ((0, 0), (0, pad_r), (0, pad_c)))
    return jnp.stack(
        [src[:, :height, 8 * k : 8 * k + width] for k in range(16)]
    )


@functools.partial(jax.jit, static_argnames=("ry", "rx", "interpret"))
def gather_rects_panels_multi(
    panels: jnp.ndarray,
    x8: jnp.ndarray,
    y8: jnp.ndarray,
    *,
    ry: int,
    rx: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Multi-plane gather_rects_panels: panels (16, C, Hq, Wq) from
    build_panels_multi -> (N, C, ry, rx), one 3-plane DMA per point.
    Same alignment contract as gather_rects_panels."""
    assert ry % 8 == 0 and rx % 128 == 0, (ry, rx)
    n = x8.shape[0]
    c = panels.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pan = x8 % 128 // 8
    xq = x8 // 128
    yq = y8 // 8

    def kernel(pan_r, xq_r, yq_r, img_ref, out_ref, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            img_ref.at[
                pan_r[i], :, pl.ds(yq_r[i] * 8, ry), pl.ds(xq_r[i] * 128, rx)
            ],
            out_ref.at[0],
            sem,
        )
        dma.start()
        dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, c, ry, rx), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c, ry, rx), panels.dtype),
        interpret=interpret,
    )(pan, xq, yq, panels)
