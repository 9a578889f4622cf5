"""Pallas TPU kernel for dense bilinear warping (the Farneback inner loop).

The XLA formulation of the coefficient warp (ops/farneback.py
update_matrices; OpenCV FarnebackUpdateMatrices' bilinear fetch) gathers
20 elements per pixel from HBM — measured at ~7 ns/element on this
hardware, it is the single cost that keeps the dense path below the CPU
baseline. This kernel removes the gathers entirely:

- the output is tiled (8, 128); for each tile an XLA prepass computes the
  MINIMUM integer sample coordinate over the tile, and the kernel DMAs one
  (C, 96, 384) source slab at that dynamic base — flow is smooth after
  Farneback's box blur, so a tile's samples cluster tightly. TPU DMA
  slices must be provably (8, 128)-aligned, so the base is floor-aligned
  and shipped as scalar-prefetched QUOTIENTS (by/8, bx/128) that the
  kernel re-multiplies — Mosaic can prove 8*q % 8 == 0, but not anything
  about an opaque SMEM scalar;
- COLUMN selection is a per-lane dynamic gather: Mosaic lowers
  jnp.take_along_axis(..., axis=-1) on 32-bit, exactly-128-lane operands
  to a hardware lane shuffle that runs at VPU-ALU speed (measured
  2026-08-20, benchmarks/micro_warpgather.py: a 16-gather tile pipeline
  times within 2% of the same pipeline with gathers deleted). Each
  pixel's two bilinear columns are fetched by 3 gathers over the slab's
  three 128-lane column groups + a 2-level select (out-of-range lane
  indices WRAP mod 128, so no clipping is needed); this replaced a
  roll-ladder candidate walk whose cost grew with the tile's flow
  spread (~8.7 ms/call at 720p on real frames vs ~2-4 ms for this form);
- ROW selection stays a tent sum — sublane-axis gathers do not lower on
  this toolchain (micro_gatherprobe.py) — but it runs on the already
  column-gathered (C, 16, 128) strip, so its cost is small and bounded:
  out = sum_k ty(k) * xb[k] with ty(k) = max(0, 1 - |ryf - k|) nonzero
  for exactly the two bilinear rows, accumulated over 16-row groups that
  are scalar-gated by the tile's live row range [ylo, yh);
- the grid runs one step per tile ROW; the kernel walks the row's column
  tiles in a fori_loop with DOUBLE-BUFFERED slab DMA (warm-up start,
  prefetch next, wait current — the canonical intra-invocation pipeline),
  hiding the transfer under the candidate math (~2x at 720p).

Pixels whose sample deviates more than the margin from the tile minimum
(72 px vertically / 128 px horizontally) clamp to the slab edge — on the
reference corpus at 720p the per-tile spread maxes at ~65 px vertical /
~82 px horizontal (violent-turn clip), inside the margins; the exact
gather path (FarnebackParams.warp_mode='exact') remains the golden-test
reference. Runs in interpreter mode off-TPU so tests cover it everywhere.

Reference: OpenCV optflowgf.cpp FarnebackUpdateMatrices (the cv2 kernel
behind DenseOF.py:147-157); cf. SURVEY.md section 2.3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile and slab geometry. Vertical spread within a tile is driven
# by fy variation across the tile's 128 COLUMNS (not its 8 rows), so the
# vertical margin must be sized like the horizontal one. The source is
# padded by (PADT, PADL) so leftward/upward flow up to the margin keeps
# residuals non-negative; positions are measured relative to the pixel's
# own position in the tile.
#   rows: positions ryf in [0, RYC-1] from the 8-aligned slab base;
#         RYC-1 = 80 = spread margin 72 + base alignment remainder <= 7
#         + bilinear pair; 16-row group g covers slab rows [16g, 16g+16)
#         so position 80 reads rows {80, 81} in group 5 — 96 rows total.
#   cols: positions rxf in [rx0, rx0 + RXC-1] from the 128-aligned slab
#         base (rx0 <= 127 is the base alignment remainder); a pixel at
#         tile lane l gathers slab columns l + floor(rxf) + {0, 1}
#         <= 127 + 127 + 128 + 1 = 383 = COLS - 1.
TH, TW = 8, 128
ROWS, COLS = 96, 384
RYC = 81
RXC = 129
PADT = 72  # vertical flow margin (alignment eats the rest of RYC)
PADL = RXC - 1  # horizontal flow margin


def supports(h: int, w: int) -> bool:
    """Whether the kernel's slab geometry fits this image (the padded
    source always fits; only degenerate sizes are excluded)."""
    return h >= 2 and w >= 2


def _kernel(by8_ref, bx128_ref, yh_ref, src_ref,
            yi_ref, xi_ref, ay_ref, ax_ref, out_ref, slab2, sem2,
            *, gr: int = 16):
    c = out_ref.shape[0]
    ti = pl.program_id(0)
    ntx = out_ref.shape[-1] // TW
    ng = ROWS // gr

    # double-buffered slab pipeline over this row's column tiles (the
    # canonical intra-invocation pattern: warm-up start, prefetch next,
    # wait current, compute)
    def get_dma(slot, tj):
        return pltpu.make_async_copy(
            src_ref.at[
                :,
                pl.ds(by8_ref[ti, tj] * 8, ROWS),
                pl.ds(bx128_ref[ti, tj] * 128, COLS),
            ],
            slab2.at[slot],
            sem2.at[slot],
        )

    get_dma(0, 0).start()

    def col_body(tj, _):
        slot = lax.rem(tj, 2)

        @pl.when(tj + 1 < ntx)
        def _():
            get_dma(lax.rem(tj + 1, 2), tj + 1).start()

        get_dma(slot, tj).wait()

        slab = slab2.at[slot]
        lanes = pl.ds(tj * TW, TW)
        yi = yi_ref[:, lanes]  # (TH, TW) i32 top-tap row from slab base
        xi = xi_ref[:, lanes]  # (TH, TW) i32 left-tap column (incl. rx0)
        ay = ay_ref[:, lanes]  # (TH, TW) f32 bilinear fractions
        ax = ax_ref[:, lanes]
        yh = yh_ref[ti, tj]  # exclusive live row bound for this tile
        lane = lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
        # absolute slab column of each pixel's left bilinear tap
        ii0 = lane + xi  # (TH, TW) in [0, COLS-2]
        ks = lax.broadcasted_iota(jnp.int32, (gr, TW), 0)

        def group(acc, g):
            # one gr-row slab group: column-gather both bilinear taps for
            # every output row, then the gr-row y-tent (exactly the two
            # bilinear rows have nonzero weight; others add zeros)
            sg = (
                slab[:, gr * g : gr * g + gr, :]
                .astype(jnp.float32)
                .reshape(c * gr, COLS)
            )
            h0 = sg[:, :TW]
            h1 = sg[:, TW : 2 * TW]
            h2 = sg[:, 2 * TW :]

            def take(ii):
                # per-lane shuffle over the three 128-lane column groups;
                # one shared mod keeps the index in-range for every group
                # (TPU wraps OOB lanes mod 128 anyway, but interpret mode
                # — and thus the CPU tests — would fill NaN)
                iib = jnp.broadcast_to(ii[None, :], (c * gr, TW))
                iw = lax.rem(iib, TW)
                v = jnp.where(
                    iib < TW,
                    jnp.take_along_axis(h0, iw, axis=1),
                    jnp.where(
                        iib < 2 * TW,
                        jnp.take_along_axis(h1, iw, axis=1),
                        jnp.take_along_axis(h2, iw, axis=1),
                    ),
                )
                return v.reshape(c, gr, TW)

            rows = []
            for i in range(TH):
                t0 = take(ii0[i])
                t1 = take(ii0[i] + 1)
                xb = (1.0 - ax[i])[None, None] * t0 + ax[i][None, None] * t1
                # sample rows are {yi + i, yi + i + 1}: yi is measured at
                # the tile's row 0, each output row i sits i rows further
                # down. Integer row match keeps the weights exact (a f32
                # tent over a 0..255 index costs ~2^-16 on the fraction).
                d = ks + (gr * g - i) - yi[i][None, :]  # (gr, TW) i32
                ty = jnp.where(
                    d == 0,
                    (1.0 - ay[i])[None, :],
                    jnp.where(d == 1, ay[i][None, :], 0.0),
                )
                rows.append(jnp.sum(xb * ty[None], axis=1))
            return acc + jnp.stack(rows, axis=1)  # (c, TH, TW)

        # group 0 is always live (the aligned base remainder is < 8);
        # later groups are scalar-gated by the tile's live row bound,
        # widened by TH-1 because the per-row sample index adds i — plus
        # one more ONLY when yh clipped at RYC: a margin-clipped residual
        # (yi == RYC-1 while yh saturates) still reads its +1 bilinear
        # row at yh + TH - 1 (the 16-row granularity used to absorb that
        # row; 8-row groups exposed it). Unclipped tiles keep the tight
        # bound so no group runs needlessly.
        bound = yh + (TH - 1) + jnp.where(yh >= RYC, 1, 0)
        acc = group(jnp.zeros((c, TH, TW), jnp.float32), 0)
        for g in range(1, ng):
            acc = lax.cond(
                gr * g < bound,
                lambda a, g=g: group(a, g),
                lambda a: a,
                acc,
            )
        out_ref[:, :, lanes] = acc
        return 0

    lax.fori_loop(0, ntx, col_body, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret", "slab_dtype", "group_rows")
)
def warp_bilinear_pallas(
    src: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    *,
    interpret: bool | None = None,
    slab_dtype=jnp.float32,
    group_rows: int = 16,
) -> jnp.ndarray:
    """Sample src (C, H, W) at absolute float coords (fx, fy), each (H, W).

    Border handling matches ops/farneback.py update_matrices: integer
    corners clamp to [0, dim-2]; callers mask out-of-range pixels with
    their own `inside` test. Returns (C, H, W) float32.

    slab_dtype=bfloat16 halves the slab DMA traffic (the kernel's binding
    cost): src rounds to bf16 (~0.4% rel) before the copy; all candidate
    math stays f32. Accuracy vs cv2 stays ~1e-2 px (tests).
    """
    c, h, w = src.shape
    assert supports(h, w), "caller falls back to the gather path"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 2)
    ax = jnp.clip(fx - x0.astype(fx.dtype), 0.0, 1.0)
    ay = jnp.clip(fy - y0.astype(fy.dtype), 0.0, 1.0)

    hp = -(-h // TH) * TH
    wp = -(-w // TW) * TW
    nty, ntx = hp // TH, wp // TW
    # source in padded coordinates: +PADT/+PADL lets base stay >= 0 for
    # negative flow up to the margin; + ROWS/COLS on the far side keeps the
    # worst-case slab DMA in bounds
    src = jnp.pad(src, ((0, 0), (PADT, hp + ROWS - h), (PADL, wp + COLS - w)))

    # per-pixel residuals relative to the pixel's own tile-local position;
    # padded destination pixels get +/- sentinels so they drag neither the
    # per-tile minimum (slab base) nor the maximum (live candidate count)
    il = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % TH
    jl = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % TW
    dy0 = y0 + PADT - il
    dx0 = x0 + PADL - jl
    dy0_hi = dy0
    if (hp, wp) != (h, w):
        pad2 = ((0, hp - h), (0, wp - w))
        dy0 = jnp.pad(dy0, pad2, constant_values=2**30)
        dx0 = jnp.pad(dx0, pad2, constant_values=2**30)
        dy0_hi = jnp.pad(dy0_hi, pad2, constant_values=-(2**30))
        ax = jnp.pad(ax, pad2)
        ay = jnp.pad(ay, pad2)

    def tile_reduce(v, fn):
        return fn(v.reshape(nty, TH, ntx, TW), (1, 3))

    ymin = jnp.maximum(tile_reduce(dy0, jnp.min), 0)
    xmin = jnp.maximum(tile_reduce(dx0, jnp.min), 0)
    by8 = (ymin // 8).astype(jnp.int32)  # aligned DMA base quotients
    bx128 = (xmin // 128).astype(jnp.int32)
    rx0 = (xmin - bx128 * 128).astype(jnp.int32)  # column remainder, 0..127
    # live row bound: the max integer residual needs rows {resid, resid+1}
    # for its bilinear pair, hence +2 (exclusive bound), measured from the
    # ALIGNED base (the 16-row groups absorb the <= 7 remainder)
    yh = jnp.clip(tile_reduce(dy0_hi, jnp.max) - by8 * 8 + 2, 1, RYC).astype(jnp.int32)

    def per_pixel(base):
        return jnp.broadcast_to(
            base[:, None, :, None], (nty, TH, ntx, TW)
        ).reshape(hp, wp)

    # integer tap positions from the tile's ALIGNED slab base (rows clip
    # to the row margin; columns carry the base remainder rx0 so the
    # kernel's gather index is simply lane + xi), with the bilinear
    # fractions shipped separately so they stay exact
    yi = jnp.clip(dy0 - per_pixel(by8 * 8), 0, RYC - 1).astype(jnp.int32)
    prx0 = per_pixel(rx0)
    xi = jnp.clip(
        dx0 - per_pixel(bx128 * 128), prx0, prx0 + (RXC - 1)
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        # one grid step per tile ROW; the kernel loops the row's column
        # tiles itself so the slab DMA double-buffers across them
        grid=(nty,),
        in_specs=[
            # pinned to HBM: the kernel DMAs its own slabs
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((TH, wp), lambda i, *_: (i, 0)),
            pl.BlockSpec((TH, wp), lambda i, *_: (i, 0)),
            pl.BlockSpec((TH, wp), lambda i, *_: (i, 0)),
            pl.BlockSpec((TH, wp), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((c, TH, wp), lambda i, *_: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, c, ROWS, COLS), slab_dtype),  # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    assert ROWS % group_rows == 0, group_rows
    out = pl.pallas_call(
        functools.partial(_kernel, gr=group_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        interpret=interpret,
    )(
        by8, bx128, yh, src.astype(slab_dtype),
        yi, xi, ay.astype(jnp.float32), ax.astype(jnp.float32),
    )
    return out[:, :h, :w]
