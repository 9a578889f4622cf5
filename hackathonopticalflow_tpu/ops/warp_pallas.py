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
- each pixel's sample is a bilinear "tent" sum over the slab's candidate
  offsets: out = sum_ry sum_rx ty(ry) * tx(rx) * slab[ry:ry+8, rx:rx+128]
  with per-pixel weights ty(ry) = max(0, 1 - |ryf - ry|) that are nonzero
  for exactly the two bilinear rows/columns — VPU fmas, no per-element
  addressing;
- TPUs cannot vector-load at data-dependent sublane/lane offsets, so the
  candidate walk is built from the same primitives as ops/lk_pallas.py:
  the <=127-lane alignment remainder is consumed by a log2 ladder of
  static lane rolls masked on the remainder's scalar bits; column
  candidates then advance by carrying the block through a fori_loop and
  re-aligning with a static roll-by-1 each step (dynamic trip count = the
  tile's live column count, prefetched as a scalar — zero dead work); row
  candidates come in aligned 16-row blocks (static 8q slices, scalar-
  guarded) expanded by 8 static sublane rolls;
- because candidates are measured from the tile minimum, live candidates
  are contiguous from offset 0, so per-tile cost tracks the tile's actual
  flow spread (typically 2-4 live columns x 1-2 row blocks of the worst
  case);
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
# residuals non-negative; candidates are measured relative to the pixel's
# own position in the tile.
#   rows: candidates ryf in [0, RYC-1]; RYC-1 = 80 = spread margin 72 +
#         base alignment remainder <= 7 + bilinear pair; block q covers
#         slab rows [8q, 8q+16) so candidate 80 reads rows [80, 96).
#   cols: candidates rxf in [0, RXC-1] measured from the true tile min;
#         the <=127 alignment remainder rx0 is consumed in-kernel, so the
#         slab needs rx0 + (RXC-1) + TW <= COLS: 127 + 128 + 128 < 384.
TH, TW = 8, 128
ROWS, COLS = 96, 384
RYC = 81
RXC = 129
NQ = (RYC + 7) // 8  # 11 aligned row-candidate blocks
PADT = 72  # vertical flow margin (alignment eats the rest of RYC)
PADL = RXC - 1  # horizontal flow margin


def supports(h: int, w: int) -> bool:
    """Whether the kernel's slab geometry fits this image (the padded
    source always fits; only degenerate sizes are excluded)."""
    return h >= 2 and w >= 2


def _kernel(by8_ref, bx128_ref, rx0_ref, ylo_ref, yh_ref, xh_ref, src_ref,
            ryf_ref, rxf_ref, out_ref, slab2, sem2):
    c = out_ref.shape[0]
    ti = pl.program_id(0)
    ntx = out_ref.shape[-1] // TW

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
        ryf = ryf_ref[:, lanes]  # (TH, TW) fractional row candidate offsets
        rxf = rxf_ref[:, lanes]
        rx0 = rx0_ref[ti, tj]  # lane alignment remainder, 0..127
        ylo = ylo_ref[ti, tj]  # first live row candidate (0..7, alignment)
        yh = yh_ref[ti, tj]  # live candidate counts for this tile
        xh = xh_ref[ti, tj]
        acc = jnp.zeros((c, TH, TW), jnp.float32)
        for q in range(NQ):

            def q_live(acc, q=q):
                # (c, 16, COLS) static slice; upcast once so the roll
                # ladder and tent math stay f32 regardless of slab dtype
                a0 = slab[:, 8 * q : 8 * q + 16, :].astype(jnp.float32)
                # consume the alignment remainder: left-roll by rx0 via a
                # log2 ladder of static rolls masked on rx0's scalar bits
                # (left-roll by t == roll by COLS - t; cf. ops/lk_pallas.py)
                for t in (64, 32, 16, 8, 4, 2, 1):
                    a0 = lax.cond(
                        (rx0 & t) != 0,
                        lambda a, t=t: pltpu.roll(a, COLS - t, 2),
                        lambda a: a,
                        a0,
                    )
                cur0 = a0[:, :, : TW + RXC - 1]  # live lanes only (256)

                # row-candidate liveness, per sublane step s: candidates
                # below the tile's aligned minimum (ylo, only in q == 0)
                # or at/above the exclusive max (yh) carry zero tent
                # weight for EVERY pixel — skip their roll+fma entirely.
                # tyw depends on (q, s) but not rx: hoist out of rx_body.
                live = [
                    ((8 * q + s >= ylo) if q == 0 else True)
                    & (8 * q + s < yh)
                    for s in range(8)
                ]
                tyws = [
                    jnp.maximum(1.0 - jnp.abs(ryf - float(8 * q + s)), 0.0)
                    for s in range(8)
                ]

                def rx_body(rx, carry):
                    a, cur = carry
                    txw = jnp.maximum(
                        1.0 - jnp.abs(rxf - rx.astype(jnp.float32)), 0.0
                    )
                    win = cur[:, :, :TW]  # lanes [rx0+rx, rx0+rx+TW)
                    for s in range(8):

                        def step(a, s=s):
                            wgt = txw * tyws[s]
                            # left-roll by s == roll by (size - s);
                            # pltpu.roll needs non-negative shifts
                            rows = pltpu.roll(win, 16 - s, 1) if s else win
                            return a + rows[:, :TH, :] * wgt[None]

                        a = lax.cond(live[s], step, lambda a: a, a)
                    return a, pltpu.roll(cur, TW + RXC - 2, 2)

                acc, _ = lax.fori_loop(0, xh, rx_body, (acc, cur0))
                return acc

            acc = lax.cond(8 * q < yh, q_live, lambda a: a, acc)
        out_ref[:, :, lanes] = acc
        return 0

    lax.fori_loop(0, ntx, col_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "slab_dtype"))
def warp_bilinear_pallas(
    src: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    *,
    interpret: bool | None = None,
    slab_dtype=jnp.float32,
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
    dy0_hi, dx0_hi = dy0, dx0
    if (hp, wp) != (h, w):
        pad2 = ((0, hp - h), (0, wp - w))
        dy0 = jnp.pad(dy0, pad2, constant_values=2**30)
        dx0 = jnp.pad(dx0, pad2, constant_values=2**30)
        dy0_hi = jnp.pad(dy0_hi, pad2, constant_values=-(2**30))
        dx0_hi = jnp.pad(dx0_hi, pad2, constant_values=-(2**30))
        ax = jnp.pad(ax, pad2)
        ay = jnp.pad(ay, pad2)

    def tile_reduce(v, fn):
        return fn(v.reshape(nty, TH, ntx, TW), (1, 3))

    ymin = jnp.maximum(tile_reduce(dy0, jnp.min), 0)
    xmin = jnp.maximum(tile_reduce(dx0, jnp.min), 0)
    by8 = (ymin // 8).astype(jnp.int32)  # aligned DMA base quotients
    bx128 = (xmin // 128).astype(jnp.int32)
    rx0 = (xmin - bx128 * 128).astype(jnp.int32)
    ylo = (ymin - by8 * 8).astype(jnp.int32)  # first live row cand, 0..7
    # live candidate counts: the max integer residual needs candidates
    # {resid, resid+1} for its bilinear pair, hence +2 (exclusive bound).
    # Rows are measured from the ALIGNED base (the 16-row blocks absorb
    # the <=7 remainder); columns from the true minimum (the in-kernel
    # roll ladder consumes the remainder).
    yh = jnp.clip(tile_reduce(dy0_hi, jnp.max) - by8 * 8 + 2, 1, RYC).astype(jnp.int32)
    xh = jnp.clip(tile_reduce(dx0_hi, jnp.max) - xmin + 2, 1, RXC).astype(jnp.int32)

    def per_pixel(base):
        return jnp.broadcast_to(
            base[:, None, :, None], (nty, TH, ntx, TW)
        ).reshape(hp, wp)

    ryf = jnp.clip((dy0 - per_pixel(by8 * 8)).astype(jnp.float32) + ay, 0.0, RYC - 1.0)
    rxf = jnp.clip((dx0 - per_pixel(xmin)).astype(jnp.float32) + ax, 0.0, RXC - 1.0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        # one grid step per tile ROW; the kernel loops the row's column
        # tiles itself so the slab DMA double-buffers across them
        grid=(nty,),
        in_specs=[
            # pinned to HBM: the kernel DMAs its own slabs
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((TH, wp), lambda i, *_: (i, 0)),
            pl.BlockSpec((TH, wp), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((c, TH, wp), lambda i, *_: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, c, ROWS, COLS), slab_dtype),  # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        interpret=interpret,
    )(by8, bx128, rx0, ylo, yh, xh, src.astype(slab_dtype), ryf, rxf)
    return out[:, :h, :w]
