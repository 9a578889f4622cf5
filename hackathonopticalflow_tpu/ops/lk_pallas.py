"""Pallas TPU kernel for the pyramidal-LK iteration loop.

The XLA formulation of LK's inner loop re-extracts every point's window
from HBM on every Gauss-Newton iteration (10 dynamic slices per point per
level — slice-loop bound, ~1.4 us each on this hardware). This kernel
keeps each point's search slab resident in VMEM and runs ALL iterations
on-chip: per iteration the window is a VMEM sublane dynamic slice at the
point's current integer row offset; the column offset (lane dimension,
not dynamically addressable on TPU) is realized as a log2 ladder of
static circular rolls + selects. The window is bilinearly blended with
the point's shared fractional weights, quantized to OpenCV's 1/32
fixed-point grid, and reduced against the VMEM-resident template and
gradient windows. HBM traffic collapses to ONE read of slabs + templates,
auto-pipelined across the point grid.

Mosaic-friendly structure: one point per program; all per-point scalars
(slab origin, initial position, structure tensor, masks) live in SMEM;
the Gauss-Newton state is carried as 0-D scalars through the fori_loop;
vector compute touches only clean 2-D (win, S) / (win, win) tiles.

Numerics are identical to ops/lk.py's exact path (same masks, step,
eps and oscillation-damping schedule); points whose intra-level
displacement leaves the slab clamp at its edge (only points already
beyond LK's trackable range). Enabled by LKParams.use_pallas; runs in
interpreter mode off-TPU so tests cover it everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CV_SCALE = 1.0 / 1024.0


def _fix(x):
    return jnp.floor(x * 32.0 + 0.5) * (1.0 / 32.0)


def lk_iterate(
    iw: jnp.ndarray,  # (N, win_h, win_w) f32 template windows (quantized)
    ixw: jnp.ndarray,  # (N, win_h, win_w) f32 gradient windows
    iyw: jnp.ndarray,
    slabs: jnp.ndarray,  # (N, S, S) f32 search slabs from the next image
    slab_base: jnp.ndarray,  # (N, 2) i32 [x, y] slab origins (padded coords)
    next_tl0: jnp.ndarray,  # (N, 2) f32 initial window top-left (unpadded)
    amat: jnp.ndarray,  # (N, 4) f32 [a11, a12, a22, inv_det]
    active0: jnp.ndarray,  # (N,) bool
    status0: jnp.ndarray,  # (N,) bool
    *,
    pad: int,
    margin2: int,
    win_w: int,
    win_h: int,
    level_w: int,
    level_h: int,
    max_iters: int,
    eps2: float,
    is_level0: bool,
    block_n: int = 1,  # kept for API stability; kernel is one point/program
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the per-level LK iterations; returns (next_tl, status)."""
    del block_n
    n = iw.shape[0]
    s = slabs.shape[-1]
    roll_bits = [b for b in (64, 32, 16, 8, 4, 2, 1) if b <= margin2]

    def kernel(bx_sm, by_sm, tx_sm, ty_sm, a11_sm, a12_sm, a22_sm, idet_sm,
               act_sm, st_sm, iw_r, ixw_r, iyw_r, slab_r, out_r):
        i = pl.program_id(0)
        a11 = a11_sm[i]
        a12 = a12_sm[i]
        a22 = a22_sm[i]
        inv_det = idet_sm[i]
        base_x = bx_sm[i]
        base_y = by_sm[i]
        iw_v = iw_r[0]
        ixw_v = ixw_r[0]
        iyw_v = iyw_r[0]

        def body(j, carry):
            tlx, tly, pdx, pdy, active, status = carry
            ix = jnp.floor(tlx)
            iy = jnp.floor(tly)
            oob = (ix < -win_w) | (ix >= level_w) | (iy < -win_h) | (iy >= level_h)
            if is_level0:
                status = status & ~(active & oob)
            active = active & ~oob

            ax = (tlx - ix).astype(jnp.float32)
            ay = (tly - iy).astype(jnp.float32)
            ox = jnp.clip(ix.astype(jnp.int32) + pad - base_x, 0, margin2)
            oy = jnp.clip(iy.astype(jnp.int32) + pad - base_y, 0, margin2)

            rows = slab_r[0, pl.ds(oy, win_h + 1), :]  # (win_h+1, S)
            for b in roll_bits:
                # left-roll by b == roll by (S - b) (shift must be >= 0)
                rows = jnp.where((ox & b) != 0, pltpu.roll(rows, s - b, 1), rows)
            sub = rows[:, : win_w + 1]
            jw = _fix(
                sub[:win_h, :win_w] * (1 - ax) * (1 - ay)
                + sub[:win_h, 1:] * ax * (1 - ay)
                + sub[1:, :win_w] * (1 - ax) * ay
                + sub[1:, 1:] * ax * ay
            )
            diff = jw - iw_v
            b1 = jnp.sum(diff * ixw_v) * _CV_SCALE
            b2 = jnp.sum(diff * iyw_v) * _CV_SCALE
            dx = (a12 * b2 - a22 * b1) * inv_det
            dy = (a12 * b1 - a11 * b2) * inv_det
            tlx = jnp.where(active, tlx + dx, tlx)
            tly = jnp.where(active, tly + dy, tly)
            converged = dx * dx + dy * dy <= eps2
            osc = (
                (j > 0)
                & (jnp.abs(dx + pdx) < 0.01)
                & (jnp.abs(dy + pdy) < 0.01)
                & ~converged
            )
            tlx = jnp.where(active & osc, tlx - dx * 0.5, tlx)
            tly = jnp.where(active & osc, tly - dy * 0.5, tly)
            active = active & ~(converged | osc)
            return tlx, tly, dx, dy, active, status

        tlx, tly, _, _, _, status = lax.fori_loop(
            0,
            max_iters,
            body,
            (
                tx_sm[i],
                ty_sm[i],
                jnp.float32(0.0),
                jnp.float32(0.0),
                act_sm[i] != 0,
                st_sm[i] != 0,
            ),
        )
        # pack scalars into lanes of the (1, 128) output row
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        vec = jnp.where(
            lane == 0,
            tlx,
            jnp.where(lane == 1, tly, status.astype(jnp.float32)),
        )
        out_r[0] = vec

    def vspec(*shape):
        return pl.BlockSpec((1,) + shape, lambda i, *_: (i,) + (0,) * len(shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(n,),
        in_specs=[
            vspec(win_h, win_w),
            vspec(win_h, win_w),
            vspec(win_h, win_w),
            vspec(s, s),
        ],
        out_specs=vspec(1, 128),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(
        slab_base[:, 0],
        slab_base[:, 1],
        next_tl0[:, 0],
        next_tl0[:, 1],
        amat[:, 0],
        amat[:, 1],
        amat[:, 2],
        amat[:, 3],
        active0.astype(jnp.int32),
        status0.astype(jnp.int32),
        iw,
        ixw,
        iyw,
        slabs,
    )
    next_tl = out[:, 0, :2]
    status = out[:, 0, 2] > 0.5
    return next_tl, status
