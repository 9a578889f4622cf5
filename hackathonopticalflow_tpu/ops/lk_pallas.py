"""Pallas TPU kernel for the pyramidal-LK iteration loop.

The XLA formulation of LK's inner loop re-extracts every point's window
from HBM on every Gauss-Newton iteration (10 dynamic slices per point per
level — slice-loop bound on this hardware). This kernel keeps a BLOCK of
points' search slabs resident in VMEM and runs ALL iterations on-chip,
fully vectorized across the block:

- each point's integer window offset inside its slab is realized as a
  log2 ladder of static circular rolls (pltpu.roll) masked per point —
  sublane rolls for the row offset, lane rolls for the column offset
  (the lane dimension is not dynamically addressable on TPU);
- the windows are bilinearly blended with per-point fractional weights,
  quantized to OpenCV's 1/32 fixed-point grid, and reduced against the
  VMEM-resident template/gradient windows — (B, win, win) VPU math;
- Gauss-Newton state (positions, deltas, masks) is carried as (B, 1)
  sublane vectors through the fori_loop (lane<->sublane transposes are
  unsupported; keeping the point index on sublanes lets the same vectors
  broadcast over the (B, win, win) tiles); per-point inputs arrive as
  (N/B, B, 1) VMEM columns; results leave as a packed (N/B, B, 8) tile.

HBM traffic collapses to ONE read of slabs + templates, auto-pipelined
across the block grid. Numerics are identical to ops/lk.py's exact path
(same masks, step, eps and oscillation damping); points whose intra-level
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
    block_n: int = 32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the per-level LK iterations; returns (next_tl, status)."""
    n = iw.shape[0]
    assert n % block_n == 0, "caller pads the point count to block_n"
    b = block_n
    nb = n // b
    s = slabs.shape[-1]
    roll_bits = [t for t in (64, 32, 16, 8, 4, 2, 1) if t <= margin2]

    def kernel(iw_r, ixw_r, iyw_r, slab_r, bx_r, by_r, tx_r, ty_r,
               a11_r, a12_r, a22_r, idet_r, act_r, st_r, out_r):
        def row(ref):
            return ref[0]  # (b, 1) sublane vector

        a11 = row(a11_r)
        a12 = row(a12_r)
        a22 = row(a22_r)
        inv_det = row(idet_r)
        base_x = row(bx_r).astype(jnp.int32)
        base_y = row(by_r).astype(jnp.int32)
        iw_v = iw_r[:]
        ixw_v = ixw_r[:]
        iyw_v = iyw_r[:]
        slab_v = slab_r[:]

        def body(j, carry):
            # masks travel as f32 0/1 (boolean vector loop carries fail to
            # legalize in Mosaic)
            tlx, tly, pdx, pdy, active_f, status_f = carry  # (b, 1) each
            active = active_f > 0.5
            status = status_f > 0.5
            ix = jnp.floor(tlx)
            iy = jnp.floor(tly)
            oob = (ix < -win_w) | (ix >= level_w) | (iy < -win_h) | (iy >= level_h)
            if is_level0:
                status = status & ~(active & oob)
            active = active & ~oob

            ax = (tlx - ix).reshape(b, 1, 1)  # (b,1) -> (b,1,1): same layout
            ay = (tly - iy).reshape(b, 1, 1)
            ox = jnp.clip(ix.astype(jnp.int32) + pad - base_x, 0, margin2)
            oy = jnp.clip(iy.astype(jnp.int32) + pad - base_y, 0, margin2)
            oxm = ox.reshape(b, 1, 1)
            oym = oy.reshape(b, 1, 1)

            x = slab_v
            for t in roll_bits:
                # left-roll by t == roll by (S - t); masked per point
                x = jnp.where((oym & t) != 0, pltpu.roll(x, s - t, 1), x)
            x = x[:, : win_h + 1, :]  # rows resolved: crop before lane work
            for t in roll_bits:
                x = jnp.where((oxm & t) != 0, pltpu.roll(x, s - t, 2), x)
            sub = x[:, :, : win_w + 1]
            jw = _fix(
                sub[:, :win_h, :win_w] * (1 - ax) * (1 - ay)
                + sub[:, :win_h, 1:] * ax * (1 - ay)
                + sub[:, 1:, :win_w] * (1 - ax) * ay
                + sub[:, 1:, 1:] * ax * ay
            )
            diff = jw - iw_v
            b1 = jnp.sum(jnp.sum(diff * ixw_v, axis=2), axis=1, keepdims=True) * _CV_SCALE
            b2 = jnp.sum(jnp.sum(diff * iyw_v, axis=2), axis=1, keepdims=True) * _CV_SCALE
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
            return tlx, tly, dx, dy, active.astype(jnp.float32), status.astype(jnp.float32)

        def rrow(ref):
            return ref[0]

        zero = jnp.zeros((b, 1), jnp.float32)

        # early exit once every point in the block has converged —
        # LK typically finishes in 3-5 of the 10 capped iterations
        def cond(carry):
            j = carry[0]
            active_f = carry[5]
            return (j < max_iters) & (jnp.max(active_f) > 0.5)

        def wbody(carry):
            j = carry[0]
            out = body(j, carry[1:])
            return (j + 1,) + out

        carry = lax.while_loop(
            cond,
            wbody,
            (
                jnp.int32(0),
                rrow(tx_r),
                rrow(ty_r),
                zero,
                zero,
                rrow(act_r),
                rrow(st_r),
            ),
        )
        tlx, tly, status_f = carry[1], carry[2], carry[6]
        # pack [tlx, tly, status] into lanes of the (b, 8) output tile
        c_idx = lax.broadcasted_iota(jnp.int32, (b, 8), 1)
        out_r[0] = jnp.where(c_idx == 0, tlx, jnp.where(c_idx == 1, tly, status_f))

    def wspec(*shape):
        return pl.BlockSpec((b,) + shape, lambda i: (i,) + (0,) * len(shape))

    def rspec():
        return pl.BlockSpec((1, b, 1), lambda i: (i, 0, 0))

    def as_rows(x):
        return x.astype(jnp.float32).reshape(nb, b, 1)

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            wspec(win_h, win_w),
            wspec(win_h, win_w),
            wspec(win_h, win_w),
            wspec(s, s),
            rspec(),
            rspec(),
            rspec(),
            rspec(),
            rspec(),
            rspec(),
            rspec(),
            rspec(),
            rspec(),
            rspec(),
        ],
        out_specs=pl.BlockSpec((1, b, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, b, 8), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(
        iw,
        ixw,
        iyw,
        slabs,
        as_rows(slab_base[:, 0].astype(jnp.float32)),
        as_rows(slab_base[:, 1].astype(jnp.float32)),
        as_rows(next_tl0[:, 0]),
        as_rows(next_tl0[:, 1]),
        as_rows(amat[:, 0]),
        as_rows(amat[:, 1]),
        as_rows(amat[:, 2]),
        as_rows(amat[:, 3]),
        as_rows(active0),
        as_rows(status0),
    )
    tlx = out[:, :, 0].reshape(n)
    tly = out[:, :, 1].reshape(n)
    status = out[:, :, 2].reshape(n) > 0.5
    return jnp.stack([tlx, tly], axis=-1), status
