"""Second-generation Pallas TPU kernel for grid-anchored pyramidal LK.

The v1 kernel (ops/lk_pallas.py) extracts one dynamic slab per point in
XLA (2304 serialized dynamic slices per level) and runs the iteration
ladder over the full (win+2M+2)^2 slab each Gauss-Newton step. This
kernel exploits the pathfinder's STATIC measurement grid
(pathfinder_viewer.py:255-267; SURVEY.md "hard parts" #1 — "fixed grid
points are regularly strided — exploit that"):

- search slabs are GRID-anchored and statically extracted
  (ops/grid_patch.py): (N, Ry, 128) bf16 blocks stream through the
  normal Pallas auto-pipeline — no dynamic slices, no in-kernel DMA
  bookkeeping, no gathers anywhere;
- bf16 slabs are EXACT: pyramid levels are u8-quantized, and every
  integer in [0, 255] is representable in bfloat16; all blend math
  upcasts to f32 before OpenCV's 1/32 fixed-point quantization;
- phase A (once per level): each point's slab is rotated to its
  coarse-level initialization offset with 7-bit masked roll ladders and
  cropped to the iteration window + a small margin (win+1+2*m_iter);
- phase B (per Gauss-Newton iteration): only 4-bit ladders over the
  small crop — the per-iteration cost no longer scales with the search
  margin, which is what made v1 latency-bound;
- templates arrive pre-extracted/pre-quantized (static grid slices, XLA)
  as regular blocked inputs.

Semantics match ops/lk.py's exact path (masks, step, eps, oscillation
damping, status); points whose within-level drift exceeds m_iter px from
their coarse init, or whose total flow exceeds the slab margins
(41 px * 2^level horizontally, 40 px * 2^level vertically), clamp at the
slab edge — wider budgets than v1's +-16 px slabs. Interpreter mode off
TPU so tests cover it everywhere.

Measured dead end (2026-08-20, do not re-litigate): an "incremental"
phase B that kept the aligned crop resident and rolled it by the
per-iteration offset DELTA (|delta| <= 1 for subpixel GN steps) instead
of re-running the absolute ladder. Two implementations both lost:
(a) pure-carry through the while_loop — Mosaic copies the ~1 MB carry
every iteration, 20.5 ms vs 13.0 ms for the absolute ladder at 1080p;
(b) VMEM scratch-resident crop — scratch writes under pl.when inside
loop bodies SIGABRT/hang this toolchain's remote-compile helper
(CLAUDE.md "Pallas/Mosaic gotcha"). Big loop state must stay out of the
carry, and the stateless absolute ladder stands.
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


def _ladder_bits(maxval: int) -> tuple[int, ...]:
    return tuple(t for t in (64, 32, 16, 8, 4, 2, 1) if t <= maxval)


def lk_iterate_grid(
    tmpl: jnp.ndarray,  # (3, N, win_h, 128) i16 templates (x32 grid)
    slabs: jnp.ndarray,  # (N, Ry, 128) i16 grid-anchored search slabs
    slab_base: jnp.ndarray,  # (N, 2) i32 [x, y] UNPADDED slab origins, x-major
    next_tl0: jnp.ndarray,  # (N, 2) f32 initial window top-left (unpadded)
    status0: jnp.ndarray,  # (N,) bool
    *,
    win_w: int,
    win_h: int,
    m_iter: int,
    level_w: int,
    level_h: int,
    max_iters: int,
    eps2: float,
    is_level0: bool,
    min_eig_threshold: float = 1e-4,
    early_exit: bool = True,
    block_n: int = 48,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Template/slab inputs arrive in the extraction-native blocked layout
    (ops/grid_patch.py *_blocked): tmpl (3, N, win_h, 128) int16 on
    OpenCV's x32 window grid; slabs (N, Ry, 128) int16, both point-major
    in the grid's x-major order and streamed with zero relayout; the
    W_BITS dequantization, structure tensor, and its spectral gating all
    happen in-kernel (no f32 template array ever materializes in HBM).
    Per-point vectors are x-major (N,)."""
    n, ry, rx = slabs.shape
    assert rx == 128
    # largest divisor of N <= block_n points per block (VMEM-bounded)
    b = min(block_n, n)
    while n % b:
        b -= 1
    nb = n // b
    crop_y = win_h + 1 + 2 * m_iter
    crop_x = win_w + 1 + 2 * m_iter
    assert crop_y <= ry and crop_x <= rx
    a_bits_y = _ladder_bits(ry - crop_y)
    a_bits_x = _ladder_bits(rx - crop_x)
    i_bits = _ladder_bits(2 * m_iter)

    flt_eps = 1.1920929e-07

    def kernel(tmpl_r, slab_r, bx_r, by_r, tx_r, ty_r, st_r, out_r):
        def row(ref):
            return ref[0]  # (b, 1)

        base_x = row(bx_r).astype(jnp.int32)
        base_y = row(by_r).astype(jnp.int32)
        tlx0 = row(tx_r)
        tly0 = row(ty_r)
        descale = jnp.float32(1.0 / 32.0)
        iw_v = tmpl_r[0][:, :, :win_w].astype(jnp.float32) * descale
        ixw_v = tmpl_r[1][:, :, :win_w].astype(jnp.float32) * descale
        iyw_v = tmpl_r[2][:, :, :win_w].astype(jnp.float32) * descale

        # structure tensor + OpenCV spectral gating, in-kernel
        a11 = jnp.sum(jnp.sum(ixw_v * ixw_v, axis=2), axis=1, keepdims=True) * _CV_SCALE
        a12 = jnp.sum(jnp.sum(ixw_v * iyw_v, axis=2), axis=1, keepdims=True) * _CV_SCALE
        a22 = jnp.sum(jnp.sum(iyw_v * iyw_v, axis=2), axis=1, keepdims=True) * _CV_SCALE
        det = a11 * a22 - a12 * a12
        min_eig = (
            a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)
        ) / (2.0 * win_w * win_h)
        bad_tmpl = (min_eig < min_eig_threshold) | (det < flt_eps)
        inv_det = jnp.where(det > 0, 1.0 / det, 0.0)

        # ---- phase A: rotate each point's slab to its init offset ----
        ry0_raw = jnp.floor(tly0).astype(jnp.int32) - base_y - m_iter
        rx0_raw = jnp.floor(tlx0).astype(jnp.int32) - base_x - m_iter
        # points whose iteration crop does not fit inside the slab FREEZE
        # at this level and keep the coarser level's estimate (the slab
        # margins bound the representable flow; a frozen point's value is
        # the coarse-level subpixel result x2 — still inside the EPE
        # budget, and such flows are this kernel's range envelope)
        fits = (
            (ry0_raw >= 0)
            & (ry0_raw <= ry - crop_y)
            & (rx0_raw >= 0)
            & (rx0_raw <= rx - crop_x)
        ).astype(jnp.float32)
        ry0 = jnp.clip(ry0_raw, 0, ry - crop_y)
        rx0 = jnp.clip(rx0_raw, 0, rx - crop_x)
        # slabs stream in as i16 (half the f32 pipeline traffic; exact
        # for u8-quantized pyramid levels) but Mosaic only rotates 32-bit
        # data — upcast once before the ladders
        x = slab_r[:].astype(jnp.float32)
        oym = ry0.reshape(b, 1, 1)
        for t in a_bits_y:
            x = jnp.where((oym & t) != 0, pltpu.roll(x, ry - t, 1), x)
        x = x[:, :crop_y, :]
        oxm = rx0.reshape(b, 1, 1)
        for t in a_bits_x:
            x = jnp.where((oxm & t) != 0, pltpu.roll(x, rx - t, 2), x)
        crop = x  # (b, crop_y, rx) f32; window cols live in [0, crop_x)
        crop_bx = base_x + rx0  # (b, 1) unpadded coords of crop origin
        crop_by = base_y + ry0

        def _sample(crop, oy_off, ox_off, ax, ay):
            """Bilinear window at crop offset (oy_off, ox_off) via the
            full masked-ladder rolls (the non-incremental path)."""
            w = crop
            for t in i_bits:
                w = jnp.where((oy_off & t) != 0, pltpu.roll(w, crop_y - t, 1), w)
            w = w[:, : win_h + 1, :]
            for t in i_bits:
                w = jnp.where((ox_off & t) != 0, pltpu.roll(w, rx - t, 2), w)
            sub = w[:, :, : win_w + 1]
            return _blend(sub, ax, ay)

        def _blend(sub, ax, ay):
            return _fix(
                sub[:, :win_h, :win_w] * (1 - ax) * (1 - ay)
                + sub[:, :win_h, 1:win_w + 1] * ax * (1 - ay)
                + sub[:, 1:win_h + 1, :win_w] * (1 - ax) * ay
                + sub[:, 1:win_h + 1, 1:win_w + 1] * ax * ay
            )

        # ---- phase B: Gauss-Newton iterations on the small crop ----
        def body(j, carry):
            tlx, tly, pdx, pdy, active_f, status_f = carry
            active = active_f > 0.5
            status = status_f > 0.5
            ix = jnp.floor(tlx)
            iy = jnp.floor(tly)
            oob = (ix < -win_w) | (ix >= level_w) | (iy < -win_h) | (iy >= level_h)
            if is_level0:
                status = status & ~(active & oob)
            active = active & ~oob

            ax = (tlx - ix).reshape(b, 1, 1)
            ay = (tly - iy).reshape(b, 1, 1)
            oy = jnp.clip(iy.astype(jnp.int32) - crop_by, 0, 2 * m_iter)
            ox = jnp.clip(ix.astype(jnp.int32) - crop_bx, 0, 2 * m_iter)

            jw = _sample(crop, oy.reshape(b, 1, 1), ox.reshape(b, 1, 1), ax, ay)
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
            return (
                tlx, tly, dx, dy,
                active.astype(jnp.float32), status.astype(jnp.float32),
            )

        zero = jnp.zeros((b, 1), jnp.float32)
        status_in = row(st_r)
        if is_level0:
            status_in = jnp.minimum(status_in, 1.0 - bad_tmpl.astype(jnp.float32))
        active_in = jnp.minimum(
            fits, 1.0 - bad_tmpl.astype(jnp.float32)
        )
        init = (
            tlx0,
            tly0,
            zero,
            zero,
            active_in,
            status_in,
        )
        if early_exit:

            def cond(carry):
                return (carry[0] < max_iters) & (jnp.max(carry[5]) > 0.5)

            def wbody(carry):
                out = body(carry[0], carry[1:])
                return (carry[0] + 1,) + out

            carry = lax.while_loop(cond, wbody, (jnp.int32(0),) + init)
            tlx, tly, status_f = carry[1], carry[2], carry[6]
        else:
            carry = lax.fori_loop(0, max_iters, body, init)
            tlx, tly, status_f = carry[0], carry[1], carry[5]

        c_idx = lax.broadcasted_iota(jnp.int32, (b, 8), 1)
        out_r[0] = jnp.where(c_idx == 0, tlx, jnp.where(c_idx == 1, tly, status_f))

    def rspec():
        return pl.BlockSpec((1, b, 1), lambda i: (i, 0, 0))

    def as_rows(x):
        return x.astype(jnp.float32).reshape(nb, b, 1)

    tmpl_spec = pl.BlockSpec((3, b, win_h, 128), lambda i: (0, i, 0, 0))
    slab_spec = pl.BlockSpec((b, ry, rx), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[tmpl_spec, slab_spec] + [rspec()] * 5,
        out_specs=pl.BlockSpec((1, b, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, b, 8), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(
        tmpl,
        slabs,
        as_rows(slab_base[:, 0]),
        as_rows(slab_base[:, 1]),
        as_rows(next_tl0[:, 0]),
        as_rows(next_tl0[:, 1]),
        as_rows(status0),
    )
    tlx = out[:, :, 0].reshape(n)
    tly = out[:, :, 1].reshape(n)
    status = out[:, :, 2].reshape(n) > 0.5
    return jnp.stack([tlx, tly], axis=-1), status
