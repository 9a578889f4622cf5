"""Third-generation Pallas TPU kernel for grid-anchored pyramidal LK:
points-in-lanes layout.

The v2 kernel (ops/lk_pallas2.py) puts the window's x extent on the
128-lane axis — only win_w+1 = 46 lanes are ever live (36% utilization,
BASELINE.md roofline) — and blocks points on the sublane-tiled axis.
This kernel transposes the layout: the LANE axis holds 128 POINTS and
both window axes live on sublane-tiled dims, so every lane computes a
distinct point and the per-point vector-op count drops ~2.5-4x.

Design constraints (all measured on this toolchain, 2026-08-20):
- Mosaic rotates only 32-bit data; 16-bit bitcast-roll tricks wedge the
  relay's remote-compile backend (micro_v3probe.py) — every roll here
  happens on f32 CHUNK VALUES, upcast from int-typed storage just for
  the masked ladder and cast straight back;
- VMEM scratch writes inside loop bodies SIGABRT (CLAUDE.md), and this
  kernel's first formulation (run_scoped slab scratch + manual DMA +
  straight-line scratch writes) crashed the remote compiler outright —
  so this formulation uses NO scratches and NO in-kernel DMA at all:
  slabs stream through the normal auto-pipelined BlockSpec path as
  (Nb, Ry, Rx, 128) INT8 blocks (pyramid levels are u8-quantized;
  biasing by -128 makes them exact in int8 at a QUARTER of the f32
  bytes, which is what lets two auto-pipeline buffers fit VMEM);
- per-point alignment ladders are masked rolls along the two sublane
  axes with per-LANE (per-point) selection masks, CHUNKED along the
  non-rolled axis so f32 transients stay ~2 MB; intermediates persist
  as int16 values (exact for u8 pixel data);
- the TOP pyramid level needs no phase A: its init is the grid anchor
  itself, so ops/lk.py sizes the top slab margins to exactly
  iter_margin_top, the alignment offset is identically zero, and the
  slab block IS the iteration crop;
- the bilinear blend runs at the zero-padded template width (WWP) so
  every vector op stays 8-lane aligned; garbage columns meet zero
  template columns in every consumer reduction.

Semantics match ops/lk_pallas2.py (same freeze/clamp envelope, W_BITS
fixed point, oscillation damper, spectral gating, status). The same
code path runs in interpreter mode off-TPU, so CPU tests cover the
production kernel structure.

Reference: OpenCV lkpyramid.cpp via cv2.calcOpticalFlowPyrLK
(pathfinder_viewer.py:144-193); cf. SURVEY.md section 2.3 and the
round-2 roofline's "points-in-lanes" lever (BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CV_SCALE = 1.0 / 1024.0
SLAB_BIAS = 128  # int8 slab values are pixel - SLAB_BIAS


def _fix(x):
    return jnp.floor(x * 32.0 + 0.5) * (1.0 / 32.0)


def _ladder_bits(maxval: int) -> tuple[int, ...]:
    return tuple(t for t in (64, 32, 16, 8, 4, 2, 1) if t <= maxval)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunks(total: int, target: int) -> list[tuple[int, int]]:
    """Split [0, total) into ~target-sized 8-aligned chunks."""
    n = max(1, -(-total // target))
    step = _round_up(-(-total // n), 8)
    out = []
    o = 0
    while o < total:
        out.append((o, min(step, total - o)))
        o += step
    return out


def lk_iterate_grid_lanes(
    tmpl: jnp.ndarray,  # (3, win_h, WWP, NP) i16 templates (x32 grid)
    slabs: jnp.ndarray,  # (Nb, Ry, Rx, 128) i8 search slabs (pixel-128)
    slab_base: jnp.ndarray,  # (NP, 2) i32 [x, y] UNPADDED slab origins
    next_tl0: jnp.ndarray,  # (NP, 2) f32 initial window top-left (unpadded)
    status0: jnp.ndarray,  # (NP,) bool/float
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
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Points-in-lanes LK level iteration. NP = Nb * 128 (the padded
    point count); padded points must carry zero templates (their
    det == 0 spectral-gates them inactive).

    When the slab geometry equals the iteration crop (Ry == crop_y and
    Rx == padded crop_x — the top-level configuration), phase A is a
    single debias cast and the ladder work vanishes."""
    nb, ry, rx, b = slabs.shape
    assert b == 128
    np_ = nb * b
    crop_y = win_h + 1 + 2 * m_iter
    crop_x = win_w + 1 + 2 * m_iter
    # exact-margin (top-level) slabs carry no x slack: the crop keeps the
    # raw width; otherwise pad the crop to an 8-aligned width
    cxp = crop_x if rx == crop_x else _round_up(crop_x, 8)
    assert crop_y <= ry and cxp <= rx, (crop_y, ry, cxp, rx)
    a_bits_y = _ladder_bits(ry - crop_y)
    a_bits_x = _ladder_bits(rx - cxp)
    i_bits = _ladder_bits(2 * m_iter)
    wwp = tmpl.shape[2]
    assert tmpl.shape == (3, win_h, wwp, np_), tmpl.shape
    # phase-B window reads stay ahead of the cyclic wrap: live template
    # columns ([0, win_w)) never see wrapped data
    assert 2 * m_iter + win_w + 1 <= cxp, (m_iter, win_w, cxp)

    flt_eps = 1.1920929e-07
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(bx_r, by_r, tx_r, ty_r, st_r, tmpl_r, slab_r, out_r):
        def lanes(ref):
            return ref[0].reshape(1, 1, b)

        base_x = lanes(bx_r).astype(jnp.int32)
        base_y = lanes(by_r).astype(jnp.int32)
        tlx0 = lanes(tx_r)
        tly0 = lanes(ty_r)
        descale = jnp.float32(1.0 / 32.0)

        def tplane(i):
            return tmpl_r[i].astype(jnp.float32) * descale  # (win_h, wwp, b)

        # structure tensor + OpenCV spectral gating (padded template
        # columns are zero and contribute nothing)
        ixw0 = tplane(1)
        iyw0 = tplane(2)
        a11 = jnp.sum(ixw0 * ixw0, axis=(0, 1)).reshape(1, 1, b) * _CV_SCALE
        a12 = jnp.sum(ixw0 * iyw0, axis=(0, 1)).reshape(1, 1, b) * _CV_SCALE
        a22 = jnp.sum(iyw0 * iyw0, axis=(0, 1)).reshape(1, 1, b) * _CV_SCALE
        det = a11 * a22 - a12 * a12
        min_eig = (
            a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)
        ) / (2.0 * win_w * win_h)
        bad_tmpl = (min_eig < min_eig_threshold) | (det < flt_eps)
        inv_det = jnp.where(det > 0, 1.0 / det, 0.0)

        # ---- phase A: align each point's slab to its init offset ----
        ry0_raw = jnp.floor(tly0).astype(jnp.int32) - base_y - m_iter
        rx0_raw = jnp.floor(tlx0).astype(jnp.int32) - base_x - m_iter
        fits = (
            (ry0_raw >= 0)
            & (ry0_raw <= ry - crop_y)
            & (rx0_raw >= 0)
            & (rx0_raw <= rx - cxp)
        ).astype(jnp.float32)
        oym = jnp.clip(ry0_raw, 0, ry - crop_y)
        oxm = jnp.clip(rx0_raw, 0, rx - cxp)
        crop_bx = base_x + oxm  # (1, 1, b) unpadded coords of crop origin
        crop_by = base_y + oym

        def deb(v):
            """int8 slab chunk -> debiased f32 pixels."""
            return v.astype(jnp.float32) + jnp.float32(SLAB_BIAS)

        if not a_bits_y and not a_bits_x and (ry, rx) == (crop_y, cxp):
            # top-level geometry: the block IS the crop (offset == 0)
            crop = (slab_r[0].astype(jnp.int16) + jnp.int16(SLAB_BIAS))
        else:
            # y-ladder (cyclic over Ry), chunked along x; intermediates
            # persist as exact int16 pixel values
            ypieces = []
            for off, size in _chunks(rx, 32):
                x = deb(slab_r[0, :, off : off + size, :])
                for t in a_bits_y:
                    x = jnp.where(
                        (oym & t) != 0, pltpu.roll(x, ry - t, 0), x
                    )
                ypieces.append(x[:crop_y].astype(jnp.int16))
            yc = jnp.concatenate(ypieces, axis=1)  # (crop_y, rx, b) i16
            # x-ladder (cyclic over Rx), chunked along y
            xpieces = []
            for off, size in _chunks(crop_y, 24):
                x = yc[off : off + size].astype(jnp.float32)
                for t in a_bits_x:
                    x = jnp.where(
                        (oxm & t) != 0, pltpu.roll(x, rx - t, 1), x
                    )
                xpieces.append(x[:, :cxp, :].astype(jnp.int16))
            crop = jnp.concatenate(xpieces, axis=0)  # (crop_y, cxp, b) i16

        def _sample(oy_off, ox_off, ax, ay):
            """Bilinear window at per-lane offsets via CHUNKED masked-roll
            ladders: f32 transients stay ~2 chunks above the int16 crop,
            which is what lets the wide-margin top level (crop 110x112)
            run at the full 128-lane block within VMEM."""
            # y-ladder (cyclic over crop_y), chunked along x
            ypieces = []
            for off, size in _chunks(cxp, 32):
                w = crop[:, off : off + size, :].astype(jnp.float32)
                for t in i_bits:
                    w = jnp.where(
                        (oy_off & t) != 0, pltpu.roll(w, crop_y - t, 0), w
                    )
                ypieces.append(w[: win_h + 1])
            w = jnp.concatenate(ypieces, axis=1)  # (win_h+1, cxp, b) f32
            # x-ladder (cyclic over cxp), chunked along y
            xpieces = []
            for off, size in _chunks(win_h + 1, 24):
                v = w[off : off + size]
                for t in i_bits:
                    v = jnp.where(
                        (ox_off & t) != 0, pltpu.roll(v, cxp - t, 1), v
                    )
                xpieces.append(v[:, : wwp + 1, :])
            sub = jnp.concatenate(xpieces, axis=0)  # (win_h+1, wwp+1, b)
            # blend at padded width: garbage columns >= win_w meet zero
            # template columns in every consumer reduction
            return _fix(
                sub[:win_h, :wwp] * (1 - ax) * (1 - ay)
                + sub[:win_h, 1 : wwp + 1] * ax * (1 - ay)
                + sub[1 : win_h + 1, :wwp] * (1 - ax) * ay
                + sub[1 : win_h + 1, 1 : wwp + 1] * ax * ay
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

            ax = tlx - ix  # (1, 1, b)
            ay = tly - iy
            oy = jnp.clip(iy.astype(jnp.int32) - crop_by, 0, 2 * m_iter)
            ox = jnp.clip(ix.astype(jnp.int32) - crop_bx, 0, 2 * m_iter)

            jw = _sample(oy, ox, ax, ay)  # (win_h, wwp, b)
            diff = jw - tplane(0)
            b1 = jnp.sum(diff * tplane(1), axis=(0, 1)).reshape(1, 1, b) * _CV_SCALE
            b2 = jnp.sum(diff * tplane(2), axis=(0, 1)).reshape(1, 1, b) * _CV_SCALE
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

        zero = jnp.zeros((1, 1, b), jnp.float32)
        status_in = lanes(st_r)
        if is_level0:
            status_in = jnp.minimum(status_in, 1.0 - bad_tmpl.astype(jnp.float32))
        active_in = jnp.minimum(fits, 1.0 - bad_tmpl.astype(jnp.float32))
        init = (tlx0, tly0, zero, zero, active_in, status_in)
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

        r_idx = lax.broadcasted_iota(jnp.int32, (8, b), 0)
        out_r[0] = jnp.where(
            r_idx == 0,
            jnp.broadcast_to(tlx.reshape(1, b), (8, b)),
            jnp.where(
                r_idx == 1,
                jnp.broadcast_to(tly.reshape(1, b), (8, b)),
                jnp.broadcast_to(status_f.reshape(1, b), (8, b)),
            ),
        )

    def lane_rows(x):
        # (nb, 1, b): the block (1, 1, b) then equals the trailing array
        # dims — Mosaic requires trailing block dims divisible by (8, 128)
        # OR equal to the array dims
        return x.astype(jnp.float32).reshape(nb, 1, b)

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0))] * 5
        + [
            pl.BlockSpec((3, win_h, wwp, b), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((1, ry, rx, b), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, 8, b), jnp.float32),
        interpret=interpret,
    )(
        lane_rows(slab_base[:, 0]),
        lane_rows(slab_base[:, 1]),
        lane_rows(next_tl0[:, 0]),
        lane_rows(next_tl0[:, 1]),
        lane_rows(status0),
        tmpl,
        slabs,
    )
    tlx = out[:, 0, :].reshape(np_)
    tly = out[:, 1, :].reshape(np_)
    status = out[:, 2, :].reshape(np_) > 0.5
    return jnp.stack([tlx, tly], axis=-1), status
