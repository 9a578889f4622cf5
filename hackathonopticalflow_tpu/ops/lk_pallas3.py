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
    a_max: int | None = None,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Points-in-lanes LK level iteration. NP = Nb * 128 (the padded
    point count); padded points must carry zero templates (their
    det == 0 spectral-gates them inactive).

    When the slab geometry equals the iteration crop (Ry == crop_y and
    Rx == padded crop_x — the top-level configuration), phase A is a
    single debias cast and the ladder work vanishes.

    a_max caps the phase-A alignment range below the slab-vs-crop
    slack: the aligned DMA carve (ops/carve_pallas.py) delivers 8-px-
    quantized origins inside (Ry, 128) rects whose slack is 10/40 px
    but whose true offsets are <= 7, and the cap drops the never-taken
    ladder passes. Offsets beyond the cap freeze like offsets beyond
    the slack always have (the `fits` gate)."""
    nb, ry, rx, b = slabs.shape
    assert b == 128
    np_ = nb * b
    crop_y = win_h + 1 + 2 * m_iter
    crop_x = win_w + 1 + 2 * m_iter
    # exact-margin (top-level) slabs carry no x slack: the crop keeps the
    # raw width; otherwise pad the crop to an 8-aligned width
    cxp = crop_x if rx == crop_x else _round_up(crop_x, 8)
    assert crop_y <= ry and cxp <= rx, (crop_y, ry, cxp, rx)
    slack_y = ry - crop_y if a_max is None else min(ry - crop_y, a_max)
    slack_x = rx - cxp if a_max is None else min(rx - cxp, a_max)
    a_bits_y = _ladder_bits(slack_y)
    a_bits_x = _ladder_bits(slack_x)
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
            & (ry0_raw <= slack_y)
            & (rx0_raw >= 0)
            & (rx0_raw <= slack_x)
        ).astype(jnp.float32)
        oym = jnp.clip(ry0_raw, 0, slack_y)
        oxm = jnp.clip(rx0_raw, 0, slack_x)
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
            # persist as exact int16 pixel values. Chunk target 24 (was
            # 32): at 32 the f32 transients put the whole kernel at
            # 15.99 MB of scoped VMEM and any extra program context
            # (a 48-pair scan, the staged runner's outer scan) tipped
            # it 72 KB over the 16 MB stack (measured round 4).
            ypieces = []
            for off, size in _chunks(rx, 24):
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


def lk_iterate_grid_lanes_packed(
    tmpl: jnp.ndarray,  # (3, win_h, WWP, NP) i16 templates (x32 grid)
    slabs: jnp.ndarray,  # (Nb, Ry, Rx, 128) i8 search slabs (pixel-128)
    next_tl0: jnp.ndarray,  # (NP, 2) f32 initial window top-left (unpadded)
    status0: jnp.ndarray,  # (NP,) bool/float
    slab_base: jnp.ndarray | None = None,  # (NP, 2) i32 [x, y] origins
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
    """lk_iterate_grid_lanes with x4 u8-in-int32 PACKED alignment
    ladders (round 4).

    Both alignment stages — phase A (slab -> per-point crop; pass
    slab_base for the wide-slab levels, omit it for the exact-margin
    top level where the slab IS the crop) and the per-iteration window
    ladder — run on int32 words carrying four adjacent u8 x-columns:
    the y-ladders and the whole-word x shifts touch a QUARTER of the
    vector registers (the top level's 7-bit ladder over its (110, 112)
    crop alone was 66% of that level's per-iteration cost — the
    prof-ladder-split experiment, 2026-08-21). Sub-word x shifts
    (0..3 bytes) are three byte-combine candidates + a per-lane select,
    and the bilinear blend + Gauss-Newton reductions run in BYTE-PLANE
    layout (plane j holds window columns 4k+j; window sums are
    order-independent, so no column interleave is ever materialized).
    Packing is numerically EXACT — u8 pixels round-trip the int32
    words bit-for-bit; only f32 summation order differs from the
    unpacked kernel (<=0.04 px on corpus frames, status bits
    identical).

    Reference: OpenCV lkpyramid.cpp via cv2.calcOpticalFlowPyrLK
    (pathfinder_viewer.py:144-193)."""
    nb, ry, rx, b = slabs.shape
    assert b == 128
    np_ = nb * b
    crop_y = win_h + 1 + 2 * m_iter
    crop_x = win_w + 1 + 2 * m_iter
    top_level = slab_base is None
    if top_level:
        assert (ry, rx) == (crop_y, crop_x), (ry, rx, crop_y, crop_x)
    cxp = _round_up(crop_x, 4)
    if rx < cxp:
        # pad columns to a word multiple: the pad is reachable only by
        # sampled columns whose window position lands on zero template
        # columns (>= win_w), so its contents never matter
        slabs = jnp.pad(slabs, [(0, 0), (0, 0), (0, cxp - rx), (0, 0)])
        rx = cxp
    assert rx % 4 == 0 and ry >= crop_y and rx >= cxp
    a_bits_y = _ladder_bits(ry - crop_y)
    aw_bits = _ladder_bits((rx - cxp) >> 2)  # phase-A whole-word x bits
    i_bits = _ladder_bits(2 * m_iter)
    iw_bits = _ladder_bits((2 * m_iter) >> 2)
    wwp = tmpl.shape[2]
    assert wwp % 4 == 0
    nwt = wwp // 4  # template words
    nws = nwt + 1  # sampled words (the +1 x tap)
    nw = rx // 4  # slab words
    ncw = cxp // 4  # crop words
    assert tmpl.shape == (3, win_h, wwp, np_), tmpl.shape
    assert 2 * m_iter + win_w + 1 <= cxp, (m_iter, win_w, cxp)

    flt_eps = 1.1920929e-07
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # XLA-side packing (cheap relayout): u8 pixel values, byte k of word
    # w = column 4w+k; templates regrouped to word/byte-plane axes
    u = (slabs.astype(jnp.int32) + SLAB_BIAS) & 0xFF
    w4 = u.reshape(nb, ry, nw, 4, b)
    packed = (
        w4[:, :, :, 0, :]
        | (w4[:, :, :, 1, :] << 8)
        | (w4[:, :, :, 2, :] << 16)
        | (w4[:, :, :, 3, :] << 24)
    )  # (Nb, Ry, nw, b) int32
    # byte-plane-major 4D template layout (plane j = window columns
    # 4k+j): channel c, plane j -> leading index c*4+j. 4D because
    # Mosaic block specs stay on well-trodden ground there.
    tmpl_p = jnp.transpose(
        tmpl.reshape(3, win_h, nwt, 4, np_), (0, 3, 1, 2, 4)
    ).reshape(12, win_h, nwt, np_)

    def kernel(bx_r, by_r, tx_r, ty_r, st_r, tmpl_r, slab_r, out_r):
        def lanes(ref):
            return ref[0].reshape(1, 1, b)

        tlx0 = lanes(tx_r)
        tly0 = lanes(ty_r)
        descale = jnp.float32(1.0 / 32.0)

        def tplane(i, j):
            # channel i, byte plane j: (win_h, nwt, b)
            return tmpl_r[i * 4 + j].astype(jnp.float32) * descale

        a11 = jnp.zeros((1, 1, b), jnp.float32)
        a12 = jnp.zeros((1, 1, b), jnp.float32)
        a22 = jnp.zeros((1, 1, b), jnp.float32)
        for j in range(4):
            ixw0 = tplane(1, j)
            iyw0 = tplane(2, j)
            a11 = a11 + jnp.sum(ixw0 * ixw0, axis=(0, 1)).reshape(1, 1, b)
            a12 = a12 + jnp.sum(ixw0 * iyw0, axis=(0, 1)).reshape(1, 1, b)
            a22 = a22 + jnp.sum(iyw0 * iyw0, axis=(0, 1)).reshape(1, 1, b)
        a11 = a11 * _CV_SCALE
        a12 = a12 * _CV_SCALE
        a22 = a22 * _CV_SCALE
        det = a11 * a22 - a12 * a12
        min_eig = (
            a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)
        ) / (2.0 * win_w * win_h)
        bad_tmpl = (min_eig < min_eig_threshold) | (det < flt_eps)
        inv_det = jnp.where(det > 0, 1.0 / det, 0.0)

        crop_full = slab_r[0]  # (ry, nw, b) int32 packed
        if top_level:
            # the crop origin is floor(tl0) - m_iter: the slab is carved
            # at exactly that base (ops/lk.py sizes top margins to
            # m_iter), so the anchor derives in-kernel from the init
            crop = crop_full
            crop_bx = jnp.floor(tlx0).astype(jnp.int32) - m_iter
            crop_by = jnp.floor(tly0).astype(jnp.int32) - m_iter
            fits = jnp.ones((1, 1, b), jnp.float32)
        else:
            # ---- packed phase A: align each point's slab to its init
            # offset (same envelope as the unpacked kernel's phase A,
            # on a quarter of the vregs) ----
            base_x = lanes(bx_r).astype(jnp.int32)
            base_y = lanes(by_r).astype(jnp.int32)
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
            crop_bx = base_x + oxm
            crop_by = base_y + oym
            ypieces = []
            for off, size in _chunks(nw, 10):
                wch = crop_full[:, off : off + size, :]
                for t in a_bits_y:
                    wch = jnp.where(
                        (oym & t) != 0, pltpu.roll(wch, ry - t, 0), wch
                    )
                ypieces.append(wch[:crop_y])
            w = jnp.concatenate(ypieces, axis=1)  # (crop_y, nw, b)
            xw = oxm >> 2
            for t in aw_bits:
                w = jnp.where((xw & t) != 0, pltpu.roll(w, nw - t, 1), w)
            nxt = pltpu.roll(w, nw - 1, 1)
            s = oxm & 3
            c1 = ((w >> 8) & 0x00FFFFFF) | (nxt << 24)
            c2 = ((w >> 16) & 0x0000FFFF) | (nxt << 16)
            c3 = ((w >> 24) & 0x000000FF) | (nxt << 8)
            crop = jnp.where(
                s == 1, c1, jnp.where(s == 2, c2, jnp.where(s == 3, c3, w))
            )[:, :ncw, :]

        def _sample(oy, ox, ax, ay):
            """Packed-ladder bilinear sample -> 4 byte-plane windows
            (win_h, nwt, b) each; plane j holds columns 4k+j.

            The y-ladder is CHUNKED along the word axis: unchunked, the
            per-bit (Ry, nw, 128) int32 temporaries overflowed the 16 MB
            scoped-VMEM stack (measured 17.09M, round 4 — the same
            constraint that shaped the unpacked kernel's chunking)."""
            ypieces = []
            for off, size in _chunks(ncw, 10):
                wch = crop[:, off : off + size, :]
                for t in i_bits:
                    wch = jnp.where(
                        (oy & t) != 0, pltpu.roll(wch, crop_y - t, 0), wch
                    )
                ypieces.append(wch[: win_h + 1])
            w = jnp.concatenate(ypieces, axis=1)
            xw = ox >> 2
            for t in iw_bits:
                w = jnp.where((xw & t) != 0, pltpu.roll(w, ncw - t, 1), w)
            nxt = pltpu.roll(w, ncw - 1, 1)
            s = ox & 3
            c1 = ((w >> 8) & 0x00FFFFFF) | (nxt << 24)
            c2 = ((w >> 16) & 0x0000FFFF) | (nxt << 16)
            c3 = ((w >> 24) & 0x000000FF) | (nxt << 8)
            v = jnp.where(
                s == 1, c1, jnp.where(s == 2, c2, jnp.where(s == 3, c3, w))
            )[:, :nws, :]
            B = [
                ((v >> (8 * k)) & 0xFF).astype(jnp.float32) for k in range(4)
            ]  # (win_h+1, nws, b)
            planes = []
            for j in range(4):
                if j < 3:
                    t0 = B[j][:, :nwt]
                    t1 = B[j + 1][:, :nwt]
                else:
                    t0 = B[3][:, :nwt]
                    t1 = B[0][:, 1 : nwt + 1]
                planes.append(
                    _fix(
                        t0[:win_h] * (1 - ax) * (1 - ay)
                        + t1[:win_h] * ax * (1 - ay)
                        + t0[1 : win_h + 1] * (1 - ax) * ay
                        + t1[1 : win_h + 1] * ax * ay
                    )
                )
            return planes  # list of (win_h, nwt, b)

        def body(j, carry):
            tlx, tly, pdx, pdy, active_f, status_f = carry
            active = active_f > 0.5
            status = status_f > 0.5
            ix = jnp.floor(tlx)
            iy = jnp.floor(tly)
            oob = (
                (ix < -win_w) | (ix >= level_w) | (iy < -win_h) | (iy >= level_h)
            )
            if is_level0:
                status = status & ~(active & oob)
            active = active & ~oob

            ax = tlx - ix
            ay = tly - iy
            # ladder offset = the window's integer drift from the crop
            # origin
            oy = jnp.clip(iy.astype(jnp.int32) - crop_by, 0, 2 * m_iter)
            ox = jnp.clip(ix.astype(jnp.int32) - crop_bx, 0, 2 * m_iter)

            jw = _sample(oy, ox, ax, ay)
            b1 = jnp.zeros((1, 1, b), jnp.float32)
            b2 = jnp.zeros((1, 1, b), jnp.float32)
            for jj in range(4):
                diff = jw[jj] - tplane(0, jj)
                b1 = b1 + jnp.sum(diff * tplane(1, jj), axis=(0, 1)).reshape(
                    1, 1, b
                )
                b2 = b2 + jnp.sum(diff * tplane(2, jj), axis=(0, 1)).reshape(
                    1, 1, b
                )
            b1 = b1 * _CV_SCALE
            b2 = b2 * _CV_SCALE
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
        return x.astype(jnp.float32).reshape(nb, 1, b)

    if top_level:
        base_cols = jnp.zeros((np_,), jnp.float32)
        bx_in = by_in = lane_rows(base_cols)
    else:
        bx_in = lane_rows(slab_base[:, 0])
        by_in = lane_rows(slab_base[:, 1])
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0))] * 5
        + [
            pl.BlockSpec((12, win_h, nwt, b), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((1, ry, nw, b), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, 8, b), jnp.float32),
        interpret=interpret,
    )(
        bx_in,
        by_in,
        lane_rows(next_tl0[:, 0]),
        lane_rows(next_tl0[:, 1]),
        lane_rows(status0),
        tmpl_p,
        packed,
    )
    tlx = out[:, 0, :].reshape(np_)
    tly = out[:, 1, :].reshape(np_)
    status = out[:, 2, :].reshape(np_) > 0.5
    return jnp.stack([tlx, tly], axis=-1), status
