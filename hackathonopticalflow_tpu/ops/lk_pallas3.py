"""Third-generation Pallas TPU kernel for grid-anchored pyramidal LK:
points-in-lanes layout.

The v2 kernel (ops/lk_pallas2.py) puts the window's x extent on the
128-lane axis — only win_w+1 = 46 lanes are ever live (36% utilization,
BASELINE.md roofline) — and blocks points on the sublane-tiled axis.
This kernel transposes the layout: the LANE axis holds `lane_block`
POINTS and both window axes live on sublane-tiled dims, so every lane
computes a distinct point and the per-point vector-op count drops
~2.5-4x:

- slabs arrive as (Ry, Rx, NP) int16 (exact: pyramid levels are
  u8-quantized) and templates as (3, win_h, WWP, NP) int16 on OpenCV's
  x32 window grid (ops/grid_patch.py *_lanes extraction);
- the per-point alignment ladders become masked rolls along the two
  SUBLANE-tiled axes with per-LANE (per-point) selection masks — the
  same log2 ladder as v2, rotated 90 degrees;
- phase A (once per level) aligns each point's slab to its coarse-level
  init offset, chunked along the non-rolled axis so transient liveness
  stays ~2 MB; the slab lives in a run_scoped VMEM scratch (manual DMA,
  single-buffered — the block's compute dwarfs the copy) whose VMEM is
  returned before phase B, with the crop handed over via a small
  kernel-level scratch;
- phase B (per Gauss-Newton iteration) rolls only the small iteration
  crop (win+1+2*m_iter per axis); the crop stays int16 end to end when
  the toolchain rolls 16-bit data (roll_dtype='int16'), upcasting to
  f32 only at the bilinear blend; otherwise a f32 crop is used
  (roll_dtype='float32');
- templates stay int16-resident and dequantize on the fly per use — a
  f32 copy of 3 planes would add ~3.3 MB of VMEM for a ~10% ALU saving;
- the blend runs at the PADDED template width (WWP): padded columns are
  zero in the templates, so their (finite) garbage products vanish in
  the b1/b2 reductions and every vector op stays 8-lane aligned.

Semantics match ops/lk_pallas2.py (same freeze/clamp envelope modulo the
padded-width fit bound, W_BITS fixed point, oscillation damper, spectral
gating, status). Interpreter mode off TPU so tests cover it everywhere.

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


def lroll16(v, t: int, axis: int):
    """LEFT-roll an i16 array by a static t along `axis` via the i32
    bitcast view (Mosaic does not rotate 16-bit data — measured, see
    benchmarks/micro_v3probe.py).

    Non-packed axes roll directly on the word view. The SECOND-MINOR
    axis is packed in (2k, 2k+1) word pairs (low half = even index):
    even t rolls words by t/2; odd t merges two word rolls with 16-bit
    shifts so out16[j] = in16[j + t]."""
    size = v.shape[axis]
    if t % size == 0:
        return v
    packed_axis = v.ndim - 2
    if axis != packed_axis:
        w = pltpu.bitcast(v, jnp.int32)
        return pltpu.bitcast(
            pltpu.roll(w, w.shape[axis] - t, axis), jnp.int16
        )
    half = size // 2

    def uroll(u, s):
        return pltpu.roll(u, (half - s) % half, axis) if s % half else u

    if t % 2 == 0:
        w = pltpu.bitcast(v, jnp.int32)
        return pltpu.bitcast(uroll(w, t // 2), jnp.int16)
    u = pltpu.bitcast(v, jnp.uint32)
    lo = uroll(u, (t - 1) // 2) >> 16  # in16[2k+t]: odd index = high half
    hi = uroll(u, (t + 1) // 2) << 16  # in16[2k+t+1]: even index = low half
    return pltpu.bitcast((lo | hi).astype(jnp.int32), jnp.int16)


def lk_iterate_grid_lanes(
    tmpl: jnp.ndarray,  # (3, win_h, WWP, NP) i16 templates (x32 grid)
    slabs: jnp.ndarray,  # (Ry, Rx, NP) i16 grid-anchored search slabs
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
    lane_block: int = 128,
    roll_dtype: str = "int16",
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Points-in-lanes LK level iteration. NP (the padded point count)
    must be a multiple of lane_block; padded points must carry zero
    templates (their det == 0 spectral-gates them inactive).

    roll_dtype: 'int16' rolls the slab/crop as 16-bit data (half the
    vector passes; requires Mosaic 16-bit rotate support — probed by
    benchmarks/micro_v3probe.py); 'float32' upcasts before the ladders.
    """
    ry, rx, np_ = slabs.shape
    assert np_ % lane_block == 0, (np_, lane_block)
    nb = np_ // lane_block
    b = lane_block
    crop_y = win_h + 1 + 2 * m_iter
    crop_x = win_w + 1 + 2 * m_iter
    cxp = _round_up(crop_x, 8)
    assert crop_y <= ry and cxp <= rx
    a_bits_y = _ladder_bits(ry - crop_y)
    a_bits_x = _ladder_bits(rx - cxp)
    i_bits = _ladder_bits(2 * m_iter)
    wwp = tmpl.shape[2]
    assert tmpl.shape == (3, win_h, wwp, np_), tmpl.shape

    flt_eps = 1.1920929e-07
    ldt = jnp.int16 if roll_dtype == "int16" else jnp.float32
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # phase-A/crop STORAGE dtype: always int16 on hardware (slab values
    # are u8-quantized — exact); interpret mode mirrors the roll dtype
    rdt = jnp.int16 if (ldt == jnp.int16 or not interpret) else ldt

    def kernel(bx_r, by_r, tx_r, ty_r, st_r, tmpl_r, slab_r, out_r, crop_ref):
        ti = pl.program_id(0)

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

        def _lroll(v, t, axis):
            """Left-roll by static t; 16-bit data goes via the bitcast
            word view on the real toolchain (no 16-bit Mosaic rotate)."""
            if interpret or v.dtype.itemsize == 4:
                return pltpu.roll(v, v.shape[axis] - t, axis)
            return lroll16(v, t, axis)

        # phase A streams through int16 SCRATCHES (slab values are
        # u8-quantized pyramid levels — exact in i16), upcasting each
        # chunk to f32 only for the rolls (Mosaic has no 16-bit rotate)
        # and casting straight back: peak VMEM stays ~2 transient chunks
        # above the i16 storage instead of a full-crop f32 double.
        def phase_a(read_chunk, yc_ref):
            # y-ladder (cyclic over Ry), chunked along x
            for off, size in _chunks(rx, 32):
                x = read_chunk(off, size).astype(jnp.float32)
                for t in a_bits_y:
                    x = jnp.where((oym & t) != 0, _lroll(x, t, 0), x)
                yc_ref[:, off : off + size, :] = x[:crop_y].astype(rdt)
            # x-ladder (cyclic over Rx), chunked along y
            for off, size in _chunks(crop_y, 24):
                x = yc_ref[off : off + size].astype(jnp.float32)
                for t in a_bits_x:
                    x = jnp.where((oxm & t) != 0, _lroll(x, t, 1), x)
                crop_ref[off : off + size] = x[:, :cxp, :].astype(rdt)

        if interpret:

            def with_scratch(yc_ref):
                phase_a(
                    lambda off, size: slab_r[:, off : off + size, :], yc_ref
                )

        else:

            def with_scratch(slab_vmem, yc_ref, sem):
                cp = pltpu.make_async_copy(
                    slab_r.at[:, :, pl.ds(ti * b, b)], slab_vmem, sem
                )
                cp.start()
                cp.wait()
                phase_a(
                    lambda off, size: slab_vmem[:, off : off + size, :], yc_ref
                )

        # slab + intermediate scratches are scoped: phase B gets the
        # VMEM back and keeps only the small crop
        if interpret:
            pl.run_scoped(
                with_scratch,
                yc_ref=pltpu.VMEM((crop_y, rx, b), rdt),
            )
        else:
            pl.run_scoped(
                with_scratch,
                slab_vmem=pltpu.VMEM((ry, rx, b), jnp.int16),
                yc_ref=pltpu.VMEM((crop_y, rx, b), rdt),
                sem=pltpu.SemaphoreType.DMA(()),
            )
        crop = crop_ref[...]
        if ldt != jnp.int16:
            crop = crop.astype(ldt)

        def _sample(oy_off, ox_off, ax, ay):
            w = crop
            for t in i_bits:
                w = jnp.where((oy_off & t) != 0, _lroll(w, t, 0), w)
            w = w[: win_h + 1]
            for t in i_bits:
                w = jnp.where((ox_off & t) != 0, _lroll(w, t, 1), w)
            sub = w[:, : wwp + 1, :].astype(jnp.float32)
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
        return x.astype(jnp.float32).reshape(1, nb, b)

    if interpret:
        slab_spec = pl.BlockSpec((ry, rx, b), lambda i: (0, 0, i))
    else:
        # full array pinned off-VMEM; the kernel DMAs its own lane block
        slab_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 1, b), lambda i: (0, i, 0))] * 5
        + [
            pl.BlockSpec((3, win_h, wwp, b), lambda i: (0, 0, 0, i)),
            slab_spec,
        ],
        out_specs=pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, 8, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((crop_y, cxp, b), rdt)],
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
