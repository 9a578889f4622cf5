"""Static window extraction for the fixed measurement grid.

The pathfinder's measurement points are a compile-time-constant grid
(core/grid.py measurement_grid — reference pathfinder_viewer.py:255-267),
so at every pyramid level the template windows AND the search slabs live
at STATIC positions: extraction needs no dynamic slices and no gathers at
all — the TPU-hostile part of sparse LK (2304 serialized dynamic slices
per level, ~2-4 ms each on v5e) becomes a handful of static strided
reshapes that XLA fuses into cheap relayouts.

Mechanics (per axis): level-L positions are (x0 + step*k) / 2^L - off.
Group k by k mod M where M is the smallest period making step*M a
multiple of 2^L: within a class, integer window origins advance by the
constant stride S = step*M/2^L and the fractional offset is one SHARED
scalar. Windows of width W at stride S are carved by reshaping the axis
into S-cells and concatenating ceil(W/S)+1 cell shifts — pure static
slicing. Classes are re-interleaved with a reshape.

Used by ops/lk.py's static-grid path (LKParams.grid_step) feeding the
ops/lk_pallas2.py kernel; parity vs the dynamic extract_patches_multi
path is asserted in tests/test_lk_static_grid.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def axis_classes(coords: np.ndarray, level: int, off: float):
    """Split static axis coordinates into stride-regular classes.

    coords: (K,) int numpy grid coordinates (full-resolution).
    Returns a list of dicts per class c (c = k mod M):
      {idx: class member ks, base: (Kc,) int window origins,
       frac: shared fractional offset, stride: S}
    """
    coords = np.asarray(coords, np.float64)
    k = coords.shape[0]
    step = float(coords[1] - coords[0]) if k > 1 else 1.0
    assert k < 2 or np.allclose(np.diff(coords), step), "grid must be uniform"
    m = 1
    while (step * m) % (1 << level) != 0:
        m *= 2
        assert m <= (1 << level), "stride never becomes integral"
    pos = coords / (1 << level) - off
    out = []
    for c in range(min(m, k)):
        idx = np.arange(c, k, m)
        p = pos[idx]
        base = np.floor(p).astype(np.int64)
        frac = float(p[0] - base[0])
        s = int(round(step * m / (1 << level))) if len(idx) > 1 else 1
        if len(idx) > 1:
            assert np.all(np.diff(base) == s), (base, s)
            assert np.allclose(p - base, frac), "frac must be shared in class"
        out.append({"idx": idx, "base": base, "frac": frac, "stride": s})
    return out


def _carve(arr: jnp.ndarray, start: int, stride: int, count: int, width: int):
    """(..., X) -> (..., count, width): windows [start + stride*i,
    start + stride*i + width) via the cell-reshape trick (static only)."""
    if count == 1:
        return arr[..., start : start + width][..., None, :, ]
    ncat = -(-width // stride)  # cells a window can span
    span = stride * (count - 1 + ncat)
    # the last window ends at stride*(count-1)+width <= span; the reshape
    # may span a little past it — zero-pad the tail (those cells never
    # land inside a window)
    last_needed = start + stride * (count - 1) + width
    assert start >= 0 and last_needed <= arr.shape[-1], (
        f"carve out of bounds: start={start} need={last_needed} axis={arr.shape[-1]}"
    )
    if start + span > arr.shape[-1]:
        arr = jnp.pad(
            arr,
            [(0, 0)] * (arr.ndim - 1) + [(0, start + span - arr.shape[-1])],
        )
    cells = arr[..., start : start + span].reshape(
        arr.shape[:-1] + (count - 1 + ncat, stride)
    )
    parts = [cells[..., j : j + count, :] for j in range(ncat)]
    return jnp.concatenate(parts, axis=-1)[..., :width]


def axis_windows(
    arr: jnp.ndarray,
    coords: np.ndarray,
    level: int,
    off: float,
    width: int,
    pad: int,
    *,
    blend: bool = False,
):
    """Extract static windows along the LAST axis of arr.

    arr: (..., X) a pyramid plane padded by `pad` on this axis.
    coords: (K,) full-resolution grid coordinates along the axis.
    off: subtracted after level scaling (e.g. half-window [+ margin]).
    width: window length. blend: linearly blend the shared fractional
    offset (window of `width` from `width`+1 raw samples).

    Returns (windows (..., K, width), bases (K,) int64 numpy) where
    bases are the UNPADDED integer window origins.
    """
    classes = axis_classes(coords, level, off)
    k = sum(len(c["idx"]) for c in classes)
    raw_w = width + 1 if blend else width
    outs, bases = [], np.zeros(k, np.int64)
    for c in classes:
        start = int(c["base"][0]) + pad
        w = _carve(arr, start, c["stride"], len(c["idx"]), raw_w)
        if blend:
            f = jnp.asarray(c["frac"], arr.dtype)
            w = w[..., :width] * (1 - f) + w[..., 1:] * f
        outs.append(w)
        bases[c["idx"]] = c["base"]
    if len(outs) == 1:
        return outs[0], bases
    # interleave classes back into grid order along the K axis
    kmax = max(o.shape[-2] for o in outs)
    padded = [
        jnp.pad(o, [(0, 0)] * (o.ndim - 2) + [(0, kmax - o.shape[-2]), (0, 0)])
        for o in outs
    ]
    inter = jnp.stack(padded, axis=-2)  # (..., kmax, M, width)
    inter = inter.reshape(inter.shape[:-3] + (kmax * len(outs), width))
    return inter[..., :k, :], bases


def _carve_axis(arr: jnp.ndarray, axis: int, start: int, stride: int, count: int, width: int):
    """_carve generalized to any axis WITHOUT moving it: (..., X, ...) ->
    (..., count, width, ...) in place — keeps downstream layouts natural
    (the kernel-blocked extraction's no-transpose guarantee)."""
    axis = axis % arr.ndim
    if count == 1:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(start, start + width)
        out = arr[tuple(sl)]
        return jnp.expand_dims(out, axis)
    ncat = -(-width // stride)
    span = stride * (count - 1 + ncat)
    last_needed = start + stride * (count - 1) + width
    assert start >= 0 and last_needed <= arr.shape[axis], (
        f"carve axis {axis} oob: start={start} need={last_needed} size={arr.shape[axis]}"
    )
    if start + span > arr.shape[axis]:
        padw = [(0, 0)] * arr.ndim
        padw[axis] = (0, start + span - arr.shape[axis])
        arr = jnp.pad(arr, padw)
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(start, start + span)
    cells = arr[tuple(sl)].reshape(
        arr.shape[:axis] + (count - 1 + ncat, stride) + arr.shape[axis + 1 :]
    )
    csl = [slice(None)] * cells.ndim
    parts = []
    for j in range(ncat):
        csl[axis] = slice(j, j + count)
        parts.append(cells[tuple(csl)])
    out = jnp.concatenate(parts, axis=axis + 1)
    osl = [slice(None)] * out.ndim
    osl[axis + 1] = slice(0, width)
    return out[tuple(osl)]


def axis_windows_inplace(
    arr: jnp.ndarray,
    axis: int,
    coords: np.ndarray,
    level: int,
    off: float,
    width: int,
    pad: int,
    *,
    blend: bool = False,
):
    """axis_windows without moving the axis: (..., X, ...) ->
    (..., K, width, ...) with K/width replacing X in place."""
    axis = axis % arr.ndim
    classes = axis_classes(coords, level, off)
    k = sum(len(c["idx"]) for c in classes)
    raw_w = width + 1 if blend else width
    outs, bases = [], np.zeros(k, np.int64)
    for c in classes:
        start = int(c["base"][0]) + pad
        w = _carve_axis(arr, axis, start, c["stride"], len(c["idx"]), raw_w)
        if blend:
            f = jnp.asarray(c["frac"], arr.dtype)
            sl0 = [slice(None)] * w.ndim
            sl1 = [slice(None)] * w.ndim
            sl0[axis + 1] = slice(0, width)
            sl1[axis + 1] = slice(1, width + 1)
            w = w[tuple(sl0)] * (1 - f) + w[tuple(sl1)] * f
        outs.append(w)
        bases[c["idx"]] = c["base"]
    if len(outs) == 1:
        return outs[0], bases
    kmax = max(o.shape[axis] for o in outs)
    padded = []
    for o in outs:
        padw = [(0, 0)] * o.ndim
        padw[axis] = (0, kmax - o.shape[axis])
        padded.append(jnp.pad(o, padw))
    inter = jnp.stack(padded, axis=axis + 1)  # (..., kmax, M, width, ...)
    inter = inter.reshape(
        inter.shape[:axis] + (kmax * len(outs),) + inter.shape[axis + 2 :]
    )
    sl = [slice(None)] * inter.ndim
    sl[axis] = slice(0, k)
    return inter[tuple(sl)], bases


def _axis_bases(coords: np.ndarray, level: int, off: float):
    """Per-coordinate integer window origins + fractional offsets."""
    pos = np.asarray(coords, np.float64) / (1 << level) - off
    base = np.floor(pos).astype(np.int64)
    return base, (pos - base).astype(np.float32)


def extract_grid_templates_blocked(
    planes: jnp.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    level: int,
    win_w: int,
    win_h: int,
    pad: int,
    *,
    lane: int = 128,
) -> jnp.ndarray:
    """Templates in the Pallas-kernel-native layout (C, Ky, win_h,
    Kx*lane) i16 (values scaled by 32 — OpenCV's W_BITS window grid, so
    the i16 stream is EXACT and half the f32 bytes).

    Built as per-window static slices stacked/concatenated along large
    minor dims (a strided cell-reshape keeps 15..45-lane minor dims that
    run at ~12% HBM efficiency on TPU; this formulation stays >= 2048
    lanes everywhere)."""
    by, fy = _axis_bases(ys, level, (win_h - 1) * 0.5)
    bx, fx = _axis_bases(xs, level, (win_w - 1) * 0.5)
    c, hp, wp = planes.shape

    rows47 = jnp.stack(
        [planes[:, int(b) + pad : int(b) + pad + win_h + 1, :] for b in by],
        axis=1,
    )  # (C, Ky, win_h+1, Wp)
    fyv = jnp.asarray(fy).reshape(1, -1, 1, 1)
    rows = rows47[:, :, :win_h, :] * (1 - fyv) + rows47[:, :, 1:, :] * fyv

    pieces = []
    for k, b in enumerate(bx):
        raw = rows[..., int(b) + pad : int(b) + pad + win_w + 1]
        f = float(fx[k])
        wnd = raw[..., :win_w] * (1 - f) + raw[..., 1:] * f
        # x32 fixed-point (exact: _fix quantizes to the 1/32 grid and
        # window values stay within i16) + lane pad to `lane`
        q = jnp.floor(wnd * 32.0 + 0.5).astype(jnp.int16)
        pieces.append(jnp.pad(q, [(0, 0)] * 3 + [(0, lane - win_w)]))
    # stack kx on a NEW axis then merge with ky: point-major (C, N, win_h,
    # lane) in the grid's x-major order, still with zero transposes
    out = jnp.stack(pieces, axis=1)  # (C, Kx, Ky, win_h, lane)
    c, kx, ky_, wh, _ = out.shape
    return out.reshape(c, kx * ky_, wh, lane)


def extract_grid_slabs_blocked(
    plane: jnp.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    level: int,
    win_w: int,
    win_h: int,
    margin_x: int,
    margin_y: int,
    pad: int,
    *,
    dtype=jnp.int16,
):
    """Search slabs in the kernel-native layout (Ky, Ry, Kx*Rx) dtype
    (Rx = win_w+1+2*margin_x must be 128 for legal blocking; pyramid
    levels are u8-quantized so an integer stream is exact at half the
    f32 bytes — int16 because Mosaic lacks a u8->f32 cast). Same
    large-minor-dim construction as the templates."""
    ry = win_h + 1 + 2 * margin_y
    rx = win_w + 1 + 2 * margin_x
    by, _ = _axis_bases(ys, level, (win_h - 1) * 0.5 + margin_y)
    bx, _ = _axis_bases(xs, level, (win_w - 1) * 0.5 + margin_x)
    p = plane.astype(dtype)
    rows = jnp.stack(
        [p[int(b) + pad : int(b) + pad + ry, :] for b in by], axis=0
    )  # (Ky, Ry, Wp)
    cols = jnp.stack(
        [rows[..., int(b) + pad : int(b) + pad + rx] for b in bx], axis=0
    )  # (Kx, Ky, Ry, Rx) — point-major after a free reshape
    kx_, ky_, ry_, rx_ = cols.shape
    return cols.reshape(kx_ * ky_, ry_, rx_), bx, by


def extract_grid_templates_lanes(
    planes: jnp.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    level: int,
    win_w: int,
    win_h: int,
    pad: int,
    *,
    np_pad: int | None = None,
) -> jnp.ndarray:
    """Templates in the points-in-lanes layout for ops/lk_pallas3.py:
    (C, win_h, WWP, NP) int16 (x32 window grid), WWP = win_w rounded up
    to 8 (padded columns zero so they vanish in the kernel's windowed
    reductions), NP = N padded to np_pad with zero templates (padded
    points spectral-gate inactive: det == 0).

    Built from the blocked extraction + one XLA transpose (the blocked
    form is transpose-free; the (N -> lane-minor) move is one fused
    relayout of ~N*win_h*WWP i16, ~30 MB at 1080p level 0)."""
    wwp = -(-win_w // 8) * 8
    # NOTE (round 4, measured): padding columns straight to WWP=48 here
    # (lane=wwp) to save the 128-lane pad's extra HBM bytes made the
    # extraction SLOWER (L0 0.63 -> 0.73 ms) — the 48-lane minor dim
    # runs at a fraction of HBM efficiency, exactly the blocked
    # builder's >=2048-lane design rule. Keep 128 and slice.
    t = extract_grid_templates_blocked(
        planes, xs, ys, level, win_w, win_h, pad
    )  # (C, N, win_h, 128) i16, cols >= win_w zero
    t = t[..., :wwp]
    out = jnp.transpose(t, (0, 2, 3, 1))  # (C, win_h, WWP, N)
    n = out.shape[-1]
    if np_pad is not None and np_pad != n:
        out = jnp.pad(out, [(0, 0)] * 3 + [(0, np_pad - n)])
    return out


def extract_grid_slabs_lanes(
    plane: jnp.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    level: int,
    win_w: int,
    win_h: int,
    margin_x: int,
    margin_y: int,
    pad: int,
    *,
    np_pad: int,
    lane: int = 128,
):
    """Search slabs in the points-in-lanes BLOCKED layout
    (Nb, Ry, Rx, 128) int8 for ops/lk_pallas3.py (pixel values biased by
    -128 — u8-quantized pyramid levels are exact in int8 at a quarter of
    the f32 bytes), plus the (Kx,), (Ky,) unpadded integer bases.
    One XLA transpose over the blocked extraction (~37 MB i8 at 1080p
    level 0 — ~0.1 ms at HBM stream rate)."""
    slabs, bx, by = extract_grid_slabs_blocked(
        plane, xs, ys, level, win_w, win_h, margin_x, margin_y, pad,
        dtype=jnp.int16,
    )  # (N, Ry, Rx)
    from .lk_pallas3 import SLAB_BIAS

    s8 = (slabs - SLAB_BIAS).astype(jnp.int8)
    n, ry, rx = s8.shape
    assert np_pad % lane == 0
    if np_pad != n:
        s8 = jnp.pad(s8, [(0, np_pad - n), (0, 0), (0, 0)])
    out = jnp.transpose(
        s8.reshape(np_pad // lane, lane, ry, rx), (0, 2, 3, 1)
    )  # (Nb, Ry, Rx, lane)
    return out, bx, by


def extract_grid_templates(
    planes: jnp.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    level: int,
    win_w: int,
    win_h: int,
    pad: int,
) -> jnp.ndarray:
    """Blended template windows for the static grid.

    planes: (C, Hp, Wp) padded level planes (image + derivatives).
    Returns (N, C, win_h, win_w) in the reference's x-major point order
    (N = len(xs) * len(ys)); numerically identical to
    extract_patches_multi at the same (fractional) positions.
    """
    half_w = (win_w - 1) * 0.5
    half_h = (win_h - 1) * 0.5
    rows, _ = axis_windows(
        jnp.swapaxes(planes, -1, -2), ys, level, half_h, win_h, pad, blend=True
    )  # (C, Wp, Ky, win_h)
    cols, _ = axis_windows(
        jnp.moveaxis(rows, 1, -1), xs, level, half_w, win_w, pad, blend=True
    )  # (C, Ky, win_h, Kx, win_w)
    # -> (Kx, Ky, C, win_h, win_w) -> x-major (N, C, win_h, win_w)
    out = jnp.moveaxis(cols, 3, 0)
    out = jnp.moveaxis(out, 2, 1)
    kx, ky, c = out.shape[:3]
    return out.reshape(kx * ky, c, win_h, win_w)


def extract_grid_slabs(
    plane: jnp.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    level: int,
    win_w: int,
    win_h: int,
    margin_x: int,
    margin_y: int,
    pad: int,
    *,
    dtype=jnp.bfloat16,
):
    """Integer-anchored search slabs around each grid point's template
    position: rows [ty - margin_y, ty + win_h + 1 + margin_y), similarly
    for columns — static because the anchor is the grid, not the flow.

    plane: (Hp, Wp) padded next-image level. Returns
    (slabs (N, Ry, Rx) dtype, base_x (Kx,), base_y (Ky,)) with
    Ry = win_h + 1 + 2*margin_y, Rx = win_w + 1 + 2*margin_x and bases in
    UNPADDED level coordinates, x-major point order.
    """
    ry = win_h + 1 + 2 * margin_y
    rx = win_w + 1 + 2 * margin_x
    half_w = (win_w - 1) * 0.5
    half_h = (win_h - 1) * 0.5
    p = plane.astype(dtype)
    rows, by = axis_windows(
        jnp.swapaxes(p, -1, -2), ys, level, half_h + margin_y, ry, pad
    )  # (Wp, Ky, Ry)
    cols, bx = axis_windows(
        jnp.moveaxis(rows, 0, -1), xs, level, half_w + margin_x, rx, pad
    )  # (Ky, Ry, Kx, Rx)
    out = jnp.moveaxis(cols, 2, 0)  # (Kx, Ky, Ry, Rx)
    kx, ky = out.shape[:2]
    return out.reshape(kx * ky, ry, rx), bx, by
