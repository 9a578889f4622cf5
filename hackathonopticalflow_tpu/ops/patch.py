"""Bilinear patch (window) extraction around fractional point positions.

This is the memory-access core of the TPU-native pyramidal LK tracker: each
measurement point needs a win_size window of the image sampled at a
fractional position (OpenCV samples it with fixed-point bilinear weights).

TPU-first design: all pixels of one window share the SAME fractional offset,
so instead of 4*K*K scattered gathers per point we take ONE integer-aligned
(K+1, K+1) dynamic slice per point and blend its four integer shifts with
shared bilinear weights — a VPU-friendly formulation that lowers to a
coalesced gather under vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

#: Route batched rect extraction through the UNALIGNED Pallas DMA carve
#: on TPU. Permanently OFF on this relay: every unaligned make_async_copy
#: form crashes the remote Mosaic helper (benchmarks/micro_carve2-4.py,
#: 2026-08-21). The ALIGNED panel route below (_dma_patches_raw) is the
#: one that works.
DMA_CARVE = False

#: Route the integer-origin window crops behind extract_patches /
#: extract_patches_multi through the ALIGNED panel DMA carve
#: (ops/carve_pallas.py) + a <=7 px masked-add shift. 'auto' = on TPU
#: from DMA_TMPL_MIN_N points; True/False force (tests force True in
#: interpret mode to pin bit-identity). Threshold measured on the 48-
#: frame 1080p tracker scan (benchmarks/probe_tracker_minn.py): cap 256
#: wins 1.05x with both routes on, cap 64 LOSES 0.63x (the per-level
#: panel restage dominates tiny point sets).
DMA_TMPL = "auto"
DMA_TMPL_MIN_N = 256


def _dma_patches_raw(
    imgs: jnp.ndarray, ipi: jnp.ndarray, size_h: int, size_w: int
):
    """Integer-origin crop batch via the aligned panel DMA: returns the
    (N, C, size_h, size_w) raw windows extract_patches_multi's
    vmap(dynamic_slice) would produce, or None when the route doesn't
    apply. Origins clamp like the slice path for non-negative overflow;
    negative origins differ (XLA wraps them Python-style) but belong to
    oob points whose windows are never consumed (ops/lk.py masks).

    The carve lands on (8,128)-aligned bases (the relay's provable-DMA
    envelope; ops/carve_pallas.py) and the <=7 px residual offsets are
    resolved with 8+8 masked static-slice adds — the select_windows
    trick — which is exact (one branch live per point)."""
    route = DMA_TMPL
    if route == "auto":
        route = (
            jax.default_backend() == "tpu"
            and ipi.shape[0] >= DMA_TMPL_MIN_N
        )
    if not route or size_w + 7 > 128:
        return None
    from .carve_pallas import build_panels_multi, gather_rects_panels_multi

    squeeze = imgs.ndim == 2
    if squeeze:
        imgs = imgs[None]
    c, h, w = imgs.shape
    xi = jnp.clip(ipi[:, 0], 0, w - size_w)
    yi = jnp.clip(ipi[:, 1], 0, h - size_h)
    x8 = xi // 8 * 8
    y8 = yi // 8 * 8
    ry = -(-(size_h + 7) // 8) * 8
    rx = 128
    hq = (h - size_h) // 8 * 8 + ry
    wq = (w - size_w) // 8 * 8 // 128 * 128 + rx
    panels = build_panels_multi(imgs, height=hq, width=wq)
    raw = gather_rects_panels_multi(panels, x8, y8, ry=ry, rx=rx)
    raw = raw[..., : size_w + 8]  # pre-crop before the shift passes
    dy = (yi - y8)[:, None, None, None]
    dx = (xi - x8)[:, None, None, None]
    rows = jnp.zeros(
        (raw.shape[0], c, size_h, size_w + 8), raw.dtype
    )
    for k in range(8):
        rows = rows + jnp.where(dy == k, raw[:, :, k : k + size_h, :], 0)
    out = jnp.zeros((raw.shape[0], c, size_h, size_w), raw.dtype)
    for k in range(8):
        out = out + jnp.where(dx == k, rows[..., k : k + size_w], 0)
    return out[:, 0] if squeeze else out


def _dma_rects(img: jnp.ndarray, tli: jnp.ndarray, size_h: int, size_w: int):
    """Route a batched rect extraction through the Pallas DMA kernel
    (ops/carve_pallas.py) when it beats the XLA gather: on TPU, the
    vmap(dynamic_slice) lowering costs ~1.2 us PER SLICE regardless of
    size (CLAUDE.md relay cost model) while the DMA engine issues the
    same copies in ~0.1 us each (benchmarks/micro_carve.py, 2026-08-21).

    Origins are clamped to keep every DMA in bounds. For in-bounds
    requests (all live LK points — the frame pad guarantees it, see
    ops/lk.py _frame_pad) results are bit-identical to the slice path.
    Out-of-range origins (diverged points, sampled before their active
    mask kills them) clamp slightly differently than dynamic_slice's
    wrap-then-clamp, but those window values are never consumed: the
    points are oob-masked and their estimates frozen (tests/test_carve.py
    pins the in-bounds equivalence; tests/test_lk.py pins end-to-end
    parity). Returns None when the DMA route doesn't apply (not on
    TPU)."""
    if not DMA_CARVE or jax.default_backend() != "tpu":
        return None
    from .carve_pallas import gather_rects

    h, w = img.shape[-2:]
    c = img.shape[0] if img.ndim == 3 else 1
    n = tli.shape[0]
    tl = jnp.stack(
        [
            jnp.clip(tli[:, 0], 0, w - size_w),
            jnp.clip(tli[:, 1], 0, h - size_h),
        ],
        axis=-1,
    )
    pad_n = (-n) % 32
    if pad_n:
        tl = jnp.pad(tl, ((0, pad_n), (0, 0)))
    # largest block that divides N and keeps the kernel's double-buffered
    # out block a modest VMEM slice
    block = 32
    for b in (128, 64):
        if (n + pad_n) % b == 0 and (
            b * c * size_h * size_w * img.dtype.itemsize <= 4 * 2**20
        ):
            block = b
            break
    out = gather_rects(img, tl, ry=size_h, rx=size_w, block=block)
    return out[:n] if pad_n else out


def extract_patches(
    img: jnp.ndarray, top_left: jnp.ndarray, size_h: int, size_w: int
) -> jnp.ndarray:
    """Sample (N, size_h, size_w) windows from img at fractional top-left
    positions.

    img:       (H, W) float32 — already padded by the caller so that every
               requested slice (after floor) lies inside; lax.dynamic_slice
               clamps as a safety net.
    top_left:  (N, 2) float32 [x, y] window origins (may be fractional).
    """
    ip = jnp.floor(top_left)
    frac = (top_left - ip).astype(img.dtype)
    ipi = ip.astype(jnp.int32)

    raw = _dma_patches_raw(img, ipi, size_h + 1, size_w + 1)
    if raw is None:

        def slice_one(p):
            return lax.dynamic_slice(img, (p[1], p[0]), (size_h + 1, size_w + 1))

        raw = jax.vmap(slice_one)(ipi)  # (N, size_h+1, size_w+1)
    return blend_bilinear(raw, frac, size_h, size_w)


def blend_bilinear(
    raw: jnp.ndarray, frac: jnp.ndarray, size_h: int, size_w: int
) -> jnp.ndarray:
    """Blend the four integer shifts of (N, size_h+1, size_w+1) patches
    with per-patch shared bilinear weights -> (N, size_h, size_w)."""
    ax = frac[:, 0][:, None, None]
    ay = frac[:, 1][:, None, None]
    w00 = (1 - ax) * (1 - ay)
    w10 = ax * (1 - ay)
    w01 = (1 - ax) * ay
    w11 = ax * ay
    return (
        raw[:, :size_h, :size_w] * w00
        + raw[:, :size_h, 1:] * w10
        + raw[:, 1:, :size_w] * w01
        + raw[:, 1:, 1:] * w11
    )


def extract_patches_multi(
    imgs: jnp.ndarray, top_left: jnp.ndarray, size_h: int, size_w: int
) -> jnp.ndarray:
    """Multi-channel variant: sample (N, C, size_h, size_w) windows from a
    (C, H, W) stack at shared fractional positions — ONE dynamic slice per
    point instead of C (slices are the cost unit on TPU)."""
    c = imgs.shape[0]
    ip = jnp.floor(top_left)
    frac = (top_left - ip).astype(imgs.dtype)
    ipi = ip.astype(jnp.int32)

    raw = _dma_patches_raw(imgs, ipi, size_h + 1, size_w + 1)
    if raw is None:

        def slice_one(p):
            return lax.dynamic_slice(
                imgs, (0, p[1], p[0]), (c, size_h + 1, size_w + 1)
            )

        raw = jax.vmap(slice_one)(ipi)  # (N, C, size_h+1, size_w+1)
    ax = frac[:, 0][:, None, None, None]
    ay = frac[:, 1][:, None, None, None]
    w00 = (1 - ax) * (1 - ay)
    w10 = ax * (1 - ay)
    w01 = (1 - ax) * ay
    w11 = ax * ay
    return (
        raw[:, :, :size_h, :size_w] * w00
        + raw[:, :, :size_h, 1:] * w10
        + raw[:, :, 1:, :size_w] * w01
        + raw[:, :, 1:, 1:] * w11
    )


def extract_slabs(img: jnp.ndarray, top_left_int: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, size, size) integer-aligned slabs (one big dynamic slice per
    point — slice-priced, cheap). top_left_int: (N, 2) int32 [x, y]."""
    return extract_slabs_rect(img, top_left_int, size, size)


def extract_slabs_rect(
    img: jnp.ndarray, top_left_int: jnp.ndarray, size_h: int, size_w: int
) -> jnp.ndarray:
    """extract_slabs with a rectangular (size_h, size_w) window — used by
    the static-grid path's large-flow rescue pass (ops/lk.py), whose
    slab IS the iteration crop (win + 1 + 2*iter_margin per axis)."""
    out = _dma_rects(img, top_left_int, size_h, size_w)
    if out is not None:
        return out

    def slice_one(p):
        return lax.dynamic_slice(img, (p[1], p[0]), (size_h, size_w))

    return jax.vmap(slice_one)(top_left_int)


def select_windows(
    slabs: jnp.ndarray, offsets: jnp.ndarray, win_h: int, win_w: int, margin2: int
) -> jnp.ndarray:
    """Extract (win_h+1, win_w+1) windows from per-point slabs at integer
    offsets in [0, margin2] per axis — via masked STATIC slices (no
    gathers; the TPU fast path for LK's iteration sampling).

    slabs:   (N, S, S) with S >= max(win)+margin2+1
    offsets: (N, 2) int32 [ox, oy], clipped to [0, margin2]
    """
    n, s, _ = slabs.shape
    ox = jnp.clip(offsets[:, 0], 0, margin2)[:, None, None]
    oy = jnp.clip(offsets[:, 1], 0, margin2)[:, None, None]
    rows = jnp.zeros((n, win_h + 1, s), slabs.dtype)
    for k in range(margin2 + 1):
        rows = rows + jnp.where(oy == k, slabs[:, k : k + win_h + 1, :], 0.0)
    out = jnp.zeros((n, win_h + 1, win_w + 1), slabs.dtype)
    for k in range(margin2 + 1):
        out = out + jnp.where(ox == k, rows[:, :, k : k + win_w + 1], 0.0)
    return out
