"""ops/carve_pallas.py — batched rect DMA carve vs the XLA slice path.

The kernel must be value-identical to ops/patch.py extract_slabs_rect
(it replaces it inside the rescue carve and the points-lanes template
extraction on TPU); interpret mode runs the same kernel structure the
hardware runs (SURVEY.md §4 strategy)."""

import numpy as np
import jax.numpy as jnp

from hackathonopticalflow_tpu.ops.carve_pallas import gather_rects
from hackathonopticalflow_tpu.ops.patch import extract_slabs_rect


def test_gather_rects_matches_dynamic_slice_2d():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.uniform(0, 255, (120, 180)).round(), jnp.float32)
    tl = jnp.asarray(
        np.stack(
            [rng.randint(0, 180 - 40, 64), rng.randint(0, 120 - 48, 64)], -1
        ).astype(np.int32)
    )
    out = gather_rects(img, tl, ry=42, rx=34, block=32)
    ref = extract_slabs_rect(img, tl, 42, 34)
    assert out.shape == (64, 42, 34)
    assert bool(jnp.all(out == ref))


def test_dma_route_clamp_matches_dynamic_slice():
    """ops/patch.py _dma_rects clamps origins before the DMA kernel; for
    non-negative origins (including past-the-end ones) the clamp must
    reproduce lax.dynamic_slice exactly. NEGATIVE origins wrap
    Python-style inside XLA before clamping and are deliberately NOT
    matched — those windows belong to diverged points whose values are
    oob-masked before any consumer sees them (ops/patch.py _dma_rects
    docstring)."""
    import jax
    from jax import lax

    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.uniform(0, 255, (100, 160)), jnp.float32)
    # origins from 0 to far past the end of the plane
    tl_np = np.stack(
        [rng.randint(0, 700, 64), rng.randint(0, 600, 64)], -1
    ).astype(np.int32)
    ry, rx = 21, 24
    tl_clamped = jnp.stack(
        [
            jnp.clip(jnp.asarray(tl_np[:, 0]), 0, 160 - rx),
            jnp.clip(jnp.asarray(tl_np[:, 1]), 0, 100 - ry),
        ],
        axis=-1,
    )
    out = gather_rects(img, tl_clamped, ry=ry, rx=rx, block=32)
    ref = jax.vmap(
        lambda p: lax.dynamic_slice(img, (p[1], p[0]), (ry, rx))
    )(jnp.asarray(tl_np))
    assert bool(jnp.all(out == ref))


def test_panels_carve_matches_slice_carve():
    """gather_rects_panels at 8-aligned origins must return exactly the
    plane content the slice carve would (the panel indirection and the
    zero fill must be invisible inside the plane)."""
    from hackathonopticalflow_tpu.ops.carve_pallas import (
        build_panels,
        gather_rects_panels,
    )

    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.uniform(0, 255, (200, 300)).round(), jnp.float32)
    ry, rx = 40, 128
    tl_np = np.stack(
        [rng.randint(0, (300 - rx) // 8, 64) * 8,
         rng.randint(0, (200 - ry) // 8, 64) * 8], -1
    ).astype(np.int32)
    hq = (200 // 8) * 8 + ry
    wq = ((300 + 8 * 15) // 128) * 128 + rx
    panels = build_panels(img, height=hq, width=wq)
    out = gather_rects_panels(
        panels, jnp.asarray(tl_np[:, 0]), jnp.asarray(tl_np[:, 1]),
        ry=ry, rx=rx,
    )
    img8 = (img - 128.0).astype(jnp.int8)
    for k in (0, 17, 63):
        x, y = tl_np[k]
        rect = np.zeros((ry, rx), np.int8)
        real = np.asarray(img8[y : y + ry, x : min(x + rx, 300)])
        rect[: real.shape[0], : real.shape[1]] = real
        assert np.array_equal(np.asarray(out[k]), rect), k


def test_rescue_dma_carve_matches_slice_carve():
    """The full static-grid rescue pipeline must produce BIT-IDENTICAL
    endpoints and status with carve_dma on and off: the aligned DMA slab
    plus the phase-A ladder (a_max=7) reconstructs exactly the crop the
    direct carve extracts."""
    import dataclasses

    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.ops.image import sep_conv2d
    from hackathonopticalflow_tpu.ops.lk import pyr_lk

    from hackathonopticalflow_tpu.core.config import LKParams

    rng = np.random.RandomState(7)
    base = rng.uniform(0, 255, (360, 600)).astype(np.float32)
    k = jnp.asarray([0.25, 0.5, 0.25])
    sm = base
    for _ in range(4):
        sm = np.asarray(sep_conv2d(jnp.asarray(sm), k, k))
    a = sm[40:310, 50:530]
    b = sm[43:313, 90:570]
    h, w = a.shape
    pts = measurement_grid(h, w, 30)
    cfgs = [
        LKParams(grid_step=30, use_pallas=True, carve_dma=False),
        LKParams(grid_step=30, use_pallas=True, carve_dma=True),
    ]
    outs = [
        pyr_lk(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts), c)
        for c in cfgs
    ]
    assert np.array_equal(
        np.asarray(outs[0].status), np.asarray(outs[1].status)
    )
    assert np.array_equal(
        np.asarray(outs[0].next_pts), np.asarray(outs[1].next_pts)
    )


def test_points_lanes_dma_carve_matches_slice_carve():
    """Same bit-identity through the arbitrary-point lanes path (the
    tracker's LK)."""
    from hackathonopticalflow_tpu.ops.image import sep_conv2d
    from hackathonopticalflow_tpu.ops.lk import pyr_lk

    from hackathonopticalflow_tpu.core.config import LKParams

    rng = np.random.RandomState(8)
    base = rng.uniform(0, 255, (260, 400)).astype(np.float32)
    k = jnp.asarray([0.25, 0.5, 0.25])
    sm = base
    for _ in range(3):
        sm = np.asarray(sep_conv2d(jnp.asarray(sm), k, k))
    a = sm[10:210, 20:350]
    b = sm[13:213, 26:356]
    pts = np.stack(
        [rng.uniform(10, 320, 96), rng.uniform(10, 190, 96)], -1
    ).astype(np.float32)
    mk = lambda dma: LKParams(
        win_size=(15, 15), use_pallas=True, slab_margin=8,
        points_lanes=True, carve_dma=dma,
    )
    outs = [
        pyr_lk(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts), mk(d))
        for d in (False, True)
    ]
    assert np.array_equal(
        np.asarray(outs[0].status), np.asarray(outs[1].status)
    )
    assert np.array_equal(
        np.asarray(outs[0].next_pts), np.asarray(outs[1].next_pts)
    )


def test_dma_template_route_matches_slice_route():
    """extract_patches / extract_patches_multi through the aligned panel
    DMA route (forced on, interpret mode) must be bit-identical to the
    slice route for in-bounds fractional origins — the shift passes and
    the blend must be exact."""
    from hackathonopticalflow_tpu.ops import patch

    rng = np.random.RandomState(9)
    imgs = jnp.asarray(rng.uniform(-50, 305, (3, 140, 400)), jnp.float32)
    tl = jnp.asarray(
        np.stack(
            [rng.uniform(0, 400 - 20, 256), rng.uniform(0, 140 - 20, 256)],
            -1,
        ).astype(np.float32)
    )
    ref_multi = patch.extract_patches_multi(imgs, tl, 16, 16)
    ref_one = patch.extract_patches(imgs[0], tl, 16, 16)
    old = patch.DMA_TMPL
    patch.DMA_TMPL = True
    try:
        out_multi = patch.extract_patches_multi(imgs, tl, 16, 16)
        out_one = patch.extract_patches(imgs[0], tl, 16, 16)
    finally:
        patch.DMA_TMPL = old
    assert bool(jnp.all(out_multi == ref_multi))
    assert bool(jnp.all(out_one == ref_one))


def test_gather_rects_matches_dynamic_slice_3d():
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.uniform(-9, 9, (3, 90, 140)), jnp.float32)
    tl_np = np.stack(
        [rng.randint(0, 140 - 20, 32), rng.randint(0, 90 - 20, 32)], -1
    ).astype(np.int32)
    out = gather_rects(img, jnp.asarray(tl_np), ry=17, rx=16, block=32)
    ref = jnp.stack(
        [img[:, t[1] : t[1] + 17, t[0] : t[0] + 16] for t in tl_np]
    )
    assert out.shape == (32, 3, 17, 16)
    assert bool(jnp.all(out == ref))
