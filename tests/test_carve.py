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
