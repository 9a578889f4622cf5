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
