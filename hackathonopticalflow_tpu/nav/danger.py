"""Danger-point scoring.

The reference renders filtered points as red "lamps" whose brightness is
min(50 + 2*m, 255) (pathfinder_viewer.py:210-217, the math inside
`draw_sparse_lamps` minus the rendering). Here the scoring is an explicit
device-side op; rasterization lives in viz/layers.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def danger_values(modulus: jnp.ndarray) -> jnp.ndarray:
    """Brightness of each danger lamp: min(50 + 2*m, 255)."""
    return jnp.minimum(50.0 + modulus * 2.0, 255.0)


def danger_image(
    pts: jnp.ndarray,
    values: jnp.ndarray,
    good: jnp.ndarray,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Scatter danger values into an (H, W) float map (device-side layer;
    the host viz draws r=6 circles on top of it as the reference does)."""
    x = jnp.clip(pts[:, 0], 0, width - 1)
    y = jnp.clip(pts[:, 1], 0, height - 1)
    img = jnp.zeros((height, width), jnp.float32)
    return img.at[y, x].max(jnp.where(good, values, 0.0))
