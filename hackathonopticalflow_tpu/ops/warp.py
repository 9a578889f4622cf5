"""Dense bilinear sampling / warping.

Used by the Farneback dense-flow iteration (sampling the second image's
polynomial-expansion coefficients at positions displaced by the current
flow — OpenCV FarnebackUpdateMatrices' inner bilinear fetch) and available
as a general remap primitive.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample img (..., H, W) at float coords (broadcastable xs, ys).

    Out-of-range coordinates are clamped to the border pixel.
    """
    h, w = img.shape[-2:]
    x = jnp.clip(xs, 0.0, w - 1.0)
    y = jnp.clip(ys, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(w - 2, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(h - 2, 0))
    ax = (x - x0).astype(img.dtype)
    ay = (y - y0).astype(img.dtype)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    def gather(yy, xx):
        return img[..., yy, xx]

    v00 = gather(y0, x0)
    v10 = gather(y0, x1)
    v01 = gather(y1, x0)
    v11 = gather(y1, x1)
    return (
        v00 * (1 - ax) * (1 - ay)
        + v10 * ax * (1 - ay)
        + v01 * (1 - ax) * ay
        + v11 * ax * ay
    )


def warp_image(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img by flow: out(p) = img(p + flow(p)).

    img: (H, W); flow: (H, W, 2) with [dx, dy] channels.
    """
    h, w = img.shape[-2:]
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype), indexing="ij"
    )
    return bilinear_sample(img, xs + flow[..., 0], ys + flow[..., 1])
