"""Color-space conversions (cv2.cvtColor parity for the conversions the
reference uses: BGR2GRAY pathfinder_viewer.py:244,280; BGR2HSV :288,
HSV2BGR :139,219; GRAY2BGR DenseOF.py:533).

Arrays are channel-last: (..., H, W, 3) for color, (..., H, W) for gray.
uint8 in/out where the reference works on uint8 frames; float paths keep
full precision for on-device pipelines.
"""

from __future__ import annotations

import jax.numpy as jnp


def bgr2gray(bgr: jnp.ndarray) -> jnp.ndarray:
    """cv2 BGR2GRAY. uint8 input reproduces OpenCV's fixed-point rounding
    (Y = (B*1868 + G*9617 + R*4899 + 8192) >> 14); float input uses the
    same Rec.601 weights exactly."""
    b = bgr[..., 0]
    g = bgr[..., 1]
    r = bgr[..., 2]
    if bgr.dtype == jnp.uint8:
        acc = (
            b.astype(jnp.int32) * 1868
            + g.astype(jnp.int32) * 9617
            + r.astype(jnp.int32) * 4899
            + 8192
        )
        return (acc >> 14).astype(jnp.uint8)
    return 0.114 * b + 0.587 * g + 0.299 * r


def gray2bgr(gray: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([gray, gray, gray], axis=-1)


def bgr2hsv(bgr: jnp.ndarray) -> jnp.ndarray:
    """cv2 BGR2HSV for uint8 range: H in [0,180), S,V in [0,255]."""
    f = bgr.astype(jnp.float32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    s = jnp.where(v == 0, 0.0, diff * 255.0 / jnp.where(v == 0, 1.0, v))
    h = jnp.where(
        v == r,
        30.0 * (g - b) / safe,
        jnp.where(v == g, 60.0 + 30.0 * (b - r) / safe, 120.0 + 30.0 * (r - g) / safe),
    )
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 180.0, h)
    out = jnp.stack([h, s, v], axis=-1)
    if bgr.dtype == jnp.uint8:
        return (out + 0.5).astype(jnp.uint8)
    return out


def hsv2bgr(hsv: jnp.ndarray) -> jnp.ndarray:
    """cv2 HSV2BGR for uint8 range (H in [0,180))."""
    f = hsv.astype(jnp.float32)
    h, s, v = f[..., 0] * 2.0, f[..., 1] / 255.0, f[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    sector = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4, sector == 5],
        [c, x, z, z, x, c],
    )
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4, sector == 5],
        [x, c, c, x, z, z],
    )
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4, sector == 5],
        [z, z, x, c, c, x],
    )
    out = jnp.stack([b + m, g + m, r + m], axis=-1)
    if hsv.dtype == jnp.uint8:
        return (out + 0.5).astype(jnp.uint8)
    return out


def saturating_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cv2.add on uint8: saturating elementwise addition
    (layer compositing, pathfinder_viewer.py:294-312)."""
    s = a.astype(jnp.int32) + b.astype(jnp.int32)
    return jnp.clip(s, 0, 255).astype(jnp.uint8)
