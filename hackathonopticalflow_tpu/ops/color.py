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
    """cv2 BGR2GRAY with Rec.601 weights. uint8 input reproduces OpenCV 5's
    15-bit fixed point ((B*3735 + G*19235 + R*9798 + 16384) >> 15, verified
    bit-exact vs cv2 5.0); float input returns the weighted sum unrounded."""
    b = bgr[..., 0]
    g = bgr[..., 1]
    r = bgr[..., 2]
    if bgr.dtype == jnp.uint8:
        acc = (
            b.astype(jnp.int32) * 3735
            + g.astype(jnp.int32) * 19235
            + r.astype(jnp.int32) * 9798
            + 16384
        )
        return (acc >> 15).astype(jnp.uint8)
    return (
        0.114 * b.astype(jnp.float32)
        + 0.587 * g.astype(jnp.float32)
        + 0.299 * r.astype(jnp.float32)
    )


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
