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

    def slice_one(p):
        return lax.dynamic_slice(img, (p[1], p[0]), (size_h + 1, size_w + 1))

    raw = jax.vmap(slice_one)(ipi)  # (N, size_h+1, size_w+1)
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
