"""Spatial image derivatives.

scharr_deriv replaces OpenCV's internal calcScharrDeriv used by the
pyramidal LK tracker (smoothing taps (3,10,3), difference taps (-1,0,1),
BORDER_REFLECT_101). OpenCV keeps the un-normalized int16 values; we
return the true derivative (divided by 32) and scale the LK thresholds
accordingly (see ops/lk.py).

sobel_deriv provides the aperture-3 Sobel used by cornerMinEigenVal
(Shi-Tomasi, reference call site SparseOF.py:69).
"""

from __future__ import annotations

import jax.numpy as jnp

from .image import sep_conv2d

_SCHARR_SMOOTH = jnp.array([3.0, 10.0, 3.0]) / 32.0
_DIFF = jnp.array([-1.0, 0.0, 1.0])
_SOBEL_SMOOTH = jnp.array([1.0, 2.0, 1.0])


def scharr_deriv(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(dI/dx, dI/dy) with Scharr 3x3 taps, normalized by 1/32."""
    ix = sep_conv2d(img, _SCHARR_SMOOTH, _DIFF, mode="reflect")
    iy = sep_conv2d(img, _DIFF, _SCHARR_SMOOTH, mode="reflect")
    return ix, iy


def sobel_deriv(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Aperture-3 Sobel derivatives (unnormalized, like cv2.Sobel)."""
    ix = sep_conv2d(img, _SOBEL_SMOOTH, _DIFF, mode="reflect")
    iy = sep_conv2d(img, _DIFF, _SOBEL_SMOOTH, mode="reflect")
    return ix, iy
