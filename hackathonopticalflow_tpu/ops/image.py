"""Dense image primitives: separable convolution, Gaussian blur, box sums,
OpenCV-compatible resizes, thresholding.

These replace the OpenCV C++ kernels the reference calls through cv2
(GaussianBlur: Operations.py:55-56; resize: Operations.py:46,239;
threshold: Operations.py:58-60, DenseOF.py:396) with XLA-native ops.
All functions take (..., H, W) float32 arrays and are jit-friendly
(static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Parity-critical convolutions run in full f32 on the MXU.
_PRECISION = lax.Precision.HIGHEST


def _to_nchw(img: jnp.ndarray) -> tuple[jnp.ndarray, tuple[int, ...]]:
    """Reshape (..., H, W) -> (N, 1, H, W) remembering the batch shape."""
    batch_shape = img.shape[:-2]
    h, w = img.shape[-2:]
    return img.reshape((-1, 1, h, w)), batch_shape


def conv2d_single(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """VALID 2-D correlation of (..., H, W) with (kh, kw)."""
    x, batch_shape = _to_nchw(img)
    k = kernel[None, None, :, :].astype(img.dtype)
    y = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID", precision=_PRECISION
    )
    return y.reshape(batch_shape + y.shape[-2:])


def _band_matrix(n_in: int, k: jnp.ndarray) -> jnp.ndarray:
    """(n_in, n_out) banded matrix B with B[i, j] = k[i - j]: a VALID
    correlation along an axis becomes x @ B — the TPU-native formulation
    (1-channel convolutions do not map onto the MXU; banded matmuls do)."""
    kk = len(k)
    n_out = n_in - kk + 1
    i = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 1)
    d = i - j
    band = jnp.zeros((n_in, n_out), k.dtype)
    for t in range(kk):
        band = band + jnp.where(d == t, k[t], 0)
    return band


def _use_mxu() -> bool:
    return jax.default_backend() == "tpu"


def sep_conv2d(
    img: jnp.ndarray,
    ky: jnp.ndarray,
    kx: jnp.ndarray,
    *,
    mode: str = "reflect",
) -> jnp.ndarray:
    """Separable 2-D correlation with border handling.

    mode: any jnp.pad mode — 'reflect' == cv2 BORDER_REFLECT_101 (default for
    GaussianBlur / Scharr), 'edge' == BORDER_REPLICATE, 'constant' == zeros.
    Output has the same spatial shape as the input.

    On TPU the two passes run as banded-matrix matmuls on the MXU
    (precision HIGHEST keeps f32-grade accuracy for the parity budget);
    on CPU the direct convolution path is cheaper.
    """
    ky = jnp.asarray(ky, img.dtype)
    kx = jnp.asarray(kx, img.dtype)
    ry, rx = len(ky) // 2, len(kx) // 2
    pad = [(0, 0)] * (img.ndim - 2) + [(ry, ry), (rx, rx)]
    x = jnp.pad(img, pad, mode=mode)
    if _use_mxu():
        # narrow kernels: shifted multiply-adds on the VPU (a k-tap conv
        # as a k x n_out banded MATMUL pays n_out/k times the FLOPs — a
        # ~300x waste for Scharr/pyrDown taps at 1080p)
        if 1 < len(kx) <= 9:
            w_out = x.shape[-1] - len(kx) + 1
            acc = x[..., :w_out] * kx[0]
            for t in range(1, len(kx)):
                acc = acc + x[..., t : t + w_out] * kx[t]
            x = acc
        elif len(kx) > 1:
            bx = _band_matrix(x.shape[-1], kx)
            x = jnp.einsum("...hw,wo->...ho", x, bx, precision=_PRECISION)
        if 1 < len(ky) <= 9:
            h_out = x.shape[-2] - len(ky) + 1
            acc = x[..., :h_out, :] * ky[0]
            for t in range(1, len(ky)):
                acc = acc + x[..., t : t + h_out, :] * ky[t]
            x = acc
        elif len(ky) > 1:
            by = _band_matrix(x.shape[-2], ky)
            x = jnp.einsum("...hw,ho->...ow", x, by, precision=_PRECISION)
        return x
    x = conv2d_single(x, ky[:, None])
    x = conv2d_single(x, kx[None, :])
    return x


_SMALL_GAUSSIAN_TAB = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def gaussian_kernel1d(ksize: int, sigma: float) -> jnp.ndarray:
    """cv2.getGaussianKernel semantics, including the fixed small-kernel
    tables used when sigma <= 0 and ksize <= 7."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN_TAB:
        return jnp.asarray(_SMALL_GAUSSIAN_TAB[ksize], jnp.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    import numpy as _np

    xs = _np.arange(ksize, dtype=_np.float64) - (ksize - 1) * 0.5
    k = _np.exp(-(xs**2) / (2.0 * sigma * sigma))
    return jnp.asarray((k / k.sum()).astype(_np.float32))


def gaussian_blur(
    img: jnp.ndarray, ksize: int, sigma: float, *, mode: str = "reflect"
) -> jnp.ndarray:
    """cv2.GaussianBlur parity (BORDER_REFLECT_101 default)."""
    k = gaussian_kernel1d(ksize, sigma)
    return sep_conv2d(img, k, k, mode=mode)


def _box1d(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """Sliding window-of-k sum along `axis` of an already-padded array,
    via doubling: build power-of-2 partial sums (S_2p[i] = S_p[i] +
    S_p[i+p]) and combine k's binary decomposition — ceil(log2 k) +
    popcount(k) - 1 adds instead of k-1 (6 vs 14 for Farneback's
    winsize 15; the >9-tap path otherwise lowers to a banded matmul at
    ~1% MXU utilization)."""

    def sl(a, start, length):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, start + length)
        return a[tuple(idx)]

    n = x.shape[axis]
    sums = {1: x}
    p = 1
    while 2 * p <= k:
        s = sums[p]
        m = s.shape[axis]
        sums[2 * p] = sl(s, 0, m - p) + sl(s, p, m - p)
        p *= 2
    out = None
    off, rem = 0, k
    out_len = n - k + 1
    for b in sorted(sums, reverse=True):
        if rem >= b:
            part = sl(sums[b], off, out_len)
            out = part if out is None else out + part
            off += b
            rem -= b
    return out


def box_sum(img: jnp.ndarray, ksize: int, *, mode: str = "edge") -> jnp.ndarray:
    """Unnormalized box sums over a ksize x ksize window (replicate border),
    as used by Farneback's flow averaging (OpenCV FarnebackUpdateFlow_blur)
    and cornerMinEigenVal's blockSize aggregation."""
    r = ksize // 2
    pad = [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)]
    x = jnp.pad(img, pad, mode=mode)
    x = _box1d(x, ksize, axis=-1)
    return _box1d(x, ksize, axis=-2)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize INTER_LINEAR parity (half-pixel centers, clamped, NO
    antialiasing on downscale — unlike jax.image.resize)."""
    h, w = img.shape[-2:]
    scale_y = h / out_h
    scale_x = w / out_w
    # src = (dst + 0.5) * scale - 0.5
    sy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * scale_y - 0.5
    sx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * scale_x - 0.5
    sy = jnp.clip(sy, 0.0, h - 1.0)
    sx = jnp.clip(sx, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 2) if h > 1 else jnp.zeros_like(sy, jnp.int32)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 2) if w > 1 else jnp.zeros_like(sx, jnp.int32)
    wy = (sy - y0).astype(img.dtype) if h > 1 else jnp.zeros_like(sy, img.dtype)
    wx = (sx - x0).astype(img.dtype) if w > 1 else jnp.zeros_like(sx, img.dtype)

    rows0 = jnp.take(img, y0, axis=-2)
    rows1 = jnp.take(img, jnp.minimum(y0 + 1, h - 1), axis=-2)
    wy_b = wy.reshape((1,) * (img.ndim - 2) + (out_h, 1))
    rows = rows0 * (1 - wy_b) + rows1 * wy_b
    cols0 = jnp.take(rows, x0, axis=-1)
    cols1 = jnp.take(rows, jnp.minimum(x0 + 1, w - 1), axis=-1)
    wx_b = wx.reshape((1,) * (img.ndim - 2) + (1, out_w))
    return cols0 * (1 - wx_b) + cols1 * wx_b


def _area_weights(n_in: int, n_out: int):
    """(n_out, n_in) fractional pixel-coverage weights for cv2's generic
    INTER_AREA downscale: output cell j covers src span
    [j*scale, (j+1)*scale); border cells get partial coverage; rows are
    normalized by covered area (host-side numpy, static shapes)."""
    import numpy as _np

    scale = n_in / n_out
    w = _np.zeros((n_out, n_in), _np.float32)
    for j in range(n_out):
        a, b = j * scale, (j + 1) * scale
        lo, hi = int(_np.floor(a)), int(min(_np.ceil(b), n_in))
        for i in range(lo, hi):
            w[j, i] = min(b, i + 1) - max(a, i)
    return w / w.sum(axis=1, keepdims=True)


def resize_area(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize INTER_AREA parity: exact pixel-area average for integer
    shrink factors, fractional coverage weights for non-integer downscale
    (as cv2's generic area path), bilinear for upscale (cv2's behavior)."""
    h, w = img.shape[-2:]
    if h % out_h == 0 and w % out_w == 0 and h >= out_h and w >= out_w:
        fy, fx = h // out_h, w // out_w
        x = img.reshape(img.shape[:-2] + (out_h, fy, out_w, fx))
        return x.mean(axis=(-3, -1))
    if h >= out_h and w >= out_w:
        wy = jnp.asarray(_area_weights(h, out_h), img.dtype)
        wx = jnp.asarray(_area_weights(w, out_w), img.dtype)
        x = jnp.einsum("oh,...hw->...ow", wy, img, precision=_PRECISION)
        return jnp.einsum("...hw,ow->...ho", x, wx, precision=_PRECISION)
    return resize_bilinear(img, out_h, out_w)


def threshold_binary(img: jnp.ndarray, thresh: float, maxval: float = 255.0) -> jnp.ndarray:
    """cv2.threshold(..., THRESH_BINARY) parity: img > thresh -> maxval else 0."""
    return jnp.where(img > thresh, jnp.asarray(maxval, img.dtype), jnp.asarray(0, img.dtype))

