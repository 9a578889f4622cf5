"""ops/image.py, ops/color.py, ops/pyramid.py, ops/deriv.py golden tests
vs the OpenCV oracle (the reference's compute substrate, SURVEY.md §2.3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hackathonopticalflow_tpu.ops.image import (
    gaussian_blur,
    resize_bilinear,
    resize_area,
    threshold_binary,
    gaussian_kernel1d,
)
from hackathonopticalflow_tpu.ops.color import (
    bgr2gray,
    bgr2hsv,
    hsv2bgr,
    saturating_add,
)
from hackathonopticalflow_tpu.ops.pyramid import pyr_down
from hackathonopticalflow_tpu.ops.deriv import scharr_deriv

from conftest import requires_cv2, HAVE_CV2

if HAVE_CV2:
    import cv2


@requires_cv2
def test_gaussian_kernel_matches_cv2():
    for ksize, sigma in [(3, 0.0), (5, 0.0), (3, 1.5), (15, 2.0), (19, 3.5)]:
        ours = np.asarray(gaussian_kernel1d(ksize, sigma)).ravel()
        ref = cv2.getGaussianKernel(ksize, sigma).ravel()
        np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=f"{ksize}/{sigma}")


@requires_cv2
def test_gaussian_blur_matches_cv2(frame_pair_small):
    a, _ = frame_pair_small
    af = a.astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(af), 7, 1.5))
    ref = cv2.GaussianBlur(af, (7, 7), 1.5)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


@requires_cv2
def test_resize_bilinear_matches_cv2(frame_pair_small):
    a, _ = frame_pair_small
    af = a.astype(np.float32)
    for (w, h) in [(240, 135), (241, 137), (960, 540)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(af), h, w))
        ref = cv2.resize(af, (w, h), interpolation=cv2.INTER_LINEAR)
        assert np.abs(ours - ref).max() < 1e-2, (w, h)


@requires_cv2
def test_resize_area_integer_matches_cv2(frame_pair_small):
    a, _ = frame_pair_small
    af = a.astype(np.float32)
    ours = np.asarray(resize_area(jnp.asarray(af), 135, 240))
    ref = cv2.resize(af, (240, 135), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(ours, ref, atol=1e-2)


@requires_cv2
def test_pyr_down_matches_cv2(frame_pair_small):
    a, _ = frame_pair_small
    af = a.astype(np.float32)
    ours = np.asarray(pyr_down(jnp.asarray(af)))
    ref = cv2.pyrDown(af)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-3)


@requires_cv2
def test_pyr_down_odd_size():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, (271, 481)).astype(np.float32)
    ours = np.asarray(pyr_down(jnp.asarray(img)))
    ref = cv2.pyrDown(img)
    assert ours.shape == ref.shape == (136, 241)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


@requires_cv2
def test_scharr_matches_cv2(frame_pair_small):
    a, _ = frame_pair_small
    af = a.astype(np.float32)
    ix, iy = scharr_deriv(jnp.asarray(af))
    ref_x = cv2.Scharr(af, cv2.CV_32F, 1, 0) / 32.0
    ref_y = cv2.Scharr(af, cv2.CV_32F, 0, 1) / 32.0
    np.testing.assert_allclose(np.asarray(ix), ref_x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(iy), ref_y, atol=1e-4)


@requires_cv2
def test_threshold_matches_cv2(frame_pair_small):
    a, _ = frame_pair_small
    ours = np.asarray(threshold_binary(jnp.asarray(a.astype(np.float32)), 70.0))
    _, ref = cv2.threshold(a.astype(np.float32), 70, 255, cv2.THRESH_BINARY)
    np.testing.assert_array_equal(ours, ref)


@requires_cv2
def test_bgr2gray_u8_exact(bgr_frame):
    ours = np.asarray(bgr2gray(jnp.asarray(bgr_frame)))
    ref = cv2.cvtColor(bgr_frame, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(ours, ref)


@requires_cv2
def test_bgr2hsv_close(bgr_frame):
    ours = np.asarray(bgr2hsv(jnp.asarray(bgr_frame))).astype(np.int32)
    ref = cv2.cvtColor(bgr_frame, cv2.COLOR_BGR2HSV).astype(np.int32)
    # uint8 fixed-point rounding differences of at most 1, hue wrap-aware
    dh = np.abs(ours[..., 0] - ref[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert dh.max() <= 1
    assert np.abs(ours[..., 1:] - ref[..., 1:]).max() <= 1


@requires_cv2
def test_hsv2bgr_close(bgr_frame):
    hsv = cv2.cvtColor(bgr_frame, cv2.COLOR_BGR2HSV)
    ours = np.asarray(hsv2bgr(jnp.asarray(hsv))).astype(np.int32)
    ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR).astype(np.int32)
    assert np.abs(ours - ref).max() <= 1


@requires_cv2
def test_saturating_add_matches_cv2(bgr_frame):
    other = bgr_frame[::-1].copy()
    ours = np.asarray(saturating_add(jnp.asarray(bgr_frame), jnp.asarray(other)))
    ref = cv2.add(bgr_frame, other)
    np.testing.assert_array_equal(ours, ref)
