"""Native C++ host-runtime tests (io/native/hofio.cpp via ctypes)."""

import os
import tempfile

import numpy as np
import pytest

from hackathonopticalflow_tpu.io import native_lib as nl

from conftest import requires_cv2, HAVE_CV2

if HAVE_CV2:
    import cv2

needs_native = pytest.mark.skipif(not nl.available(), reason="native lib build failed")


@needs_native
@requires_cv2
def test_native_bgr2gray_bit_exact():
    rng = np.random.RandomState(0)
    bgr = rng.randint(0, 256, (257, 321, 3)).astype(np.uint8)
    np.testing.assert_array_equal(
        nl.bgr2gray_u8(bgr), cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    )


@needs_native
def test_ring_reader_order_and_eof():
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (7, 24, 32)).astype(np.uint8)
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        frames.tofile(f.name)
        path = f.name
    try:
        with nl.RawFrameRing(path, (24, 32), n_slots=3) as ring:
            got = []
            while True:
                fr = ring.next()
                if fr is None:
                    break
                got.append(fr)
        assert len(got) == 7
        for a, b in zip(got, frames):
            np.testing.assert_array_equal(a, b)
    finally:
        os.unlink(path)


@needs_native
@requires_cv2
def test_trace_contours_matches_cv2_point_sets():
    img = np.zeros((60, 80), np.uint8)
    img[10:20, 15:35] = 255
    img[30:45, 50:70] = 255
    img[50:55, 5:10] = 255
    ours = nl.trace_contours(img)
    ref, _ = cv2.findContours(img, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    assert len(ours) == len(ref)
    ours_set = set(map(tuple, np.concatenate(ours).tolist()))
    ref_set = set(map(tuple, np.concatenate([c.reshape(-1, 2) for c in ref]).tolist()))
    inter = len(ours_set & ref_set)
    union = len(ours_set | ref_set)
    assert inter / union > 0.95


@needs_native
@requires_cv2
def test_trace_contours_real_frame(frame_pair_small):
    """The contour_layer input pattern: quantized gray, thresholded."""
    a, _ = frame_pair_small
    img_div = (a // 63) * 63
    binary = ((img_div > 126) * 255).astype(np.uint8)
    ours = nl.trace_contours(binary)
    ref, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    # outer borders only vs cv2 external: counts should be close and the
    # large contours must appear in both
    big_ours = sorted(len(c) for c in ours if len(c) > 50)
    big_ref = sorted(len(c.reshape(-1, 2)) for c in ref if len(c) > 50)
    assert len(big_ours) == len(big_ref)
