"""End-to-end pipeline integration vs a literal OpenCV transcription of
the reference viewer (SURVEY.md §4 integration strategy): danger-point
sets per frame must agree with the oracle pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hackathonopticalflow_tpu.core.config import LKParams
from hackathonopticalflow_tpu.core.grid import measurement_grid
from hackathonopticalflow_tpu.flow.lk_grid import lk_grid_flow

from conftest import requires_cv2, HAVE_CV2, CLIP_CORRIDOR

if HAVE_CV2:
    import cv2


def _reference_pipeline(prev_gray, gray, points, half_w, half_h):
    """Literal transcription of get_flow_lk (pathfinder_viewer.py:144-176)."""
    next_pts, _st, _err = cv2.calcOpticalFlowPyrLK(
        gray,
        prev_gray,
        points.reshape(-1, 1, 2),
        None,
        winSize=(45, 45),
        maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    next_pts = next_pts.reshape(-1, 2)
    flow = next_pts - points
    fx, fy = flow[:, 0], flow[:, 1]
    x, y = points[:, 0], points[:, 1]
    ang = np.arctan2(fy, fx)
    modulus = np.sqrt(fx * fx + fy * fy)
    modulus_middle = np.sqrt((half_w - x) ** 2 + (half_h - y) ** 2)
    modulus = modulus / (5 + np.sqrt(modulus_middle)) * 30
    nfx = modulus * np.cos(ang)
    nfy = modulus * np.sin(ang)
    next_i = np.int32(np.vstack([x + nfx, y + nfy]).T + 0.5)
    pts_i = np.int32(points + 0.5)
    mask = (np.median(modulus) * 1.0 < modulus) & (
        modulus < np.percentile(modulus, 99)
    )
    return pts_i, next_i, mask, modulus


@requires_cv2
def test_pipeline_matches_reference_oracle():
    import os

    if not os.path.exists(CLIP_CORRIDOR):
        pytest.skip("corpus missing")
    cap = cv2.VideoCapture(CLIP_CORRIDOR)
    cap.set(cv2.CAP_PROP_POS_FRAMES, 30)
    frames = []
    for _ in range(5):
        ok, f = cap.read()
        assert ok
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        frames.append(cv2.resize(g, (480, 270), interpolation=cv2.INTER_AREA))
    cap.release()

    h, w = frames[0].shape
    pts = measurement_grid(h, w, 30)
    fn = jax.jit(lambda a, b, p: lk_grid_flow(a, b, p))

    agreements = []
    mod_errs = []
    for t in range(1, 5):
        ref_pts, ref_next, ref_mask, ref_mod = _reference_pipeline(
            frames[t - 1], frames[t], pts, int(w / 2), int(h / 2)
        )
        res = fn(
            jnp.asarray(frames[t - 1], jnp.float32),
            jnp.asarray(frames[t], jnp.float32),
            jnp.asarray(pts),
        )
        np.testing.assert_array_equal(np.asarray(res.pts), ref_pts)
        agree = (np.asarray(res.good) == ref_mask).mean()
        agreements.append(agree)
        mod_errs.append(np.abs(np.asarray(res.modulus) - ref_mod).max())
        # endpoints of agreed good points must round identically
        both = np.asarray(res.good) & ref_mask
        np.testing.assert_array_equal(np.asarray(res.next_pts)[both], ref_next[both])
    assert np.mean(agreements) > 0.99, agreements
    assert max(mod_errs) < 0.05, mod_errs
