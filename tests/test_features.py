"""Shi-Tomasi corner detection golden tests vs cv2.goodFeaturesToTrack
(reference call site SparseOF.py:69)."""

import numpy as np

import jax.numpy as jnp

from hackathonopticalflow_tpu.core.config import FeatureParams
from hackathonopticalflow_tpu.ops.features import good_features_to_track, min_eig_map

from conftest import requires_cv2, HAVE_CV2

if HAVE_CV2:
    import cv2


@requires_cv2
def test_min_eig_map_golden(frame_pair_small):
    a, _ = frame_pair_small
    eig = np.asarray(min_eig_map(jnp.asarray(a, jnp.float32), 7))
    ref = cv2.cornerMinEigenVal(a, 7, 3)
    assert np.abs(eig - ref).max() / ref.max() < 1e-5


@requires_cv2
def test_good_features_match_cv2(frame_pair_small):
    a, _ = frame_pair_small
    ref = cv2.goodFeaturesToTrack(
        a, maxCorners=20, qualityLevel=0.3, minDistance=10, blockSize=7
    )
    ref = ref.reshape(-1, 2)
    c = good_features_to_track(jnp.asarray(a, jnp.float32), FeatureParams())
    ours = np.asarray(c.pts)[np.asarray(c.valid)]
    assert len(ours) == len(ref)
    d = np.linalg.norm(ref[:, None, :] - ours[None, :, :], axis=-1)
    assert (d.min(axis=1) < 2).mean() >= 0.9
    assert (d.min(axis=0) < 2).mean() >= 0.9


@requires_cv2
def test_good_features_respects_mask(frame_pair_small):
    a, _ = frame_pair_small
    h, w = a.shape
    mask = np.full((h, w), 255, np.uint8)
    mask[:, : w // 2] = 0  # exclude left half
    c = good_features_to_track(jnp.asarray(a, jnp.float32), FeatureParams(), mask=jnp.asarray(mask))
    ours = np.asarray(c.pts)[np.asarray(c.valid)]
    assert (ours[:, 0] >= w // 2).all()


def test_good_features_min_distance_enforced():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    p = FeatureParams(max_corners=50, quality_level=0.01, min_distance=10)
    c = good_features_to_track(jnp.asarray(img), p)
    pts = np.asarray(c.pts)[np.asarray(c.valid)]
    if len(pts) > 1:
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        d[np.arange(len(pts)), np.arange(len(pts))] = 1e9
        assert d.min() >= 10.0
