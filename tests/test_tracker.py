"""Functional trajectory tracker tests (reference SparseOF.py behavior)."""

import numpy as np

import jax
import jax.numpy as jnp

from hackathonopticalflow_tpu.core.config import TrackerParams, FeatureParams, LKParams
from hackathonopticalflow_tpu.flow.tracker import init_tracker, track_step, _heads

from conftest import requires_cv2, HAVE_CV2, CLIP_CORRIDOR

if HAVE_CV2:
    import cv2


def _small_params():
    return TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=64,
        features=FeatureParams(max_corners=20, max_candidates=256),
    )


def test_tracker_seeds_and_tracks_synthetic():
    """Corners on a moving pattern must be detected and tracked with the
    known translation."""
    rng = np.random.RandomState(0)
    base = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25
    # cheap smoothing
    base = np.pad(base, 2, mode="reflect")
    base = sum(
        base[i : i + 120, j : j + 160] * k[i, j] for i in range(5) for j in range(5)
    )
    params = _small_params()
    state = init_tracker(params)
    step = jax.jit(lambda s, a, b: track_step(s, a, b, params))

    frames = [np.roll(base, (2 * t, t), axis=(1, 0)) for t in range(4)]
    # frame 0: detection happens (frame_idx 0 % 5 == 0)
    state = step(state, jnp.asarray(frames[0]), jnp.asarray(frames[0]))
    n0 = int(np.asarray(state.alive).sum())
    assert n0 > 0
    for t in range(1, 4):
        state = step(state, jnp.asarray(frames[t - 1]), jnp.asarray(frames[t]))
    alive = np.asarray(state.alive)
    assert alive.sum() > 0
    traj = np.asarray(state.traj)
    lengths = np.asarray(state.length)
    # tracks alive since frame 0 must have moved by ~(2,1) per frame
    for i in np.where(alive)[0]:
        if lengths[i] >= 3:
            steps = np.diff(traj[i, : lengths[i]], axis=0)
            inner = steps[(np.abs(steps[:, 0]) < 30) & (np.abs(steps[:, 1]) < 30)]
            if len(inner):
                assert np.allclose(inner.mean(axis=0), [2, 1], atol=0.5)
            break


def test_tracker_caps_trajectory_length():
    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=32,
        trajectory_len=5,
        features=FeatureParams(max_corners=10, max_candidates=128),
    )
    rng = np.random.RandomState(1)
    img = rng.uniform(0, 255, (100, 120)).astype(np.float32)
    state = init_tracker(params)
    step = jax.jit(lambda s, a, b: track_step(s, a, b, params))
    for _ in range(8):
        state = step(state, jnp.asarray(img), jnp.asarray(img))
    assert int(np.asarray(state.length).max()) <= 5


@requires_cv2
def test_tracker_fwd_bwd_gate_matches_reference_loop(frame_pair_small):
    """The keep/kill decision must match a literal cv2 transcription of
    SparseOF.py:31-38 for the same seed points."""
    a, b = frame_pair_small
    h, w = a.shape
    seeds = cv2.goodFeaturesToTrack(
        a, maxCorners=20, qualityLevel=0.3, minDistance=10, blockSize=7
    ).reshape(-1, 2)

    lk = dict(
        winSize=(15, 15),
        maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    p1, _, _ = cv2.calcOpticalFlowPyrLK(a, b, seeds.reshape(-1, 1, 2), None, **lk)
    p0r, _, _ = cv2.calcOpticalFlowPyrLK(b, a, p1, None, **lk)
    ref_good = (np.abs(seeds - p0r.reshape(-1, 2)).max(-1) < 1).astype(bool)

    from hackathonopticalflow_tpu.ops.lk import pyr_lk
    from hackathonopticalflow_tpu.core.config import LKParams

    params = LKParams(win_size=(15, 15))
    o1 = pyr_lk(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32), jnp.asarray(seeds), params).next_pts
    o0r = pyr_lk(jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32), o1, params).next_pts
    ours_good = np.abs(seeds - np.asarray(o0r)).max(-1) < 1
    assert (ours_good == ref_good).mean() >= 0.9
