"""Checkpoint/resume: a resumed run must be numerically identical to an
uninterrupted one (SURVEY.md §5.4 — unlike the reference, derived state
survives)."""

import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from hackathonopticalflow_tpu.core.config import TrackerParams, LKParams, FeatureParams
from hackathonopticalflow_tpu.flow.tracker import init_tracker, track_step
from hackathonopticalflow_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _frames(n=6):
    rng = np.random.RandomState(0)
    base = rng.uniform(0, 255, (100, 140)).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25
    base = np.pad(base, 2, mode="reflect")
    base = sum(base[i : i + 100, j : j + 140] * k[i, j] for i in range(5) for j in range(5))
    return [np.roll(base, (2 * t, t), axis=(1, 0)) for t in range(n)]


def test_tracker_checkpoint_resume_identical():
    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=32,
        features=FeatureParams(max_corners=10, max_candidates=128),
    )
    step = jax.jit(lambda s, a, b: track_step(s, a, b, params))
    frames = _frames(6)

    # uninterrupted run
    s = init_tracker(params)
    for t in range(1, 6):
        s = step(s, jnp.asarray(frames[t - 1]), jnp.asarray(frames[t]))
    ref = s

    # interrupted at t=3, checkpointed, resumed
    s = init_tracker(params)
    for t in range(1, 3):
        s = step(s, jnp.asarray(frames[t - 1]), jnp.asarray(frames[t]))
    path = os.path.join(tempfile.mkdtemp(), "ckpt.npz")
    save_checkpoint(path, tracker=s, prev_gray=jnp.asarray(frames[2]))
    restored = load_checkpoint(
        path, {"tracker": s, "prev_gray": jnp.asarray(frames[2])}
    )
    s2 = restored["tracker"]
    for t in range(3, 6):
        s2 = step(s2, jnp.asarray(frames[t - 1]), jnp.asarray(frames[t]))

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_checkpoint_missing_template_key(tmp_path):
    """Forward compatibility (round-5 review finding): a template key
    absent from an older checkpoint (e.g. the tracker's 'poses', added
    round 5) falls back to the template instead of KeyError, so
    pre-upgrade checkpoints stay loadable."""
    import numpy as np

    from hackathonopticalflow_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    path = str(tmp_path / "c.npz")
    save_checkpoint(path, a=np.arange(3))
    out = load_checkpoint(
        path,
        {"a": np.zeros(3, np.int64), "b": {"x": np.ones(2, np.float32)}},
    )
    assert np.array_equal(np.asarray(out["a"]), np.arange(3))
    assert np.array_equal(np.asarray(out["b"]["x"]), np.ones(2))
