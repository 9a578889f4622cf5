"""App-level tests: the pathfinder's chunked headless pipeline
(apps/pathfinder.py run_batched) matches the per-frame loop's outputs —
same frames processed, same danger counts (reference semantics:
pathfinder_viewer.py:270-358)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hackathonopticalflow_tpu.apps.pathfinder import (  # noqa: E402
    PathfinderApp,
    PathfinderConfig,
)


def _make_clip(path: str, n: int = 9, h: int = 128, w: int = 192) -> None:
    rng = np.random.RandomState(0)
    base = rng.uniform(40, 220, (h + 16, w + 16)).astype(np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 1.5)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (w, h))
    assert vw.isOpened()
    for t in range(n):
        g = base[4 + t : 4 + t + h, 4 + t : 4 + t + w]
        vw.write(cv2.cvtColor(g, cv2.COLOR_GRAY2BGR))
    vw.release()


def test_run_batched_matches_per_frame(tmp_path):
    clip = str(tmp_path / "clip.mp4")
    _make_clip(clip)

    cfg = PathfinderConfig(video=clip, max_frames=8)
    serial = PathfinderApp(cfg).run(headless=True, render=False)

    cfg2 = PathfinderConfig(video=clip, max_frames=8)
    # chunk=3 over 8 pairs: exercises both full chunks and the padded tail
    batched = PathfinderApp(cfg2).run_batched(chunk=3, render=False)

    assert batched["frames"] == serial["frames"] == 8
    assert batched["mean_danger_points"] == pytest.approx(
        serial["mean_danger_points"]
    )
    assert batched["fps"] > 0


def test_run_batched_renders_mp4(tmp_path):
    clip = str(tmp_path / "clip.mp4")
    _make_clip(clip, n=5)
    out = str(tmp_path / "out.mp4")
    cfg = PathfinderConfig(video=clip, max_frames=4)
    stats = PathfinderApp(cfg).run_batched(chunk=2, out_path=out, render=True)
    assert stats["frames"] == 4
    cap = cv2.VideoCapture(out)
    n = 0
    while True:
        ok, _ = cap.read()
        if not ok:
            break
        n += 1
    cap.release()
    assert n == 4


def test_pathfinder_checkpoint_resume(tmp_path):
    """True checkpoint/resume (SURVEY.md §5.4 upgrade of the reference's
    state-losing start_frame seek): a run killed mid-clip and resumed
    from its checkpoint must produce the exact per-frame output stream
    of an uninterrupted run."""
    clip = str(tmp_path / "clip.mp4")
    _make_clip(clip, n=14)
    ck = str(tmp_path / "pf.ckpt.npz")

    full = PathfinderApp(
        PathfinderConfig(video=clip, max_frames=12)
    ).run_batched(chunk=3, render=False)
    assert full["frames"] == 12

    # "crash" after 6 pairs (checkpoint saved at each chunk boundary)
    cfg1 = PathfinderConfig(
        video=clip, max_frames=6, checkpoint_path=ck, checkpoint_every=3
    )
    part1 = PathfinderApp(cfg1).run_batched(chunk=3, render=False)
    assert part1["frames"] == 6

    # resume to the end: picks up at the checkpoint, numerically identical
    cfg2 = PathfinderConfig(
        video=clip, max_frames=12, checkpoint_path=ck, checkpoint_every=3
    )
    part2 = PathfinderApp(cfg2).run_batched(chunk=3, render=False)
    assert part2["first_pair_frame"] == 7
    assert part2["frames"] == 6
    combined = part1["danger_counts"] + part2["danger_counts"]
    assert combined == full["danger_counts"]


def test_tracker_checkpoint_resume(tmp_path):
    """Tracker resume keeps every live trajectory (the reference's seek
    restarts them empty, SparseOF.py:17-18) and matches the
    uninterrupted run's final state exactly."""
    from hackathonopticalflow_tpu.apps.tracker_app import (
        TrackerApp,
        TrackerAppConfig,
    )
    from hackathonopticalflow_tpu.core.config import (
        FeatureParams,
        LKParams,
        TrackerParams,
    )

    clip = str(tmp_path / "clip.mp4")
    _make_clip(clip, n=11)
    params = TrackerParams(
        lk=LKParams(win_size=(15, 15)),
        max_tracks=32,
        features=FeatureParams(
            max_corners=16, quality_level=0.05, max_candidates=128
        ),
    )
    full = TrackerApp(
        TrackerAppConfig(video=clip, params=params, max_frames=10)
    ).run(headless=True)
    assert full["frames"] == 10 and full["final_tracks"] > 0

    ck = str(tmp_path / "tr.ckpt.npz")
    part1 = TrackerApp(
        TrackerAppConfig(
            video=clip, params=params, max_frames=5,
            checkpoint_path=ck, checkpoint_every=2,
        )
    ).run(headless=True)
    assert part1["frames"] == 5
    part2 = TrackerApp(
        TrackerAppConfig(
            video=clip, params=params, max_frames=10,
            checkpoint_path=ck, checkpoint_every=2,
        )
    ).run(headless=True)
    assert part2["frames"] == 10  # absolute count after resume
    assert part2["final_tracks"] == full["final_tracks"]
    assert np.array_equal(part2["final_heads"], full["final_heads"])


def test_batch_runner_staged_matches_streaming(tmp_path):
    """The staged compute-path mode (config-4 companion) must produce
    the streaming path's exact per-stream danger sequences, including
    the unequal-length stream masking."""
    from hackathonopticalflow_tpu.apps.batch_runner import (
        BatchRunnerConfig,
        run_batch,
        run_batch_staged,
    )

    clips = []
    for i, n in enumerate((9, 7)):
        c = str(tmp_path / f"clip{i}.mp4")
        _make_clip(c, n=n)
        clips.append(c)
    cfg = BatchRunnerConfig(videos=clips)
    streaming = run_batch(cfg)
    staged = run_batch_staged(BatchRunnerConfig(videos=clips), reps=1)
    assert staged["danger_counts"] == streaming["danger_counts"]
    assert staged["total_frames"] == streaming["total_frames"] == 8 + 6


def test_batch_runner_checkpoint_resume(tmp_path):
    from hackathonopticalflow_tpu.apps.batch_runner import (
        BatchRunnerConfig,
        run_batch,
    )

    clips = []
    for i in range(2):
        c = str(tmp_path / f"clip{i}.mp4")
        _make_clip(c, n=9)
        clips.append(c)
    full = run_batch(BatchRunnerConfig(videos=clips, max_frames=8))
    ck = str(tmp_path / "br.ckpt.npz")
    part1 = run_batch(
        BatchRunnerConfig(
            videos=clips, max_frames=4, checkpoint_path=ck,
            checkpoint_every=2,
        )
    )
    assert part1["steps"] == 3  # checkpoint landed at step 2
    part2 = run_batch(
        BatchRunnerConfig(
            videos=clips, max_frames=8, checkpoint_path=ck,
            checkpoint_every=2,
        )
    )
    assert part2["first_step"] == 3
    for i in range(2):
        assert part1["danger_counts"][i] == full["danger_counts"][i][:3]
        assert part2["danger_counts"][i] == full["danger_counts"][i][2:]


def _make_wander_clip(path: str, n: int, h: int = 128, w: int = 192) -> None:
    """Clip whose per-frame shift varies (pseudo-random walk), so each
    pair's flow — and hence its danger count — is step-distinguishable."""
    rng = np.random.RandomState(7)
    pad = 2 * n + 8
    base = rng.uniform(40, 220, (h + pad, w + pad)).astype(np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 1.5)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (w, h))
    assert vw.isOpened()
    y, x = 4, 4
    for t in range(n):
        g = base[y : y + h, x : x + w]
        vw.write(cv2.cvtColor(g, cv2.COLOR_GRAY2BGR))
        y += int(rng.randint(0, 3))
        x += int(rng.randint(0, 3))
    vw.release()


def test_batch_runner_double_resume(tmp_path):
    """Crash after a RESUME (the normal soak scenario): checkpoints
    written by a resumed run must keep the n_steps == prev-frame-index
    invariant, so a second resume neither skips nor repeats a frame
    (advisor r4 high-severity finding)."""
    from hackathonopticalflow_tpu.apps.batch_runner import (
        BatchRunnerConfig,
        run_batch,
    )

    clips = []
    for i in range(2):
        c = str(tmp_path / f"clip{i}.mp4")
        _make_wander_clip(c, n=12)
        clips.append(c)
    full = run_batch(BatchRunnerConfig(videos=clips, max_frames=11))
    # step-distinguishable counts: the invariant check below is only
    # meaningful if adjacent steps differ
    assert any(len(set(c)) > 1 for c in full["danger_counts"])
    ck = str(tmp_path / "br2.ckpt.npz")
    kw = dict(videos=clips, checkpoint_path=ck, checkpoint_every=2)
    part1 = run_batch(BatchRunnerConfig(max_frames=4, **kw))
    part2 = run_batch(BatchRunnerConfig(max_frames=7, **kw))  # 1st resume
    part3 = run_batch(BatchRunnerConfig(max_frames=11, **kw))  # 2nd resume
    assert part2["first_step"] == 3
    # part2's last checkpoint records n_steps=6 with prev=frame 6, so the
    # second resume must decode from frame 7 and re-pair (6, 7) — the
    # pre-fix code skipped frame 7 here
    assert part3["first_step"] == 7
    for i in range(2):
        assert part1["danger_counts"][i] == full["danger_counts"][i][:3]
        assert part2["danger_counts"][i] == full["danger_counts"][i][2:6]
        assert part3["danger_counts"][i] == full["danger_counts"][i][6:10]
