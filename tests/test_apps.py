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
