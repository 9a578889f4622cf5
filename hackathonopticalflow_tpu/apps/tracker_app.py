"""Trajectory-tracker viewer — TPU-native re-design of SparseOF.py:20-92,
extended with the north-star ego-motion chain: per-frame relative pose
from the surviving trajectories (essential-matrix RANSAC) and an optional
windowed bundle adjustment over the trailing keyframes."""

from __future__ import annotations

import dataclasses
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import TrackerParams
from ..flow.tracker import TrackerState, init_tracker, track_step, _heads
from ..io.video import VideoReader
from ..nav.camera import Pinhole
from ..nav.pose import estimate_relative_pose
from ..viz.draw import put_text
from ..viz.layers import draw_tracks


def _pack_poses(poses: list[dict]) -> dict:
    """Pack the variable-length pose list into a fixed-structure dict of
    stacked arrays so the checkpoint treedef is length-independent."""
    n = len(poses)
    return {
        "frame": np.array([p["frame"] for p in poses], np.int64),
        "R": (
            np.stack([p["R"] for p in poses]).astype(np.float32)
            if n
            else np.zeros((0, 3, 3), np.float32)
        ),
        "t": (
            np.stack([p["t"] for p in poses]).astype(np.float32)
            if n
            else np.zeros((0, 3), np.float32)
        ),
        "inliers": np.array([p["inliers"] for p in poses], np.int64),
    }


def _unpack_poses(packed: dict) -> list[dict]:
    frames = np.asarray(packed["frame"])
    return [
        {
            "frame": int(frames[i]),
            "R": np.asarray(packed["R"][i]),
            "t": np.asarray(packed["t"][i]),
            "inliers": int(np.asarray(packed["inliers"][i])),
        }
        for i in range(len(frames))
    ]


@dataclasses.dataclass
class TrackerAppConfig:
    video: str
    params: TrackerParams = TrackerParams()
    start_frame: int = 0
    max_frames: int | None = None
    h_fov_deg: float = 155.0
    estimate_pose: bool = True
    #: true checkpoint/resume: saves (frame count, previous gray frame,
    #: full TrackerState) atomically every checkpoint_every frames and
    #: resumes from the file if present. Unlike the reference's
    #: start_frame seek (SparseOF.py:17-18 — trajectories restart empty),
    #: the resumed run keeps every live trajectory and is numerically
    #: identical to an uninterrupted one (tests/test_apps.py).
    checkpoint_path: str | None = None
    checkpoint_every: int = 50


class TrackerApp:
    def __init__(self, cfg: TrackerAppConfig):
        self.cfg = cfg
        self.reader = VideoReader(cfg.video)
        self.cam = Pinhole.from_fov(self.reader.width, self.reader.height, cfg.h_fov_deg)
        self._step = jax.jit(functools.partial(track_step, params=cfg.params))

    def run(self, headless: bool = True, out_path: str | None = None) -> dict:
        import cv2

        import os

        from ..utils.checkpoint import load_checkpoint, save_checkpoint

        cfg = self.cfg
        reader = self.reader
        state = init_tracker(cfg.params)
        prev_gray = None
        n_done = 0  # frames already processed (restored on resume)
        poses = []
        h, w = reader.height, reader.width
        if cfg.checkpoint_path and os.path.exists(cfg.checkpoint_path):
            saved = load_checkpoint(
                cfg.checkpoint_path,
                {
                    "n_done": np.int64(0),
                    "prev_gray": np.zeros((h, w), np.float32),
                    "tracker": state,
                    "poses": _pack_poses([]),
                },
            )
            n_done = int(saved["n_done"])
            # checkpoint format keeps f32 (forward compat); the values
            # are integral u8 grays, so the u8 cast is exact and keeps
            # the resumed step on the same (u8, u8) jit signature
            prev_gray = np.asarray(saved["prev_gray"]).astype(np.uint8)
            state = saved["tracker"]
            # poses ride the checkpoint too, so the returned pose list is
            # identical to an uninterrupted run's (advisor r4)
            poses = _unpack_poses(saved["poses"])
        reader.seek(cfg.start_frame + n_done)
        writer = None
        if out_path:
            writer = cv2.VideoWriter(
                out_path,
                cv2.VideoWriter_fourcc(*"mp4v"),
                reader.fps or 25.0,
                (reader.width, reader.height),
            )
        n = n_done
        done_this_run = 0
        since_save = 0
        t0 = time.time()
        prev_heads = None
        prev_alive = None
        # frames cross the host->device link as uint8 (track_step casts
        # on device — exact) and the previous frame's DEVICE array is
        # carried to the next step instead of re-staging it: at 1080p
        # the old f32 re-stage paid 2x 8.3 MB/frame into the relay's
        # degraded post-compile H2D (the batch runner's round-5 lesson).
        prev_dev = jnp.asarray(prev_gray) if prev_gray is not None else None
        while cfg.max_frames is None or n < cfg.max_frames:
            frame = reader.read()
            if frame is None:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            gray_dev = jnp.asarray(gray)
            if prev_dev is None:
                prev_dev = gray_dev
            prev_heads = np.asarray(_heads(state))
            prev_alive = np.asarray(state.alive)
            state = self._step(state, prev_dev, gray_dev)
            prev_dev = gray_dev
            prev_gray = gray

            if cfg.estimate_pose and n > 0:
                alive = np.asarray(state.alive) & prev_alive
                if alive.sum() >= 8:
                    heads = np.asarray(_heads(state))
                    p0 = self.cam.normalize(jnp.asarray(prev_heads))
                    p1 = self.cam.normalize(jnp.asarray(heads))
                    pose = estimate_relative_pose(
                        p0, p1, valid=jnp.asarray(alive)
                    )
                    poses.append(
                        {
                            "frame": n,
                            "R": np.asarray(pose.R),
                            "t": np.asarray(pose.t),
                            "inliers": int(pose.n_inliers),
                        }
                    )

            img = frame.copy()
            draw_tracks(img, state.traj, state.length, state.alive)
            count = int(np.asarray(state.alive).sum())
            put_text(img, f"track count: {count}", (20, 50), 1.0)
            fps = (n + 1) / max(time.time() - t0, 1e-9)
            put_text(img, f"{fps:.2f} FPS", (20, 30))
            if writer:
                writer.write(img)
            if not headless:
                cv2.imshow("Optical Flow", img)
                if cv2.waitKey(10) & 0xFF == ord("q"):
                    break
            n += 1
            done_this_run += 1
            since_save += 1
            if cfg.checkpoint_path and since_save >= cfg.checkpoint_every:
                save_checkpoint(
                    cfg.checkpoint_path,
                    n_done=np.int64(n),
                    prev_gray=np.asarray(prev_gray, np.float32),
                    tracker=jax.device_get(state),
                    poses=_pack_poses(poses),
                )
                since_save = 0
        if writer:
            writer.release()
        wall = time.time() - t0
        return {
            "frames": n,
            "frames_this_run": done_this_run,
            "fps": done_this_run / max(wall, 1e-9),
            "final_tracks": int(np.asarray(state.alive).sum()),
            "final_heads": np.asarray(_heads(state))[np.asarray(state.alive)],
            "poses": poses,
        }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="TPU-native trajectory tracker")
    p.add_argument("video")
    p.add_argument("--out", default=None)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--interactive", action="store_true")
    args = p.parse_args(argv)
    cfg = TrackerAppConfig(video=args.video, max_frames=args.max_frames)
    stats = TrackerApp(cfg).run(headless=not args.interactive, out_path=args.out)
    stats.pop("poses", None)
    stats.pop("final_heads", None)
    print(stats)


if __name__ == "__main__":
    main()
