"""Long-sequence checkpoint/resume soak (VERDICT r3 missing #2).

The reference's missing long benchmark clips are >=2875 frames
(.MISSING_LARGE_BLOBS, DenseOF.py:15 bookmark); this soak rebuilds that
scale by looping the four committed corpus clips into ONE ~3300-frame
1080p mp4, then:

1. reference pass — pathfinder run_batched over the whole clip,
   uninterrupted, recording every frame's danger count;
2. soak pass — the same run with --checkpoint, except the parent
   SIGKILLs the worker process at random intervals and relaunches it
   until it finishes; every segment logs (first_pair_frame,
   danger_counts) to a jsonl;
3. the segments are overlaid by ABSOLUTE frame index (a resume re-emits
   the frames between its checkpoint and the kill point; overlaps must
   agree) and the reconstructed stream is asserted IDENTICAL to the
   uninterrupted pass.

Run on the TPU (one process at a time — the parent itself never imports
jax). Usage: python benchmarks/soak_resume.py [--frames 3300]
[--kill-every 30] [--cpu].

Reference: pathfinder_viewer.py:15,240 (the state-losing seek this
replaces), SURVEY.md §5.4.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VIDEO_DIR = "/root/reference/videos"
CLIP = "/tmp/soak_long.mp4"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_clip(n_frames: int) -> int:
    """Loop the corpus into one long 1080p clip (cached)."""
    import cv2

    if os.path.exists(CLIP):
        cap = cv2.VideoCapture(CLIP)
        have = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        if have >= n_frames:
            log(f"soak clip cached: {have} frames")
            return have
    srcs = sorted(glob.glob(os.path.join(VIDEO_DIR, "*.mp4")))
    assert srcs, "corpus missing"
    vw = cv2.VideoWriter(
        CLIP, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (1920, 1080)
    )
    assert vw.isOpened()
    written = 0
    t0 = time.time()
    while written < n_frames:
        for s in srcs:
            cap = cv2.VideoCapture(s)
            while written < n_frames:
                ok, f = cap.read()
                if not ok:
                    break
                if f.shape[:2] != (1080, 1920):
                    f = cv2.resize(f, (1920, 1080))
                vw.write(f)
                written += 1
            cap.release()
            if written >= n_frames:
                break
    vw.release()
    log(f"built soak clip: {written} frames in {time.time() - t0:.0f}s")
    return written


def segment(args) -> None:
    """Worker mode: one pathfinder segment (resumes via checkpoint)."""
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from hackathonopticalflow_tpu.apps.pathfinder import (
        PathfinderApp,
        PathfinderConfig,
    )
    from hackathonopticalflow_tpu.core.config import LKParams

    cfg = PathfinderConfig(
        video=CLIP,
        max_frames=args.frames - 1,
        checkpoint_path=args.checkpoint if args.checkpoint else None,
        checkpoint_every=96,
        lk=LKParams(grid_step=30, use_pallas=True, compute_err=False),
    )
    def on_chunk(first, danger):
        # STREAM chunk outputs: a SIGKILLed segment has already
        # exported everything it consumed (end-of-run-only logging left
        # killed segments' work unrecorded — measured gap, round 4)
        with open(args.out, "a") as f:
            f.write(json.dumps({"first": int(first), "danger": danger}) + "\n")
            f.flush()
            os.fsync(f.fileno())

    stats = PathfinderApp(cfg).run_batched(
        chunk=24, render=False, on_chunk=on_chunk
    )
    log(
        f"segment done: first={stats['first_pair_frame']} "
        f"frames={stats['frames']} fps={stats['fps']:.2f}"
    )


def overlay(jsonl: str, n_pairs: int):
    """Reconstruct the stream by absolute index; verify overlaps agree."""
    stream = [None] * (n_pairs + 2)
    with open(jsonl) as f:
        for line in f:
            seg = json.loads(line)
            for i, v in enumerate(seg["danger"]):
                idx = seg["first"] + i
                if stream[idx] is not None and stream[idx] != v:
                    raise AssertionError(
                        f"overlap mismatch at frame {idx}: "
                        f"{stream[idx]} vs {v}"
                    )
                stream[idx] = v
    return stream


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3300)
    ap.add_argument("--kill-every", type=float, default=30.0,
                    help="seconds between SIGKILLs of the soak worker")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--segment", action="store_true")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--out", default="/tmp/soak_segments.jsonl")
    ap.add_argument("--skip-ref", action="store_true",
                    help="reuse an existing /tmp/soak_ref.jsonl")
    args = ap.parse_args()
    if args.segment:
        segment(args)
        return 0

    import cv2  # noqa: F401  (decode backend for build_clip)

    have = build_clip(args.frames)
    args.frames = min(args.frames, have)
    n_pairs = args.frames - 1

    base_cmd = [sys.executable, os.path.abspath(__file__), "--segment",
                "--frames", str(args.frames)]
    if args.cpu:
        base_cmd.append("--cpu")

    # 1. uninterrupted reference pass
    ref_out = "/tmp/soak_ref.jsonl"
    skip = args.skip_ref and os.path.exists(ref_out)
    # with --skip-ref, accumulated soak segments + the checkpoint are
    # kept as well (the harness itself may be restarted; overlay()
    # handles overlaps) — a fresh run wipes everything
    for p in (
        [] if skip
        else [ref_out, "/tmp/soak_segments.jsonl", "/tmp/soak.ckpt.npz"]
    ):
        if os.path.exists(p):
            os.unlink(p)
    t0 = time.time()
    if not skip:
        log("=== reference pass (uninterrupted) ===")
        subprocess.run(base_cmd + ["--out", ref_out], check=True, cwd=REPO)
    ref_wall = time.time() - t0
    ref = overlay(ref_out, n_pairs)
    assert all(v is not None for v in ref[1 : n_pairs + 1]), "ref gaps"

    # 2. soak pass: SIGKILL the worker until it survives to the end
    log(f"=== soak pass (SIGKILL every ~{args.kill_every}s) ===")
    seg_out = "/tmp/soak_segments.jsonl"
    kills = 0
    t0 = time.time()
    while True:
        proc = subprocess.Popen(
            base_cmd
            + ["--out", seg_out, "--checkpoint", "/tmp/soak.ckpt.npz"],
            cwd=REPO,
        )
        try:
            rc = proc.wait(timeout=args.kill_every)
            if rc == 0:
                break
            log(f"worker exited rc={rc}; relaunching")
        except subprocess.TimeoutExpired:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            kills += 1
            log(f"SIGKILL #{kills}")
    soak_wall = time.time() - t0

    # 3. reconstruct and compare
    got = overlay(seg_out, n_pairs)
    missing = [i for i in range(1, n_pairs + 1) if got[i] is None]
    assert not missing, f"gaps at {missing[:10]}"
    diff = [i for i in range(1, n_pairs + 1) if got[i] != ref[i]]
    assert not diff, f"mismatches at {diff[:10]}"
    print(
        json.dumps(
            {
                "soak": "PASSED",
                "frames": n_pairs,
                "kills": kills,
                "ref_wall_s": round(ref_wall, 1),
                "soak_wall_s": round(soak_wall, 1),
                "ref_fps": round(n_pairs / ref_wall, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
