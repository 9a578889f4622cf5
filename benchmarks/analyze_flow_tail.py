"""Measure the large-flow tail that freezes the static-grid lanes kernel
(VERDICT r4 item 1): per-level slab-budget overflow fractions and the
spatial coherence of large flows (per-tile spread), from the cv2 oracle
at the production config (1080p, grid 30, win 45, maxLevel 2).

Budgets (ops/lk.py static-grid path, level-L scale):
- levels 0..1: |flow_x|/2^L <= margin_x - iter_margin = 41-12 = 29,
               |flow_y|/2^L <= margin_y - iter_margin = 36-12 = 24
- top level 2: |flow|/4 <= iter_margin_top = 32 (drift clamp)

A point frozen at level L keeps the level-(L+1) estimate (x 2^(L+1)
resolution) — so the overflow LEVEL determines the error magnitude.
"""

import glob
import os
import sys

import numpy as np
import cv2

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hackathonopticalflow_tpu.core.grid import measurement_grid  # noqa: E402


def main():
    h, w = 1080, 1920
    pts = measurement_grid(h, w, 30).astype(np.float32)
    xs = np.unique(pts[:, 0])
    ys = np.unique(pts[:, 1])
    kx, ky = len(xs), len(ys)
    print(f"grid {kx} x {ky} = {kx*ky} points", file=sys.stderr)
    n_pairs = 6

    for path in sorted(glob.glob("/root/reference/videos/*.mp4")):
        cap = cv2.VideoCapture(path)
        cap.set(cv2.CAP_PROP_POS_FRAMES, 30)
        frames = []
        for _ in range(n_pairs + 1):
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2GRAY))
        cap.release()
        if len(frames) < n_pairs + 1:
            continue
        o0 = o1 = o2 = 0.0
        mags = []
        spreads = []
        for i in range(n_pairs):
            nxt, st, _ = cv2.calcOpticalFlowPyrLK(
                frames[i], frames[i + 1], pts.reshape(-1, 1, 2), None,
                winSize=(45, 45), maxLevel=2,
                criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
            )
            fl = nxt.reshape(-1, 2) - pts
            fx, fy = np.abs(fl[:, 0]), np.abs(fl[:, 1])
            o0 += np.mean((fx > 29) | (fy > 24))
            o1 += np.mean((fx / 2 > 29) | (fy / 2 > 24))
            o2 += np.mean(np.maximum(fx, fy) / 4 > 32)
            mags.append(np.hypot(fl[:, 0], fl[:, 1]))
            # per-tile spread: x-major point order -> (kx, ky); tiles of
            # 16 grid cols x 8 grid rows (= 128 points, 480 x 240 px)
            g = fl.reshape(kx, ky, 2)
            for tx in range(0, kx - 15, 16):
                for ty in range(0, ky - 7, 8):
                    t = g[tx : tx + 16, ty : ty + 8]
                    sp = t.max(axis=(0, 1)) - t.min(axis=(0, 1))
                    spreads.append(sp)
        m = np.concatenate(mags)
        sp = np.stack(spreads)
        print(
            f"{os.path.basename(path)[:26]:26s} "
            f"|flow| p50 {np.percentile(m,50):5.1f} p90 {np.percentile(m,90):5.1f} "
            f"p99 {np.percentile(m,99):6.1f} max {m.max():6.1f} | "
            f"ovf L0 {o0/n_pairs*100:5.1f}% L1 {o1/n_pairs*100:5.1f}% "
            f"top {o2/n_pairs*100:5.1f}% | "
            f"tile-spread p50 ({np.percentile(sp[:,0],50):4.1f},{np.percentile(sp[:,1],50):4.1f}) "
            f"p90 ({np.percentile(sp[:,0],90):4.1f},{np.percentile(sp[:,1],90):4.1f}) "
            f"p99 ({np.percentile(sp[:,0],99):5.1f},{np.percentile(sp[:,1],99):5.1f})"
        )


if __name__ == "__main__":
    main()
