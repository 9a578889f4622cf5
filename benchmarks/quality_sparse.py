"""Static-grid sparse LK quality vs the cv2 oracle at the REAL bench
configuration (1080p, grid step 30) across the reference corpus.

Reports per clip: EPE percentiles over all points, the divergent-point
fraction, and danger-mask agreement after the reference's radial
normalize + median/P99 filter (the metric that decides what the product
actually draws). Runs the TPU kernel; cv2 runs on host.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import cv2

    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.flow.lk_grid import lk_grid_flow_video

    h, w = 1080, 1920
    pts_np = measurement_grid(h, w, 30)
    pts = jax.device_put(jnp.asarray(pts_np))
    lk = LKParams(grid_step=30, use_pallas=True, compute_err=False)
    n_pairs = 6

    @jax.jit
    def run_all(fr):
        res = lk_grid_flow_video(fr[::-1].astype(jnp.float32), pts, lk=lk)
        return res.raw_next_pts, res.good, res.status

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
        frames = np.stack(frames)
        nxt_d, good_d, st_d = run_all(jax.device_put(jnp.asarray(frames)))
        nxt_d = np.asarray(nxt_d)
        good_d = np.asarray(good_d)
        st_d = np.asarray(st_d)

        epes, agrees, fr_div = [], [], []
        epes_tracked, st_agrees = [], []
        for i in range(n_pairs):
            # the device scan consumes the REVERSED clip with backward
            # (current -> previous) semantics, so its step j tracks
            # original frame t = n_pairs-1-j INTO frame t+1. The oracle
            # must match that direction: track(i -> i+1). (The round-3
            # version of this gate compared against track(i+1 -> i) —
            # opposite direction, producing ~15-50 px "EPE" that was
            # pure protocol error, not kernel error; round 4.)
            step = n_pairs - 1 - i
            ref_nxt, ref_st, _e = cv2.calcOpticalFlowPyrLK(
                frames[i], frames[i + 1], pts_np.reshape(-1, 1, 2), None,
                winSize=(45, 45), maxLevel=2,
                criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
            )
            ref_nxt = ref_nxt.reshape(-1, 2)
            ref_st = ref_st.reshape(-1).astype(bool)
            epe = np.linalg.norm(nxt_d[step] - ref_nxt, axis=-1)
            epes.append(epe)
            fr_div.append(np.mean(epe > 0.5))
            # the raw EPE includes points BOTH trackers mark failed
            # (status 0 — the endpoint is whatever the iteration wandered
            # to, chaotic for cv2 and for us by construction); the
            # status-aware rows isolate points both claim to have tracked
            both = ref_st & st_d[step]
            epes_tracked.append(epe[both])
            st_agrees.append(np.mean(ref_st == st_d[step]))

            def mask(endpoints):
                f = endpoints - pts_np
                m = np.linalg.norm(f, axis=-1)
                dc = np.linalg.norm(pts_np - [w / 2, h / 2], axis=-1)
                m = m / (5 + np.sqrt(dc)) * 30
                return (np.median(m) < m) & (m < np.percentile(m, 99))

            agrees.append(np.mean(mask(nxt_d[step]) == mask(ref_nxt)))
        epe = np.concatenate(epes)
        epe_t = np.concatenate(epes_tracked)
        if epe_t.size == 0:  # pathological clip: nothing both-tracked
            epe_t = np.array([np.nan])
        log(
            f"{os.path.basename(path)[:28]:28s} epe med {np.median(epe):.1e} "
            f"p95 {np.percentile(epe, 95):.3f} p99 {np.percentile(epe, 99):.2f} "
            f"div>0.5px {np.mean(epe > 0.5) * 100:.2f}%  "
            f"mask agree {np.mean(agrees) * 100:.2f}%  | both-tracked "
            f"div {np.mean(epe_t > 0.5) * 100:.2f}% "
            f"p99 {np.percentile(epe_t, 99):.2f}  "
            f"status agree {np.mean(st_agrees) * 100:.2f}%"
        )


if __name__ == "__main__":
    main()
