"""Tracker-scan A/B for the aligned DMA slab carve (round-5 cont.):
48-frame 1080p lanes-kernel scans at caps 512/1024/2048, carve_dma
forced on vs off, interleaved in one process (no CPU baseline — the
round-5 scaling table already pins cv2; this measures OUR delta only).
Ends with a final-state identity check (alive mask + heads) between the
two carve backends at cap 1024.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench_tracker import load, log


def main():
    from hackathonopticalflow_tpu.core.config import (
        FeatureParams,
        LKParams,
        TrackerParams,
    )
    from hackathonopticalflow_tpu.flow.tracker import (
        _heads,
        init_tracker,
        track_step,
        track_video,
    )

    clip = "/root/reference/videos/Тёмный_коридор_колонны .mp4"
    log(f"device {jax.devices()[0]}")
    n = 48
    host_frames = load(clip, n + 1)
    frames = jax.device_put(jnp.asarray(host_frames, jnp.float32))

    rows = []
    for corners, cap in ((256, 512), (512, 1024), (1024, 2048)):
        quality = 0.05 if corners <= 256 else 0.01
        min_dist = 10 if corners <= 256 else 5
        fns = {}
        states = {}
        for dma in (True, False):
            params = TrackerParams(
                lk=LKParams(
                    win_size=(15, 15), use_pallas=True, slab_margin=8,
                    points_lanes=True, carve_dma=dma,
                ),
                max_tracks=cap,
                features=FeatureParams(
                    max_corners=corners, quality_level=quality,
                    min_distance=min_dist,
                    max_candidates=max(128, 2 * corners),
                ),
            )
            step = jax.jit(lambda s, a, b, p=params: track_step(s, a, b, p))
            scan = jax.jit(lambda fr, s, p=params: track_video(fr, p, s))
            state0 = step(init_tracker(params), frames[0], frames[0])
            t0 = time.perf_counter()
            s, (hs, al, ln) = scan(frames, state0)
            _ = int(np.asarray(al)[-1].sum())
            log(f"cap {cap} dma={dma}: compile+first "
                f"{time.perf_counter() - t0:.1f}s")
            fns[dma] = scan
            states[dma] = state0

        times = {True: [], False: []}
        for rnd in range(3):
            for dma in (True, False):
                t0 = time.perf_counter()
                s, (hs, al, ln) = fns[dma](frames, states[dma])
                live = int(np.asarray(al)[-1].sum())
                times[dma].append(time.perf_counter() - t0)
        f_on = n / min(times[True])
        f_off = n / min(times[False])
        log(f"cap {cap:5d}: dma ON {f_on:7.2f} fps | OFF {f_off:7.2f} fps "
            f"({f_on / f_off:4.2f}x) live {live}")
        rows.append((cap, f_on, f_off))

        if cap == 1024:
            s1, (h1, a1, l1) = fns[True](frames, states[True])
            s2, (h2, a2, l2) = fns[False](frames, states[False])
            same_alive = bool(jnp.all(a1 == a2))
            dh = float(
                jnp.max(jnp.where(a1[..., None], jnp.abs(h1 - h2), 0.0))
            )
            log(f"identity cap 1024: alive equal {same_alive}, "
                f"max live-head delta {dh:.2e}")


if __name__ == "__main__":
    main()
