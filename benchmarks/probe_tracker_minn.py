"""Threshold check: do the DMA carve routes pay at cap 256 (the
tracker app's default capacity / the 128-corner scaling row)?
Both routes forced on vs both off, interleaved, 48-frame 1080p scan.
Decides DMA_TMPL_MIN_N / the carve_dma auto threshold.
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
        init_tracker,
        track_step,
        track_video,
    )
    from hackathonopticalflow_tpu.ops import patch

    clip = "/root/reference/videos/Тёмный_коридор_колонны .mp4"
    log(f"device {jax.devices()[0]}")
    n = 48
    frames = jax.device_put(
        jnp.asarray(load(clip, n + 1), jnp.float32)
    )

    for corners, cap in ((128, 256), (20, 64)):
        fns, states = {}, {}
        for dma in (True, False):
            patch.DMA_TMPL = dma
            params = TrackerParams(
                lk=LKParams(
                    win_size=(15, 15), use_pallas=True, slab_margin=8,
                    points_lanes=True, carve_dma=dma,
                ),
                max_tracks=cap,
                features=FeatureParams(
                    max_corners=corners,
                    quality_level=0.3 if corners == 20 else 0.05,
                    min_distance=10,
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
            fns[dma], states[dma] = scan, state0
        patch.DMA_TMPL = "auto"

        times = {True: [], False: []}
        for rnd in range(3):
            for dma in (True, False):
                t0 = time.perf_counter()
                s, (hs, al, ln) = fns[dma](frames, states[dma])
                live = int(np.asarray(al)[-1].sum())
                times[dma].append(time.perf_counter() - t0)
        f_on = n / min(times[True])
        f_off = n / min(times[False])
        log(f"cap {cap:4d}: BOTH ON {f_on:7.2f} fps | OFF {f_off:7.2f} fps "
            f"({f_on / f_off:4.2f}x) live {live}")


if __name__ == "__main__":
    main()
