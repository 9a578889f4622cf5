"""Tracker-scan A/B for the aligned DMA TEMPLATE route (round-5
cont.): slab carve ON in both arms (probe_tracker_dma pinned that
delta); template route off vs on, interleaved. The flag is read at
trace time, so each arm's scan is traced while its flag value is set.
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
    host_frames = load(clip, n + 1)
    frames = jax.device_put(jnp.asarray(host_frames, jnp.float32))

    for corners, cap in ((256, 512), (512, 1024), (1024, 2048)):
        quality = 0.05 if corners <= 256 else 0.01
        min_dist = 10 if corners <= 256 else 5
        params = TrackerParams(
            lk=LKParams(
                win_size=(15, 15), use_pallas=True, slab_margin=8,
                points_lanes=True, carve_dma=True,
            ),
            max_tracks=cap,
            features=FeatureParams(
                max_corners=corners, quality_level=quality,
                min_distance=min_dist, max_candidates=max(128, 2 * corners),
            ),
        )
        fns, states = {}, {}
        for tmpl in (True, False):
            patch.DMA_TMPL = tmpl
            step = jax.jit(lambda s, a, b, p=params: track_step(s, a, b, p))
            scan = jax.jit(lambda fr, s, p=params: track_video(fr, p, s))
            state0 = step(init_tracker(params), frames[0], frames[0])
            t0 = time.perf_counter()
            s, (hs, al, ln) = scan(frames, state0)
            _ = int(np.asarray(al)[-1].sum())
            log(f"cap {cap} tmpl={tmpl}: compile+first "
                f"{time.perf_counter() - t0:.1f}s")
            fns[tmpl], states[tmpl] = scan, state0
        patch.DMA_TMPL = "auto"

        times = {True: [], False: []}
        for rnd in range(3):
            for tmpl in (True, False):
                t0 = time.perf_counter()
                s, (hs, al, ln) = fns[tmpl](frames, states[tmpl])
                live = int(np.asarray(al)[-1].sum())
                times[tmpl].append(time.perf_counter() - t0)
        f_on = n / min(times[True])
        f_off = n / min(times[False])
        log(f"cap {cap:5d}: tmpl ON {f_on:7.2f} fps | OFF {f_off:7.2f} fps "
            f"({f_on / f_off:4.2f}x) live {live}")

        if cap == 1024:
            s1, (h1, a1, l1) = fns[True](frames, states[True])
            s2, (h2, a2, l2) = fns[False](frames, states[False])
            same = bool(jnp.all(a1 == a2))
            dh = float(
                jnp.max(jnp.where(a1[..., None], jnp.abs(h1 - h2), 0.0))
            )
            log(f"identity cap 1024: alive equal {same}, "
                f"max live-head delta {dh:.2e}")


if __name__ == "__main__":
    main()
