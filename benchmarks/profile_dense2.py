"""Per-stage, per-level timing of the PREPARED dense Farneback pair on
real corpus frames (the configuration bench.py actually runs), plus
per-tile candidate-walk statistics for the Pallas slab warp.

profile_dense.py times stages at level-0 shapes on random noise; real
flow fields are smooth, so the slab kernel's per-tile live-candidate
counts (and therefore the walk cost) differ a lot. This script replays
farneback_prepared's level loop stage by stage on real frames and times
each stage with the flow it actually receives, then prints the per-tile
(ylo, yh, xh) distributions that drive ops/warp_pallas.py's gated walk.

Diagnostic tool; not the driver bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_FLOOR = [0.0]


def timeit(name, fn, *args, reps=8):
    @jax.jit
    def run(*a):
        def body(acc, _):
            out = fn(a[0] + acc * 1e-30, *a[1:])
            return jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]) * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return acc

    t0 = time.perf_counter()
    _ = float(run(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - _FLOOR[0], 0.0) / reps * 1e3
    log(f"{name:44s} {ms:8.2f} ms/call   (compile {compile_s:.1f}s)")
    return ms


def measure_floor():
    @jax.jit
    def nop(x):
        return jnp.sum(x[..., :1]) * 1e-30

    x = jnp.zeros((8, 8), jnp.float32)
    _ = float(nop(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(nop(x))
        best = min(best, time.perf_counter() - t0)
    _FLOOR[0] = best
    log(f"dispatch+readback floor: {best * 1e3:.1f} ms")


def load_pair(h=720, w=1280):
    import cv2

    cap = cv2.VideoCapture("/root/reference/videos/Тёмный_коридор_колонны .mp4")
    cap.set(cv2.CAP_PROP_POS_FRAMES, 40)
    fr = []
    for _ in range(2):
        ok, f = cap.read()
        assert ok
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        fr.append(cv2.resize(g, (w, h), interpolation=cv2.INTER_AREA))
    cap.release()
    return np.stack(fr)


def tile_stats(flow_np, name):
    """Per-tile live-candidate stats of the gated walk (host replica of
    ops/warp_pallas.py's prepass)."""
    from hackathonopticalflow_tpu.ops.warp_pallas import TH, TW, RXC, RYC

    h, w = flow_np.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w]
    fx = xs + flow_np[..., 0]
    fy = ys + flow_np[..., 1]
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 2)
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 2)
    il, jl = ys % TH, xs % TW
    dy0 = y0 + 72 - il
    dx0 = x0 + (RXC - 1) - jl
    hp, wp = -(-h // TH) * TH, -(-w // TW) * TW
    if (hp, wp) != (h, w):
        pad = ((0, hp - h), (0, wp - w))
        dy0 = np.pad(dy0, pad, constant_values=2**30)
        dx0 = np.pad(dx0, pad, constant_values=2**30)
    nty, ntx = hp // TH, wp // TW
    dy4 = dy0.reshape(nty, TH, ntx, TW)
    dx4 = dx0.reshape(nty, TH, ntx, TW)
    ymin = np.maximum(dy4.min((1, 3)), 0)
    xmin = np.maximum(dx4.min((1, 3)), 0)
    ymax = np.where(dy4 >= 2**29, -(2**30), dy4).max((1, 3))
    xmax = np.where(dx4 >= 2**29, -(2**30), dx4).max((1, 3))
    by8 = ymin // 8
    ylo = ymin - by8 * 8
    yh = np.clip(ymax - by8 * 8 + 2, 1, RYC)
    xh = np.clip(xmax - xmin + 2, 1, RXC)
    rows_walk_old = 8 * np.ceil(yh / 8)
    rows_walk_new = np.maximum(yh - ylo, 1)
    steps_old = (rows_walk_old * xh).mean()
    steps_new = (rows_walk_new * xh).mean()
    log(
        f"  {name}: yh-ylo p50/p95/max {np.percentile(rows_walk_new, 50):.0f}/"
        f"{np.percentile(rows_walk_new, 95):.0f}/{rows_walk_new.max():.0f}  "
        f"xh p50/p95/max {np.percentile(xh, 50):.0f}/{np.percentile(xh, 95):.0f}/"
        f"{xh.max():.0f}  walk steps old {steps_old:.1f} -> gated {steps_new:.1f} "
        f"({steps_old / max(steps_new, 1e-9):.2f}x)"
    )


def main():
    import importlib

    from hackathonopticalflow_tpu.core.config import FarnebackParams
    from hackathonopticalflow_tpu.ops.image import resize_bilinear

    fb = importlib.import_module("hackathonopticalflow_tpu.ops.farneback")

    params = fb._resolve_mode(FarnebackParams())
    mode = params.warp_mode
    frames = load_pair()
    a = jax.device_put(jnp.asarray(frames[0], jnp.float32))
    b = jax.device_put(jnp.asarray(frames[1], jnp.float32))
    log(f"device {jax.devices()[0]}; warp_mode {mode}")
    measure_floor()

    prep = jax.jit(lambda x: fb.prepare_frame(x, params))
    rs_prev = jax.block_until_ready(prep(a))
    rs_next = jax.block_until_ready(prep(b))

    timeit("prepare_frame (per frame, amortized)", lambda x: fb.prepare_frame(x, params), a)

    # replay the farneback_prepared level loop, timing stages with the
    # flows they actually see
    total = 0.0
    flow = None
    for lev, (r0, r1) in enumerate(zip(rs_prev, rs_next)):
        _, hk, wk = r0.shape
        if flow is None:
            flow = jnp.zeros((hk, wk, 2), jnp.float32)
        else:
            up = timeit(
                f"L{lev} flow resize -> ({hk},{wk})",
                lambda f: jnp.moveaxis(
                    resize_bilinear(jnp.moveaxis(f, -1, 0), hk, wk), 0, -1
                )
                * (1.0 / params.pyr_scale),
                flow,
            )
            total += up
            flow = jnp.moveaxis(
                resize_bilinear(jnp.moveaxis(flow, -1, 0), hk, wk), 0, -1
            ) * (1.0 / params.pyr_scale)
        for i in range(params.iterations):
            tile_stats(np.asarray(flow), f"L{lev} it{i} tiles")
            ms = timeit(
                f"L{lev} it{i} update_matrices",
                lambda f, x, y: fb.update_matrices(x, y, f, mode=mode),
                flow, r0, r1,
            )
            total += ms
            m = jax.block_until_ready(
                jax.jit(lambda x, y, f: fb.update_matrices(x, y, f, mode=mode))(
                    r0, r1, flow
                )
            )
            ms = timeit(
                f"L{lev} it{i} solve_flow", lambda mm: fb._solve_flow(mm, params), m
            )
            total += ms
            flow = jax.block_until_ready(
                jax.jit(lambda mm: fb._solve_flow(mm, params))(m)
            )
    log(f"sum of stages: {total:.2f} ms")

    timeit(
        "farneback_prepared whole pair",
        lambda x0, *rs: fb.farneback_prepared(
            tuple(rs[: len(rs_prev)]), (x0,) + tuple(rs[len(rs_prev) :]),
            params,
        ),
        rs_next[0], *rs_prev, *rs_next[1:],
    )


if __name__ == "__main__":
    main()
