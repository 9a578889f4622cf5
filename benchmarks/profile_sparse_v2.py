"""Per-stage timing of the static-grid sparse LK path on the real TPU.

Times: prepare_frame, blocked template/slab extraction, the lk_pallas2
kernel alone (per level, block variants), and the full pyr_lk — at the
1080p reference configuration. Diagnostic tool; not the driver bench.
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


_FLOOR = [0.0]  # measured dispatch+readback latency, subtracted from runs


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


def timeit(name, fn, *args, reps=8):
    @jax.jit
    def run(*a):
        def body(acc, _):
            # serialize iterations without promoting a[0]'s dtype (i16
            # templates must stay i16 or the kernel compiles differently)
            bump = (acc * 0).astype(a[0].dtype)
            out = fn(a[0] + bump, *a[1:])
            leaf = jax.tree.leaves(out)[0]
            return jnp.sum(leaf.ravel()[:1]).astype(jnp.float32) * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return acc

    try:
        t0 = time.perf_counter()
        _ = float(run(*args))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(*args))
            best = min(best, time.perf_counter() - t0)
        ms = max(best - _FLOOR[0], 0.0) / reps * 1e3
        log(f"{name:48s} {ms:8.2f} ms/call   (compile {compile_s:.1f}s)")
        return ms
    except Exception as e:
        log(f"{name:48s} FAILED {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.ops.grid_patch import (
        extract_grid_slabs_blocked,
        extract_grid_templates_blocked,
    )
    from hackathonopticalflow_tpu.ops.lk import (
        _frame_pad,
        prepare_frame,
        pyr_lk,
        pyr_lk_prepared,
    )
    from hackathonopticalflow_tpu.ops.lk_pallas2 import lk_iterate_grid

    h, w = 1080, 1920
    rng = np.random.RandomState(0)
    a = jax.device_put(jnp.asarray(rng.randint(0, 255, (h, w)), jnp.float32))
    b = jax.device_put(jnp.asarray(rng.randint(0, 255, (h, w)), jnp.float32))
    pts_np = measurement_grid(h, w, 30)
    pts = jax.device_put(jnp.asarray(pts_np))
    xs = np.unique(pts_np[:, 0]).astype(int)
    ys = np.unique(pts_np[:, 1]).astype(int)
    n = pts_np.shape[0]
    params = LKParams(grid_step=30, use_pallas=True, compute_err=False)
    pad = _frame_pad(params)
    win_w, win_h = params.win_size
    margin_x = (128 - win_w - 1) // 2
    margin_y = params.slab_margin_y
    log(f"device {jax.devices()[0]}; {n} points at {h}x{w}; pad {pad}")
    measure_floor()

    timeit(
        "full pyr_lk (static-grid v2)",
        lambda x, y, p: pyr_lk(x, y, p, params)[0],
        a, b, pts,
    )
    prep_a = jax.jit(lambda x: prepare_frame(x, params))(a)
    prep_b = jax.jit(lambda x: prepare_frame(x, params))(b)
    timeit(
        "pyr_lk_prepared (both pyramids amortized)",
        lambda p: pyr_lk_prepared(
            jax.tree.map(lambda t: t + p * 0, prep_a), prep_b, pts, params
        )[0],
        jnp.float32(0),
    )
    timeit("prepare_frame", lambda x: prepare_frame(x, params).img_p[0], a)

    for level in range(3):
        planes = jnp.stack(
            [prep_a.img_p[level], prep_a.dix_p[level], prep_a.diy_p[level]]
        )
        timeit(
            f"templates L{level} (blocked extract)",
            lambda p, lv=level: extract_grid_templates_blocked(
                p, xs, ys, lv, win_w, win_h, pad
            ),
            planes,
        )
        timeit(
            f"slabs L{level} (blocked extract)",
            lambda p, lv=level: extract_grid_slabs_blocked(
                p, xs, ys, lv, win_w, win_h, margin_x, margin_y, pad
            )[0],
            prep_b.img_p[level],
        )

    # kernel alone at each level's shapes
    for level in range(3):
        planes = jnp.stack(
            [prep_a.img_p[level], prep_a.dix_p[level], prep_a.diy_p[level]]
        )
        tmpl = jax.jit(
            lambda p, lv=level: extract_grid_templates_blocked(
                p, xs, ys, lv, win_w, win_h, pad
            )
        )(planes)
        slabs, bx, by = jax.jit(
            lambda p, lv=level: extract_grid_slabs_blocked(
                p, xs, ys, lv, win_w, win_h, margin_x, margin_y, pad
            )
        )(prep_b.img_p[level])
        base = jnp.asarray(
            np.stack(np.meshgrid(bx, by, indexing="ij"), -1).reshape(-1, 2),
            jnp.int32,
        )
        lw, lh = w >> level, h >> level
        scale = 1.0 / (1 << level)
        tl0 = pts * scale - 22.0
        st = jnp.ones((n,), jnp.float32)
        m_iter = (
            params.iter_margin_top if level == params.max_level else params.iter_margin
        )

        def kern(tm, m=m_iter, lv=level, block=48, ee=True, iters=10):
            return lk_iterate_grid(
                tm, slabs, base, tl0, st,
                win_w=win_w, win_h=win_h, m_iter=m,
                level_w=lw, level_h=lh, max_iters=iters,
                eps2=0.0009, is_level0=(lv == 0),
                early_exit=ee, block_n=block,
            )[0]

        timeit(f"kernel L{level} (while, m={m_iter}, b48)", kern, tmpl)
        if level == 0:
            timeit("kernel L0 (while, m=12, b32)", lambda t: kern(t, block=32), tmpl)
            timeit("kernel L0 (while, m=12, b96)", lambda t: kern(t, block=96), tmpl)
            timeit("kernel L0 (while, m=8, b48)", lambda t: kern(t, m=8), tmpl)
            timeit("kernel L0 (fori10, m=12, b48)", lambda t: kern(t, ee=False), tmpl)
            timeit("kernel L0 (fori1, m=12, b48)", lambda t: kern(t, ee=False, iters=1), tmpl)


if __name__ == "__main__":
    main()
