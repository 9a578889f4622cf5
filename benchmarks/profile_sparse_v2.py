"""Per-stage timing of the static-grid sparse LK path on the real TPU.

Times: prepare_frame, static template extraction, static slab extraction,
the lk_pallas2 kernel alone (per level), and the full pyr_lk — at the
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


def timeit(name, fn, *args, reps=8):
    @jax.jit
    def run(*a):
        def body(acc, _):
            out = fn(a[0] + acc * 1e-30, *a[1:])
            return jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]) * 1e-30, None

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
        ms = best / reps * 1e3
        log(f"{name:44s} {ms:8.2f} ms/call   (compile {compile_s:.1f}s)")
        return ms
    except Exception as e:
        log(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.ops.grid_patch import (
        extract_grid_slabs,
        extract_grid_templates,
    )
    from hackathonopticalflow_tpu.ops.lk import (
        _frame_pad,
        _level_lk_static_grid,
        prepare_frame,
        pyr_lk,
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
    log(f"device {jax.devices()[0]}; {n} points at {h}x{w}; pad {pad}")

    timeit("full pyr_lk (static-grid v2)", lambda x, y, p: pyr_lk(x, y, p, params)[0], a, b, pts)
    timeit("prepare_frame", lambda x: prepare_frame(x, params).img_p[0], a)

    prep = jax.jit(lambda x: prepare_frame(x, params))(a)
    planes0 = jnp.stack([prep.img_p[0], prep.dix_p[0], prep.diy_p[0]])
    timeit(
        "templates L0 (static extract)",
        lambda p: extract_grid_templates(p, xs, ys, 0, 45, 45, pad),
        planes0,
    )
    timeit(
        "slabs L0 (static extract, bf16)",
        lambda p: extract_grid_slabs(p, xs, ys, 0, 45, 45, 41, 40, pad)[0],
        prep.img_p[0],
    )

    # kernel alone at L0 shapes
    slabs, bx, by = jax.jit(
        lambda p: extract_grid_slabs(p, xs, ys, 0, 45, 45, 41, 40, pad)
    )(prep.img_p[0])
    base = jnp.asarray(
        np.stack(np.meshgrid(bx, by, indexing="ij"), -1).reshape(-1, 2), jnp.int32
    )
    tmpl = jax.jit(
        lambda p: extract_grid_templates(p, xs, ys, 0, 45, 45, pad)
    )(planes0)
    iw = tmpl[:, 0]
    amat = jnp.concatenate(
        [jnp.ones((n, 3), jnp.float32), jnp.full((n, 1), 1e-3)], axis=-1
    )
    tl0 = pts - 22.0
    act = jnp.ones((n,), bool)

    def kern(iw_, early_exit, m_iter, max_iters=10, block=32):
        return lk_iterate_grid(
            iw_, iw_, iw_, slabs, base, tl0, amat, act, act,
            win_w=45, win_h=45, m_iter=m_iter, level_w=w, level_h=h,
            max_iters=max_iters, eps2=0.0009, is_level0=True,
            block_n=block, early_exit=early_exit,
        )[0]

    timeit("kernel L0 (while, m=16, b32)", lambda x: kern(x, True, 16), iw)
    timeit("kernel L0 (while, m=12, b32)", lambda x: kern(x, True, 12), iw)
    timeit("kernel L0 (while, m=12, b48)", lambda x: kern(x, True, 12, block=48), iw)
    timeit("kernel L0 (while, m=12, b64)", lambda x: kern(x, True, 12, block=64), iw)
    timeit("kernel L0 (fori1, m=12, b48)", lambda x: kern(x, False, 12, max_iters=1, block=48), iw)

    # extraction sub-stages
    from hackathonopticalflow_tpu.ops.grid_patch import axis_windows
    timeit("tmpl rows-only (3ch)", lambda p: axis_windows(jnp.swapaxes(p, -1, -2), ys, 0, 22.0, 45, pad, blend=True)[0], planes0)
    rows0 = jax.jit(lambda p: axis_windows(jnp.swapaxes(p, -1, -2), ys, 0, 22.0, 45, pad, blend=True)[0])(planes0)
    timeit("tmpl cols-only", lambda r: axis_windows(jnp.moveaxis(r, 1, -1), xs, 0, 22.0, 45, pad, blend=True)[0], rows0)
    cols0 = jax.jit(lambda r: axis_windows(jnp.moveaxis(r, 1, -1), xs, 0, 22.0, 45, pad, blend=True)[0])(rows0)
    timeit("tmpl final transpose+reshape", lambda c: jnp.moveaxis(jnp.moveaxis(c, 3, 0), 2, 1).reshape(-1, 3, 45, 45), cols0)


if __name__ == "__main__":
    main()
