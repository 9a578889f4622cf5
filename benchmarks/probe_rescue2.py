"""Cost split of the init-centered rescue extraction (round 5): where do
the +5.6 ms/pair go? Times, on TPU, per level-0-sized call:
  (a) 2304 dynamic slices (extract_slabs_rect) alone
  (b) slices + bias/int8 cast + lanes transpose (the full relayout)
  (c) the 24-pair scan with rescue at L0 ONLY (L1 static) — the
      quality/speed middle ground.
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, arg, label, reps=4):
    t0 = time.perf_counter()
    _ = jax.block_until_ready(fn(arg))
    log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.block_until_ready(fn(arg))
        times.append(time.perf_counter() - t0)
    log(f"{label}: best {min(times)*1e3:.2f} ms {[round(t*1e3,2) for t in times]}")
    return min(times)


def main():
    from hackathonopticalflow_tpu.core.config import LKParams
    from hackathonopticalflow_tpu.core.grid import measurement_grid
    from hackathonopticalflow_tpu.flow.lk_grid import lk_grid_flow_video
    from hackathonopticalflow_tpu.ops.patch import extract_slabs_rect
    from bench import load_frames

    log(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (1222, 2062)).round(), jnp.float32)
    sb = jnp.asarray(
        np.stack(
            [rng.randint(0, 1900, 2304), rng.randint(0, 1100, 2304)], -1
        ),
        jnp.int32,
    )

    @jax.jit
    def slices_only(b):
        return jnp.sum(extract_slabs_rect(img, b, 70, 72))

    @jax.jit
    def slices_relayout(b):
        s = extract_slabs_rect(img, b, 70, 72)
        s8 = (s - jnp.float32(128)).astype(jnp.int8)
        out = jnp.transpose(s8.reshape(18, 128, 70, 72), (0, 2, 3, 1))
        return jnp.sum(out.astype(jnp.int32))

    bench(slices_only, sb, "(a) 2304 slices (70,72)")
    bench(slices_relayout, sb, "(b) slices + i8 + lanes transpose")

    n_pairs = 24
    frames = load_frames(n_pairs, 1080, 1920)
    pts = jax.device_put(jnp.asarray(measurement_grid(1080, 1920, 30)))
    dev = jax.device_put(jnp.asarray(frames))
    lk = LKParams(
        grid_step=30, use_pallas=True, compute_err=False,
        grid_kernel="lanes", rescue_levels=1,
    )

    @jax.jit
    def run_all(fr):
        res = lk_grid_flow_video(fr[::-1].astype(jnp.float32), pts, lk=lk)
        return jnp.sum(res.modulus)

    t = bench(run_all, dev, "(c) 24-pair scan, rescue L0 only", reps=4)
    log(f"    = {t / n_pairs * 1e3:.2f} ms/pair -> {n_pairs / t:.2f} fps")


if __name__ == "__main__":
    main()
