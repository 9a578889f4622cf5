"""Micro: batched rect carve — XLA gather vs Pallas DMA (round-5 cont.).

Measures, at the production rescue-carve workload (N=2304 points,
(86, 88) rects from a 1222x2062 f32 plane):
  (a) extract_slabs_rect (vmap dynamic_slice -> XLA gather; the
      shipped carve, ~1.2 us/slice on this relay)
  (b) gather_rects (Pallas per-point DMA), unaligned origins
  (c) gather_rects with (8,128)-aligned origins and an enlarged
      (96, 216) rect (what the kernel would need if Mosaic rejects
      unaligned DMA starts)
  (d) the winner at the 2048-capacity tracker's template-crop shape
      (N=2048, (16, 16) rects) — tiny-DMA issue overhead check.
Correctness of every Pallas variant is asserted against (a) exactly.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, *args, label="", reps=5):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    log(f"{label}: best {min(times)*1e3:.3f} ms "
        f"{[round(t*1e3, 3) for t in times]}")
    return out


def main():
    from jax import lax

    from hackathonopticalflow_tpu.ops.carve_pallas import gather_rects

    def extract_slabs_rect(img, tl, size_h, size_w):
        # the RAW vmap(dynamic_slice) form (ops/patch.py now routes
        # through the DMA kernel on TPU — this probe measures against
        # the pre-DMA lowering)
        def slice_one(p):
            return lax.dynamic_slice(img, (p[1], p[0]), (size_h, size_w))

        return jax.vmap(slice_one)(tl)

    log(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    h, w = 1222, 2062
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).round(), jnp.float32)
    n = 2304
    ry, rx = 86, 88
    tl = np.stack(
        [rng.randint(0, w - 260, n), rng.randint(0, h - 120, n)], -1
    ).astype(np.int32)
    tlj = jnp.asarray(tl)

    @jax.jit
    def xla_carve(b):
        return extract_slabs_rect(img, b, ry, rx)

    ref = bench(xla_carve, tlj, label=f"(a) XLA gather {n}x({ry},{rx})")

    try:
        out = bench(
            lambda b: gather_rects(img, b, ry=ry, rx=rx, block=64),
            tlj, label=f"(b) pallas DMA unaligned {n}x({ry},{rx})",
        )
        ok = bool(jnp.all(out == ref))
        log(f"(b) exact match: {ok}")
    except Exception as e:
        log(f"(b) FAILED: {type(e).__name__}: {str(e)[:300]}")

    # aligned variant: quantize origins to (8, 8) and (8, 128)
    for ay, ax, ry2, rx2, tag in [
        (8, 8, 96, 96, "(c1) aligned (8,8)"),
        (8, 128, 96, 216, "(c2) aligned (8,128)"),
    ]:
        tl2 = jnp.asarray(np.stack([tl[:, 0] // ax * ax,
                                    tl[:, 1] // ay * ay], -1))
        try:
            out = bench(
                lambda b: gather_rects(img, b, ry=ry2, rx=rx2, block=32),
                tl2, label=f"{tag} {n}x({ry2},{rx2})",
            )
            ref2 = jax.jit(
                lambda b: extract_slabs_rect(img, b, ry2, rx2)
            )(tl2)
            log(f"{tag} exact match: {bool(jnp.all(out == ref2))}")
        except Exception as e:
            log(f"{tag} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # tiny-rect tracker-template shape
    n3, ry3, rx3 = 2048, 16, 16
    tl3 = jnp.asarray(
        np.stack(
            [rng.randint(0, w - 40, n3), rng.randint(0, h - 40, n3)], -1
        ).astype(np.int32)
    )
    ref3 = bench(
        jax.jit(lambda b: extract_slabs_rect(img, b, ry3, rx3)),
        tl3, label=f"(d-xla) XLA gather {n3}x({ry3},{rx3})",
    )
    try:
        out3 = bench(
            lambda b: gather_rects(img, b, ry=ry3, rx=rx3, block=128),
            tl3, label=f"(d) pallas DMA {n3}x({ry3},{rx3})",
        )
        log(f"(d) exact match: {bool(jnp.all(out3 == ref3))}")
    except Exception as e:
        log(f"(d) FAILED: {type(e).__name__}: {str(e)[:300]}")

    # 3-plane template-stack shape (extract_patches_multi's workload)
    img3 = jnp.stack([img, img * 0.5, img * 0.25])

    @jax.jit
    def xla3(b):
        import jax as _jax
        from jax import lax as _lax

        def one(p):
            return _lax.dynamic_slice(
                img3, (0, p[1], p[0]), (3, ry3, rx3)
            )

        return _jax.vmap(one)(b)

    ref4 = bench(xla3, tl3, label=f"(e-xla) XLA gather {n3}x(3,{ry3},{rx3})")
    try:
        out4 = bench(
            lambda b: gather_rects(img3, b, ry=ry3, rx=rx3, block=128),
            tl3, label=f"(e) pallas DMA {n3}x(3,{ry3},{rx3})",
        )
        log(f"(e) exact match: {bool(jnp.all(out4 == ref4))}")
    except Exception as e:
        log(f"(e) FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
