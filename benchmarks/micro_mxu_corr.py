"""MXU reformulation study for sparse LK (VERDICT r4 item 2 — the
declared swing at the sparse >=10x bar).

The per-lane Gauss-Newton blend+reduce runs at ~2x VPU issue SoL and is
~the whole remaining sparse cost (BASELINE.md round 4). The only known
MXU-mappable reformulation is the CORRELATION-SURFACE approach: for each
point precompute the full integer-offset cross-correlation of its search
slab with its template channels (T, Ix, Iy); every GN iteration then
becomes 4 surface lookups + a bilinear blend instead of a 46x46 window
blend + 2 reductions.

Shape analysis (production config: N=2304 points, win 45, m_iter=12):
- offsets O = (2*12+1)^2 = 625, window K = 46*46 = 2116, C = 3 channels
- arithmetic: N*O*K*C*2 = 18.3 GFLOP per level per pair — ~30x the
  FLOPs of 10 naive GN iterations (N*K*C*~4*10 = 0.6 GFLOP). The MXU
  only wins if its rate advantage exceeds that 30x blowup.
- an explicit im2col operand is 12 GB — the only viable lowering is
  conv_general_dilated with batch_group_count=N (per-sample filters),
  measured here in f32 and bf16.
- independent blocker (recorded round 4): the surface approach
  linearizes past OpenCV's W_BITS quantization (_fix rounds each
  BLENDED pixel to the 1/32 grid BEFORE the reduction), so golden
  status-bit parity is forfeit regardless of speed.

Run on TPU (one process). Prints measured ms per candidate to stderr.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, arg, label, reps=5):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(arg))
    log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(arg))
        times.append(time.perf_counter() - t0)
    log(f"{label}: best {min(times)*1e3:.2f} ms  {sorted(round(t*1e3,2) for t in times)}")
    return min(times)


def main():
    log(f"device: {jax.devices()[0]}")
    n, win, m = 2304, 46, 12
    slab = win + 2 * m  # 70
    off = 2 * m + 1  # 25
    rng = np.random.RandomState(0)
    slabs = jnp.asarray(rng.uniform(0, 255, (n, 1, slab, slab)), jnp.float32)
    tmpl = jnp.asarray(rng.uniform(-32, 32, (n * 3, 1, win, win)), jnp.float32)

    @jax.jit
    def corr_f32(s):
        out = lax.conv_general_dilated(
            s, tmpl, window_strides=(1, 1), padding="VALID",
            batch_group_count=n,
        )  # (1, n*3, off, off)
        return jnp.sum(out)

    @jax.jit
    def corr_bf16(s):
        out = lax.conv_general_dilated(
            s.astype(jnp.bfloat16), tmpl.astype(jnp.bfloat16),
            window_strides=(1, 1), padding="VALID",
            batch_group_count=n, preferred_element_type=jnp.float32,
        )
        return jnp.sum(out)

    gflop = n * 3 * off * off * win * win * 2 / 1e9
    log(f"correlation surface: {gflop:.1f} GFLOP per level per pair")
    t = bench(corr_f32, slabs, "conv batch_group f32")
    log(f"  -> {gflop / t / 1e3:.2f} TFLOP/s effective")
    t = bench(corr_bf16, slabs, "conv batch_group bf16")
    log(f"  -> {gflop / t / 1e3:.2f} TFLOP/s effective")

    # candidate B for reference: the per-iteration reduce as a batched
    # matvec einsum (what the MXU would run INSIDE each iteration):
    # (n, K) window . (n, K, 3) template -> (n, 3). Batch-diagonal
    # contraction, N=3 output columns of a 128-wide systolic array.
    wins = jnp.asarray(rng.uniform(0, 255, (n, win * win)), jnp.float32)
    tm = jnp.asarray(rng.uniform(-32, 32, (n, win * win, 3)), jnp.float32)

    @jax.jit
    def matvec(wv):
        return jnp.sum(jnp.einsum("nk,nkc->nc", wv, tm))

    t = bench(matvec, wins, "batched matvec (one iteration's reduce)")
    gf = n * win * win * 3 * 2 / 1e9
    log(f"  -> {gf / t / 1e3:.3f} TFLOP/s effective ({gf*1e3:.1f} MFLOP)")


if __name__ == "__main__":
    main()
