"""Probe 4: throughput of the gather-based warp-tile pipeline.

Emulates, at timing scale, the inner work the redesigned dense warp
kernel (ops/warp_pallas.py) would do per (8,128) output tile:

  per output row i (8) x live 16-row group g (2):
    idx  = column selection per lane (i32, range [0,256))
    tap0 = where(idx<128, take(h0, idx), take(h1, idx))   # 2 gathers
    tap1 = same with idx+1                                # 2 gathers
    xb   = (1-ax)*tap0 + ax*tap1          # (5*16, 128) x-blended rows
    out_i += sum_k ty(k;i)*xb[k]          # y tent over the group's rows

vs the ALU-only equivalent volume (rolls+fmas, the current walk's cost
model) and vs pure fma padding. All inside ONE pallas_call with a
fori_loop over NTILES tiles so the ~0.25 ms dispatch floor is amortized.

Also checks the tile pipeline's numerics against numpy bilinear once.
Diagnostic tool; safe to delete.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


C, K, TW = 5, 16, 128  # channels, rows per group, lanes
NT = 900  # tiles per 720p image
NG = 2  # live 16-row groups (p50-p95 at L3)


def tile_gather_pipeline(slab, idxf, ax, ryf):
    """One tile, gather formulation.

    slab (C*2K, 256) f32 — two 16-row groups' slab rows, 256 columns.
    idxf (8, TW) f32 column positions in [0, 254]; ax (8, TW) fractions.
    ryf (8, TW) f32 row positions in [0, 2K-1).
    Returns (8, C? ) reduced — we return (8, TW) channel-0 out to keep
    the probe's checksum small; all C channels are computed.
    """
    outs = []
    for i in range(8):
        idx = idxf[i].astype(jnp.int32)
        ii = jnp.broadcast_to(idx[None, :], (C * 2 * K, TW))
        h0 = slab[:, :128]
        h1 = slab[:, 128:]
        t0 = jnp.where(ii < 128, jnp.take_along_axis(h0, ii, axis=1),
                       jnp.take_along_axis(h1, ii, axis=1))
        i1 = ii + 1
        t1 = jnp.where(i1 < 128, jnp.take_along_axis(h0, i1, axis=1),
                       jnp.take_along_axis(h1, i1, axis=1))
        a = ax[i][None, :]
        xb = (1.0 - a) * t0 + a * t1  # (C*2K, TW)
        xb = xb.reshape(C, 2 * K, TW)
        acc = jnp.zeros((C, TW), jnp.float32)
        for k in range(2 * K):
            ty = jnp.maximum(1.0 - jnp.abs(ryf[i] - float(k)), 0.0)
            acc = acc + xb[:, k, :] * ty[None, :]
        outs.append(acc[0])
    return jnp.stack(outs)


def main():
    log(f"device {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    slab_np = rng.uniform(0, 255, (C * 2 * K, 256)).astype(np.float32)
    idxf_np = rng.uniform(0, 254, (8, TW)).astype(np.float32)
    ax_np = rng.uniform(0, 1, (8, TW)).astype(np.float32)
    ryf_np = rng.uniform(0, 2 * K - 1.01, (8, TW)).astype(np.float32)

    # --- correctness of the tile pipeline (interpret on CPU-side math
    # not needed: run the real kernel once and compare to numpy) ---
    def once_kernel(s_ref, i_ref, a_ref, r_ref, o_ref):
        o_ref[...] = tile_gather_pipeline(
            s_ref[...], i_ref[...], a_ref[...], r_ref[...]
        )

    out = np.asarray(
        pl.pallas_call(
            once_kernel, out_shape=jax.ShapeDtypeStruct((8, TW), jnp.float32)
        )(*map(jnp.asarray, (slab_np, idxf_np, ax_np, ryf_np)))
    )
    # numpy oracle: channel 0
    exp = np.zeros((8, TW), np.float32)
    s3 = slab_np.reshape(C, 2 * K, 256)
    for i in range(8):
        x0 = idxf_np[i].astype(np.int32)
        for l in range(TW):
            v = 0.0
            for k in range(2 * K):
                ty = max(0.0, 1.0 - abs(ryf_np[i, l] - k))
                if ty > 0:
                    t0 = s3[0, k, x0[l]]
                    t1 = s3[0, k, x0[l] + 1]
                    v += ty * ((1 - ax_np[i, l]) * t0 + ax_np[i, l] * t1)
            exp[i, l] = v
    err = np.abs(out - exp).max()
    log(f"tile pipeline numerics: max |err| = {err:.2e} "
        f"({'OK' if err < 1e-3 else 'WRONG'})")

    # --- throughput: NT tiles x NG groups in one call ---
    def timed(kern, n_in, label, reps=4):
        f = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, TW), jnp.float32)
        )
        args = list(map(jnp.asarray, (slab_np, idxf_np, ax_np, ryf_np)))[:n_in]

        @jax.jit
        def run(*a):
            return jnp.sum(f(*a))

        float(run(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        log(f"{label}: {best * 1e3:.2f} ms for {NT} tiles "
            f"-> {best * 1e6 / NT:.2f} us/tile")

    def gather_kern(s_ref, i_ref, a_ref, r_ref, o_ref):
        s = s_ref[...]
        idxf = i_ref[...]
        ax = a_ref[...]
        ryf = r_ref[...]

        def body(t, acc):
            # vary idx slightly per tile so nothing folds
            o = tile_gather_pipeline(
                s, idxf + (t % 2).astype(jnp.float32), ax, ryf
            )
            return acc + o

        o_ref[...] = lax.fori_loop(0, NT, body, jnp.zeros((8, TW), jnp.float32))

    timed(gather_kern, 4, f"gather pipeline ({NG} groups eq: 2K rows)")

    # ALU yardstick: same fma volume as the gather pipeline's ALU part
    # (selects + blends + tents) WITHOUT the gathers, to isolate gather cost
    def alu_kern(s_ref, i_ref, a_ref, r_ref, o_ref):
        s = s_ref[...]
        ax = a_ref[...]
        ryf = r_ref[...]

        def body(t, acc):
            outs = []
            for i in range(8):
                a = ax[i][None, :] + t.astype(jnp.float32) * 1e-9
                t0 = s[:, :128]
                t1 = s[:, 128:]
                xb = (1.0 - a) * t0 + a * t1
                xb = xb.reshape(C, 2 * K, TW)
                acc2 = jnp.zeros((C, TW), jnp.float32)
                for k in range(2 * K):
                    ty = jnp.maximum(1.0 - jnp.abs(ryf[i] - float(k)), 0.0)
                    acc2 = acc2 + xb[:, k, :] * ty[None, :]
                outs.append(acc2[0])
            return acc + jnp.stack(outs)

        o_ref[...] = lax.fori_loop(0, NT, body, jnp.zeros((8, TW), jnp.float32))

    timed(alu_kern, 4, "ALU-only same volume (no gathers)")

    # current-walk yardstick: xh steps x (roll + live_s fmas) at the
    # measured L3 p50 stats (xh=17, live_s=10) on (C,16,256) data
    def walk_kern(s_ref, i_ref, a_ref, r_ref, o_ref):
        s = s_ref[...].reshape(C, 2 * K, 256)
        ax = a_ref[...]

        def body(t, acc):
            cur = s + t.astype(jnp.float32) * 1e-30
            a = jnp.zeros((C, 8, TW), jnp.float32)

            def rx_body(rx, carry):
                a, cur = carry
                txw = jnp.maximum(1.0 - jnp.abs(ax - rx.astype(jnp.float32)), 0.0)
                win = cur[:, :, :TW]
                for sdx in range(10):  # live_s = 10
                    rows = pltpu.roll(win, 16 - sdx, 1) if sdx else win
                    a = a + rows[:, :8, :] * txw[None]
                return a, pltpu.roll(cur, 255, 2)

            a, _ = lax.fori_loop(0, 17, rx_body, (a, cur))  # xh = 17
            return acc + a[0]

        o_ref[...] = lax.fori_loop(0, NT, body, jnp.zeros((8, TW), jnp.float32))

    timed(walk_kern, 4, "walk yardstick (xh=17, s=10)")


if __name__ == "__main__":
    main()
