"""Micro-benchmark: masked-roll alignment ladders on f32 values vs
4-wide u8-in-uint32 PACKED words (round-4 sparse-kernel lever).

The v3 lanes kernel's per-iteration cost is the chunked masked-roll
ladder over the (crop_y, cxp, 128) f32 crop (BASELINE.md round-3
roofline: ~2.5x tent/ladder overhead). Pixel values are u8, and Mosaic
rotates 32-bit data — so four adjacent x-columns can ride one uint32
lane word: the y-ladder (any shift) and whole-word x shifts run on a
quarter of the vregs, with only the sub-word x shift (0..3 bytes) and
the final unpack paid in extra ops.

This kernel times three ladder formulations over realistic geometry
(crop 70x72, 5 y-bits + 5 x-bits, 10 iterations, 128 lanes):
  A. current: f32 rolls, chunked (the lk_pallas3 _sample structure);
  B. packed: uint32 x4-packed rolls for y + whole-word x, byte-combine
     for the sub-word x, unpack to 4 byte-plane f32 arrays;
  C. lower bound: the blend+reduction work alone (no alignment).

Run on TPU. Informs whether the packed rewrite is worth landing.
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


CROP_Y, CXP, B = 70, 72, 128
WIN = 45
WWP = 48
ITERS = 10
Y_BITS = (16, 8, 4, 2, 1)
X_BITS = (16, 8, 4, 2, 1)
XW_BITS = (4, 2, 1)  # whole-word x bits (shift/4)


def _kernel_f32(crop_ref, oy_ref, ox_ref, out_ref):
    crop = crop_ref[...]
    oy = oy_ref[0].reshape(1, 1, B).astype(jnp.int32)
    ox = ox_ref[0].reshape(1, 1, B).astype(jnp.int32)

    def body(j, acc):
        # y-ladder chunked along x (the lk_pallas3 _sample structure)
        ypieces = []
        for off in range(0, CXP, 32):
            size = min(32, CXP - off)
            w = crop[:, off : off + size, :].astype(jnp.float32)
            for t in Y_BITS:
                w = jnp.where(((oy + j) & t) != 0, pltpu.roll(w, CROP_Y - t, 0), w)
            ypieces.append(w[: WIN + 1])
        w = jnp.concatenate(ypieces, axis=1)
        xpieces = []
        for off in range(0, WIN + 1, 24):
            size = min(24, WIN + 1 - off)
            v = w[off : off + size]
            for t in X_BITS:
                v = jnp.where(((ox + j) & t) != 0, pltpu.roll(v, CXP - t, 1), v)
            xpieces.append(v[:, : WWP + 1, :])
        sub = jnp.concatenate(xpieces, axis=0)
        blend = sub[:WIN, :WWP] * 0.25 + sub[:WIN, 1 : WWP + 1] * 0.75
        blend = blend * 0.5 + sub[1 : WIN + 1, :WWP] * 0.125
        return acc + jnp.sum(blend, axis=(0, 1)).reshape(1, 1, B)

    acc = lax.fori_loop(0, ITERS, body, jnp.zeros((1, 1, B), jnp.float32))
    out_ref[...] = jnp.broadcast_to(acc.reshape(1, 1, B), (1, 8, B))


def _kernel_packed(packed_ref, oy_ref, ox_ref, out_ref):
    # packed: (CROP_Y, CXP//4, B) uint32, byte k of word w = column 4w+k
    pk = packed_ref[...]
    oy = oy_ref[0].reshape(1, 1, B).astype(jnp.int32)
    ox = ox_ref[0].reshape(1, 1, B).astype(jnp.int32)
    nw = CXP // 4
    nwin = (WWP + 4) // 4  # words feeding the window incl. +1 tap

    def body(j, acc):
        w = pk
        for t in Y_BITS:
            w = jnp.where(((oy + j) & t) != 0, pltpu.roll(w, CROP_Y - t, 0), w)
        w = w[: WIN + 1]
        # whole-word x ladder
        xw = (ox + j) >> 2
        for t in XW_BITS:
            w = jnp.where((xw & t) != 0, pltpu.roll(w, nw - t, 1), w)
        # sub-word shift: candidates s=0..3 built by byte combine
        nxt = pltpu.roll(w, nw - 1, 1)
        s = (ox + j) & 3
        cands = [w]
        for k in (1, 2, 3):
            cands.append((w >> (8 * k)) | (nxt << (8 * (4 - k))))
        v = jnp.where(
            s == 1, cands[1], jnp.where(s == 2, cands[2], jnp.where(s == 3, cands[3], cands[0]))
        )
        v = v[:, :nwin, :]
        # unpack to byte planes
        planes = [
            pltpu.bitcast((v >> (8 * k)) & 0xFF, jnp.int32).astype(
                jnp.float32
            )
            for k in range(4)
        ]
        nxtp = [planes[(k + 1) % 4] for k in range(4)]
        nxtp[3] = jnp.concatenate(
            [planes[0][:, 1:, :], planes[0][:, :1, :]], axis=1
        )
        tot = jnp.zeros((1, 1, B), jnp.float32)
        for k in range(4):
            blend = planes[k][:WIN] * 0.25 + nxtp[k][:WIN] * 0.75
            blend = blend * 0.5 + planes[k][1 : WIN + 1] * 0.125
            tot = tot + jnp.sum(
                blend[:, : WWP // 4, :], axis=(0, 1)
            ).reshape(1, 1, B)
        return acc + tot

    acc = lax.fori_loop(0, ITERS, body, jnp.zeros((1, 1, B), jnp.float32))
    out_ref[...] = jnp.broadcast_to(acc.reshape(1, 1, B), (1, 8, B))


def _kernel_floor(crop_ref, oy_ref, ox_ref, out_ref):
    crop = crop_ref[...]
    oy = oy_ref[0].reshape(1, 1, B).astype(jnp.float32)

    def body(j, acc):
        sub = crop[: WIN + 1, : WWP + 1, :].astype(jnp.float32) + oy
        blend = sub[:WIN, :WWP] * 0.25 + sub[:WIN, 1 : WWP + 1] * 0.75
        blend = blend * 0.5 + sub[1 : WIN + 1, :WWP] * 0.125
        return acc + jnp.sum(blend, axis=(0, 1)).reshape(1, 1, B)

    acc = lax.fori_loop(0, ITERS, body, jnp.zeros((1, 1, B), jnp.float32))
    out_ref[...] = jnp.broadcast_to(acc.reshape(1, 1, B), (1, 8, B))


def run(kernel, crop, oy, ox, label, nb=18, reps=8):
    def lane_rows(x):
        return x.astype(jnp.float32).reshape(1, 1, B)

    f = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(crop.shape, lambda i: (0,) * len(crop.shape)),
            pl.BlockSpec((1, 1, B), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, B), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 8, B), jnp.float32),
    )

    @jax.jit
    def go(c, a, b):
        def body(acc, _):
            r = f(c, a + (acc * 0).astype(a.dtype), b)
            return jnp.sum(r[0, 0, :1]) * 1e-30, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=reps)
        return acc

    t0 = time.perf_counter()
    _ = float(go(crop, lane_rows(oy), lane_rows(ox)))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(go(crop, lane_rows(oy), lane_rows(ox)))
        best = min(best, time.perf_counter() - t0)
    per_block = best / reps / nb * 1e6
    log(
        f"{label:28s} {per_block:8.1f} us/block-call "
        f"({per_block / ITERS:6.2f} us/block-iter)  compile {c:.0f}s"
    )
    return per_block


def main():
    rng = np.random.RandomState(0)
    vals = rng.randint(0, 256, (CROP_Y, CXP, B)).astype(np.uint8)
    oy = rng.randint(0, 17, (B,)).astype(np.int32)
    ox = rng.randint(0, 17, (B,)).astype(np.int32)
    crop_f = jnp.asarray(vals.astype(np.int16))
    packed = jnp.asarray(
        vals.reshape(CROP_Y, CXP // 4, 4, B).astype(np.uint32)
    )
    packed = jnp.asarray(
        (
            vals.reshape(CROP_Y, CXP // 4, 4, B)[:, :, 0].astype(np.uint32)
            | (vals.reshape(CROP_Y, CXP // 4, 4, B)[:, :, 1].astype(np.uint32) << 8)
            | (vals.reshape(CROP_Y, CXP // 4, 4, B)[:, :, 2].astype(np.uint32) << 16)
            | (vals.reshape(CROP_Y, CXP // 4, 4, B)[:, :, 3].astype(np.uint32) << 24)
        )
    )
    log(f"device {jax.devices()[0]}")
    run(_kernel_floor, crop_f, oy, ox, "C floor (no alignment)")
    run(_kernel_f32, crop_f, oy, ox, "A current f32 ladder")
    run(_kernel_packed, packed, oy, ox, "B packed u32 ladder")


if __name__ == "__main__":
    main()
