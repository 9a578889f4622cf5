"""Feasibility + cost probes for the points-in-lanes LK kernel (v3).

Round-3 probe findings (2026-08-20, this toolchain), which this script
re-verifies on each run:
  - native i16 pltpu.roll does NOT compile (matches the v2 note);
  - pltpu.bitcast i16<->i32 round-trips, and rolls on the bitcast view
    are CORRECT along non-packed axes (axis 0 of a 3D array) but wrong
    along the packed second-minor axis — packing pairs (2k, 2k+1) of the
    second-minor into one i32 word (low half = even index);
  - second-minor i16 rolls therefore decompose: even shifts roll the
    word view by t/2; odd shifts combine two word rolls with 16-bit
    shifts (verified against jnp.roll here);
  - reductions must never be written to small output blocks (the known
    SIGABRT gotcha, CLAUDE.md) — every probe writes full (8, 128)
    broadcast blocks.

Also times phase-B iteration proxies (ladder + blend + residual
reductions) in v2 vs v3 layouts, f32 vs i16-resident.

Diagnostic tool; not the driver bench.
"""

from __future__ import annotations

import functools
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


def bench(name, fn, *args, reps=3):
    try:
        run = jax.jit(fn)
        t0 = time.perf_counter()
        out = run(*args)
        first = jax.tree.leaves(out)[0]
        _ = float(jnp.sum(first.ravel()[:1]))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = run(*args)
            _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
            best = min(best, time.perf_counter() - t0)
        ms = best / reps * 1e3
        log(f"{name:58s} {ms:9.3f} ms/call (compile {compile_s:.1f}s)")
        return ms, out
    except Exception as e:  # noqa: BLE001 - probe must survive any failure
        log(f"{name:58s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None, None


def lroll16(v, t, axis, size):
    """LEFT-roll an i16 array by t along `axis` via the i32 bitcast view.

    Non-packed axes (anything except the second-minor) roll directly on
    the word view. The second-minor axis is packed in (2k, 2k+1) word
    pairs: even t rolls words by t/2; odd t merges two word rolls with
    16-bit shifts (out16[j] = in16[j+t])."""
    if t % size == 0:
        return v
    w = pltpu.bitcast(v, jnp.int32)
    packed_axis = v.ndim - 2
    if axis != packed_axis:
        return pltpu.bitcast(pltpu.roll(w, w.shape[axis] - t, axis), jnp.int16)
    half = w.shape[axis]  # size // 2 words along the packed axis

    def wroll(s):
        return pltpu.roll(w, (half - s) % half, axis) if s % half else w

    if t % 2 == 0:
        return pltpu.bitcast(wroll(t // 2), jnp.int16)
    u = pltpu.bitcast(v, jnp.uint32)

    def uroll(s):
        return (
            pltpu.roll(u, (half - s) % half, axis) if s % half else u
        )

    lo = uroll((t - 1) // 2) >> 16  # in16[2k+t] (odd index = high half)
    hi = uroll((t + 1) // 2) << 16  # in16[2k+t+1] (even index = low half)
    return pltpu.bitcast((lo | hi).astype(jnp.int32), jnp.int16)


# ---------------------------------------------------------------- probes


def roll16_correct(x, t, axis):
    def kernel(x_ref, o_ref):
        o_ref[:] = lroll16(x_ref[:], t, axis, x_ref.shape[axis])

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x)


def lane_masked_roll16(x, mask):
    """Per-lane select between rolled/unrolled i16 data."""

    def kernel(x_ref, m_ref, o_ref):
        v = x_ref[:]
        r = lroll16(v, 1, 0, v.shape[0])
        m = m_ref[0].reshape(1, 1, v.shape[-1])
        o_ref[:] = jnp.where((m & 1) != 0, r, v)

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x, mask)


def _writeout(o_ref, vec):
    """Write a (1, N)-ish result broadcast over a full (8, N) block (small
    reduction outputs SIGABRT this toolchain)."""
    o_ref[:] = jnp.broadcast_to(vec.reshape(1, -1), o_ref.shape)


def ladder_v3(crop, oy, ox, bits, nrep, win=45, wwp=48, i16=False):
    """Phase-B proxy, v3 layout: crop (Y, X, 128pts); per-lane offsets
    oy/ox (1, 1, 128) i32; masked ladder + 4-tap blend + two windowed
    reductions, repeated nrep times (pure-carry fori)."""
    y, xw, npts = crop.shape

    def kernel(oy_ref, ox_ref, c_ref, o_ref):
        oym = oy_ref[0].reshape(1, 1, npts)
        oxm = ox_ref[0].reshape(1, 1, npts)
        c = c_ref[:]

        def roll(v, t, axis):
            if i16:
                return lroll16(v, t, axis, v.shape[axis])
            return pltpu.roll(v, v.shape[axis] - t, axis)

        def body(i, acc):
            w = c
            for t in bits:
                w = jnp.where((oym & t) != 0, roll(w, t, 0), w)
            w = w[: win + 1]
            for t in bits:
                w = jnp.where((oxm & t) != 0, roll(w, t, 1), w)
            sub = w[:, : wwp + 1, :].astype(jnp.float32)
            ax = 0.25
            ay = 0.5
            jw = (
                sub[:win, :wwp] * ((1 - ax) * (1 - ay))
                + sub[:win, 1 : wwp + 1] * (ax * (1 - ay))
                + sub[1 : win + 1, :wwp] * ((1 - ax) * ay)
                + sub[1 : win + 1, 1 : wwp + 1] * (ax * ay)
            )
            b1 = jnp.sum(jw, axis=(0, 1)).reshape(1, 1, npts)
            b2 = jnp.sum(jw * jw, axis=(0, 1)).reshape(1, 1, npts)
            return acc + (b1 + b2) * (1e-30 * (i + 1))

        acc = lax.fori_loop(
            0, nrep, body, jnp.zeros((1, 1, npts), jnp.float32)
        )
        _writeout(o_ref, acc)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, npts), jnp.float32),
    )(oy, ox, crop)


def ladder_v2(crop, oy, ox, bits, nrep, win=45):
    """Phase-B proxy, v2 layout: crop (B, Y, 128lanes) f32, window cols
    [0, win+1) of the lane axis; per-point offsets (B, 1)."""
    b, y, xl = crop.shape

    def kernel(oy_ref, ox_ref, c_ref, o_ref):
        oym = oy_ref[:].reshape(b, 1, 1).astype(jnp.int32)
        oxm = ox_ref[:].reshape(b, 1, 1).astype(jnp.int32)
        c = c_ref[:]

        def body(i, acc):
            w = c
            for t in bits:
                w = jnp.where((oym & t) != 0, pltpu.roll(w, y - t, 1), w)
            w = w[:, : win + 1, :]
            for t in bits:
                w = jnp.where((oxm & t) != 0, pltpu.roll(w, xl - t, 2), w)
            sub = w[:, :, : win + 1]
            ax = 0.25
            ay = 0.5
            jw = (
                sub[:, :win, :win] * ((1 - ax) * (1 - ay))
                + sub[:, :win, 1 : win + 1] * (ax * (1 - ay))
                + sub[:, 1 : win + 1, :win] * ((1 - ax) * ay)
                + sub[:, 1 : win + 1, 1 : win + 1] * (ax * ay)
            )
            b1 = jnp.sum(jw, axis=(1, 2)).reshape(b, 1, 1)
            b2 = jnp.sum(jw * jw, axis=(1, 2)).reshape(b, 1, 1)
            return acc + (b1 + b2) * (1e-30 * (i + 1))

        acc = lax.fori_loop(0, nrep, body, jnp.zeros((b, 1, 1), jnp.float32))
        _writeout(o_ref, acc.reshape(1, b))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, b), jnp.float32),
    )(oy, ox, crop)


def main():
    rng = np.random.RandomState(0)
    log(f"device {jax.devices()[0]}")

    # -- correctness probes ------------------------------------------
    x16 = jnp.asarray(rng.randint(-300, 300, (16, 16, 128)), jnp.int16)
    for t, axis in [(5, 0), (1, 1), (2, 1), (5, 1), (7, 1)]:
        _, out = bench(
            f"probe: i16 left-roll t={t} axis={axis} via bitcast",
            functools.partial(roll16_correct, t=t, axis=axis),
            x16,
        )
        if out is not None:
            ref = jnp.roll(x16, -t, axis)
            ok = bool(jnp.all(out == ref))
            log(f"   matches jnp.roll: {ok}")

    mask = jnp.asarray(rng.randint(0, 2, (1, 128)), jnp.int32)
    _, out = bench(
        "probe: per-lane where on i16 (bitcast roll)",
        lane_masked_roll16, x16, mask,
    )
    if out is not None:
        ref = jnp.where(
            (mask.reshape(1, 1, 128) & 1) != 0, jnp.roll(x16, -1, 0), x16
        )
        log(f"   correct: {bool(jnp.all(out == ref))}")

    # -- cost probes (per-iteration phase-B proxies) ------------------
    nrep = 64
    # v3: m_iter=7 -> crop 60x60 (x padded 64), 4-bit ladders
    crop3 = jnp.asarray(rng.uniform(0, 255, (60, 64, 128)), jnp.float32)
    oy3 = jnp.asarray(rng.randint(0, 15, (1, 128)), jnp.int32)
    ox3 = jnp.asarray(rng.randint(0, 15, (1, 128)), jnp.int32)
    for i16 in (False, True):
        ms, _ = bench(
            f"v3 {'i16' if i16 else 'f32'} iter proxy (60,64,128pts) x{nrep}",
            functools.partial(ladder_v3, bits=(8, 4, 2, 1), nrep=nrep, i16=i16),
            crop3.astype(jnp.int16) if i16 else crop3, oy3, ox3,
        )
        if ms:
            log(f"   -> {ms / nrep / 128 * 1e3:.2f} us/pt/iter")

    # v2 shape: block 32 pts, crop (32, 70, 128), 5-bit ladders (m_iter=12)
    crop2 = jnp.asarray(rng.uniform(0, 255, (32, 70, 128)), jnp.float32)
    oy2 = jnp.asarray(rng.randint(0, 25, (32, 1)), jnp.int32)
    ox2 = jnp.asarray(rng.randint(0, 25, (32, 1)), jnp.int32)
    ms, _ = bench(
        f"v2 f32 iter proxy (32pts,70,128) 5+5 bits x{nrep}",
        functools.partial(ladder_v2, bits=(16, 8, 4, 2, 1), nrep=nrep),
        crop2, oy2, ox2,
    )
    if ms:
        log(f"   -> {ms / nrep / 32 * 1e3:.2f} us/pt/iter")

    # top-level proxies: m=32 -> crop (110, 112, .), 6-bit ladders
    for lanes in (128, 64):
        cropt = jnp.asarray(
            rng.uniform(0, 255, (110, 112, lanes)), jnp.float32
        )
        oyt = jnp.asarray(rng.randint(0, 63, (1, lanes)), jnp.int32)
        oxt = jnp.asarray(rng.randint(0, 63, (1, lanes)), jnp.int32)
        for i16 in (False, True):
            ms, _ = bench(
                f"v3 {'i16' if i16 else 'f32'} TOP proxy (110,112,{lanes}) x{nrep}",
                functools.partial(
                    ladder_v3, bits=(32, 16, 8, 4, 2, 1), nrep=nrep, i16=i16
                ),
                cropt.astype(jnp.int16) if i16 else cropt, oyt, oxt,
            )
            if ms:
                log(f"   -> {ms / nrep / lanes * 1e3:.2f} us/pt/iter")


if __name__ == "__main__":
    main()
