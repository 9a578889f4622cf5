"""Dense Farneback flow — the reference's `calculate_optical_flow`
(DenseOF.py:127-157) as a batch-first jittable op."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import FarnebackParams
from ..ops.farneback import farneback, farneback_prepared, prepare_frame


def farneback_flow_video(
    frames: jnp.ndarray,
    params: FarnebackParams = FarnebackParams(),
) -> jnp.ndarray:
    """(T, H, W) grayscale clip -> (T-1, H, W, 2) flow per consecutive
    pair, as one lax.scan that carries each frame's prepared polynomial
    pyramid forward — every frame is expanded ONCE instead of twice
    (it is the `nxt` of pair t-1 and the `prev` of pair t). Matches
    per-pair farneback() exactly for the coefficient warp modes."""
    first = prepare_frame(frames[0], params)

    def step(rs_prev, frame):
        rs_cur = prepare_frame(frame, params)
        return rs_cur, farneback_prepared(rs_prev, rs_cur, params)

    _, flows = jax.lax.scan(step, first, frames[1:])
    return flows


def farneback_flow(
    prev_gray: jnp.ndarray,
    gray: jnp.ndarray,
    params: FarnebackParams = FarnebackParams(),
) -> jnp.ndarray:
    """(…, H, W) grayscale pair -> (…, H, W, 2) dense flow.

    Leading batch dims are vmapped (one stream per batch row — the
    stream-DP axis in parallel/streams.py)."""
    if prev_gray.ndim == 2:
        return farneback(prev_gray, gray, params)
    fn = lambda a, b: farneback(a, b, params)
    for _ in range(prev_gray.ndim - 2):
        fn = jax.vmap(fn)
    return fn(prev_gray, gray)
