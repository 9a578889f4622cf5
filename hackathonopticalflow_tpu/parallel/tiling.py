"""Spatially tiled dense flow over a device mesh (SURVEY.md §5.7a).

Design: **recompute-in-halo**. Each device owns a contiguous row block of
the frame; one ppermute round per frame extends every block with `halo`
rows from its neighbors, after which the full Farneback pyramid runs
independently per device on the extended slab — zero communication inside
the iteration loops (the collectives ride ICI once, the MXU/VPU never
wait). The core rows of each slab are exact as long as `halo` covers the
algorithm's receptive field:

    RF ~= sum over levels of (smooth_ksize/2 + poly_n + win/2) / scale
          + max vertical displacement per level

With the reference config (4 layers at 1080p), halo=96 covers flows up to
~30 px; raise it for wilder motion. Rows within `halo` of the true frame
top/bottom differ slightly from the single-device result (the per-slab
border handling and OpenCV's 5-px border down-weighting band anchor to
slab edges there); everywhere else the match is bitwise-exact — asserted
by tests/test_parallel.py on an 8-device CPU mesh.

Halo alignment: tile heights and halo must be even so each slab's pyramid
resampling grid coincides with the global one (INTER_LINEAR half-pixel
centers shift otherwise).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.config import FarnebackParams
from ..ops.farneback import farneback
from .halo import halo_exchange_rows


def derive_halo(
    params: FarnebackParams = FarnebackParams(), max_displacement: float = 30.0
) -> int:
    """Halo rows needed for the recompute-in-halo scheme to reproduce the
    single-device flow in every core row, derived from the algorithm's
    receptive field at the COARSEST level (the finest-grained reads are
    the widest in full-resolution pixels):

        (win//2 + poly_n + 2) / s_min + max_displacement

    where s_min = pyr_scale^levels: one flow-smoothing window plus the
    polynomial-expansion taps at the coarsest level (where each level
    pixel spans 1/s_min full-res rows), plus the worst-case displaced
    coefficient read. Repeated iterations and cross-level seeding are
    NOT multiplied in: the box filters average (boundary error decays
    with distance rather than propagating at full strength), and the
    coarse flow seeds the finer level only within the bilinear resize
    neighborhood — validated by tests/test_parallel.py's 3-level
    large-frame tiled-vs-single check; the deliberately-too-small-halo
    test shows the failure signature when this is violated."""
    s_min = params.pyr_scale**params.levels
    rf = (params.win_size // 2 + params.poly_n + 2) / s_min + max_displacement
    return int(-(-rf // 2) * 2)  # round up to even (pyramid grid alignment)


@dataclasses.dataclass(frozen=True)
class TileConfig:
    axis: str = "tile"
    halo: int = 96

    @classmethod
    def for_params(
        cls,
        params: FarnebackParams = FarnebackParams(),
        max_displacement: float = 30.0,
        axis: str = "tile",
    ) -> "TileConfig":
        return cls(axis=axis, halo=derive_halo(params, max_displacement))


def tiled_farneback(
    prev: jnp.ndarray,
    nxt: jnp.ndarray,
    mesh: Mesh,
    params: FarnebackParams = FarnebackParams(),
    tile: TileConfig = TileConfig(),
) -> jnp.ndarray:
    """Dense flow over (H, W) frames row-sharded across mesh axis
    `tile.axis`. Returns (H, W, 2) with the same sharding.

    H must be divisible by the tile axis size; tile height and halo must
    be even (pyramid grid alignment).
    """
    n = mesh.shape[tile.axis]
    h = prev.shape[0]
    if h % n:
        raise ValueError(f"H={h} not divisible by {n} tiles")
    if (h // n) % 2 or tile.halo % 2:
        raise ValueError("tile height and halo must be even for pyramid alignment")

    def local(p, x):
        p_ext = halo_exchange_rows(p, tile.halo, tile.axis, mode="edge")
        x_ext = halo_exchange_rows(x, tile.halo, tile.axis, mode="edge")
        flow_ext = farneback(p_ext, x_ext, params)
        return flow_ext[tile.halo : -tile.halo]

    spec = P(tile.axis, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=P(tile.axis, None, None),
    )(prev, nxt)


def tiled_farneback_multi(
    prev: jnp.ndarray,
    nxt: jnp.ndarray,
    mesh: Mesh,
    params: FarnebackParams = FarnebackParams(),
    tile: TileConfig = TileConfig(),
    stream_axis: str = "stream",
) -> jnp.ndarray:
    """Stream-batched + row-tiled dense flow: (B, H, W) frames sharded
    (stream, tile) over a 2-D mesh — the single-host multi-stream
    configuration (BASELINE.json config 4)."""
    n = mesh.shape[tile.axis]
    h = prev.shape[1]
    if h % n:
        raise ValueError(f"H={h} not divisible by {n} tiles")

    def local(p, x):
        # p, x: (B_local, H_tile, W)
        def one(pp, xx):
            p_ext = halo_exchange_rows(pp, tile.halo, tile.axis, mode="edge")
            x_ext = halo_exchange_rows(xx, tile.halo, tile.axis, mode="edge")
            return farneback(p_ext, x_ext, params)[tile.halo : -tile.halo]

        return jax.vmap(one)(p, x)

    spec = P(stream_axis, tile.axis, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=P(stream_axis, tile.axis, None, None),
    )(prev, nxt)
