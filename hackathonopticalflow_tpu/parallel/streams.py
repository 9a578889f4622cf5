"""Stream data-parallelism: a batch of independent video streams sharded
over the 'stream' mesh axis (SURVEY.md §2.4 DP row; BASELINE.json
config 4 — "all videos processed concurrently").

Per-stream state (the prev-frame carry) keeps the time axis sequential;
throughput scales with the number of streams. The per-frame compute is the
single-stream jitted function vmapped over the batch; jit + NamedSharding
puts each stream's work on its own devices with zero cross-stream
communication (the robust-statistics reductions are per-stream).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import FarnebackParams, FilterParams, LKParams, NormalizeParams
from ..flow.lk_grid import lk_grid_flow
from ..ops.farneback import farneback


def stream_batched_grid_flow(
    prev: jnp.ndarray,
    nxt: jnp.ndarray,
    pts: jnp.ndarray,
    mesh: Mesh,
    lk: LKParams = LKParams(),
    norm: NormalizeParams = NormalizeParams(),
    filt: FilterParams = FilterParams(),
    stream_axis: str = "stream",
):
    """(B, H, W) frame batch + shared (N, 2) grid -> batched GridFlowResult,
    with B sharded over the stream axis."""
    sharding = NamedSharding(mesh, P(stream_axis, None, None))
    prev = jax.lax.with_sharding_constraint(prev, sharding)
    nxt = jax.lax.with_sharding_constraint(nxt, sharding)
    fn = jax.vmap(partial(lk_grid_flow, lk=lk, norm=norm, filt=filt), in_axes=(0, 0, None))
    return fn(prev, nxt, pts)


def stream_batched_farneback(
    prev: jnp.ndarray,
    nxt: jnp.ndarray,
    mesh: Mesh,
    params: FarnebackParams = FarnebackParams(),
    stream_axis: str = "stream",
) -> jnp.ndarray:
    """(B, H, W) -> (B, H, W, 2) dense flow, B sharded over streams."""
    sharding = NamedSharding(mesh, P(stream_axis, None, None))
    prev = jax.lax.with_sharding_constraint(prev, sharding)
    nxt = jax.lax.with_sharding_constraint(nxt, sharding)
    return jax.vmap(lambda a, b: farneback(a, b, params))(prev, nxt)
