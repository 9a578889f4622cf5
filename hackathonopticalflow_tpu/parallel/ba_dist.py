"""Distributed windowed bundle adjustment (BASELINE.json config 5;
SURVEY.md §5.7b).

Landmarks are embarrassingly parallel in the Schur-reduced normal
equations: each device holds a shard of the landmark axis (its points,
observation columns, and mask), computes its partial camera Hessian B,
gradient v, and Schur products E C^-1 E^T / E C^-1 w, and a psum over the
mesh axis assembles the reduced (6M x 6M) camera system — which every
device then solves redundantly (M is a small keyframe window) before
back-substituting its own landmarks locally. Communication per iteration:
one psum of O(M^2) 6x6 blocks — independent of landmark count.

Equality with the single-device solver is asserted on the 8-virtual-
device CPU mesh in tests/test_pose_ba.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..nav.ba import BAState, BAStats, bundle_adjust


def distributed_bundle_adjust(
    state: BAState,
    mesh: Mesh,
    axis_name: str = "tile",
    iters: int = 10,
    lam: float = 1e-4,
    fix_scale: bool = True,
) -> tuple[BAState, BAStats]:
    """Run windowed BA with the landmark axis sharded over `axis_name`.

    The landmark count must be divisible by the mesh axis size (pad with
    masked-out landmarks if needed). Poses are replicated; landmark data
    is sharded; the reduced camera system is psum-assembled.
    """
    n = mesh.shape[axis_name]
    l = state.points.shape[0]
    if l % n:
        raise ValueError(f"landmark count {l} not divisible by {n} devices")

    def local(rvecs, tvecs, points, obs, mask):
        st = BAState(rvecs=rvecs, tvecs=tvecs, points=points, obs=obs, mask=mask)
        out, stats = bundle_adjust(
            st,
            iters=iters,
            lam=lam,
            fix_scale=fix_scale,
            preduce=lambda x: lax.psum(x, axis_name),
        )
        return out.rvecs, out.tvecs, out.points, stats.cost, stats.initial_cost, stats.n_obs

    rep = P()
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(rep, rep, P(axis_name, None), P(None, axis_name, None), P(None, axis_name)),
        out_specs=(rep, rep, P(axis_name, None), rep, rep, rep),
        check_vma=False,
    )
    rvecs, tvecs, points, cost, init_cost, n_obs = fn(
        state.rvecs, state.tvecs, state.points, state.obs, state.mask
    )
    return (
        state._replace(rvecs=rvecs, tvecs=tvecs, points=points),
        BAStats(cost=cost, initial_cost=init_cost, n_obs=n_obs),
    )
