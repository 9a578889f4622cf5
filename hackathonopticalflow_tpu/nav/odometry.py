"""Ego-motion odometry: tracker -> keyframe windows -> triangulation ->
windowed bundle adjustment -> pose chain.

This is the glue the north star requires between the trajectory tracker
(flow/tracker.py, the SparseOF.py:22-92 re-design — SURVEY.md §3.3:
"trajectories are exactly the correspondences a windowed BA consumes")
and the Schur-reduced BA solver (nav/ba.py):

1. `collect_tracks` scans the tracker over a clip, recording per-frame
   head positions, liveness, and each slot's BIRTH frame (slot reuse
   would otherwise alias two different physical tracks).
2. `build_window` assembles the dense (M, L, 2) observation table for a
   keyframe window, masking inconsistent/short tracks.
3. `init_window_poses` chains per-pair essential-matrix poses
   (nav/pose.py RANSAC) with monocular scale propagated by closed-form
   per-landmark scale votes against the already-triangulated map.
4. `triangulate` DLT-initializes landmarks from all masked observations.
5. `window_ba` refines with Levenberg-damped Schur BA (nav/ba.py).
6. `ego_motion_track` runs sliding windows (2-keyframe overlap), stitches
   scales via the shared step, and returns the global keyframe pose
   chain — both the raw essential chain and the BA-refined one, so
   benchmarks/bench_ate.py can report the refinement delta.

The per-window math is jittable; the window loop is a host loop (few
windows per clip).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import TrackerParams
from ..flow.tracker import TrackerState, _heads, init_tracker, track_step
from .ba import BAState, bundle_adjust, rodrigues, so3_log
from .pose import estimate_relative_pose


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    window: int = 6  # keyframes per BA window
    kf_stride: int = 3  # frames between keyframes
    overlap: int = 2  # keyframes shared between consecutive windows
    ba_iters: int = 12
    ba_lambda: float = 1e-4
    min_track_obs: int = 2  # min keyframe observations to keep a track
    min_depth: float = 1e-3  # cheirality floor for triangulated depths
    #: RANSAC inlier gate in SQUARED NORMALIZED coords. None -> computed
    #: by ego_motion_track as cam.sq_norm_thresh(1.0) (1 px at the clip's
    #: focal length — cv2.findEssentialMat's default threshold unit).
    inlier_thresh: float | None = None
    #: pre-BA reprojection gate in normalized coords. None -> 3 px at the
    #: camera's focal length.
    max_reproj: float | None = None
    #: window-init translation scales: closed-form landmark votes
    #: (True) or the unit-step gauge (False — matches the per-pair chain
    #: convention; BA then owns relative scale refinement).
    scale_votes: bool = True


class TrackTable(NamedTuple):
    pos: np.ndarray  # (F, T, 2) head positions per frame
    alive: np.ndarray  # (F, T) bool
    birth: np.ndarray  # (F, T) int32 — frame index the slot's track began


def collect_tracks(
    frames: np.ndarray, params: TrackerParams = TrackerParams()
) -> TrackTable:
    """Run the tracker over (F, H, W) frames; return per-frame state rows."""
    state = init_tracker(params)
    step = jax.jit(lambda s, a, b: track_step(s, a, b, params))
    f0 = jnp.asarray(frames[0], jnp.float32)
    state = step(state, f0, f0)  # seed detections on frame 0
    pos, alive, birth = [], [], []

    def snap(state: TrackerState, fidx: int):
        pos.append(np.asarray(_heads(state)))
        alive.append(np.asarray(state.alive))
        birth.append(fidx - np.asarray(state.length) + 1)

    snap(state, 0)
    for idx in range(1, len(frames)):
        state = step(
            state,
            jnp.asarray(frames[idx - 1], jnp.float32),
            jnp.asarray(frames[idx], jnp.float32),
        )
        snap(state, idx)
    return TrackTable(
        pos=np.stack(pos), alive=np.stack(alive), birth=np.stack(birth)
    )


def build_window(
    table: TrackTable, kf_idx: np.ndarray, cfg: OdometryConfig
) -> tuple[np.ndarray, np.ndarray]:
    """Dense observation table for keyframes kf_idx: (M, L, 2) positions +
    (M, L) mask. A slot contributes only where it is alive AND hosts the
    same physical track as at the window's last keyframe (births equal)."""
    m = len(kf_idx)
    pos = table.pos[kf_idx]  # (M, T, 2)
    alive = table.alive[kf_idx]
    birth = table.birth[kf_idx]
    ref_birth = birth[-1]  # (T,)
    mask = alive & (birth == ref_birth[None, :])
    keep = mask.sum(0) >= max(cfg.min_track_obs, 2)
    mask = mask & keep[None, :]
    return pos, mask


def _pose_mats(rvecs: jnp.ndarray, tvecs: jnp.ndarray) -> jnp.ndarray:
    Rs = jax.vmap(rodrigues)(rvecs)
    return jnp.concatenate([Rs, tvecs[..., None]], axis=-1)  # (M, 3, 4)


def triangulate(
    obs: jnp.ndarray, mask: jnp.ndarray, rvecs: jnp.ndarray, tvecs: jnp.ndarray
) -> jnp.ndarray:
    """Batched DLT: landmark l minimizes ||A_l X||, A_l stacked from
    masked rows u*P[2]-P[0], v*P[2]-P[1] over keyframes. Solved via the
    smallest eigenvector of the (4, 4) normal matrix (vmapped eigh)."""
    P = _pose_mats(rvecs, tvecs)  # (M, 3, 4)
    u = obs[..., 0]
    v = obs[..., 1]
    r0 = u[..., None] * P[:, None, 2, :] - P[:, None, 0, :]  # (M, L, 4)
    r1 = v[..., None] * P[:, None, 2, :] - P[:, None, 1, :]
    w = mask.astype(obs.dtype)[..., None]
    A = jnp.concatenate([r0 * w, r1 * w], axis=0)  # (2M, L, 4)
    M4 = jnp.einsum("mli,mlj->lij", A, A)  # (L, 4, 4)
    _, vecs = jnp.linalg.eigh(M4)
    X = vecs[..., 0]  # smallest eigenvalue's eigenvector
    wcomp = X[..., 3]
    wsafe = jnp.where(jnp.abs(wcomp) < 1e-9, 1e-9, wcomp)
    return X[..., :3] / wsafe[..., None]


def _reproj_mask(
    points: jnp.ndarray,
    rvecs: jnp.ndarray,
    tvecs: jnp.ndarray,
    obs: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: OdometryConfig,
) -> jnp.ndarray:
    """Drop observations behind a camera or with gross reprojection error
    (normalized coords) before BA."""
    max_err = cfg.max_reproj if cfg.max_reproj is not None else 5e-2
    Rs = jax.vmap(rodrigues)(rvecs)
    pc = jnp.einsum("mij,lj->mli", Rs, points) + tvecs[:, None, :]
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = pc[..., :2] / zs[..., None]
    err = jnp.linalg.norm(proj - obs, axis=-1)
    ok = mask & (z > cfg.min_depth) & (err < max_err)
    # a landmark needs >= 2 surviving views
    ok = ok & (jnp.sum(ok, axis=0) >= 2)[None, :]
    return ok


def _scale_votes(a: jnp.ndarray, bdir: jnp.ndarray, uv: jnp.ndarray, ok):
    """Per-landmark closed-form scale s solving u = (a_x + s b_x)/(a_z + s b_z):
    returns median over valid votes (both image axes)."""
    u = uv[..., 0]
    v = uv[..., 1]
    num_u = u * a[..., 2] - a[..., 0]
    den_u = bdir[0] - u * bdir[2]
    num_v = v * a[..., 2] - a[..., 1]
    den_v = bdir[1] - v * bdir[2]
    s_u = num_u / jnp.where(jnp.abs(den_u) < 1e-9, 1e-9, den_u)
    s_v = num_v / jnp.where(jnp.abs(den_v) < 1e-9, 1e-9, den_v)
    votes = jnp.concatenate([s_u, s_v])
    vok = jnp.concatenate([ok & (jnp.abs(den_u) > 1e-6), ok & (jnp.abs(den_v) > 1e-6)])
    votes = jnp.where(vok, votes, jnp.nan)
    return jnp.nanmedian(votes)


def init_window_poses(
    obs: jnp.ndarray, mask: jnp.ndarray, cfg: OdometryConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Chained essential-matrix initialization with scale propagation.

    Pose 0 is identity; pose 1 gets unit translation (the window's scale
    gauge); each further step's translation scale comes from median
    closed-form votes of landmarks triangulated from the poses so far.
    Returns (rvecs (M, 3), tvecs (M, 3), points (L, 3)) as numpy."""
    m = obs.shape[0]
    rvecs = [np.zeros(3, np.float32)]
    tvecs = [np.zeros(3, np.float32)]
    thresh = cfg.inlier_thresh if cfg.inlier_thresh is not None else 1e-5
    for k in range(1, m):
        pair_ok = mask[k - 1] & mask[k]
        rp = estimate_relative_pose(
            jnp.asarray(obs[k - 1]),
            jnp.asarray(obs[k]),
            jnp.asarray(pair_ok),
            inlier_thresh=thresh,
        )
        R_rel = np.asarray(rp.R)
        t_rel = np.asarray(rp.t)
        R_prev = np.asarray(rodrigues(jnp.asarray(rvecs[-1])))
        R_k = R_rel @ R_prev
        t_base = R_rel @ tvecs[-1]
        if k == 1 or not cfg.scale_votes:
            s = 1.0
        else:
            rv = jnp.asarray(np.stack(rvecs))
            tv = jnp.asarray(np.stack(tvecs))
            pts3 = triangulate(
                jnp.asarray(obs[:k]), jnp.asarray(mask[:k]), rv, tv
            )
            # votes from landmarks seen both before k and at k
            seen = (np.asarray(mask[:k]).sum(0) >= 2) & mask[k]
            a = jnp.einsum("ij,lj->li", jnp.asarray(R_k), pts3) + jnp.asarray(
                t_base
            )
            s = float(
                _scale_votes(a, jnp.asarray(t_rel), jnp.asarray(obs[k]), jnp.asarray(seen))
            )
            if not np.isfinite(s) or s <= 1e-6:
                s = 1.0
        t_k = t_base + s * t_rel
        rvecs.append(np.asarray(so3_log(jnp.asarray(R_k)), np.float32))
        tvecs.append(t_k.astype(np.float32))
    rv = np.stack(rvecs)
    tv = np.stack(tvecs)
    pts3 = np.asarray(
        triangulate(jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(rv), jnp.asarray(tv))
    )
    return rv, tv, pts3


def window_ba(
    obs: np.ndarray,
    mask: np.ndarray,
    cfg: OdometryConfig,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """One window: init -> gate -> BA. Returns (rvecs, tvecs, stats)."""
    rv, tv, pts3 = init_window_poses(obs, mask, cfg)
    ok = np.asarray(
        _reproj_mask(
            jnp.asarray(pts3), jnp.asarray(rv), jnp.asarray(tv),
            jnp.asarray(obs), jnp.asarray(mask), cfg,
        )
    )
    state = BAState(
        rvecs=jnp.asarray(rv),
        tvecs=jnp.asarray(tv),
        points=jnp.asarray(pts3),
        obs=jnp.asarray(obs),
        mask=jnp.asarray(ok),
    )
    refined, stats = bundle_adjust(state, iters=cfg.ba_iters, lam=cfg.ba_lambda)
    return (
        np.asarray(refined.rvecs),
        np.asarray(refined.tvecs),
        {
            "raw_rvecs": rv,
            "raw_tvecs": tv,
            "cost0": float(stats.initial_cost),
            "cost": float(stats.cost),
            "n_obs": int(stats.n_obs),
        },
    )


def _compose_chain(
    chain_R: list, chain_C: list, rvecs: np.ndarray, tvecs: np.ndarray, start: int
):
    """Append window poses (world->cam, window frame) to the global chain
    of camera centers, aligning at the window's first keyframe and scale-
    matching on the first window step shared with the chain."""
    Rs = np.stack([np.asarray(rodrigues(jnp.asarray(r))) for r in rvecs])
    Cs = np.stack([-(R.T @ t) for R, t in zip(Rs, tvecs)])  # window coords
    # window -> global similarity from the anchor keyframe (start)
    R_anchor_g = chain_R[start]
    C_anchor_g = chain_C[start]
    # scale: median ratio over ALL steps already on the chain (the
    # overlap region) — one shared step is a single noisy vote
    ratios = []
    for k in range(1, len(Cs)):
        if start + k >= len(chain_C):
            break
        g_step = np.linalg.norm(chain_C[start + k] - chain_C[start + k - 1])
        w_step = np.linalg.norm(Cs[k] - Cs[k - 1])
        if w_step > 1e-9 and g_step > 1e-9:
            ratios.append(g_step / w_step)
    s = float(np.median(ratios)) if ratios else 1.0
    # world(window) -> world(global): x_g = R_g x_w + c where R_g maps
    # window-anchor orientation onto the chain's
    # world(global)->world(window) rotation R_gw = R_w0^T R_anchor_g from
    # the anchor camera being the same physical camera; centers map by its
    # transpose R_map = R_gw^T and rotations by R_gw on the right.
    R_map = R_anchor_g.T @ Rs[0]
    for k in range(len(Rs)):
        C_g = C_anchor_g + s * (R_map @ (Cs[k] - Cs[0]))
        R_g = Rs[k] @ R_map.T
        if start + k < len(chain_C):
            chain_C[start + k] = C_g
            chain_R[start + k] = R_g
        else:
            chain_C.append(C_g)
            chain_R.append(R_g)


class EgoMotionResult(NamedTuple):
    kf_idx: np.ndarray  # (K,) frame indices of keyframes
    centers: np.ndarray  # (K, 3) BA-refined camera centers (global chain)
    rotations: np.ndarray  # (K, 3, 3) world->cam
    raw_centers: np.ndarray  # (K, 3) raw essential-chain centers
    stats: list  # per-window dicts


def ego_motion_track(
    frames: np.ndarray,
    tracker_params: TrackerParams,
    cam,
    cfg: OdometryConfig = OdometryConfig(),
    table: TrackTable | None = None,
) -> EgoMotionResult:
    """Full integrated ego-motion estimation over a clip (H, W) frames.

    cam: nav.camera.Pinhole (normalizes pixel observations). Pass a
    precomputed `table` (collect_tracks) to rerun the geometry under a
    different OdometryConfig without re-tracking."""
    if cfg.inlier_thresh is None or cfg.max_reproj is None:
        cfg = dataclasses.replace(
            cfg,
            inlier_thresh=cfg.inlier_thresh
            if cfg.inlier_thresh is not None
            else cam.sq_norm_thresh(1.0),
            max_reproj=cfg.max_reproj
            if cfg.max_reproj is not None
            else 3.0 / cam.fx,
        )
    if table is None:
        table = collect_tracks(frames, tracker_params)
    f = len(frames)
    kf_idx = np.arange(0, f, cfg.kf_stride)
    if len(kf_idx) < 2:
        raise ValueError("clip too short for a keyframe window")
    m = cfg.window
    stride = m - cfg.overlap
    chain_R: list = [np.eye(3)]
    chain_C: list = [np.zeros(3)]
    raw_R: list = [np.eye(3)]
    raw_C: list = [np.zeros(3)]
    stats = []
    start = 0
    while start < len(kf_idx) - 1:
        idx = kf_idx[start : start + m]
        if len(idx) < 2:
            break
        pos, mask = build_window(table, idx, cfg)
        obs = np.asarray(cam.normalize(jnp.asarray(pos)))
        rv, tv, st = window_ba(obs, mask, cfg)
        _compose_chain(chain_R, chain_C, rv, tv, start)
        _compose_chain(raw_R, raw_C, st["raw_rvecs"], st["raw_tvecs"], start)
        stats.append(st)
        start += stride
    k = len(chain_C)
    return EgoMotionResult(
        kf_idx=kf_idx[:k],
        centers=np.stack(chain_C),
        rotations=np.stack(chain_R),
        raw_centers=np.stack(raw_C),
        stats=stats,
    )
