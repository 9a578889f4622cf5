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

Throughput shape (round 4): at the default config (unit-step window
init) the WHOLE per-window solve — per-pair RANSAC (vmapped over the
window's keyframe pairs), chain composition (lax.scan), triangulation,
reprojection gating, and Schur BA — is one jitted function, and
`ego_motion_track` stacks every same-shape window of a clip and solves
them all in ONE dispatch (`lax.map`). The round-3 formulation host-
looped an eager RANSAC + BA per window and ran at 1.16 fps
(VERDICT r3 weak #2); the batched form runs the same ~34-window clip
two orders of magnitude faster (BASELINE.md round 4). The legacy eager
loop remains for scale_votes=True (sequential dependence through the
growing triangulated map).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import TrackerParams
from ..flow.tracker import (
    TrackerState,
    _heads,
    init_tracker,
    track_step,
    track_video,
)
from .ba import BAState, bundle_adjust, rodrigues, so3_log
from .pose import estimate_relative_pose


def _geometry_device():
    """Context manager: run the small geometry solves (pose RANSAC,
    Schur BA — tens of poses, hundreds of landmarks) on the HOST CPU
    backend when the default device is a remote accelerator. Eager op
    dispatch over the axon relay costs ~145 ms/op vs ~1 ms on local CPU
    (measured 2026-08-20); these stages are latency-bound, tiny, and
    host-side by design — only the tracker runs on the accelerator."""
    import contextlib

    if jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:  # no CPU backend registered — stay on default
        return contextlib.nullcontext()


@functools.lru_cache(maxsize=8)
def _jit_bundle_adjust(iters: int, huber_delta: float | None):
    """Jitted bundle_adjust keyed on its static config: eager dispatch
    retraced the whole Schur/scan graph per window (~2.2 s each on this
    host; the jitted call runs ~0.1 s after one compile per shape)."""
    return jax.jit(
        lambda st, lam: bundle_adjust(
            st, iters=iters, lam=lam, huber_delta=huber_delta
        )
    )


def _np_rodrigues(w: np.ndarray) -> np.ndarray:
    """Host-side Rodrigues (matches nav/ba.py rodrigues): the pose-graph
    stitcher composes a few hundred tiny rotations per clip — eager jnp
    dispatch made that a measurable serial cost (~1 ms/op host-side,
    ~145 ms/op over the relay)."""
    theta = float(np.sqrt(np.dot(w, w) + 1e-24))
    if theta < 1e-9:
        return np.eye(3)
    k = w / theta
    K = np.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    return np.eye(3) + np.sin(theta) * K + (1.0 - np.cos(theta)) * (K @ K)


def _np_so3_log(R: np.ndarray) -> np.ndarray:
    """Host-side inverse Rodrigues (matches nav/ba.py so3_log)."""
    c = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = np.arccos(c)
    axis_raw = np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    s = np.sin(theta)
    scale = 0.5 if abs(s) < 1e-7 else theta / (2.0 * max(s, 1e-12))
    return axis_raw * scale


@functools.lru_cache(maxsize=8)
def _jit_track_step(params: TrackerParams):
    return jax.jit(lambda s, a, b: track_step(s, a, b, params))


@functools.lru_cache(maxsize=8)
def _jit_track_video(params: TrackerParams):
    return jax.jit(lambda fr, s: track_video(fr, params, s))


#: fetch each chunk's history rows as ONE packed array instead of three
#: leaves: the relay charges a round trip per fetched leaf (the
#: pathfinder chunked pipeline's packed-fetch lesson, BASELINE.md r3).
#: Module toggle so benchmarks/probe_ego_u8.py can A/B in-process.
FETCH_PACKED = True


@functools.lru_cache(maxsize=8)
def _jit_track_video_packed(params: TrackerParams):
    def run(fr, s):
        s2, (hs, al, ln) = track_video(fr, params, s)
        # (F, T, 4) f32: [x, y, alive, length] — alive is 0/1 and
        # length <= trajectory_len (40), both exact in f32
        packed = jnp.concatenate(
            [
                hs,
                al.astype(jnp.float32)[..., None],
                ln.astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )
        return s2, packed

    return jax.jit(run)


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    #: keyframes per BA window. 4 measured best on the corpus sweep
    #: (benchmarks/sweep_odometry.py, round 3): small windows limit
    #: window-internal drift and the pose graph owns composition.
    window: int = 4
    #: frames between keyframes. None (default) -> ADAPTIVE selection
    #: (select_keyframes): the next keyframe is the first frame whose
    #: rotation-compensated median parallax vs the current keyframe
    #: clears the clip's own single-frame residual floor by kf_alpha,
    #: bounded to [kf_min_stride, kf_max_stride]. The round-3 fixed
    #: stride 3 starved the коридор clip of parallax signal (fast
    #: rotation + motion blur put its PER-STEP residual floor at ~5 px
    #: vs здания's ~1.3): BA lost to the keyframe-pair chain there at
    #: stride 3 but won at stride 5 (BASELINE.md r3/r4 ATE tables) —
    #: stride must follow the measured signal-to-floor ratio, not a
    #: constant.
    kf_stride: int | None = None
    #: adaptive selector: required ratio of candidate parallax to the
    #: single-frame residual floor (both rotation-compensated medians).
    kf_alpha: float = 2.5
    #: adaptive selector: absolute parallax floor (px) — guards the
    #: ratio rule when the clip's noise floor is tiny.
    kf_min_px: float = 2.0
    #: adaptive selector: minimum shared live tracks; candidates with
    #: fewer stop the stride extension (track survival bound).
    kf_min_tracks: int = 24
    kf_min_stride: int = 2
    kf_max_stride: int = 6
    #: keyframes shared between consecutive windows. 3 gives the
    #: pose-graph stitcher TWO shared steps per window pair to average
    #: scale and rotation over (2 was a single noisy vote — round-2
    #: VERDICT weak #3).
    overlap: int = 3
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
    #: (True) or the unit-step gauge (False, default — measured better
    #: against the unit-step-gauged oracle on both corpus clips,
    #: BASELINE.md round-2 ATE table; BA then owns relative scale
    #: refinement under its Huber loss).
    scale_votes: bool = False
    #: Huber robust-loss scale for BA, in PIXELS (converted to normalized
    #: coords via the camera focal). None -> plain SSE.
    huber_px: float | None = 2.0
    #: resolved normalized-coordinate Huber delta (set by
    #: ego_motion_track from huber_px; leave None to auto-resolve).
    huber_delta: float | None = None


class TrackTable(NamedTuple):
    pos: np.ndarray  # (F, T, 2) head positions per frame
    alive: np.ndarray  # (F, T) bool
    birth: np.ndarray  # (F, T) int32 — frame index the slot's track began


def collect_tracks(
    frames: np.ndarray,
    params: TrackerParams = TrackerParams(),
    chunk: int = 32,
) -> TrackTable:
    """Run the tracker over (F, H, W) frames; return per-frame state rows.

    Frames are tracked in device-resident chunks via flow/tracker.py
    track_video (one lax.scan per chunk) instead of one dispatch per
    frame — the round-2 path paid the ~30 ms relay floor every frame,
    capping the whole ego-motion pipeline at ~15 fps (VERDICT weak #4).
    Chunked and per-frame runs produce identical tables
    (tests/test_tracker.py).

    uint8 frames are staged AS uint8 and cast to f32 on device (exact;
    track_step/track_video cast internally): the f32 staging paid 4x
    the bytes into the relay's degraded post-compile H2D and was most
    of the tracking stage's wall time at 640x360 (benchmarks/
    probe_ego_u8.py — the batch runner's round-5 u8 lesson)."""
    state = init_tracker(params)
    stage = (
        frames
        if frames.dtype == np.uint8
        else np.asarray(frames, np.float32)
    )
    # module-level jit caches keyed on the (hashable, frozen) params:
    # defining fresh lambdas here would recompile BOTH graphs on every
    # collect_tracks call (~50 s on the relay — measured; the scan itself
    # runs 109 fps at 640x360 once cached)
    step = _jit_track_step(params)
    scan = (
        _jit_track_video_packed(params)
        if FETCH_PACKED
        else _jit_track_video(params)
    )
    f0 = jnp.asarray(stage[0])
    state = step(state, f0, f0)  # seed detections on frame 0
    pos = [np.asarray(_heads(state))]
    alive = [np.asarray(state.alive)]
    length = [np.asarray(state.length)]

    idx = 1
    while idx < len(frames):
        # chunk covers steps idx..idx+n-1; frames[idx-1] carries the pair
        n = min(chunk, len(frames) - idx)
        fr = jnp.asarray(stage[idx - 1 : idx + n])
        if FETCH_PACKED:
            state, packed = scan(fr, state)
            arr = np.asarray(packed)  # ONE fetch round trip per chunk
            pos.extend(arr[..., :2])
            alive.extend(arr[..., 2] > 0.5)
            length.extend(arr[..., 3].astype(np.int32))
        else:
            state, (hs, al, ln) = scan(fr, state)
            pos.extend(np.asarray(hs))
            alive.extend(np.asarray(al))
            length.extend(np.asarray(ln))
        idx += n
    fidx = np.arange(len(frames)).reshape(-1, 1)
    return TrackTable(
        pos=np.stack(pos),
        alive=np.stack(alive),
        birth=fidx - np.stack(length) + 1,
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


def _rotation_residual_px(p0, p1, ok, fx):
    """Median pixel residual after the best rotation-only alignment of
    the two frames' bearing vectors (Kabsch over the correspondence
    covariance). Pure camera rotation explains image motion exactly at
    any depth; the residual is translation-induced parallax — the
    quantity that conditions two-view translation estimation. Jittable;
    vmapped over candidate frames by select_keyframes."""
    ones = jnp.ones_like(p0[:, :1])
    b0 = jnp.concatenate([p0, ones], axis=-1)
    b1 = jnp.concatenate([p1, ones], axis=-1)
    b0 = b0 / jnp.linalg.norm(b0, axis=-1, keepdims=True)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    w = ok.astype(jnp.float32)
    H = jnp.einsum("n,ni,nj->ij", w, b1, b0)
    u, _, vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(u @ vt)
    R = u @ jnp.diag(jnp.array([1.0, 1.0, d])) @ vt
    rb = b0 @ R.T
    z = jnp.where(jnp.abs(rb[:, 2]) < 1e-6, 1e-6, rb[:, 2])
    proj = rb[:, :2] / z[:, None]
    err = jnp.linalg.norm(proj - p1, axis=-1) * fx
    err = jnp.where(ok, err, jnp.nan)
    return jnp.nanmedian(err)


@functools.lru_cache(maxsize=2)
def _jit_parallax_batch():
    return jax.jit(jax.vmap(_rotation_residual_px, in_axes=(None, 0, 0, None)))


@functools.lru_cache(maxsize=2)
def _jit_parallax_matrix():
    one = jax.vmap(_rotation_residual_px, in_axes=(None, 0, 0, None))
    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, None)))


def select_keyframes(table: TrackTable, cam, cfg: OdometryConfig) -> np.ndarray:
    """Adaptive keyframe selection (cfg.kf_stride is None).

    Greedy walk: from keyframe a, evaluate the rotation-compensated
    median parallax of frame a+1 (the clip's PER-STEP residual floor —
    track noise + motion blur; parallax at one 16 ms baseline is
    negligible) and of every candidate a+s, s in [kf_min_stride,
    kf_max_stride]. The next keyframe is the first candidate whose
    parallax clears max(kf_alpha * floor, kf_min_px) — i.e. the first
    baseline at which translation signal dominates the clip's own noise
    — bounded by track survival (kf_min_tracks shared live tracks).
    Fast-rotation clips (high floor) stretch the baseline; clean forward
    flight keeps keyframes dense.

    The parallax of EVERY (anchor, candidate) pair is precomputed in ONE
    vmapped dispatch and the greedy walk runs on the host matrix: the
    round-4 form dispatched once per chosen keyframe, and on the relay
    (~30-50 ms/dispatch) those ~35 round trips were ~2 s of the geometry
    stage's wall time (measured round 5, probe_ego_steady). The extra
    arithmetic (all anchors instead of ~1/3) is 3x3-Kabsch trivia."""
    f = len(table.pos)
    npos = np.asarray(cam.normalize(table.pos))
    lo, hi = cfg.kf_min_stride, cfg.kf_max_stride
    if f < 2 or lo > f - 1:
        return np.asarray([0])
    # anchor axis padded to a 64 bucket (duplicating the last anchor) so
    # the one-dispatch compile is shared across clip lengths — without
    # it every (clip length, track capacity) pair costs a fresh relay
    # compile, eating the round trips this batching saves
    n_a = f - 1
    a_pad = -(-n_a // 64) * 64
    anchors = np.minimum(np.arange(a_pad), n_a - 1)
    # column 0 = the a+1 noise floor; columns 1.. = candidates a+lo..a+hi
    # clipped to the last frame (clipped duplicates are sliced off per
    # anchor in the walk, exactly like the round-4 padding)
    cand_mat = np.concatenate(
        [
            anchors[:, None] + 1,
            np.minimum(
                anchors[:, None] + np.arange(lo, hi + 1)[None, :], f - 1
            ),
        ],
        axis=1,
    )  # (a_pad, K)
    # same physical track at both ends: alive at both, birth matches
    ok = (
        table.alive[anchors][:, None, :]
        & table.alive[cand_mat]
        & (table.birth[cand_mat] == table.birth[anchors][:, None, :])
    )  # (a_pad, K, T)
    res_all = np.asarray(
        _jit_parallax_matrix()(
            jnp.asarray(npos[anchors]),
            jnp.asarray(npos[cand_mat]),
            jnp.asarray(ok),
            jnp.float32(cam.fx),
        )
    )[:n_a]  # (f-1, K)
    n_shared_all = ok.sum(-1)[:n_a]

    kf = [0]
    while kf[-1] < f - 1:
        a = kf[-1]
        n_c = min(a + hi, f - 1) - (a + lo) + 1
        if n_c <= 0:
            break
        cand = np.arange(a + lo, a + lo + n_c)
        if n_c == 1:
            kf.append(int(cand[0]))
            continue
        floor = res_all[a, 0]
        res = res_all[a, 1 : 1 + n_c]
        n_shared = n_shared_all[a, 1 : 1 + n_c]
        thresh = max(
            cfg.kf_alpha * (floor if np.isfinite(floor) else 0.0),
            cfg.kf_min_px,
        )
        # candidates past the track-survival bound are ineligible (but
        # keep at least the first so the walk always advances)
        alivec = (n_shared >= cfg.kf_min_tracks) | (np.arange(n_c) == 0)
        eligible = np.nan_to_num(res, nan=np.inf) >= thresh
        hit = np.flatnonzero(eligible & alivec)
        if len(hit):
            pick = hit[0]
        else:
            pick = int(np.flatnonzero(alivec)[-1])  # furthest surviving
        kf.append(int(cand[pick]))
    return np.asarray(kf)


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


def _init_chain_core(
    obs: jnp.ndarray, mask: jnp.ndarray, thresh
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jittable unit-step essential chain: per-pair RANSAC vmapped over
    the window's M-1 keyframe pairs, composed by one lax.scan. This is
    the scale_votes=False init (the shipped default) with the round-3
    host loop's per-pair eager dispatch removed."""
    pair_ok = mask[:-1] & mask[1:]
    rp = jax.vmap(
        lambda a, b, v: estimate_relative_pose(a, b, v, inlier_thresh=thresh)
    )(obs[:-1], obs[1:], pair_ok)

    def step(carry, x):
        R_prev, t_prev = carry
        R_rel, t_rel = x
        R_k = R_rel @ R_prev
        t_k = R_rel @ t_prev + t_rel  # unit step scale (the window gauge)
        return (R_k, t_k), (R_k, t_k)

    _, (Rs, ts) = jax.lax.scan(
        step, (jnp.eye(3), jnp.zeros(3)), (rp.R, rp.t)
    )
    Rs = jnp.concatenate([jnp.eye(3)[None], Rs])
    tv = jnp.concatenate([jnp.zeros((1, 3)), ts])
    rv = jax.vmap(so3_log)(Rs)
    pts3 = triangulate(obs, mask, rv, tv)
    return rv, tv, pts3


@functools.lru_cache(maxsize=2)
def _jit_init_chain():
    return jax.jit(_init_chain_core)


def init_window_poses(
    obs: jnp.ndarray, mask: jnp.ndarray, cfg: OdometryConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Chained essential-matrix initialization with scale propagation.

    Pose 0 is identity; pose 1 gets unit translation (the window's scale
    gauge); with cfg.scale_votes each further step's translation scale
    comes from median closed-form votes of landmarks triangulated from
    the poses so far (eager host loop — sequentially dependent); without
    (the default) every step is unit scale and the whole init is one
    jitted call. Returns (rvecs (M, 3), tvecs (M, 3), points (L, 3))."""
    m = obs.shape[0]
    thresh = cfg.inlier_thresh if cfg.inlier_thresh is not None else 1e-5
    if not cfg.scale_votes:
        rv, tv, pts3 = _jit_init_chain()(
            jnp.asarray(obs), jnp.asarray(mask), jnp.float32(thresh)
        )
        return np.asarray(rv), np.asarray(tv), np.asarray(pts3)
    rvecs = [np.zeros(3, np.float32)]
    tvecs = [np.zeros(3, np.float32)]
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


def _window_solve(obs, mask, cfg: OdometryConfig):
    """Traceable whole-window solve: chain init -> reprojection gate ->
    Schur BA. cfg must have inlier_thresh resolved (or None -> 1e-5)."""
    thresh = cfg.inlier_thresh if cfg.inlier_thresh is not None else 1e-5
    rv0, tv0, pts3 = _init_chain_core(obs, mask, jnp.float32(thresh))
    ok = _reproj_mask(pts3, rv0, tv0, obs, mask, cfg)
    state = BAState(rvecs=rv0, tvecs=tv0, points=pts3, obs=obs, mask=ok)
    refined, stats = bundle_adjust(
        state, iters=cfg.ba_iters, lam=cfg.ba_lambda,
        huber_delta=cfg.huber_delta,
    )
    return (
        refined.rvecs, refined.tvecs, rv0, tv0,
        stats.initial_cost, stats.cost, stats.n_obs,
    )


@functools.lru_cache(maxsize=8)
def _jit_window_batch(cfg: OdometryConfig):
    """One compiled dispatch solving a (W, M, L, …) STACK of windows via
    lax.map (shared body compile regardless of the clip's window count).
    Keyed on the frozen config (all its fields are static here)."""

    def one(args):
        obs, mask = args
        return _window_solve(obs, mask, cfg)

    return jax.jit(lambda obs_b, mask_b: jax.lax.map(one, (obs_b, mask_b)))


def _window_stats(rv0, tv0, cost0, cost, n_obs) -> dict:
    return {
        "raw_rvecs": np.asarray(rv0),
        "raw_tvecs": np.asarray(tv0),
        "cost0": float(cost0),
        "cost": float(cost),
        "n_obs": int(n_obs),
    }


def window_ba(
    obs: np.ndarray,
    mask: np.ndarray,
    cfg: OdometryConfig,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """One window: init -> gate -> BA. Returns (rvecs, tvecs, stats)."""
    if not cfg.scale_votes:
        out = _jit_window_batch(cfg)(
            jnp.asarray(obs)[None], jnp.asarray(mask)[None]
        )
        rv, tv, rv0, tv0, c0, c, n = (np.asarray(x[0]) for x in out)
        return rv, tv, _window_stats(rv0, tv0, c0, c, n)
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
    refined, stats = _jit_bundle_adjust(cfg.ba_iters, cfg.huber_delta)(
        state, cfg.ba_lambda
    )
    return (
        np.asarray(refined.rvecs),
        np.asarray(refined.tvecs),
        _window_stats(rv, tv, stats.initial_cost, stats.cost, stats.n_obs),
    )


def _geodesic_mean(Rs: list[np.ndarray]) -> np.ndarray:
    """so(3) geodesic mean of a few nearby rotations (one Gauss iteration
    from the first — ample for stitch-overlap averaging)."""
    if len(Rs) == 1:
        return Rs[0]
    R0 = Rs[0]
    w = np.mean([_np_so3_log(R @ R0.T) for R in Rs], axis=0)
    return _np_rodrigues(w) @ R0


def stitch_pose_graph(
    windows: list[tuple[np.ndarray, np.ndarray]], starts: list[int]
) -> tuple[np.ndarray, np.ndarray]:
    """Cross-window pose-graph stitching (round-2 VERDICT weak #3: the
    greedy per-window similarity match used ONE shared step as its scale
    vote and the anchor keyframe alone for rotation).

    Each window (rvecs (M,3), tvecs (M,3) world->cam, own scale gauge)
    contributes, for every keyframe step k -> k+1 it covers, a relative
    rotation R_{k+1} R_k^T and a step vector expressed in keyframe k's
    CAMERA frame (frame-invariant across windows). The graph is solved
    in closed form, exploiting the chain topology:
      - window log-scales chain by the MEAN log step-length ratio over
        all shared steps (>= overlap-1 votes per window pair);
      - shared relative rotations average geodesically;
      - shared step vectors average after scale alignment;
      - the global chain composes the averaged steps.
    Returns (centers (K, 3), rotations (K, 3, 3) world->cam)."""
    nsteps = max(s + len(rv) for (rv, _), s in zip(windows, starts)) - 1
    rels: list[list] = [[] for _ in range(nsteps)]  # (R_rel, d_cam, widx)
    for widx, ((rv, tv), s) in enumerate(zip(windows, starts)):
        Rs = np.stack([_np_rodrigues(r) for r in rv])
        Cs = np.stack([-(R.T @ t) for R, t in zip(Rs, tv)])
        for j in range(len(rv) - 1):
            d_cam = Rs[j] @ (Cs[j + 1] - Cs[j])  # cam-j frame, window scale
            rels[s + j].append((Rs[j + 1] @ Rs[j].T, d_cam, widx))
    # chain window log-scales over shared steps
    logs = np.zeros(len(windows))
    for w in range(1, len(windows)):
        votes = []
        for k in range(nsteps):
            d_prev = [d for (_, d, i) in rels[k] if i == w - 1]
            d_cur = [d for (_, d, i) in rels[k] if i == w]
            if d_prev and d_cur:
                np_prev = np.linalg.norm(d_prev[0])
                np_cur = np.linalg.norm(d_cur[0])
                if np_prev > 1e-9 and np_cur > 1e-9:
                    votes.append(np.log(np_prev) - np.log(np_cur))
        logs[w] = logs[w - 1] + (np.mean(votes) if votes else 0.0)
    scales = np.exp(logs)
    # compose the averaged chain
    chain_R = [np.eye(3)]
    chain_C = [np.zeros(3)]
    for k in range(nsteps):
        if not rels[k]:
            break
        R_rel = _geodesic_mean([R for (R, _, _) in rels[k]])
        d = np.mean([scales[i] * d for (_, d, i) in rels[k]], axis=0)
        chain_C.append(chain_C[-1] + chain_R[-1].T @ d)
        chain_R.append(R_rel @ chain_R[-1])
    return np.stack(chain_C), np.stack(chain_R)


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
    if cfg.inlier_thresh is None or cfg.max_reproj is None or (
        cfg.huber_delta is None and cfg.huber_px is not None
    ):
        cfg = dataclasses.replace(
            cfg,
            inlier_thresh=cfg.inlier_thresh
            if cfg.inlier_thresh is not None
            else cam.sq_norm_thresh(1.0),
            max_reproj=cfg.max_reproj
            if cfg.max_reproj is not None
            else 3.0 / cam.fx,
            huber_delta=cfg.huber_delta
            if cfg.huber_delta is not None
            else (
                cfg.huber_px / cam.fx if cfg.huber_px is not None else None
            ),
        )
    if table is None:
        table = collect_tracks(frames, tracker_params)
    f = len(table.pos)
    if cfg.kf_stride is None:
        kf_idx = select_keyframes(table, cam, cfg)
    else:
        kf_idx = np.arange(0, f, cfg.kf_stride)
    if len(kf_idx) < 2:
        raise ValueError("clip too short for a keyframe window")
    m = cfg.window
    stride = max(m - cfg.overlap, 1)
    # assemble every window's observation table on host first ...
    entries: list = []  # (start, obs, mask)
    start = 0
    while start < len(kf_idx) - 1:
        idx = kf_idx[start : start + m]
        if len(idx) < 2:
            break
        pos, mask = build_window(table, idx, cfg)
        entries.append((start, np.asarray(cam.normalize(pos)), mask))
        start += stride
    wins_ba: dict = {}
    wins_raw: dict = {}
    stats_by_start: dict = {}
    with _geometry_device():
        if cfg.scale_votes:
            # sequential-dependence path: eager per-window host loop
            for st_i, obs, mask in entries:
                rv, tv, st = window_ba(obs, mask, cfg)
                wins_ba[st_i] = (rv, tv)
                wins_raw[st_i] = (st["raw_rvecs"], st["raw_tvecs"])
                stats_by_start[st_i] = st
        else:
            # group same-shape windows (the tail window can be short) and
            # solve each group in ONE compiled lax.map dispatch
            groups: dict[int, list] = {}
            for e in entries:
                groups.setdefault(e[1].shape[0], []).append(e)
            solve = _jit_window_batch(cfg)
            for ents in groups.values():
                obs_b = jnp.asarray(np.stack([e[1] for e in ents]))
                mask_b = jnp.asarray(np.stack([e[2] for e in ents]))
                out = [np.asarray(x) for x in solve(obs_b, mask_b)]
                for i, (st_i, _, _) in enumerate(ents):
                    rv, tv, rv0, tv0, c0, c, n = (x[i] for x in out)
                    wins_ba[st_i] = (rv, tv)
                    wins_raw[st_i] = (rv0, tv0)
                    stats_by_start[st_i] = _window_stats(rv0, tv0, c0, c, n)
        starts = sorted(wins_ba)
        stats = [stats_by_start[s] for s in starts]
        chain_C, chain_R = stitch_pose_graph(
            [wins_ba[s] for s in starts], starts
        )
        raw_C, _ = stitch_pose_graph([wins_raw[s] for s in starts], starts)
    k = len(chain_C)
    return EgoMotionResult(
        kf_idx=kf_idx[:k],
        centers=chain_C,
        rotations=chain_R,
        raw_centers=raw_C[:k],
        stats=stats,
    )
