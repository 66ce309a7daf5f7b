"""TPU-native OC-SORT: observation-centric motion tracking.

The reference lists "Integration with other tracking algorithms (e.g.,
ByteTrack, OC-SORT)" as a future enhancement (reference README.md, Future
Enhancements). This module delivers OC-SORT (Cao et al., CVPR 2023,
arXiv:2203.14360) as a third tracker core in the same fixed-shape,
fully-jittable style as :mod:`.tracker` (DeepSORT) and :mod:`.bytetrack`:

- **SORT-parameterized Kalman filter.** 7-dim state (cx, cy, s=area,
  r=aspect, vcx, vcy, vs) with the classic SORT noise model (R aspect/area
  x10, huge initial velocity variance, damped process noise), Joseph-form
  updates, and the area-collapse guard (vs zeroed when s + vs <= 0).
- **OCM (observation-centric momentum).** The first association maximizes
  IoU *plus* a velocity-direction-consistency bonus: the angle between the
  track's stored velocity (direction between its two recent observations,
  ``delta_t`` apart) and the direction from its previous observation to
  each candidate detection, scaled by ``inertia`` and the detection score.
- **OCR (observation-centric recovery).** Detections and tracks left over
  from the first round re-associate by IoU against each track's *last
  observation box* (not the drifting Kalman prediction).
- **ORU (observation-centric re-update).** When a track is re-observed
  after ``g`` missed frames, the filter rolls back to the state frozen at
  its first miss and replays ``g`` virtual steps along the line segment
  (in center/width/height space) between the last and the current
  observation — the Kalman state never accumulates the unobserved drift.
- **Observation-centric outputs.** Emitted boxes are the matched
  detection (last observation), not the filtered state; emission requires
  ``hit_streak >= min_hits`` (except during the first ``min_hits`` frames).

Semantics mirror the official OCSort.update loop (including the
exact-adjacency shortcut that bypasses the Hungarian solve when the
IoU-above-threshold graph is already a partial matching, the strict
``score > det_thresh`` input gate, the double application of the real
measurement after an ORU replay, and the ``(pi/2 - |angle|) / pi`` bonus),
restated over padded arrays. Aspect ratios divide by ``max(h, 1e-6)``
instead of raising on degenerate boxes. Validated against an independent
NumPy oracle in ``tests/test_ocsort.py``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .assignment import min_cost_matching
from .costs import iou_matrix

_PRECISION = jax.lax.Precision.HIGHEST


# --- SORT Kalman filter (7-dim: cx, cy, s, r, vcx, vcy, vs) -------------------

def _f7() -> jnp.ndarray:
    f = jnp.eye(7, dtype=jnp.float32)
    return f.at[jnp.arange(3), jnp.arange(3) + 4].set(1.0)


def _h7() -> jnp.ndarray:
    return jnp.eye(4, 7, dtype=jnp.float32)


# NumPy (not jnp) on purpose: module-level jnp.asarray would initialize —
# and on this host, attach — the JAX backend at import time, before callers
# can force a platform (CLAUDE.md: the axon plugin overrides JAX_PLATFORMS).
# These become compile-time constants inside the jitted step either way.
_Q_DIAG = np.asarray([1, 1, 1, 1, 0.01, 0.01, 0.0001], np.float32)
_R_DIAG = np.asarray([1, 1, 10, 10], np.float32)
_P0_DIAG = np.asarray([10, 10, 10, 10, 1e4, 1e4, 1e4], np.float32)


def kf_initiate(z: jnp.ndarray):
    """(..., 4) measurement (cx, cy, s, r) -> mean (..., 7), cov (..., 7, 7)."""
    z = z.astype(jnp.float32)
    mean = jnp.concatenate([z, jnp.zeros((*z.shape[:-1], 3), jnp.float32)],
                           axis=-1)
    cov = jnp.broadcast_to(jnp.diag(_P0_DIAG),
                           (*z.shape[:-1], 7, 7)).astype(jnp.float32)
    return mean, cov


def kf_predict(x: jnp.ndarray, p: jnp.ndarray):
    """Batched predict with the SORT area-collapse guard (vs -> 0 when the
    predicted area would be non-positive, official KalmanBoxTracker.predict)."""
    vs = jnp.where(x[..., 6] + x[..., 2] <= 0, 0.0, x[..., 6])
    x = x.at[..., 6].set(vs)
    f = _f7()
    new_x = jnp.einsum("ij,...j->...i", f, x, precision=_PRECISION)
    new_p = jnp.einsum("ij,...jk,lk->...il", f, p, f,
                       precision=_PRECISION) + jnp.diag(_Q_DIAG)
    return new_x, new_p


def kf_update(x: jnp.ndarray, p: jnp.ndarray, z: jnp.ndarray):
    """Batched Joseph-form update (filterpy's update, the official KF)."""
    h = _h7()
    hx = jnp.einsum("ij,...j->...i", h, x, precision=_PRECISION)
    ph_t = jnp.einsum("...ij,kj->...ik", p, h, precision=_PRECISION)  # (...,7,4)
    s = jnp.einsum("ij,...jk->...ik", h, ph_t,
                   precision=_PRECISION) + jnp.diag(_R_DIAG)
    # K = P Hᵀ S⁻¹: Kᵀ = S⁻¹ (P Hᵀ)ᵀ (S symmetric)
    k = jnp.swapaxes(
        jnp.linalg.solve(s, jnp.swapaxes(ph_t, -1, -2)), -1, -2)  # (...,7,4)
    new_x = x + jnp.einsum("...ij,...j->...i", k, z - hx,
                           precision=_PRECISION)
    i_kh = jnp.eye(7, dtype=jnp.float32) - jnp.einsum(
        "...ij,jk->...ik", k, h, precision=_PRECISION)
    new_p = jnp.einsum("...ij,...jk,...lk->...il", i_kh, p, i_kh,
                       precision=_PRECISION) + jnp.einsum(
        "...ij,j,...kj->...ik", k, _R_DIAG, k, precision=_PRECISION)
    return new_x, new_p


# --- box parameterizations -----------------------------------------------------

def xyxy_to_z(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> (cx, cy, s=area, r=aspect). h floored at 1e-6 for
    the aspect ratio (the official converter divides by raw h)."""
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    return jnp.stack([(b[..., 0] + b[..., 2]) / 2.0,
                      (b[..., 1] + b[..., 3]) / 2.0,
                      w * h, w / jnp.maximum(h, 1e-6)], axis=-1)


def x_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """KF state -> xyxy. Non-positive s*r yields NaN (the official converter
    takes the same sqrt); callers deactivate non-finite tracks like the
    official NaN-prediction removal (ocsort.py to_del)."""
    w = jnp.sqrt(x[..., 2] * x[..., 3])
    h = x[..., 2] / jnp.maximum(w, 1e-6)
    cx, cy = x[..., 0], x[..., 1]
    return jnp.stack([cx - w / 2.0, cy - h / 2.0,
                      cx + w / 2.0, cy + h / 2.0], axis=-1)


def _xyxy_to_tlwh(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([b[..., :2], b[..., 2:] - b[..., :2]], axis=-1)


def iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return iou_matrix(_xyxy_to_tlwh(a), _xyxy_to_tlwh(b))


def _centers(b: jnp.ndarray):
    return (b[..., 0] + b[..., 2]) / 2.0, (b[..., 1] + b[..., 3]) / 2.0


def speed_direction(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Normalized (dy, dx) from box b1's center to b2's (1e-6 norm floor)."""
    cx1, cy1 = _centers(b1)
    cx2, cy2 = _centers(b2)
    dy, dx = cy2 - cy1, cx2 - cx1
    norm = jnp.sqrt(dy * dy + dx * dx) + 1e-6
    return jnp.stack([dy / norm, dx / norm], axis=-1)


# --- params / state ------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class OCSortParams:
    """Static OC-SORT hyper-parameters (official OCSort defaults).

    ``with_appearance=True`` turns the step into **Deep OC-SORT**
    (Maggiolino et al., ICIP 2023): one EMA-smoothed L2-normalized ReID
    embedding per track, fused into the round-1 association objective as
    ``iou + ocm_bonus + aw_weight * cosine_sim`` with the official
    adaptive weighting (per-row/column top-2 discriminativity, zeroed
    where boxes don't overlap) and updated with the official
    confidence-modulated "dynamic" alpha. Round 2 (OCR) stays IoU-only —
    the official implementation computes an embedding term there but does
    not use it in the assignment (its own code carries a "TODO: is better
    without this"). ``with_appearance=False`` compiles to the exact
    motion-only OC-SORT step (appearance fields are None)."""
    det_thresh: float = 0.6
    max_age: int = 30
    min_hits: int = 3
    iou_threshold: float = 0.3
    delta_t: int = 3
    inertia: float = 0.2          # velocity-direction-consistency weight
    max_tracks: int = 128
    max_detections: int = 64
    # Deep OC-SORT appearance options (official defaults: alpha_fixed_emb
    # 0.95, w_association_emb 0.75, aw_param 0.5)
    with_appearance: bool = False
    feature_dim: int = 512
    alpha_fixed_emb: float = 0.95
    w_assoc_emb: float = 0.75
    aw_param: float = 0.5


@struct.dataclass
class OCSortState:
    """All track slots as padded arrays (T = max_tracks, K = delta_t + 1)."""
    active: jnp.ndarray        # (T,) bool
    x: jnp.ndarray             # (T, 7) f32 — KF mean
    p: jnp.ndarray             # (T, 7, 7) f32 — KF covariance
    frozen_x: jnp.ndarray      # (T, 7) f32 — state saved at first miss (ORU)
    frozen_p: jnp.ndarray      # (T, 7, 7) f32
    frozen_valid: jnp.ndarray  # (T,) bool
    observed: jnp.ndarray      # (T,) bool — updated at its latest frame
    last_obs: jnp.ndarray      # (T, 5) f32 — xyxy+score, -1s before first obs
    obs_ring: jnp.ndarray      # (T, K, 4) f32 — observation boxes by age
    obs_age: jnp.ndarray       # (T, K) int32 — age each slot was written (-1)
    velocity: jnp.ndarray      # (T, 2) f32 — (dy, dx) between observations
    age: jnp.ndarray           # (T,) int32 — predict count
    tsu: jnp.ndarray           # (T,) int32 — frames since last update
    hits: jnp.ndarray          # (T,) int32
    hit_streak: jnp.ndarray    # (T,) int32
    track_id: jnp.ndarray      # (T,) int32
    class_id: jnp.ndarray      # (T,) int32
    score: jnp.ndarray         # (T,) f32
    frame_count: jnp.ndarray   # () int32
    next_id: jnp.ndarray       # () int32
    dropped: jnp.ndarray       # () int32
    # Deep OC-SORT appearance bank (None unless params.with_appearance):
    # one EMA-smoothed L2-normalized embedding per slot; zeros = no
    # embedding yet (cosine contribution 0, neutral)
    emb: Optional[jnp.ndarray] = None          # (T, F) f32


@struct.dataclass
class OCSortDetections:
    """Padded per-frame detections in xyxy (class-filtered only; the step
    applies the strict ``score > det_thresh`` gate itself)."""
    xyxy: jnp.ndarray          # (N, 4) f32
    score: jnp.ndarray         # (N,) f32
    class_id: jnp.ndarray      # (N,) int32
    valid: jnp.ndarray         # (N,) bool
    # ReID features (None unless the step runs with_appearance):
    feature: Optional[jnp.ndarray] = None      # (N, F) f32
    has_feature: Optional[jnp.ndarray] = None  # (N,) bool


def init_state(params: OCSortParams) -> OCSortState:
    t, k = params.max_tracks, params.delta_t + 1
    return OCSortState(
        active=jnp.zeros((t,), jnp.bool_),
        x=jnp.zeros((t, 7), jnp.float32),
        p=jnp.zeros((t, 7, 7), jnp.float32),
        frozen_x=jnp.zeros((t, 7), jnp.float32),
        frozen_p=jnp.zeros((t, 7, 7), jnp.float32),
        frozen_valid=jnp.zeros((t,), jnp.bool_),
        observed=jnp.zeros((t,), jnp.bool_),
        last_obs=jnp.full((t, 5), -1.0, jnp.float32),
        obs_ring=jnp.zeros((t, k, 4), jnp.float32),
        obs_age=jnp.full((t, k), -1, jnp.int32),
        velocity=jnp.zeros((t, 2), jnp.float32),
        age=jnp.zeros((t,), jnp.int32),
        tsu=jnp.zeros((t,), jnp.int32),
        hits=jnp.zeros((t,), jnp.int32),
        hit_streak=jnp.zeros((t,), jnp.int32),
        track_id=jnp.zeros((t,), jnp.int32),
        class_id=jnp.zeros((t,), jnp.int32),
        score=jnp.zeros((t,), jnp.float32),
        frame_count=jnp.int32(0),
        next_id=jnp.int32(1),
        dropped=jnp.int32(0),
        emb=(jnp.zeros((t, params.feature_dim), jnp.float32)
             if params.with_appearance else None),
    )


def make_detections(xyxy, score, class_id, valid=None, *,
                    feature=None, has_feature=None,
                    params: OCSortParams) -> OCSortDetections:
    """Pad raw per-frame detections to the static capacity.

    ``feature``: ``(k, F)`` ReID embeddings (rows of zeros = no feature),
    required shape only when ``params.with_appearance``; ignored otherwise.
    """
    n = params.max_detections
    xyxy = jnp.asarray(xyxy, jnp.float32).reshape(-1, 4)
    k = xyxy.shape[0]
    if k > n:
        raise ValueError(f"{k} detections exceed capacity {n}")
    score = jnp.asarray(score, jnp.float32).reshape(-1)
    class_id = jnp.asarray(class_id, jnp.int32).reshape(-1)
    if valid is None:
        valid = jnp.ones((k,), jnp.bool_)
    else:
        valid = jnp.asarray(valid, jnp.bool_).reshape(-1)
    valid = valid & jnp.isfinite(xyxy).all(-1)
    pad = n - k
    feat = hasf = None
    if params.with_appearance:
        if feature is None:
            feat = jnp.zeros((n, params.feature_dim), jnp.float32)
            hasf = jnp.zeros((n,), jnp.bool_)
        else:
            feature = jnp.asarray(feature, jnp.float32).reshape(
                -1, params.feature_dim)
            feat = jnp.pad(feature, ((0, n - feature.shape[0]), (0, 0)))
            if has_feature is None:
                hasf = jnp.pad(jnp.any(feature != 0.0, axis=-1),
                               (0, n - feature.shape[0]))
            else:
                has_feature = jnp.asarray(has_feature, jnp.bool_).reshape(-1)
                hasf = jnp.pad(has_feature, (0, n - has_feature.shape[0]))
    return OCSortDetections(
        xyxy=jnp.pad(xyxy, ((0, pad), (0, 0))),
        score=jnp.pad(score, (0, pad)),
        class_id=jnp.pad(class_id, (0, pad)),
        valid=jnp.pad(valid, (0, pad)),
        feature=feat,
        has_feature=hasf,
    )


def _previous_obs(state: OCSortState, params: OCSortParams):
    """Vectorized k_previous_obs: the observation at age - dt for the
    largest dt <= delta_t that exists, else the most recent observation
    (= last_obs). Returns (boxes (T, 4), valid (T,))."""
    t = state.active.shape[0]
    rows = jnp.arange(t)
    k_ring = params.delta_t + 1
    prev = state.last_obs[:, :4]
    found = jnp.zeros((t,), jnp.bool_)
    for dt in range(params.delta_t, 0, -1):
        target = state.age - dt
        slot = jnp.mod(target, k_ring)
        hit = (state.obs_age[rows, slot] == target) & (target >= 0) & ~found
        prev = jnp.where(hit[:, None], state.obs_ring[rows, slot], prev)
        found = found | hit
    return prev, state.last_obs[:, 4] >= 0


def _claimed(match: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    return jnp.zeros((n_cols + 1,), jnp.bool_).at[
        jnp.where(match >= 0, match, n_cols)].set(True)[:n_cols]


def _aw_weight_matrix(sim: jnp.ndarray, rows: jnp.ndarray,
                      cols: jnp.ndarray, w_emb: float,
                      bottom: float) -> jnp.ndarray:
    """Deep OC-SORT adaptive weighting (official compute_aw_max_metric,
    vectorized): per row and per column, the embedding weight scales with
    how discriminative the similarity is — ``1 - max(second/first -
    bottom, 0) / (1 - bottom)`` over the top-2 entries, 0 when the best
    is exactly 0, 1 when fewer than two candidates exist. The final
    matrix is ``w_emb * row_weight * col_weight``.

    ``sim`` is the padded (T, N) similarity (already zeroed where boxes
    don't overlap); ``rows`` / ``cols`` mask the real tracks/detections —
    masked entries are excluded from the top-2 (the official matrix only
    spans real pairs). Deviation from the official in one pathological
    case: when every candidate similarity in a line is negative the
    official ratio can push the weight below zero (flipping the term's
    sign); here weights clamp to [0, 1]."""
    valid = rows[:, None] & cols[None, :]
    masked = jnp.where(valid, sim, -jnp.inf)

    def axis_weight(m, n_valid):
        top2 = jax.lax.top_k(m, 2)[0]
        first, second = top2[:, 0], top2[:, 1]
        safe_first = jnp.where(first == 0.0, 1.0, first)
        w = 1.0 - jnp.maximum(second / safe_first - bottom, 0.0) \
            / (1.0 - bottom)
        w = jnp.where(first == 0.0, 0.0, w)
        w = jnp.where(n_valid < 2, 1.0, w)  # official: continue (keep w)
        return jnp.clip(w, 0.0, 1.0)

    row_w = axis_weight(masked, jnp.sum(valid, axis=1))
    col_w = axis_weight(masked.T, jnp.sum(valid, axis=0))
    return w_emb * row_w[:, None] * col_w[None, :]


def _associate_ocm(iou: jnp.ndarray, bonus: jnp.ndarray,
                   rows: jnp.ndarray, cols: jnp.ndarray,
                   iou_threshold: float,
                   emb_term: Optional[jnp.ndarray] = None,
                   emb_bound: float = 0.0) -> jnp.ndarray:
    """First-round association: maximize IoU + OCM bonus (+ the adaptively
    weighted appearance term in Deep OC-SORT mode), accept IoU >=
    threshold; with the official shortcut — when the IoU-above-threshold
    adjacency already forms a partial matching (every row and column sum
    is <= 1, with a max of exactly 1), take it verbatim and skip the
    Hungarian solve (appearance only matters in the ambiguous cases,
    exactly like the official associate())."""
    t = iou.shape[0]
    a = rows[:, None] & cols[None, :] & (iou > iou_threshold)
    row_sums = jnp.sum(a, axis=1)
    col_sums = jnp.sum(a, axis=0)
    shortcut_ok = (jnp.max(row_sums) == 1) & (jnp.max(col_sums) == 1)

    def shortcut(_):
        # each row has at most one adjacent col (and vice versa)
        return jnp.where(row_sums == 1,
                         jnp.argmax(a, axis=1).astype(jnp.int32), -1)

    def hungarian(_):
        # plain max-sum assignment (no threshold inside the solve — the
        # official lapjv call has no cost limit): shift to non-negative
        # (bonus can be negative, down to -inertia/2); the feasibility
        # bound exceeds every possible cost (<= 2.0 + inertia/2 [+ the
        # emb bound]), so nothing is clamped infeasible and the
        # post-filter below applies the official IoU >= threshold
        # rejection. Keep the bound MODEST: a huge sentinel (1e9) wrecks
        # the f32 dual arithmetic in the solver — sub-1.0 cost
        # differences vanish next to it and the augmenting phase returns
        # a non-optimal matching (caught by the seed-2 oracle
        # differential).
        objective = iou + bonus
        if emb_term is not None:
            objective = objective + emb_term
        shift = 3.0 + emb_bound
        cost = shift - objective   # within [1.9, shift + 0.1 + emb_bound]
        return min_cost_matching(cost, rows, cols,
                                 jnp.float32(shift + 1.0 + emb_bound))

    match = jax.lax.cond(shortcut_ok, shortcut, hungarian, None)
    # post-filter: official rejects matches with IoU < threshold
    j = jnp.clip(match, 0)
    ok = (match >= 0) & (iou[jnp.arange(t), j] >= iou_threshold)
    return jnp.where(ok, match, -1)


@partial(jax.jit, static_argnames=("params",), donate_argnames=("state",))
def step(state: OCSortState, dets: OCSortDetections,
         params: OCSortParams, gmc=None) -> OCSortState:
    """One full OC-SORT frame update (predict + OCM association + OCR
    recovery + ORU re-update + lifecycle), mirroring OCSort.update.

    ``gmc``: optional ``(A (2,2), t (2,))`` camera affine mapping
    previous-frame to current-frame coordinates (:mod:`..ops.gmc`),
    applied after prediction and before association (BoT-SORT ordering).
    OC-SORT associates against *observation history* as much as the KF,
    so the warp also moves ``last_obs``, the OCM ring, the frozen ORU
    state and the momentum direction (see
    :func:`..ops.gmc.warp_ocsort_state`).

    The donated ``state`` must not be reused after the call.
    """
    t = params.max_tracks
    k_ring = params.delta_t + 1
    rows_idx = jnp.arange(t)
    frame_count = state.frame_count + 1

    # strict input gate (official: scores > det_thresh)
    d_ok = dets.valid & (dets.score > params.det_thresh)

    # --- predict all active tracks -------------------------------------------
    def do_predict(_):
        px, pp = kf_predict(state.x, state.p)
        return (jnp.where(state.active[:, None], px, state.x),
                jnp.where(state.active[:, None, None], pp, state.p))

    x, p = jax.lax.cond(jnp.any(state.active), do_predict,
                        lambda _: (state.x, state.p), None)
    if gmc is not None:
        from ..ops.gmc import warp_ocsort_state
        warped = warp_ocsort_state(state.replace(x=x, p=p), gmc[0], gmc[1])
        x, p = warped.x, warped.p
        state = state.replace(
            frozen_x=warped.frozen_x, frozen_p=warped.frozen_p,
            last_obs=warped.last_obs, obs_ring=warped.obs_ring,
            velocity=warped.velocity)
    hit_streak = jnp.where(state.active & (state.tsu > 0), 0,
                           state.hit_streak)
    tsu = jnp.where(state.active, state.tsu + 1, state.tsu)
    age = jnp.where(state.active, state.age + 1, state.age)
    trk_boxes = x_to_xyxy(x)
    # the official removes tracks whose predicted BOX went NaN (to_del,
    # ocsort.py update loop): it checks the converted box, not the raw
    # state — sqrt of a negative s*r yields a NaN box while x itself is
    # still fully finite, and that track must die this frame (it would
    # otherwise live on as a zombie re-matchable through OCR).
    active = state.active & jnp.isfinite(trk_boxes).all(-1)
    prev_obs, prev_valid = _previous_obs(
        state.replace(age=age), params)

    iou = iou_xyxy(trk_boxes, dets.xyxy)  # (T, N)

    # OCM velocity-direction-consistency bonus
    dirs = speed_direction(prev_obs[:, None, :], dets.xyxy[None, :, :])
    cos = jnp.clip(state.velocity[:, None, 0] * dirs[..., 0]
                   + state.velocity[:, None, 1] * dirs[..., 1], -1.0, 1.0)
    diff_angle = (jnp.pi / 2.0 - jnp.abs(jnp.arccos(cos))) / jnp.pi
    bonus = jnp.where(prev_valid[:, None], diff_angle, 0.0) \
        * params.inertia * dets.score[None, :]

    nd = dets.valid.shape[0]
    neg = jnp.full((t,), -1, jnp.int32)

    # Deep OC-SORT: adaptively weighted appearance term for round 1.
    # Official associate(): raw cosine similarity (embeddings are unit
    # norm), zeroed where boxes don't overlap (emb_cost[iou <= 0] = 0),
    # then scaled by the per-pair adaptive weight.
    if params.with_appearance:
        sim = jnp.einsum("tf,nf->tn", state.emb, dets.feature,
                         precision=_PRECISION)
        sim = jnp.where((iou > 0.0) & dets.has_feature[None, :], sim, 0.0)
        emb_term = sim * _aw_weight_matrix(
            sim, active, d_ok, params.w_assoc_emb, params.aw_param)
        emb_bound = float(params.w_assoc_emb)
    else:
        emb_term = None
        emb_bound = 0.0

    # --- round 1: OCM association --------------------------------------------
    def round1(_):
        return _associate_ocm(iou, bonus, active, d_ok,
                              params.iou_threshold,
                              emb_term=emb_term, emb_bound=emb_bound)

    run1 = jnp.any(active) & jnp.any(d_ok)
    match1 = jax.lax.cond(run1, round1, lambda _: neg, None)
    u_det = d_ok & ~_claimed(match1, nd)

    # --- round 2: OCR — recover by last observation box ----------------------
    r_rows = active & (match1 < 0)
    iou_last = iou_xyxy(state.last_obs[:, :4], dets.xyxy)

    def round2(_):
        m = min_cost_matching(1.0 - iou_last, r_rows, u_det,
                              jnp.float32(1.0))
        j = jnp.clip(m, 0)
        ok = (m >= 0) & (iou_last[rows_idx, j] >= params.iou_threshold)
        return jnp.where(ok, m, -1)

    # official guard: only when some leftover pair exceeds the threshold
    any_left = jnp.any(jnp.where(r_rows[:, None] & u_det[None, :],
                                 iou_last, 0.0) > params.iou_threshold)
    match2 = jax.lax.cond(any_left, round2, lambda _: neg, None)

    match = jnp.where(match1 >= 0, match1, match2)
    matched = match >= 0
    det_idx = jnp.clip(match, 0)

    # --- ORU: roll back + replay along the virtual trajectory ----------------
    z2 = xyxy_to_z(dets.xyxy)[det_idx]  # (T, 4) measurement per slot
    replay = matched & ~state.observed & state.frozen_valid \
        & (state.last_obs[:, 4] >= 0)

    def do_replay(ops):
        x, p = ops
        x = jnp.where(replay[:, None], state.frozen_x, x)
        p = jnp.where(replay[:, None, None], state.frozen_p, p)
        gap = jnp.where(replay, tsu, 0)
        z1 = xyxy_to_z(state.last_obs[:, :4])
        w1 = jnp.sqrt(jnp.maximum(z1[:, 2] * z1[:, 3], 0.0))
        h1 = jnp.sqrt(jnp.maximum(
            z1[:, 2] / jnp.maximum(z1[:, 3], 1e-6), 0.0))
        w2 = jnp.sqrt(jnp.maximum(z2[:, 2] * z2[:, 3], 0.0))
        h2 = jnp.sqrt(jnp.maximum(
            z2[:, 2] / jnp.maximum(z2[:, 3], 1e-6), 0.0))
        g = jnp.maximum(gap, 1).astype(jnp.float32)
        dxc = (z2[:, 0] - z1[:, 0]) / g
        dyc = (z2[:, 1] - z1[:, 1]) / g
        dw = (w2 - w1) / g
        dh = (h2 - h1) / g

        def body(carry):
            i, x, p = carry
            live = replay & (i <= gap)
            fi = i.astype(jnp.float32)
            wi = w1 + fi * dw
            hi = h1 + fi * dh
            zi = jnp.stack([z1[:, 0] + fi * dxc, z1[:, 1] + fi * dyc,
                            wi * hi, wi / jnp.maximum(hi, 1e-6)], axis=-1)
            ux, up = kf_update(x, p, zi)
            x = jnp.where(live[:, None], ux, x)
            p = jnp.where(live[:, None, None], up, p)
            # predict between virtual steps, not after the last one
            # (official unfreeze calls the bare KF predict — no area guard)
            mid = live & (i < gap)
            f = _f7()
            px = jnp.einsum("ij,...j->...i", f, x, precision=_PRECISION)
            pp = jnp.einsum("ij,...jk,lk->...il", f, p, f,
                            precision=_PRECISION) + jnp.diag(_Q_DIAG)
            x = jnp.where(mid[:, None], px, x)
            p = jnp.where(mid[:, None, None], pp, p)
            return i + 1, x, p

        gmax = jnp.max(gap)
        _, x, p = jax.lax.while_loop(
            lambda c: c[0] <= gmax, body, (jnp.int32(1), x, p))
        return x, p

    x, p = jax.lax.cond(jnp.any(replay), do_replay, lambda ops: ops, (x, p))

    # --- real measurement update for every matched track ---------------------
    def do_update(ops):
        x, p = ops
        ux, up = kf_update(x, p, z2)
        return (jnp.where(matched[:, None], ux, x),
                jnp.where(matched[:, None, None], up, p))

    x, p = jax.lax.cond(jnp.any(matched), do_update, lambda ops: ops, (x, p))

    # velocity from the previous observation to the new one (only for
    # tracks that had one, official STrack... KalmanBoxTracker.update)
    new_vel = speed_direction(prev_obs, dets.xyxy[det_idx])
    velocity = jnp.where((matched & prev_valid)[:, None], new_vel,
                         state.velocity)

    # observation bookkeeping
    det_box = dets.xyxy[det_idx]
    last_obs = jnp.where(
        matched[:, None],
        jnp.concatenate([det_box, dets.score[det_idx, None]], axis=-1),
        state.last_obs)
    slot = jnp.mod(age, k_ring)
    obs_ring = state.obs_ring.at[rows_idx, slot].set(
        jnp.where(matched[:, None], det_box,
                  state.obs_ring[rows_idx, slot]))
    obs_age = state.obs_age.at[rows_idx, slot].set(
        jnp.where(matched, age, state.obs_age[rows_idx, slot]))

    hits = jnp.where(matched, state.hits + 1, state.hits)
    hit_streak = jnp.where(matched, hit_streak + 1, hit_streak)
    tsu = jnp.where(matched, 0, tsu)
    score = jnp.where(matched, dets.score[det_idx], state.score)
    class_id = jnp.where(matched, dets.class_id[det_idx], state.class_id)

    # Deep OC-SORT dynamic-appearance EMA: alpha = af + (1 - af)(1 - trust)
    # where trust rescales the detection confidence above det_thresh —
    # confident detections update the bank harder (official dets_alpha +
    # KalmanBoxTracker.update_emb, both round-1 and OCR matches).
    # Detections without a feature (beyond crop capacity) leave the bank
    # unchanged.
    emb = state.emb
    if params.with_appearance:
        trust = (dets.score - params.det_thresh) \
            / max(1.0 - params.det_thresh, 1e-6)
        af = params.alpha_fixed_emb
        alpha = (af + (1.0 - af) * (1.0 - trust))[det_idx]
        d_feat = dets.feature[det_idx]
        new_emb = alpha[:, None] * state.emb + (1.0 - alpha)[:, None] * d_feat
        new_emb = new_emb / jnp.maximum(
            jnp.linalg.norm(new_emb, axis=-1, keepdims=True), 1e-12)
        upd = matched & dets.has_feature[det_idx]
        emb = jnp.where(upd[:, None], new_emb, state.emb)

    # --- misses: freeze at the first one (ORU anchor) -------------------------
    missed = active & ~matched
    freeze = missed & state.observed
    frozen_x = jnp.where(freeze[:, None], x, state.frozen_x)
    frozen_p = jnp.where(freeze[:, None, None], p, state.frozen_p)
    frozen_valid = state.frozen_valid | freeze
    observed = (state.observed | matched) & ~missed

    # --- removal ---------------------------------------------------------------
    active = active & ~(missed & (tsu > params.max_age))

    # --- new tracks -------------------------------------------------------------
    u_det = u_det & ~_claimed(match2, nd)

    def initiate_new(ops):
        (active, x, p, last_obs, obs_ring, obs_age, velocity, age, tsu,
         hits, hit_streak, observed, frozen_valid, class_id, score,
         emb) = ops
        free = ~active
        n_free = jnp.sum(free)
        slot_rank = jnp.cumsum(free) - 1
        slot_of_rank = jnp.full((t + 1,), t, jnp.int32).at[
            jnp.where(free, slot_rank, t)].set(
            rows_idx.astype(jnp.int32))[:t]
        det_rank = jnp.cumsum(u_det) - 1
        can_place = u_det & (det_rank < n_free)
        dropped = jnp.sum(u_det & ~can_place).astype(jnp.int32)
        slot_for_det = jnp.where(
            can_place, slot_of_rank[jnp.clip(det_rank, 0, t - 1)], t)

        init_x, init_p = kf_initiate(xyxy_to_z(dets.xyxy))
        new_ids = state.next_id + det_rank.astype(jnp.int32)

        def scatter(arr, values):
            return arr.at[slot_for_det].set(values.astype(arr.dtype),
                                            mode="drop")

        active = scatter(active, jnp.ones_like(u_det))
        x = scatter(x, init_x)
        p = scatter(p, init_p)
        # official KalmanBoxTracker.__init__: last_observation stays -1s,
        # no ring entry, velocity None, counters zero, observed False
        last_obs = scatter(last_obs, jnp.full((nd, 5), -1.0, jnp.float32))
        obs_ring = scatter(obs_ring, jnp.zeros((nd, k_ring, 4), jnp.float32))
        obs_age = scatter(obs_age, jnp.full((nd, k_ring), -1, jnp.int32))
        velocity = scatter(velocity, jnp.zeros((nd, 2), jnp.float32))
        age = scatter(age, jnp.zeros_like(det_rank))
        tsu = scatter(tsu, jnp.zeros_like(det_rank))
        hits = scatter(hits, jnp.zeros_like(det_rank))
        hit_streak = scatter(hit_streak, jnp.zeros_like(det_rank))
        observed = scatter(observed, jnp.zeros_like(u_det))
        frozen_valid = scatter(frozen_valid, jnp.zeros_like(u_det))
        track_id = scatter(state.track_id, new_ids)
        class_id = scatter(class_id, dets.class_id)
        score = scatter(score, dets.score)
        if emb is not None:
            # official KalmanBoxTracker.__init__ seeds the bank with the
            # detection embedding; no feature -> zeros (neutral cosine)
            emb = scatter(emb, jnp.where(dets.has_feature[:, None],
                                         dets.feature,
                                         jnp.zeros_like(dets.feature)))
        n_new = jnp.sum(can_place).astype(jnp.int32)
        return (active, x, p, last_obs, obs_ring, obs_age, velocity, age,
                tsu, hits, hit_streak, observed, frozen_valid, track_id,
                class_id, score, emb, n_new, dropped)

    def no_new(ops):
        (active, x, p, last_obs, obs_ring, obs_age, velocity, age, tsu,
         hits, hit_streak, observed, frozen_valid, class_id, score,
         emb) = ops
        return (active, x, p, last_obs, obs_ring, obs_age, velocity, age,
                tsu, hits, hit_streak, observed, frozen_valid,
                state.track_id, class_id, score, emb,
                jnp.int32(0), jnp.int32(0))

    (active, x, p, last_obs, obs_ring, obs_age, velocity, age, tsu, hits,
     hit_streak, observed, frozen_valid, track_id, class_id, score, emb,
     n_new, dropped) = jax.lax.cond(
        jnp.any(u_det), initiate_new, no_new,
        (active, x, p, last_obs, obs_ring, obs_age, velocity, age, tsu,
         hits, hit_streak, observed, frozen_valid, class_id, score, emb))

    return state.replace(
        active=active, x=x, p=p,
        frozen_x=frozen_x, frozen_p=frozen_p, frozen_valid=frozen_valid,
        observed=observed, last_obs=last_obs,
        obs_ring=obs_ring, obs_age=obs_age, velocity=velocity,
        age=age, tsu=tsu, hits=hits, hit_streak=hit_streak,
        track_id=track_id, class_id=class_id, score=score,
        frame_count=frame_count, next_id=state.next_id + n_new,
        dropped=state.dropped + dropped,
        emb=emb,
    )


@partial(jax.jit, static_argnames=("params",))
def get_outputs(state: OCSortState, params: OCSortParams):
    """Tracks updated this frame with enough history, as
    (xyxy, id, class, score, mask). Boxes are the last OBSERVATION (the
    matched detection), not the Kalman state — OC-SORT's
    observation-centric output (official: last_observation when it exists).
    Emission: tsu < 1 and (hit_streak >= min_hits or within the first
    min_hits frames)."""
    has_obs = state.last_obs[:, 4] >= 0
    box = jnp.where(has_obs[:, None], state.last_obs[:, :4],
                    x_to_xyxy(state.x))
    z = (state.active & (state.tsu < 1)
         & ((state.hit_streak >= params.min_hits)
            | (state.frame_count <= params.min_hits)))
    box = jnp.where(jnp.isfinite(box), box, 0.0)
    return (jnp.where(z[:, None], box, 0.0),
            jnp.where(z, state.track_id, 0),
            jnp.where(z, state.class_id, 0),
            jnp.where(z, state.score, 0.0),
            z)
