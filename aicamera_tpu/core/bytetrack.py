"""TPU-native ByteTrack: two-pass IoU association over every detection box.

The reference lists "Integration with other tracking algorithms (e.g.,
ByteTrack, OC-SORT)" as a future enhancement (reference README.md, Future
Enhancements) — this module delivers ByteTrack (Zhang et al., ECCV 2022,
arXiv:2110.06864) as a second tracker core with the same fixed-shape,
fully-jittable design as the DeepSORT core (:mod:`.tracker`):

- **High/low score split.** Detections above ``track_thresh`` associate
  first (IoU, optionally score-fused); leftover *tracked* tracks then get a
  second chance against the low-score boxes (``low_thresh < s <
  track_thresh``) that other trackers throw away — the core ByteTrack idea.
- **No appearance model.** Association is motion-only (Kalman-predicted
  IoU), so the ReID embedder and feature gallery are not needed: a
  ByteTrack step is far cheaper than a DeepSORT step.
- **Lifecycle.** New tracks start unconfirmed (``is_activated=False``
  except on frame 1) and must re-match the next frame or die; unmatched
  tracked tracks become LOST and are revived by the first association for
  up to ``max_time_lost`` frames; duplicate tracked/lost pairs (IoU cost
  < 0.15) drop the shorter-lived twin.

Semantics follow the official ByteTrack update loop (BYTETracker.update:
joint tracked+lost pool, vh zeroed in prediction for non-tracked tracks,
fuse_score on first/unconfirmed stages, det_thresh = track_thresh + 0.1
for new tracks, unconfirmed tracks are *not* KF-predicted before their
match), restated here over padded arrays; the matching threshold
convention is "accept when cost <= thresh" (the DeepSORT-core solver's
semantics, :func:`..core.assignment.min_cost_matching`), which differs
from lap.lapjv's ``cost_limit`` only on measure-zero exact-equality ties.
Validated against an independent NumPy oracle in
``tests/test_bytetrack.py``.

Like the DeepSORT core, everything is fixed shape: padded track slots,
padded detections, masked updates — one XLA program per frame step.

**BoT-SORT mode** (``ByteTrackParams(with_appearance=True)``): the same
step becomes BoT-SORT's association (Aharon et al. 2022, arXiv:2206.14651)
— stages 1 and 3 take ``min(iou_cost, emb_cost)`` with the official
proximity/appearance masking, and every track keeps one EMA-smoothed
L2-normalized ReID embedding. The motion model stays this module's xyah
Kalman filter (the official BoT-SORT switches to xywh; documented
deviation — the association logic is what defines the tracker here).
GMC composes as before. ``with_appearance=False`` compiles to the exact
motion-only program (the appearance fields stay ``None``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from . import kalman
from .assignment import min_cost_matching
from .costs import iou_cost_matrix, mean_to_tlwh, tlwh_to_tlbr, tlwh_to_xyah

TRACKED = 1
LOST = 2


@dataclasses.dataclass(frozen=True)
class ByteTrackParams:
    """Static ByteTrack hyper-parameters (hashable; safe as a jit static).

    Defaults are the official BYTETracker demo settings: track_thresh 0.5,
    match_thresh 0.8, track_buffer 30 (= max_time_lost at the source frame
    rate), second-stage threshold 0.5, unconfirmed-stage threshold 0.7,
    low-score floor 0.1, new-track threshold track_thresh + 0.1.
    """
    track_thresh: float = 0.5
    match_thresh: float = 0.8
    second_match_thresh: float = 0.5
    unconfirmed_match_thresh: float = 0.7
    low_thresh: float = 0.1
    det_thresh: float = -1.0          # < 0 → track_thresh + 0.1
    max_time_lost: int = 30
    fuse_score: bool = True           # official mot20=False path
    dup_iou_cost: float = 0.15
    max_tracks: int = 128
    max_detections: int = 64
    # --- BoT-SORT appearance fusion (Aharon et al. 2022, arXiv:2206.14651).
    # with_appearance=True turns the ByteTrack step into BoT-SORT's
    # association: stages 1 and 3 take min(iou_cost, emb_cost) where
    # emb_cost = cosine_distance/2, invalidated (set to 1) beyond
    # appearance_thresh or where iou_cost > proximity_thresh; each track
    # keeps one EMA-smoothed L2-normalized embedding (feat_ema_alpha,
    # official default 0.9). False (default) is plain motion-only
    # ByteTrack — the appearance fields stay None and the step compiles
    # to the exact prior program.
    with_appearance: bool = False
    proximity_thresh: float = 0.5
    appearance_thresh: float = 0.25
    feat_ema_alpha: float = 0.9
    feature_dim: int = 512

    @property
    def new_track_thresh(self) -> float:
        return (self.det_thresh if self.det_thresh >= 0
                else self.track_thresh + 0.1)


@struct.dataclass
class ByteTrackState:
    """All track slots as padded arrays (T = max_tracks)."""
    active: jnp.ndarray        # (T,) bool — slot holds a live track
    state: jnp.ndarray         # (T,) int32 — TRACKED / LOST
    is_activated: jnp.ndarray  # (T,) bool — confirmed by a second match
    mean: jnp.ndarray          # (T, 8) f32 — KF state mean (cx,cy,a,h,v*)
    cov: jnp.ndarray           # (T, 8, 8) f32
    tsu: jnp.ndarray           # (T,) int32 — frames since last update
    start_frame: jnp.ndarray   # (T,) int32 — frame the track activated
    track_id: jnp.ndarray      # (T,) int32
    class_id: jnp.ndarray      # (T,) int32
    score: jnp.ndarray         # (T,) f32 — last matched detection score
    frame_id: jnp.ndarray      # () int32 — frames processed so far
    next_id: jnp.ndarray       # () int32
    dropped: jnp.ndarray       # () int32 — detections dropped to capacity
    # BoT-SORT appearance bank (None unless params.with_appearance):
    feat: jnp.ndarray | None = None      # (T, D) f32 — EMA-smoothed, L2-norm
    has_feat: jnp.ndarray | None = None  # (T,) bool


@struct.dataclass
class ByteDetections:
    """Padded per-frame detections (class-filtered; NOT score-split —
    the step splits by score itself, that is the algorithm)."""
    tlwh: jnp.ndarray          # (N, 4) f32
    score: jnp.ndarray         # (N,) f32
    class_id: jnp.ndarray      # (N,) int32
    valid: jnp.ndarray         # (N,) bool
    # ReID features (None unless the step runs with_appearance):
    feature: jnp.ndarray | None = None      # (N, D) f32
    has_feature: jnp.ndarray | None = None  # (N,) bool


def init_state(params: ByteTrackParams) -> ByteTrackState:
    t = params.max_tracks
    return ByteTrackState(
        active=jnp.zeros((t,), jnp.bool_),
        state=jnp.zeros((t,), jnp.int32),
        is_activated=jnp.zeros((t,), jnp.bool_),
        mean=jnp.zeros((t, 8), jnp.float32),
        cov=jnp.zeros((t, 8, 8), jnp.float32),
        tsu=jnp.zeros((t,), jnp.int32),
        start_frame=jnp.zeros((t,), jnp.int32),
        track_id=jnp.zeros((t,), jnp.int32),
        class_id=jnp.zeros((t,), jnp.int32),
        score=jnp.zeros((t,), jnp.float32),
        frame_id=jnp.int32(0),
        next_id=jnp.int32(1),
        dropped=jnp.int32(0),
        feat=(jnp.zeros((t, params.feature_dim), jnp.float32)
              if params.with_appearance else None),
        has_feat=(jnp.zeros((t,), jnp.bool_)
                  if params.with_appearance else None),
    )


def make_detections(tlwh, score, class_id, valid=None, feature=None, *,
                    params: ByteTrackParams) -> ByteDetections:
    """Pad raw per-frame detections to the static capacity.

    ``feature``: ``(k, D)`` ReID embeddings (rows of zeros = no feature),
    required shape only when ``params.with_appearance``; ignored otherwise.
    """
    n = params.max_detections
    tlwh = jnp.asarray(tlwh, jnp.float32).reshape(-1, 4)
    k = tlwh.shape[0]
    if k > n:
        raise ValueError(f"{k} detections exceed capacity {n}")
    score = jnp.asarray(score, jnp.float32).reshape(-1)
    class_id = jnp.asarray(class_id, jnp.int32).reshape(-1)
    if valid is None:
        valid = jnp.ones((k,), jnp.bool_)
    else:
        valid = jnp.asarray(valid, jnp.bool_).reshape(-1)
    valid = valid & jnp.isfinite(tlwh).all(-1)
    pad = n - k
    feat = has_feat = None
    if params.with_appearance:
        d = params.feature_dim
        if feature is None:
            feat = jnp.zeros((n, d), jnp.float32)
            has_feat = jnp.zeros((n,), jnp.bool_)
        else:
            f = jnp.asarray(feature, jnp.float32).reshape(k, d)
            feat = jnp.pad(f, ((0, pad), (0, 0)))
            has_feat = jnp.pad(jnp.any(f != 0.0, axis=-1), (0, pad))
    return ByteDetections(
        tlwh=jnp.pad(tlwh, ((0, pad), (0, 0))),
        score=jnp.pad(score, (0, pad)),
        class_id=jnp.pad(class_id, (0, pad)),
        valid=jnp.pad(valid, (0, pad)),
        feature=feat,
        has_feature=has_feat,
    )


def _claimed(match: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """(T,) row->col match array (-1 unmatched) -> (N,) claimed-column mask."""
    return jnp.zeros((n_cols + 1,), jnp.bool_).at[
        jnp.where(match >= 0, match, n_cols)].set(True)[:n_cols]


@partial(jax.jit, static_argnames=("params",), donate_argnames=("state",))
def step(state: ByteTrackState, dets: ByteDetections,
         params: ByteTrackParams, gmc=None) -> ByteTrackState:
    """One full ByteTrack frame update (predict + 3 association stages +
    lifecycle), mirroring the official BYTETracker.update loop.

    ``gmc``: optional ``(A (2,2), t (2,))`` camera affine mapping
    previous-frame to current-frame coordinates (:mod:`..ops.gmc`).
    Applied to every live track's Kalman state after prediction and
    before association — BoT-SORT's ordering (multi_predict then
    multi_gmc on both the track pool and unconfirmed tracks); ByteTrack
    + GMC is exactly BoT-SORT's camera-motion-compensated motion model.

    The donated ``state`` must not be reused after the call (same contract
    as the DeepSORT core's jitted step).
    """
    t = params.max_tracks
    frame_id = state.frame_id + 1

    # --- Predict the association pool (tracked + lost, i.e. activated) ------
    # Unconfirmed tracks are NOT predicted (official STrack.multi_predict
    # runs on strack_pool only); lost tracks predict with vh zeroed
    # (multi_predict zeroes mean[7] for state != Tracked).
    pool = state.active & state.is_activated
    mean0 = state.mean.at[:, 7].set(jnp.where(
        pool & (state.state != TRACKED), 0.0, state.mean[:, 7]))

    def do_predict(_):
        pm, pc = kalman.predict(mean0, state.cov)
        return (jnp.where(pool[:, None], pm, mean0),
                jnp.where(pool[:, None, None], pc, state.cov))

    mean, cov = jax.lax.cond(
        jnp.any(pool), do_predict, lambda _: (mean0, state.cov), None)
    if gmc is not None:
        from ..ops.gmc import warp_xyah_bank
        mean, cov = warp_xyah_bank(mean, cov, gmc[0], gmc[1], state.active)
    tsu = jnp.where(state.active, state.tsu + 1, state.tsu)

    # --- Score split (official: s > thresh high; 0.1 < s < thresh low;
    # s == thresh falls in neither — preserved exactly) -----------------------
    high = dets.valid & (dets.score > params.track_thresh)
    low = dets.valid & (dets.score > params.low_thresh) \
        & (dets.score < params.track_thresh)

    track_tlwh = mean_to_tlwh(mean)
    iou_c = iou_cost_matrix(track_tlwh, dets.tlwh)  # (T, N)
    if params.fuse_score:
        fused = 1.0 - (1.0 - iou_c) * dets.score[None, :]
    else:
        fused = iou_c
    if params.with_appearance:
        # BoT-SORT fused cost for stages 1 and 3 (official BoTSORT.update):
        # emb = cosine_distance / 2, invalidated (set to 1) beyond
        # appearance_thresh, where the RAW IoU cost exceeds
        # proximity_thresh (the mask is taken before score fusion, as in
        # the official code), or where either side has no feature; the
        # stage cost is then min(score-fused IoU, emb).
        tf = state.feat / jnp.maximum(
            jnp.linalg.norm(state.feat, axis=-1, keepdims=True), 1e-7)
        df = dets.feature / jnp.maximum(
            jnp.linalg.norm(dets.feature, axis=-1, keepdims=True), 1e-7)
        emb = 0.5 * jnp.maximum(
            1.0 - jnp.matmul(tf, df.T, precision=jax.lax.Precision.HIGHEST),
            0.0)
        emb_bad = ((emb > params.appearance_thresh)
                   | (iou_c > params.proximity_thresh)
                   | ~state.has_feat[:, None] | ~dets.has_feature[None, :])
        fused = jnp.minimum(fused, jnp.where(emb_bad, 1.0, emb))

    nd = dets.valid.shape[0]
    neg = jnp.full((t,), -1, jnp.int32)

    # --- Stage 1: pool (tracked + lost) vs high-score detections ------------
    def stage1(_):
        return min_cost_matching(fused, pool, high,
                                 jnp.float32(params.match_thresh))

    run1 = jnp.any(pool) & jnp.any(high)
    match_a = jax.lax.cond(run1, stage1, lambda _: neg, None)
    matched_a = match_a >= 0
    u_high = high & ~_claimed(match_a, nd)

    # --- Stage 2: leftover *tracked* tracks vs low-score detections ---------
    r_tracked = pool & ~matched_a & (state.state == TRACKED)

    def stage2(_):
        return min_cost_matching(iou_c, r_tracked, low,
                                 jnp.float32(params.second_match_thresh))

    run2 = jnp.any(r_tracked) & jnp.any(low)
    match_b = jax.lax.cond(run2, stage2, lambda _: neg, None)
    matched_b = match_b >= 0
    newly_lost = r_tracked & ~matched_b

    # --- Stage 3: unconfirmed tracks vs leftover high-score detections ------
    unconfirmed = state.active & ~state.is_activated

    def stage3(_):
        return min_cost_matching(fused, unconfirmed, u_high,
                                 jnp.float32(params.unconfirmed_match_thresh))

    run3 = jnp.any(unconfirmed) & jnp.any(u_high)
    match_c = jax.lax.cond(run3, stage3, lambda _: neg, None)
    matched_c = match_c >= 0
    remove_unconfirmed = unconfirmed & ~matched_c
    u_high = u_high & ~_claimed(match_c, nd)

    # Row sets of the three stages are disjoint, so one merged match vector
    # drives a single masked KF update.
    match = jnp.where(matched_a, match_a,
                      jnp.where(matched_b, match_b, match_c))
    matched = match >= 0
    det_idx = jnp.clip(match, 0)

    def with_matches(_):
        meas = tlwh_to_xyah(dets.tlwh)[det_idx]
        um, uc = kalman.update(mean, cov, meas)
        return (jnp.where(matched[:, None], um, mean),
                jnp.where(matched[:, None, None], uc, cov))

    mean2, cov2 = jax.lax.cond(
        jnp.any(matched), with_matches, lambda _: (mean, cov), None)

    feat, has_feat = state.feat, state.has_feat
    if params.with_appearance:
        # STrack.update_features: normalize the new feature, EMA-blend into
        # the smoothed bank, re-normalize; first feature seeds directly.
        # Applies on every match incl. re_activate (lost-track revival).
        def upd_feat(_):
            fn = dets.feature[det_idx]
            fn = fn / jnp.maximum(
                jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-7)
            a = jnp.float32(params.feat_ema_alpha)
            blend = a * feat + (1.0 - a) * fn
            blend = blend / jnp.maximum(
                jnp.linalg.norm(blend, axis=-1, keepdims=True), 1e-7)
            newf = jnp.where(has_feat[:, None], blend, fn)
            updm = matched & dets.has_feature[det_idx]
            return jnp.where(updm[:, None], newf, feat), has_feat | updm

        feat, has_feat = jax.lax.cond(
            jnp.any(matched), upd_feat, lambda _: (feat, has_feat), None)

    tsu = jnp.where(matched, 0, tsu)
    st = jnp.where(matched, TRACKED, state.state)
    st = jnp.where(newly_lost, LOST, st)
    is_act = state.is_activated | matched
    score = jnp.where(matched, dets.score[det_idx], state.score)
    class_id = jnp.where(matched, dets.class_id[det_idx], state.class_id)

    # --- Removals: dead unconfirmed + stale lost -----------------------------
    remove_lost = state.active & (st == LOST) & (tsu > params.max_time_lost)
    active = state.active & ~remove_unconfirmed & ~remove_lost

    # --- New tracks from the remaining high-score detections ----------------
    new_det = u_high & (dets.score >= params.new_track_thresh)
    rows = jnp.arange(t)

    def initiate_new(ops):
        (active, st, is_act, mean2, cov2, tsu, class_id, score) = ops[:8]
        if params.with_appearance:
            feat_i, has_feat_i = ops[8:]
        free = ~active
        n_free = jnp.sum(free)
        slot_rank = jnp.cumsum(free) - 1
        slot_of_rank = jnp.full((t + 1,), t, jnp.int32).at[
            jnp.where(free, slot_rank, t)].set(rows.astype(jnp.int32))[:t]
        det_rank = jnp.cumsum(new_det) - 1
        can_place = new_det & (det_rank < n_free)
        dropped = jnp.sum(new_det & ~can_place).astype(jnp.int32)
        slot_for_det = jnp.where(
            can_place, slot_of_rank[jnp.clip(det_rank, 0, t - 1)], t)

        init_mean, init_cov = kalman.initiate(tlwh_to_xyah(dets.tlwh))
        new_ids = state.next_id + det_rank.astype(jnp.int32)

        def scatter(arr, values):
            return arr.at[slot_for_det].set(values.astype(arr.dtype),
                                            mode="drop")

        active = scatter(active, jnp.ones_like(new_det))
        st = scatter(st, jnp.full_like(det_rank, TRACKED))
        # official STrack.activate: is_activated only on the first frame
        is_act = scatter(is_act, jnp.full_like(new_det, frame_id == 1))
        mean2 = scatter(mean2, init_mean)
        cov2 = scatter(cov2, init_cov)
        tsu = scatter(tsu, jnp.zeros_like(det_rank))
        start_frame = scatter(state.start_frame,
                              jnp.full_like(det_rank, frame_id))
        track_id = scatter(state.track_id, new_ids)
        class_id = scatter(class_id, dets.class_id)
        score = scatter(score, dets.score)
        n_new = jnp.sum(can_place).astype(jnp.int32)
        out = (active, st, is_act, mean2, cov2, tsu, start_frame,
               track_id, class_id, score, n_new, dropped)
        if params.with_appearance:
            # seed the appearance bank with the initiating detection's
            # normalized feature (STrack ctor -> update_features)
            fn = dets.feature / jnp.maximum(
                jnp.linalg.norm(dets.feature, axis=-1, keepdims=True), 1e-7)
            feat_i2 = feat_i.at[slot_for_det].set(
                jnp.where(dets.has_feature[:, None], fn, 0.0), mode="drop")
            has_feat_i2 = scatter(has_feat_i, dets.has_feature)
            out = out + (feat_i2, has_feat_i2)
        return out

    def no_new(ops):
        (active, st, is_act, mean2, cov2, tsu, class_id, score) = ops[:8]
        out = (active, st, is_act, mean2, cov2, tsu, state.start_frame,
               state.track_id, class_id, score, jnp.int32(0), jnp.int32(0))
        if params.with_appearance:
            out = out + tuple(ops[8:])
        return out

    ops_in = (active, st, is_act, mean2, cov2, tsu, class_id, score)
    if params.with_appearance:
        ops_in = ops_in + (feat, has_feat)
    _init_out = jax.lax.cond(jnp.any(new_det), initiate_new, no_new, ops_in)
    (active, st, is_act, mean2, cov2, tsu, start_frame, track_id,
     class_id, score, n_new, dropped) = _init_out[:12]
    if params.with_appearance:
        feat, has_feat = _init_out[12:]

    # --- Duplicate suppression (official remove_duplicate_stracks) ----------
    # Tracked/lost pairs with IoU cost < 0.15 drop the shorter-lived track
    # (ties drop the tracked one, matching the official `timep > timeq`).
    def dedup(active):
        a_mask = active & (st == TRACKED)
        b_mask = active & (st == LOST)
        cur_tlwh = mean_to_tlwh(mean2)
        d = iou_cost_matrix(cur_tlwh, cur_tlwh)
        pairs = a_mask[:, None] & b_mask[None, :] \
            & (d < params.dup_iou_cost)
        life = (frame_id - tsu) - start_frame
        a_older = life[:, None] > life[None, :]
        dup_b = jnp.any(pairs & a_older, axis=0)
        dup_a = jnp.any(pairs & ~a_older, axis=1)
        return active & ~(a_mask & dup_a) & ~(b_mask & dup_b)

    any_lost = jnp.any(active & (st == LOST))
    active = jax.lax.cond(any_lost, dedup, lambda a: a, active)

    return state.replace(
        active=active, state=st, is_activated=is_act,
        mean=mean2, cov=cov2, tsu=tsu, start_frame=start_frame,
        track_id=track_id, class_id=class_id, score=score,
        frame_id=frame_id, next_id=state.next_id + n_new,
        dropped=state.dropped + dropped,
        feat=feat, has_feat=has_feat,
    )


@jax.jit
def get_outputs(state: ByteTrackState):
    """Activated tracked tracks, as (tlbr, id, class, score, mask).

    Official output: ``[t for t in tracked_stracks if t.is_activated]`` —
    after a step every TRACKED track was updated this frame (tsu == 0), so
    the mask below is the same set; the extra tsu term is defensive.
    Masked-out lanes are canonical zeros (same convention as the DeepSORT
    core's get_outputs).
    """
    tlwh = mean_to_tlwh(state.mean)
    tlwh = tlwh.at[:, 2:].set(jnp.maximum(tlwh[:, 2:], 0.0))
    tlbr = tlwh_to_tlbr(tlwh)
    z = (state.active & (state.state == TRACKED)
         & state.is_activated & (state.tsu == 0))
    return (jnp.where(z[:, None], tlbr, 0.0),
            jnp.where(z, state.track_id, 0),
            jnp.where(z, state.class_id, 0),
            jnp.where(z, state.score, 0.0),
            z)
