"""Functional DeepSORT tracker step: predict, associate, update, manage.

Replaces the reference's ``TrackerCore`` (``src/tracker/core/tracker_core.py``)
with two pure functions over :class:`TrackerState`:

- :func:`predict` — vmapped KF prediction + age/tsu counters for every
  active slot (tracker_core.py:44-49, track.py:76-80).
- :func:`update` — the full association + lifecycle step
  (tracker_core.py:51-177): gated-appearance matching cascade for confirmed
  tracks, IoU matching for tentative and just-missed confirmed tracks,
  masked KF corrections, gallery appends, confirmations, deletions and new
  track initiation — all as one fixed-shape XLA program.

Lifecycle semantics preserved exactly:
- confirm at ``hits >= n_init`` (track.py:99-100);
- tentative tracks deleted on first miss (track.py:112-114);
- confirmed tracks deleted when ``tsu > max_age`` (track.py:115-118);
- stage-2 IoU candidates are tentative tracks plus confirmed-unmatched
  tracks with ``tsu == 1`` (tracker_core.py:138-141);
- appearance threshold 0.2, IoU threshold 0.7, Mahalanobis gate
  CHI2INV95[4] (tracker_core.py:119-130, linear_assignment.py:160-212);
- new tracks get sequential ids in detection order (track.py:42-43,
  tracker_core.py:71-72).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import kalman
from .assignment import matching_cascade, min_cost_matching
from .costs import (INFTY_COST, appearance_cost_matrix, iou_cost_matrix,
                    mean_to_tlwh, tlwh_to_tlbr, tlwh_to_xyah)
from .state import CONFIRMED, TENTATIVE, Detections, TrackerParams, TrackerState


@partial(jax.jit, static_argnames=("params",))
def predict(state: TrackerState, params: TrackerParams) -> TrackerState:
    """KF-predict all active tracks; age += 1, time_since_update += 1.

    Guarded by ``lax.cond`` on any-active: with no live tracks the whole
    vmapped KF predict is dead work (empty-scene fast path — inside the
    per-frame scan every op pays fixed sequencer overhead)."""
    def do(st):
        new_mean, new_cov = kalman.predict(st.mean, st.cov)
        act = st.active
        return st.replace(
            mean=jnp.where(act[:, None], new_mean, st.mean),
            cov=jnp.where(act[:, None, None], new_cov, st.cov),
            age=jnp.where(act, st.age + 1, st.age),
            tsu=jnp.where(act, st.tsu + 1, st.tsu),
        )

    return jax.lax.cond(jnp.any(state.active), do, lambda st: st, state)


def _associate(state: TrackerState, dets: Detections, params: TrackerParams):
    """Two-stage association. Returns (match (T,) det idx or -1, det_unmatched).

    Both stages are wrapped in ``lax.cond`` guards that skip them when they
    provably cannot produce a match (no eligible rows / no eligible
    columns). Inside the per-frame ``lax.scan`` every executed op pays fixed
    sequencer overhead, so skipping the whole appearance einsum + gating +
    cascade subgraph on empty frames is a large win; the guarded result is
    bit-identical (featureless detections cost INFTY in the cascade and can
    never match, reference matching.py:185-193).
    """
    t = state.mean.shape[0]
    confirmed = state.active & (state.state == CONFIRMED)

    # --- Stage 1: gated appearance cascade over confirmed tracks ------------
    def stage1(_):
        meas_xyah = tlwh_to_xyah(dets.tlwh)  # (N, 4)
        gal_idx = jnp.arange(state.gallery.shape[1])
        gallery_valid = gal_idx[None, :] < state.gallery_count[:, None]

        app_cost = appearance_cost_matrix(
            state.gallery, gallery_valid, dets.feature, dets.has_feature)
        gate = kalman.gating_distance(state.mean, state.cov, meas_xyah)
        app_cost = jnp.where(gate > kalman.CHI2INV95[4], INFTY_COST, app_cost)

        return matching_cascade(
            app_cost, state.tsu, confirmed, dets.valid,
            params.max_cosine_distance, params.max_age)

    def skip1(_):
        return jnp.full((t,), -1, jnp.int32), dets.valid

    run1 = jnp.any(confirmed) & jnp.any(dets.valid & dets.has_feature)
    cascade_match, det_unmatched = jax.lax.cond(run1, stage1, skip1, None)

    # --- Stage 2: IoU matching ----------------------------------------------
    tentative = state.active & (state.state == TENTATIVE)
    recently_missed = confirmed & (cascade_match < 0) & (state.tsu == 1)
    iou_rows = tentative | recently_missed

    def stage2(_):
        track_tlwh = mean_to_tlwh(state.mean)
        iou_cost = iou_cost_matrix(track_tlwh, dets.tlwh)
        return min_cost_matching(
            iou_cost, iou_rows, det_unmatched,
            jnp.float32(params.max_iou_distance))

    def skip2(_):
        return jnp.full((t,), -1, jnp.int32)

    run2 = jnp.any(iou_rows) & jnp.any(det_unmatched)
    iou_match = jax.lax.cond(run2, stage2, skip2, None)

    match = jnp.where(cascade_match >= 0, cascade_match, iou_match)
    nd = dets.valid.shape[0]
    claimed = jnp.zeros((nd + 1,), jnp.bool_).at[
        jnp.where(iou_match >= 0, iou_match, nd)].set(True)[:nd]
    det_unmatched = det_unmatched & ~claimed
    return match, det_unmatched


@partial(jax.jit, static_argnames=("params",), donate_argnames=("state",))
def update(state: TrackerState, dets: Detections,
           params: TrackerParams) -> TrackerState:
    """Measurement update + track management for one frame.

    ``predict`` must have been called first (as in the reference, where
    ``DeepSORT.update`` calls ``tracker_core.predict()`` then ``.update()``).
    """
    t = params.max_tracks
    g = params.nn_budget
    rows = jnp.arange(t)

    match, det_unmatched = _associate(state, dets, params)
    matched = match >= 0
    det_idx = jnp.clip(match, 0)

    # --- Matched tracks: KF correction + attribute updates ------------------
    # lax.cond-guarded: with no matches this frame, the vmapped Cholesky
    # KF update over all T slots and the gallery ring write are dead work
    # (exact skip — every consumer masks by `matched`).
    def with_matches(_):
        meas_xyah = tlwh_to_xyah(dets.tlwh)[det_idx]  # (T, 4)
        # NSA (params.nsa): measurement noise scaled by (1 - confidence) —
        # params is static, so the off branch compiles to the reference's
        # exact fixed-noise update.
        nsa_conf = dets.conf[det_idx] if params.nsa else None
        up_mean, up_cov = kalman.update(state.mean, state.cov, meas_xyah,
                                        confidence=nsa_conf)
        mean = jnp.where(matched[:, None], up_mean, state.mean)
        cov = jnp.where(matched[:, None, None], up_cov, state.cov)

        add_feat = matched & dets.has_feature[det_idx]
        new_feats = dets.feature[det_idx]  # (T, D)
        if params.ema_alpha > 0.0:
            # StrongSORT-style EMA appearance bank: one normalized
            # embedding per track in gallery slot 0,
            # e = normalize(a*e + (1-a)*normalize(f)). First feature
            # (count == 0) initializes the bank directly.
            a = jnp.float32(params.ema_alpha)
            f_n = new_feats / jnp.maximum(
                jnp.linalg.norm(new_feats, axis=-1, keepdims=True), 1e-7)
            cur = state.gallery[:, 0]
            blend = a * cur + (1.0 - a) * f_n
            blend = blend / jnp.maximum(
                jnp.linalg.norm(blend, axis=-1, keepdims=True), 1e-7)
            ema = jnp.where((state.gallery_count > 0)[:, None], blend, f_n)
            gallery = state.gallery.at[:, 0].set(
                jnp.where(add_feat[:, None], ema, cur))
            gallery_count = jnp.where(
                add_feat, jnp.maximum(state.gallery_count, 1),
                state.gallery_count)
            gallery_next = state.gallery_next
        else:
            # Gallery append (FIFO ring, reference track.py:70-74).
            pos = state.gallery_next
            cur = state.gallery[rows, pos]
            gallery = state.gallery.at[rows, pos].set(
                jnp.where(add_feat[:, None], new_feats, cur))
            gallery_count = jnp.where(
                add_feat, jnp.minimum(state.gallery_count + 1, g),
                state.gallery_count)
            gallery_next = jnp.where(add_feat, (pos + 1) % g,
                                     state.gallery_next)
        return mean, cov, gallery, gallery_count, gallery_next

    def no_matches(_):
        return (state.mean, state.cov, state.gallery, state.gallery_count,
                state.gallery_next)

    mean, cov, gallery, gallery_count, gallery_next = jax.lax.cond(
        jnp.any(matched), with_matches, no_matches, None)

    hits = jnp.where(matched, state.hits + 1, state.hits)
    tsu = jnp.where(matched, 0, state.tsu)
    conf = jnp.where(matched, dets.conf[det_idx], state.conf)
    class_id = jnp.where(matched, dets.class_id[det_idx], state.class_id)
    st = jnp.where(
        matched & (state.state == TENTATIVE) & (hits >= params.n_init),
        CONFIRMED, state.state)

    # --- Unmatched tracks: mark_missed (track.py:106-119) -------------------
    missed = state.active & ~matched
    delete = missed & (
        (state.state == TENTATIVE)
        | ((state.state == CONFIRMED) & (tsu > params.max_age)))
    active = state.active & ~delete

    # --- Unmatched detections: initiate new tracks --------------------------
    # lax.cond-guarded: frames with no new detections skip the KF initiate
    # over all N det slots and the dozen scatters (exact skip — with
    # new_det all-False every scatter would drop everything anyway).
    new_det = det_unmatched & dets.valid

    def initiate_new(ops):
        (active, st, mean, cov, hits, tsu, class_id, conf,
         gallery, gallery_count, gallery_next) = ops
        free = ~active
        n_free = jnp.sum(free)
        # slot_of_rank[r] = index of the r-th free slot.
        slot_rank = jnp.cumsum(free) - 1
        slot_of_rank = jnp.full((t + 1,), t, jnp.int32).at[
            jnp.where(free, slot_rank, t)].set(rows.astype(jnp.int32))[:t]

        det_rank = jnp.cumsum(new_det) - 1  # rank among new detections
        can_place = new_det & (det_rank < n_free)
        dropped = jnp.sum(new_det & ~can_place).astype(jnp.int32)
        slot_for_det = jnp.where(
            can_place, slot_of_rank[jnp.clip(det_rank, 0, t - 1)], t)  # t=dump

        init_mean, init_cov = kalman.initiate(tlwh_to_xyah(dets.tlwh))
        new_ids = state.next_id + det_rank.astype(jnp.int32)

        def scatter(arr, values):
            """Scatter per-detection values into track slots.

            Unplaceable detections carry slot index ``t`` (out of bounds);
            ``mode="drop"`` discards them in the scatter itself — no
            concatenate/pad/slice copies of the (potentially large) target
            array per frame.
            """
            return arr.at[slot_for_det].set(values.astype(arr.dtype),
                                            mode="drop")

        active = scatter(active, jnp.ones_like(new_det))
        st = scatter(st, jnp.full_like(det_rank, TENTATIVE))
        mean = scatter(mean, init_mean)
        cov = scatter(cov, init_cov)
        hits = scatter(hits, jnp.ones_like(det_rank))
        age = scatter(state.age, jnp.ones_like(det_rank))
        tsu = scatter(tsu, jnp.zeros_like(det_rank))
        track_id = scatter(state.track_id, new_ids)
        class_id = scatter(class_id, dets.class_id)
        conf = scatter(conf, dets.conf)

        # Seed gallery with the initiating detection's feature
        # (track.py:63-64). Only position 0 is written; anything a previous
        # slot occupant left beyond gallery_count is dead data — every
        # reader masks by gallery_valid = arange(G) < gallery_count
        # (costs.py:114-137), and the FIFO append writes each position
        # before count makes it valid. This avoids materializing a
        # (N, G, D) zero tensor and scattering full gallery rows (G*D
        # floats per detection) every frame.
        seed = dets.has_feature
        seed_feat = dets.feature
        if params.ema_alpha > 0.0:
            # The EMA bank lives in normalized space; normalize the seed so
            # the first blend in `with_matches` starts from a unit vector.
            seed_feat = seed_feat / jnp.maximum(
                jnp.linalg.norm(seed_feat, axis=-1, keepdims=True), 1e-7)
        gallery = gallery.at[slot_for_det, 0].set(
            jnp.where(seed[:, None], seed_feat, 0.0).astype(gallery.dtype),
            mode="drop")
        gallery_count = scatter(gallery_count, seed.astype(jnp.int32))
        gallery_next = scatter(gallery_next, seed.astype(jnp.int32) % g)

        n_new = jnp.sum(can_place).astype(jnp.int32)
        return (active, st, mean, cov, hits, age, tsu, track_id, class_id,
                conf, gallery, gallery_count, gallery_next, n_new, dropped)

    def no_new(ops):
        (active, st, mean, cov, hits, tsu, class_id, conf,
         gallery, gallery_count, gallery_next) = ops
        return (active, st, mean, cov, hits, state.age, tsu,
                state.track_id, class_id, conf, gallery, gallery_count,
                gallery_next, jnp.int32(0), jnp.int32(0))

    (active, st, mean, cov, hits, age, tsu, track_id, class_id, conf,
     gallery, gallery_count, gallery_next, n_new, dropped) = jax.lax.cond(
        jnp.any(new_det), initiate_new, no_new,
        (active, st, mean, cov, hits, tsu, class_id, conf,
         gallery, gallery_count, gallery_next))

    return state.replace(
        active=active, state=st, mean=mean, cov=cov,
        hits=hits, age=age, tsu=tsu,
        track_id=track_id, class_id=class_id, conf=conf,
        gallery=gallery, gallery_count=gallery_count,
        gallery_next=gallery_next,
        next_id=state.next_id + n_new,
        dropped=state.dropped + dropped.astype(jnp.int32),
    )


@jax.jit
def get_outputs(state: TrackerState):
    """Confirmed tracks updated this frame, as (tlbr, id, class, conf, mask).

    Mirrors the reference output contract (deepsort_tracker.py:126-141):
    only confirmed tracks with ``time_since_update == 0``; widths/heights
    clamped at >= 0.
    """
    tlwh = mean_to_tlwh(state.mean)
    tlwh = tlwh.at[:, 2:].set(jnp.maximum(tlwh[:, 2:], 0.0))
    tlbr = tlwh_to_tlbr(tlwh)
    out_mask = state.active & (state.state == CONFIRMED) & (state.tsu == 0)
    # Canonical masked lanes: emit zeros where mask is False instead of a
    # dead slot's stale mean/id/conf. Consumers must filter by mask either
    # way; canonicalization makes outputs a pure function of the LIVE
    # tracks, so the capacity-bucketed scan (whose padded high lanes are
    # zeros by construction) is bitwise-equal to the full scan even after
    # high-slot churn.
    z = out_mask
    return (jnp.where(z[:, None], tlbr, 0.0),
            jnp.where(z, state.track_id, 0),
            jnp.where(z, state.class_id, 0),
            jnp.where(z, state.conf, 0.0),
            out_mask)
