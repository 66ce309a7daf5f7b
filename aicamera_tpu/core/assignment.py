"""Jit-compatible optimal assignment (Hungarian / Jonker-Volgenant style).

The reference delegates track-detection assignment to
``scipy.optimize.linear_sum_assignment`` (C++ Hungarian) from Python per
cascade level (``src/tracker/core/linear_assignment.py:19-88``). Here the
solver itself runs on-device inside ``jax.jit`` so the whole tracking step
stays on the TPU with no host round trip: a shortest-augmenting-path LAPJV
solver over fixed-shape padded cost matrices, with masked (ineligible) rows
skipped at runtime via ``lax.cond`` and masked columns priced at the clamp
value so they can never displace a feasible match.

Semantics preserved from the reference:
- costs above ``max_distance`` are clamped to ``max_distance + 1e-5`` before
  solving (linear_assignment.py:58);
- accepted matches must satisfy ``cost <= max_distance`` post-solve (:76);
- the matching cascade runs one assignment per ``time_since_update`` level,
  against only the still-unmatched detections (:91-157).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class _PathState(NamedTuple):
    sr: jnp.ndarray       # (n,) bool — rows visited
    sc: jnp.ndarray       # (n,) bool — cols visited
    spc: jnp.ndarray      # (n,) f32 — shortest path cost to each col
    path: jnp.ndarray     # (n,) i32 — predecessor row for each col
    min_val: jnp.ndarray  # scalar f32
    cur_row: jnp.ndarray  # scalar i32
    sink: jnp.ndarray     # scalar i32, -1 until an unassigned col is found


def _augment_row(i, cost, u, v, col4row, row4col):
    """Run one shortest augmenting path from row ``i`` and apply it."""
    n = cost.shape[0]
    init = _PathState(
        sr=jnp.zeros((n,), jnp.bool_),
        sc=jnp.zeros((n,), jnp.bool_),
        spc=jnp.full((n,), jnp.inf, jnp.float32),
        path=jnp.full((n,), -1, jnp.int32),
        min_val=jnp.float32(0.0),
        cur_row=jnp.int32(i),
        sink=jnp.int32(-1),
    )

    def cond_fn(st: _PathState):
        return st.sink < 0

    def body_fn(st: _PathState):
        sr = st.sr.at[st.cur_row].set(True)
        reduced = st.min_val + cost[st.cur_row] - u[st.cur_row] - v
        upd = (~st.sc) & (reduced < st.spc)
        spc = jnp.where(upd, reduced, st.spc)
        path = jnp.where(upd, st.cur_row, st.path)
        masked = jnp.where(st.sc, jnp.inf, spc)
        j = jnp.argmin(masked).astype(jnp.int32)
        min_val = masked[j]
        sc = st.sc.at[j].set(True)
        r = row4col[j]
        sink = jnp.where(r < 0, j, jnp.int32(-1))
        cur_row = jnp.where(r < 0, st.cur_row, r)
        return _PathState(sr, sc, spc, path, min_val, cur_row, sink)

    st = lax.while_loop(cond_fn, body_fn, init)

    # Dual variable update (potentials), as in the classical JV scheme.
    rows = jnp.arange(n)
    u = u.at[i].add(st.min_val)
    spc_at_assigned = st.spc[jnp.clip(col4row, 0, n - 1)]
    u = jnp.where(st.sr & (rows != i), u + st.min_val - spc_at_assigned, u)
    v = jnp.where(st.sc, v - (st.min_val - st.spc), v)

    # Augment: walk back from the sink flipping assignments.
    def aug_cond(c):
        return ~c[3]

    def aug_body(c):
        j, row4col, col4row, _ = c
        i_ = st.path[j]
        row4col = row4col.at[j].set(i_)
        j_next = col4row[i_]
        col4row = col4row.at[i_].set(j)
        return (j_next, row4col, col4row, i_ == i)

    _, row4col, col4row, _ = lax.while_loop(
        aug_cond, aug_body, (st.sink, row4col, col4row, jnp.bool_(False)))
    return u, v, col4row, row4col


def solve_square(cost: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    """Optimal assignment on a square (n, n) cost matrix.

    Rows where ``row_mask`` is False are skipped (left unassigned). All cost
    entries must be finite. Returns ``col4row`` (n,) int32 with -1 for
    unassigned rows.

    The augmenting loop is bounded by the *runtime* number of eligible rows
    (eligible rows are compacted to the front with a stable sort), not the
    padded capacity — with 8 live tracks out of 128 slots only 8 augmenting
    passes execute. This is what keeps the sequential assignment cheap on
    TPU, where every loop iteration costs fixed scheduling overhead.
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)

    # --- Row-argmin pre-assignment (vectorized) -----------------------------
    # Each eligible row claims its own cheapest column; collisions resolve
    # to the smallest row index and the losers go through the normal
    # augmenting phase. Soundness: with duals u_i = rowmin_i (claim
    # winners), u_i = 0 (others), v = 0, all reduced costs are >= 0 (costs
    # are non-negative), every pre-assigned pair is tight, and v is zero on
    # every unmatched column — exactly the invariants the augmenting phase
    # preserves (its dual updates only lower v of scanned *matched*
    # columns, and the sink's v is unchanged since spc[sink] == min_val),
    # so the rectangular-Hungarian optimality certificate (v = 0 on
    # unmatched columns) holds at termination. NOTE: classical JV *column*
    # reduction (v[j] = column min) is NOT sound for this masked
    # rectangular problem — it leaves positive v on unmatched columns,
    # which breaks that certificate.
    #
    # In the common near-diagonal tracking case (every detection close to
    # exactly one track) every row wins a distinct column and ZERO
    # sequential augmenting passes run — this is what keeps the per-frame
    # scan cheap under saturated load, where each augment is a sequential
    # while-loop paying fixed sequencer overhead per iteration.
    rows = jnp.arange(n, dtype=jnp.int32)
    rowmin = jnp.min(cost, axis=1)
    jmin = jnp.argmin(cost, axis=1).astype(jnp.int32)
    winner = jnp.full((n,), n, jnp.int32).at[
        jnp.where(row_mask, jmin, n)].min(rows, mode="drop")
    assigned = row_mask & (winner[jmin] == rows)
    col4row = jnp.where(assigned, jmin, -1)
    row4col = jnp.full((n,), -1, jnp.int32).at[
        jnp.where(assigned, jmin, n)].set(
        jnp.where(assigned, rows, -1), mode="drop")
    u = jnp.where(assigned, rowmin, 0.0).astype(jnp.float32)
    v = jnp.zeros((n,), jnp.float32)

    # Compact still-unassigned eligible row indices to the front, preserving
    # index order (stable sort) so the augmentation order matches row order.
    # The whole augment phase (argsort compaction + sequential while_loop)
    # is lax.cond-guarded: in the common tracking case the pre-assignment
    # above resolves every row, and inside the per-frame scan the dead sort
    # + loop setup still pays fixed sequencer overhead per frame.
    todo = row_mask & ~assigned

    def augment_all(carry):
        u, v, col4row, row4col = carry
        order = jnp.argsort(~todo, stable=True).astype(jnp.int32)
        n_eligible = jnp.sum(todo).astype(jnp.int32)

        def cond_fn(c):
            return c[0] < n_eligible

        def body_fn(c):
            k, u, v, col4row, row4col = c
            i = order[k]
            u, v, col4row, row4col = _augment_row(
                i, cost, u, v, col4row, row4col)
            return (k + 1, u, v, col4row, row4col)

        _, u, v, col4row, row4col = lax.while_loop(
            cond_fn, body_fn, (jnp.int32(0), u, v, col4row, row4col))
        return u, v, col4row, row4col

    _, _, col4row, _ = lax.cond(
        jnp.any(todo), augment_all, lambda c: c, (u, v, col4row, row4col))
    return col4row


@partial(jax.jit, static_argnames=())
def min_cost_matching(cost: jnp.ndarray,
                      row_mask: jnp.ndarray,
                      col_mask: jnp.ndarray,
                      max_distance: jnp.ndarray) -> jnp.ndarray:
    """Masked minimum-cost matching with the reference's threshold semantics.

    Args:
        cost: ``(R, C)`` original cost matrix (may contain INFTY entries).
        row_mask: ``(R,)`` bool — rows eligible for matching.
        col_mask: ``(C,)`` bool — columns eligible for matching.
        max_distance: scalar acceptance threshold.

    Returns:
        ``(R,)`` int32: matched column per row, -1 if unmatched. A match is
        accepted only when both ends are eligible and the *original* cost is
        ``<= max_distance`` (reference linear_assignment.py:76).
    """
    r, c = cost.shape
    n = max(r, c)
    clamp = max_distance + 1e-5

    eligible = row_mask[:, None] & col_mask[None, :]
    feasible = eligible & (cost <= max_distance)
    # Rows/cols with no feasible entry can never yield an accepted match,
    # and in a min-sum assignment an infeasible row can never displace a
    # feasible row from its column (feasible cost < clamp strictly), so
    # dropping them preserves the accepted-match set while collapsing the
    # worst case (dense infeasible matrices) to a tiny solve.
    row_ok = row_mask & jnp.any(feasible, axis=1)
    col_ok = col_mask & jnp.any(feasible, axis=0)

    eligible = row_ok[:, None] & col_ok[None, :]
    clamped = jnp.where(eligible & (cost <= max_distance), cost, clamp)
    padded = jnp.full((n, n), clamp, jnp.float32)
    padded = padded.at[:r, :c].set(clamped.astype(jnp.float32))

    row_mask_p = jnp.zeros((n,), jnp.bool_).at[:r].set(row_ok)
    col4row = solve_square(padded, row_mask_p)[:r]

    j = jnp.clip(col4row, 0, c - 1)
    ok = (
        row_mask
        & (col4row >= 0)
        & (col4row < c)
        & col_mask[j]
        & (cost[jnp.arange(r), j] <= max_distance)
    )
    return jnp.where(ok, col4row, -1)


def matching_cascade(cost: jnp.ndarray,
                     track_level: jnp.ndarray,
                     track_eligible: jnp.ndarray,
                     det_valid: jnp.ndarray,
                     max_distance: float,
                     cascade_depth: int):
    """DeepSORT matching cascade over ``time_since_update`` levels.

    One assignment per level ``L`` in ``[1, cascade_depth]`` restricted to
    eligible tracks with ``track_level == L`` against still-unmatched
    detections (reference linear_assignment.py:91-157). The cost matrix is
    level-independent so it is computed once by the caller.

    Args:
        cost: ``(T, N)`` appearance cost (already Mahalanobis-gated).
        track_level: ``(T,)`` int — time_since_update per track.
        track_eligible: ``(T,)`` bool — confirmed, active tracks.
        det_valid: ``(N,)`` bool — detections available for matching.
        max_distance: acceptance threshold.
        cascade_depth: max level (== max_age).

    Returns:
        (match ``(T,)`` int32 det index or -1, det_unmatched ``(N,)`` bool).
    """
    t, nd = cost.shape
    match0 = jnp.full((t,), -1, jnp.int32)
    sentinel = jnp.int32(cascade_depth + 1)

    lv = jnp.where(
        track_eligible & (track_level >= 1) & (track_level <= cascade_depth),
        track_level.astype(jnp.int32), sentinel)

    def claim(lvl_match, det_unmatched):
        claimed = jnp.zeros((nd + 1,), jnp.bool_).at[
            jnp.where(lvl_match >= 0, lvl_match, nd)].set(True)[:nd]
        return det_unmatched & ~claimed

    # Fast path: every eligible track sits at the SAME level — true on
    # almost every frame of a healthy scene (all confirmed tracks matched
    # last frame have tsu == 1 at matching time), where the cascade is by
    # definition a single assignment. Skips the level sort/compaction and
    # the level loop, whose fixed cost is paid per frame inside the scan.
    lv_min = jnp.min(lv)

    def single_level(_):
        # rows from the masked `lv`, NOT track_level: an eligible track
        # beyond cascade_depth (tsu == max_age+1, transiently alive until
        # this update's mark_missed deletes it) has lv == sentinel and
        # must not participate, exactly as in the level loop.
        rows = (lv == lv_min) & (lv_min < sentinel)
        lvl_match = min_cost_matching(cost, rows, det_valid,
                                      jnp.float32(max_distance))
        return lvl_match, claim(lvl_match, det_valid)

    # General path: distinct levels ascending, compacted to the front; the
    # loop visits only levels actually present (typically 1-3 per frame),
    # not all `cascade_depth` levels.
    def multi_level(_):
        sorted_lv = jnp.sort(lv)
        is_first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), sorted_lv[1:] != sorted_lv[:-1]])
        is_distinct = is_first & (sorted_lv < sentinel)
        order = jnp.argsort(~is_distinct, stable=True)
        distinct = jnp.where(is_distinct[order], sorted_lv[order], sentinel)
        n_levels = jnp.sum(is_distinct).astype(jnp.int32)

        def cond_fn(carry):
            i, _, det_unmatched = carry
            return (i < n_levels) & jnp.any(det_unmatched)

        def body_fn(carry):
            i, match, det_unmatched = carry
            level = distinct[i]
            rows = track_eligible & (track_level == level)
            lvl_match = min_cost_matching(cost, rows, det_unmatched,
                                          jnp.float32(max_distance))
            match = jnp.where(lvl_match >= 0, lvl_match, match)
            return i + 1, match, claim(lvl_match, det_unmatched)

        _, match, det_unmatched = lax.while_loop(
            cond_fn, body_fn, (jnp.int32(0), match0, det_valid))
        return match, det_unmatched

    one_level = jnp.all((lv == sentinel) | (lv == lv_min))
    return lax.cond(one_level, single_level, multi_level, None)
