"""Randomized parity: the on-device two-stage association vs a NumPy oracle.

The oracle reimplements the reference's matching semantics
(tracker_core._match: gated-appearance cascade over confirmed tracks by
time_since_update level, then IoU matching for tentative + just-missed
confirmed tracks) with scipy's Hungarian — independently of the JAX code.
Randomized track banks and detection sets must produce identical match
sets (up to equal-cost ties, which the generator avoids by construction).
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from aicamera_tpu.core import kalman
from aicamera_tpu.core.costs import INFTY_COST
from aicamera_tpu.core.state import CONFIRMED, TENTATIVE, Detections, TrackerParams, init_state
from aicamera_tpu.core.tracker import _associate

P = TrackerParams(max_tracks=24, max_detections=12, nn_budget=4,
                  feature_dim=8, n_init=3, max_age=20)


def random_scenario(seed):
    rng = np.random.RandomState(seed)
    t, n = P.max_tracks, P.max_detections
    n_tracks = rng.randint(0, 12)
    n_dets = rng.randint(0, 10)

    state = init_state(P)
    active = np.zeros(t, bool)
    st = np.zeros(t, np.int32)
    tsu = np.zeros(t, np.int32)
    mean = np.zeros((t, 8), np.float32)
    cov = np.tile(np.eye(8, dtype=np.float32) * 25.0, (t, 1, 1))
    gallery = np.zeros((t, P.nn_budget, P.feature_dim), np.float32)
    gal_count = np.zeros(t, np.int32)

    for i in range(n_tracks):
        active[i] = True
        st[i] = CONFIRMED if rng.rand() < 0.7 else TENTATIVE
        tsu[i] = rng.randint(1, 4)
        cx, cy = rng.uniform(50, 450, 2)
        h = rng.uniform(40, 90)
        mean[i, :4] = [cx, cy, rng.uniform(0.4, 0.6), h]
        k = rng.randint(1, P.nn_budget + 1)
        gal_count[i] = k
        g = rng.rand(k, P.feature_dim).astype(np.float32)
        gallery[i, :k] = g / np.linalg.norm(g, axis=1, keepdims=True)

    state = state.replace(
        active=jnp.asarray(active), state=jnp.asarray(st),
        tsu=jnp.asarray(tsu), mean=jnp.asarray(mean), cov=jnp.asarray(cov),
        gallery=jnp.asarray(gallery), gallery_count=jnp.asarray(gal_count))

    tlwh = np.zeros((n, 4), np.float32)
    feats = np.zeros((n, P.feature_dim), np.float32)
    has_feat = np.zeros(n, bool)
    valid = np.zeros(n, bool)
    for j in range(n_dets):
        valid[j] = True
        if rng.rand() < 0.6 and n_tracks:  # near an existing track
            i = rng.randint(n_tracks)
            cx, cy, a, h = mean[i, :4]
            cx += rng.uniform(-15, 15)
            cy += rng.uniform(-15, 15)
        else:
            cx, cy = rng.uniform(50, 450, 2)
            a, h = rng.uniform(0.4, 0.6), rng.uniform(40, 90)
        w = a * h
        tlwh[j] = [cx - w / 2, cy - h / 2, w, h]
        has_feat[j] = rng.rand() < 0.85
        if has_feat[j]:
            if rng.rand() < 0.5 and n_tracks:
                i = rng.randint(n_tracks)
                base = gallery[i, 0] if gal_count[i] else None
                f = (base + rng.randn(P.feature_dim).astype(np.float32) * 0.05
                     if base is not None else rng.rand(P.feature_dim))
            else:
                f = rng.rand(P.feature_dim).astype(np.float32)
            feats[j] = f / max(np.linalg.norm(f), 1e-7)

    dets = Detections(
        tlwh=jnp.asarray(tlwh), conf=jnp.full((n,), 0.9),
        class_id=jnp.zeros((n,), jnp.int32), feature=jnp.asarray(feats),
        has_feature=jnp.asarray(has_feat), valid=jnp.asarray(valid))
    host = dict(active=active, st=st, tsu=tsu, mean=mean, cov=cov,
                gallery=gallery, gal_count=gal_count, tlwh=tlwh,
                feats=feats, has_feat=has_feat, valid=valid)
    return state, dets, host


# --- NumPy oracle of the reference's two-stage matching ---------------------


def np_gating(mean, cov, meas_xyah):
    pm, pc = kalman.project(jnp.asarray(mean[None]), jnp.asarray(cov[None]))
    pm, pc = np.asarray(pm)[0], np.asarray(pc)[0]
    d = meas_xyah - pm
    l = np.linalg.cholesky(pc)
    z = np.linalg.solve(l, d.T)
    return np.sum(z * z, axis=0)


def np_min_cost_matching(cost, rows, cols, max_distance):
    """Reference min_cost_matching semantics (linear_assignment.py:19-88)."""
    if not rows or not cols:
        return [], list(rows), list(cols)
    sub = cost[np.ix_(rows, cols)].copy()
    sub[sub > max_distance] = max_distance + 1e-5
    ri, ci = linear_sum_assignment(sub)
    matches, um_rows, um_cols = [], list(rows), list(cols)
    for r, c in zip(ri, ci):
        if sub[r, c] <= max_distance:
            matches.append((rows[r], cols[c]))
            um_rows.remove(rows[r])
            um_cols.remove(cols[c])
    return matches, um_rows, um_cols


def np_associate(host, params):
    t = len(host["active"])
    n = len(host["valid"])
    valid_dets = [j for j in range(n) if host["valid"][j]]

    # appearance cost with Mahalanobis gate
    meas = np.zeros((n, 4), np.float32)
    for j in range(n):
        x, y, w, h = host["tlwh"][j]
        meas[j] = [x + w / 2, y + h / 2, (w / h if h else 0.0), h]
    app = np.full((t, n), INFTY_COST, np.float32)
    for i in range(t):
        if not host["active"][i] or host["gal_count"][i] == 0:
            continue
        g = host["gallery"][i, :host["gal_count"][i]]
        g = g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-7)
        for j in range(n):
            if not host["has_feat"][j]:
                continue
            f = host["feats"][j]
            f = f / max(np.linalg.norm(f), 1e-7)
            app[i, j] = max(0.0, np.min(1.0 - g @ f))
        gd = np_gating(host["mean"][i], host["cov"][i], meas)
        app[i, gd > kalman.CHI2INV95[4]] = INFTY_COST

    confirmed = [i for i in range(t)
                 if host["active"][i] and host["st"][i] == CONFIRMED]
    matches = []
    unmatched = list(valid_dets)
    for level in range(params.max_age):  # cascade
        if not unmatched:
            break
        rows = [i for i in confirmed if host["tsu"][i] == level + 1]
        if not rows:
            continue
        m, _, unmatched = np_min_cost_matching(
            app, rows, unmatched, params.max_cosine_distance)
        matches += m

    # IoU stage: tentative + just-missed confirmed
    matched_rows = {i for i, _ in matches}
    iou_rows = [i for i in range(t) if host["active"][i] and (
        host["st"][i] == TENTATIVE or (
            host["st"][i] == CONFIRMED and i not in matched_rows
            and host["tsu"][i] == 1))]
    iou = np.full((t, n), INFTY_COST, np.float32)
    for i in range(t):
        cx, cy, a, h = host["mean"][i, :4]
        w = a * h if h > 0 else 0.0
        hh = max(h, 0.0)
        bx = [cx - w / 2, cy - hh / 2, w, hh]
        for j in range(n):
            dx = host["tlwh"][j]
            ix1 = max(bx[0], dx[0])
            iy1 = max(bx[1], dx[1])
            ix2 = min(bx[0] + bx[2], dx[0] + dx[2])
            iy2 = min(bx[1] + bx[3], dx[1] + dx[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            union = bx[2] * bx[3] + dx[2] * dx[3] - inter
            iou[i, j] = 1.0 - inter / max(union, 1e-7)
    m, _, unmatched = np_min_cost_matching(
        iou, iou_rows, unmatched, params.max_iou_distance)
    matches += m
    return sorted(matches), sorted(unmatched)


@pytest.mark.parametrize("seed", range(25))
def test_association_matches_numpy_oracle(seed):
    state, dets, host = random_scenario(seed)
    match, det_unmatched = _associate(state, dets, P)
    match = np.asarray(match)
    ours = sorted((i, int(match[i])) for i in range(P.max_tracks)
                  if match[i] >= 0)
    ours_unmatched = sorted(
        j for j in range(P.max_detections)
        if host["valid"][j] and np.asarray(det_unmatched)[j])
    ref_matches, ref_unmatched = np_associate(host, P)
    assert ours == ref_matches, (seed, ours, ref_matches)
    assert ours_unmatched == ref_unmatched, (seed, ours_unmatched,
                                             ref_unmatched)
