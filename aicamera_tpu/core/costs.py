"""Batched association cost matrices (IoU, cosine appearance) and box math.

Replaces the reference's per-track loops (``src/tracker/core/matching.py``:
iou :13, iou_cost :57, cosine_distance :109, appearance_cost_metric :144)
with single batched einsums over the whole padded track bank and detection
set — the exact shape of work the TPU MXU/VPU wants.

Numerics preserved: IoU epsilon 1e-7; cosine distance uses L2 normalization
with a 1e-7 norm floor and clips distances at >= 0; appearance cost is the
minimum cosine distance over a track's feature gallery; infeasible entries
(no gallery / no detection feature) get ``INFTY_COST = 1e5``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# The association math must stay true f32: this environment defaults f32
# matmuls to bf16 MXU passes, which perturbs cosine costs by ~1e-3 — enough
# to flip near-threshold ID decisions. HIGHEST forces full f32 accumulation.
_PRECISION = lax.Precision.HIGHEST

# Large cost marking infeasible assignments (reference linear_assignment.py:9).
INFTY_COST = 1e5


# --- Box conversions ---------------------------------------------------------

def tlwh_to_xyah(tlwh: jnp.ndarray) -> jnp.ndarray:
    """(tlx, tly, w, h) -> (cx, cy, a=w/h, h); a=0 when h==0.

    Mirrors reference ``Detection.to_xyah`` (detection.py:36-47).
    """
    x, y, w, h = tlwh[..., 0], tlwh[..., 1], tlwh[..., 2], tlwh[..., 3]
    cx = x + w / 2.0
    cy = y + h / 2.0
    a = jnp.where(h != 0, w / jnp.where(h != 0, h, 1.0), 0.0)
    return jnp.stack([cx, cy, a, h], axis=-1)


def mean_to_tlwh(mean: jnp.ndarray) -> jnp.ndarray:
    """KF state mean (cx, cy, a, h, ...) -> (tlx, tly, w, h).

    Mirrors reference ``Track.to_tlwh`` (track.py:133-151): width = a*h when
    h > 0 else 0, and height is clamped at >= 0.
    """
    cx, cy, a, h = mean[..., 0], mean[..., 1], mean[..., 2], mean[..., 3]
    w = jnp.where(h > 0, a * h, 0.0)
    h = jnp.maximum(h, 0.0)
    return jnp.stack([cx - w / 2.0, cy - h / 2.0, w, h], axis=-1)


def tlwh_to_tlbr(tlwh: jnp.ndarray) -> jnp.ndarray:
    """(tlx, tly, w, h) -> (x1, y1, x2, y2)."""
    return jnp.concatenate(
        [tlwh[..., :2], tlwh[..., :2] + tlwh[..., 2:]], axis=-1)


# --- IoU ---------------------------------------------------------------------

def iou_matrix(boxes_a_tlwh: jnp.ndarray, boxes_b_tlwh: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two tlwh box sets: ``(T, 4) x (N, 4) -> (T, N)``."""
    a_tl = boxes_a_tlwh[:, None, :2]
    a_br = a_tl + boxes_a_tlwh[:, None, 2:]
    b_tl = boxes_b_tlwh[None, :, :2]
    b_br = b_tl + boxes_b_tlwh[None, :, 2:]

    inter_tl = jnp.maximum(a_tl, b_tl)
    inter_br = jnp.minimum(a_br, b_br)
    inter_wh = jnp.maximum(0.0, inter_br - inter_tl)
    inter = inter_wh[..., 0] * inter_wh[..., 1]

    area_a = (boxes_a_tlwh[:, 2] * boxes_a_tlwh[:, 3])[:, None]
    area_b = (boxes_b_tlwh[:, 2] * boxes_b_tlwh[:, 3])[None, :]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-7)


def iou_cost_matrix(track_tlwh: jnp.ndarray, det_tlwh: jnp.ndarray) -> jnp.ndarray:
    """IoU association cost: ``1 - IoU`` (reference matching.py:57-106)."""
    return 1.0 - iou_matrix(track_tlwh, det_tlwh)


# --- Appearance --------------------------------------------------------------

def _l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, 1e-7)


def cosine_distance_matrix(feats_a: jnp.ndarray, feats_b: jnp.ndarray,
                           data_is_normalized: bool = False) -> jnp.ndarray:
    """Pairwise cosine distance ``1 - cos_sim``: ``(M, D) x (N, D) -> (M, N)``.

    Clipped at >= 0 like the reference (matching.py:109-141).
    """
    if not data_is_normalized:
        feats_a = _l2_normalize(feats_a)
        feats_b = _l2_normalize(feats_b)
    sim = jnp.matmul(feats_a, feats_b.T, precision=_PRECISION)
    return jnp.maximum(1.0 - sim, 0.0)


def appearance_cost_matrix(gallery: jnp.ndarray,
                           gallery_valid: jnp.ndarray,
                           det_features: jnp.ndarray,
                           det_has_feature: jnp.ndarray) -> jnp.ndarray:
    """Min-over-gallery cosine cost between every track and every detection.

    Args:
        gallery: ``(T, G, D)`` per-track feature galleries (stored
            L2-normalized at insertion; renormalizing is idempotent).
        gallery_valid: ``(T, G)`` bool mask of populated gallery slots.
        det_features: ``(N, D)`` detection ReID features.
        det_has_feature: ``(N,)`` bool; False for detections whose crop was
            degenerate (reference passes ``feature=None`` for those,
            deepsort_tracker.py:161-199).

    Returns:
        ``(T, N)`` cost matrix; ``INFTY_COST`` where a track has an empty
        gallery or a detection has no feature (matching.py:185-193).
    """
    t, g, d = gallery.shape
    gal = _l2_normalize(gallery.reshape(t * g, d))
    det = _l2_normalize(det_features)
    # (T*G, N) similarity on the MXU, then min over valid gallery entries.
    dist = jnp.maximum(
        1.0 - jnp.matmul(gal, det.T, precision=_PRECISION), 0.0
    ).reshape(t, g, -1)
    dist = jnp.where(gallery_valid[:, :, None], dist, jnp.inf)
    cost = jnp.min(dist, axis=1)  # (T, N)

    track_has_gallery = jnp.any(gallery_valid, axis=1)
    cost = jnp.where(track_has_gallery[:, None], cost, INFTY_COST)
    cost = jnp.where(det_has_feature[None, :], cost, INFTY_COST)
    return jnp.where(jnp.isfinite(cost), cost, INFTY_COST)
