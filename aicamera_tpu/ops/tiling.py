"""Tiled (sliced) high-resolution detection: static tile grids + merge NMS.

Small objects in high-resolution sources (4K surveillance, drone footage)
shrink below YOLOv8's effective receptive field once the whole frame is
letterboxed to a 640x640 input. The standard answer (SAHI: "Slicing Aided
Hyper Inference", Akyon et al. 2022) slices the frame into overlapping
tiles, detects on each tile at native-ish scale, and merges the per-tile
detections with a global NMS. The reference has no equivalent — it always
letterboxes the full frame (``src/detector/yolo_detector.py:86-94``).

The TPU-native formulation is batch-parallel, not loop-sequential:

* the tile grid is STATIC per ``(frame_hw, grid, overlap)`` — computed in
  Python at trace time, so tile extraction is ``lax.dynamic_slice`` at
  constant offsets (pure data movement, fusible) rather than gather;
* all tiles (plus optionally the full frame) letterbox to the same model
  input shape, so detection is ONE batched forward on the MXU — a 3x3
  grid at 4K is a batch-10 640x640 dispatch, exactly the shape the
  chunked pipeline already proves efficient;
* the per-tile NMS outputs are merged by one fixed-shape global NMS
  (:func:`merge_detections`) that reuses the Jacobi greedy-keep fixpoint
  of :mod:`aicamera_tpu.ops.nms` — no host round-trip anywhere.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
from jax import lax

from .nms import _CLASS_OFFSET, _suppress_and_emit


def tile_layout(frame_hw: Tuple[int, int], grid: Tuple[int, int],
                overlap: float = 0.2):
    """Static tile origins and size for a ``grid=(gy, gx)`` slicing.

    The tile size is the smallest integer size such that ``gy x gx`` tiles
    with a fractional ``overlap`` between neighbours cover the frame; the
    last row/column is clamped flush to the frame edge, so coverage is
    exact (every pixel is inside >= 1 tile) for any frame size.

    Returns:
        (origins, (th, tw)): ``origins`` is a length ``gy*gx`` list of
        ``(y0, x0)`` ints (row-major), ``(th, tw)`` the common tile size.
    """
    gy, gx = grid
    h, w = frame_hw
    if gy < 1 or gx < 1:
        raise ValueError(f"grid must be >= 1x1, got {grid}")
    if not 0.0 <= overlap < 1.0:
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")

    def axis(n, size):
        if n == 1:
            return [0], size
        # n tiles of t with (n-1) overlaps of o*t cover n*t - (n-1)*o*t
        t = math.ceil(size / (n - (n - 1) * overlap))
        t = min(t, size)
        stride = (size - t) / (n - 1)  # exact flush packing
        return [round(i * stride) for i in range(n)], t

    ys, th = axis(gy, h)
    xs, tw = axis(gx, w)
    origins = [(y0, x0) for y0 in ys for x0 in xs]
    return origins, (th, tw)


def extract_tiles(frame_u8: jnp.ndarray, origins: List[Tuple[int, int]],
                  tile_hw: Tuple[int, int]) -> jnp.ndarray:
    """(H, W, 3) uint8 -> (T, th, tw, 3) stack of tiles.

    ``origins`` are trace-time constants, so each slice lowers to a
    static-offset ``dynamic_slice`` — XLA turns the stack into plain
    copies (often fused into the consumer), no gather tables.
    """
    th, tw = tile_hw
    return jnp.stack([
        lax.dynamic_slice(frame_u8, (y0, x0, 0), (th, tw, 3))
        for (y0, x0) in origins])


def offset_boxes(boxes_xyxy: jnp.ndarray, y0: int, x0: int) -> jnp.ndarray:
    """Shift tile-local xyxy boxes into frame coordinates."""
    return boxes_xyxy + jnp.asarray([x0, y0, x0, y0], boxes_xyxy.dtype)


def merge_detections(boxes: jnp.ndarray, scores: jnp.ndarray,
                     cls: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float, max_det: int,
                     frame_hw: Tuple[int, int] | None = None,
                     criterion: str = "iou"):
    """Global class-aware NMS over concatenated per-tile detections.

    Args:
        boxes: ``(N, 4)`` xyxy in FRAME coordinates (already offset).
        scores, cls, valid: ``(N,)`` score f32 / label i32 / validity bool.
        iou_threshold: suppression IoU (same semantics as the in-model NMS).
        max_det: output capacity.
        frame_hw: frame size the boxes live in. The class-aware NMS trick
            shifts boxes per class by an offset that must exceed every
            coordinate; the default (8192, sized for letterbox space) is
            too small for panoramic/stitched sources, so pass the frame
            size whenever it is known and the offset scales with it.
        criterion: "iou" (default — matches the in-model NMS semantics) or
            "ios" (intersection-over-smaller-area, SAHI's merge choice):
            a detection fragment clipped at a tile boundary often has
            IoU < threshold against the full-frame detection of the same
            object (both survive — seam duplicates), but its IoS is ~1,
            so "ios" collapses such pairs. Most relevant with
            ``overlap=0.0`` grids.

    Returns:
        ``(num, boxes (max_det, 4), scores (max_det,), labels (max_det,))``
        — the engine output contract of :func:`~aicamera_tpu.ops.nms.
        fused_decode_nms`. Duplicate detections of one object from
        overlapping tiles (or the full-frame pass) collapse to the
        highest-scoring candidate, exactly as sequential greedy NMS would.
    """
    n = boxes.shape[0]
    class_offset = _CLASS_OFFSET
    if frame_hw is not None:
        # Any offset strictly above the largest coordinate keeps the class
        # bands disjoint; 2x leaves headroom for un-clipped regressions.
        class_offset = max(_CLASS_OFFSET, 2.0 * max(frame_hw))
    order = jnp.where(valid, scores, -1.0)
    k_score, k_idx = lax.top_k(order, n)  # full sort by score
    return _suppress_and_emit(
        boxes[k_idx], k_score, cls[k_idx], k_score > 0,
        jnp.float32(iou_threshold), n, max_det,
        class_offset=class_offset, criterion=criterion)
