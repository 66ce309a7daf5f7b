"""Letterbox preprocessing on-device (uint8 BGR frame -> normalized RGB).

Reproduces the reference's letterbox math exactly (min-ratio, no scale-up,
half-side padding with the ±0.1 rounding trick, pad value 114 —
``src/utils/image_processing.py:7-70`` with ``auto=False, scaleup=False``
as used by ``preprocess_yolo_input`` :73-102), but runs inside ``jax.jit``
on the TPU instead of per-frame cv2 calls on the host. Geometry is static
per (source shape, target shape) pair, so it is computed in Python at trace
time; only pixels move through XLA.

Output is NHWC (TPU-native) rather than the reference's NCHW.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Resize must be true f32: this environment defaults f32 matmuls to bf16
# passes, which costs ~1 gray level of error vs cv2.
_PRECISION = lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class LetterboxSpec:
    """Static letterbox geometry for one (src, dst) shape pair."""
    src_hw: Tuple[int, int]
    dst_hw: Tuple[int, int]
    ratio: float          # scale applied to the source
    unpad_hw: Tuple[int, int]  # resized size before padding
    pad_wh: Tuple[float, float]  # (dw, dh) half-paddings, possibly fractional
    top: int
    left: int


def letterbox_spec(src_hw: Tuple[int, int], dst_hw: Tuple[int, int],
                   scaleup: bool = False) -> LetterboxSpec:
    """Compute letterbox geometry (image_processing.py:37-67 semantics)."""
    sh, sw = src_hw
    dh_, dw_ = dst_hw
    r = min(dh_ / sh, dw_ / sw)
    if not scaleup:
        r = min(r, 1.0)
    unpad = (int(round(sh * r)), int(round(sw * r)))
    dw = (dw_ - unpad[1]) / 2.0
    dh = (dh_ - unpad[0]) / 2.0
    top = int(round(dh - 0.1))
    left = int(round(dw - 0.1))
    return LetterboxSpec(src_hw=tuple(src_hw), dst_hw=tuple(dst_hw),
                         ratio=r, unpad_hw=unpad, pad_wh=(dw, dh),
                         top=top, left=left)


def _resize_weights(dst: int, src: int) -> np.ndarray:
    """Dense bilinear resize weight matrix (dst, src), half-pixel centers.

    Matches cv2.INTER_LINEAR coordinate mapping (no antialiasing):
    src_x = (dst_x + 0.5) * src/dst - 0.5, edge-clamped.
    """
    scale = src / dst
    coords = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0.0, src - 1)
    j = np.arange(src, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(coords[:, None] - j[None, :]))
    # rows sum to 1 by construction except exact-integer hits (sum 1 anyway)
    return w.astype(np.float32)


def preprocess_yolo(frame_bgr_u8: jnp.ndarray, spec: LetterboxSpec,
                    out_dtype=jnp.float32) -> jnp.ndarray:
    """uint8 BGR (H, W, 3) -> letterboxed normalized RGB (1, Dh, Dw, 3).

    Pipeline parity with reference preprocess_yolo_input (:73-102):
    letterbox-resize (bilinear) -> pad 114 -> BGR->RGB -> /255.
    Resize is two dense matmuls (separable bilinear) so the whole
    preprocess maps onto the MXU.
    """
    uh, uw = spec.unpad_hw
    dh, dw = spec.dst_hw
    x = frame_bgr_u8.astype(jnp.float32)
    if (uh, uw) != spec.src_hw:
        wy = jnp.asarray(_resize_weights(uh, spec.src_hw[0]))
        wx = jnp.asarray(_resize_weights(uw, spec.src_hw[1]))
        x = jnp.einsum("oh,hwc->owc", wy, x, precision=_PRECISION)
        x = jnp.einsum("pw,owc->opc", wx, x, precision=_PRECISION)
        # cv2 resizes in uint8 fixed-point and rounds; emulate the rounding
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    canvas = jnp.full((dh, dw, 3), 114.0, jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, x, (spec.top, spec.left, 0))
    canvas = canvas[..., ::-1]  # BGR -> RGB
    return (canvas / 255.0).astype(out_dtype)[None]


def scale_boxes_back(boxes_xyxy: jnp.ndarray, spec: LetterboxSpec) -> jnp.ndarray:
    """Map boxes from letterboxed space back to original frame coords.

    Parity with reference scale_bboxes (image_processing.py:141-183):
    subtract the fractional half-padding, divide by the ratio, clip to the
    original frame.
    """
    dw, dh = spec.pad_wh
    sh, sw = spec.src_hw
    x1 = jnp.clip((boxes_xyxy[..., 0] - dw) / spec.ratio, 0, sw)
    y1 = jnp.clip((boxes_xyxy[..., 1] - dh) / spec.ratio, 0, sh)
    x2 = jnp.clip((boxes_xyxy[..., 2] - dw) / spec.ratio, 0, sw)
    y2 = jnp.clip((boxes_xyxy[..., 3] - dh) / spec.ratio, 0, sh)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
