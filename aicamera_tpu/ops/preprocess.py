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
    # actual output canvas: == dst_hw in square mode; unpad + stride-modulo
    # padding in `auto` (minimum-rectangle) mode
    out_hw: Tuple[int, int] = None

    def __post_init__(self):
        if self.out_hw is None:
            object.__setattr__(self, "out_hw", tuple(self.dst_hw))

    @property
    def bottom(self) -> int:
        return self.out_hw[0] - self.unpad_hw[0] - self.top

    @property
    def right(self) -> int:
        return self.out_hw[1] - self.unpad_hw[1] - self.left


def letterbox_spec(src_hw: Tuple[int, int], dst_hw: Tuple[int, int],
                   scaleup: bool = False, auto: bool = False,
                   scale_fill: bool = False,
                   stride: int = 32) -> LetterboxSpec:
    """Compute letterbox geometry (image_processing.py:37-67 semantics).

    Modes (full reference-utility surface, image_processing.py:7-70):
      * default (``auto=False, scale_fill=False``): pad to the exact
        ``dst_hw`` square/rectangle — the configuration the detect
        pipeline uses (preprocess_yolo_input :92).
      * ``auto=True``: minimum rectangle — padding is reduced modulo
        ``stride``, so the output is ``unpad + (pad % stride)`` per side
        pair, generally smaller than ``dst_hw``.
      * ``scale_fill=True`` (reference ``scaleFill``): stretch to
        ``dst_hw`` with no padding. The returned ``ratio`` intentionally
        stays the min-ratio ``r`` (not the per-axis gains) — the reference
        returns the same quirk for unscaling consistency (:57-61).
    """
    sh, sw = src_hw
    dh_, dw_ = dst_hw
    r = min(dh_ / sh, dw_ / sw)
    if not scaleup:
        r = min(r, 1.0)
    unpad = (int(round(sh * r)), int(round(sw * r)))
    pad_w = dw_ - unpad[1]
    pad_h = dh_ - unpad[0]
    if auto:  # minimum rectangle: stride-multiple padding only
        pad_w %= stride
        pad_h %= stride
    elif scale_fill:  # stretch, no padding
        pad_w = pad_h = 0
        unpad = (dh_, dw_)
    dw = pad_w / 2.0
    dh = pad_h / 2.0
    top = int(round(dh - 0.1))
    bottom = int(round(dh + 0.1))
    left = int(round(dw - 0.1))
    right = int(round(dw + 0.1))
    out_hw = (unpad[0] + top + bottom, unpad[1] + left + right)
    return LetterboxSpec(src_hw=tuple(src_hw), dst_hw=tuple(dst_hw),
                         ratio=r, unpad_hw=unpad, pad_wh=(dw, dh),
                         top=top, left=left, out_hw=out_hw)


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
    dh, dw = spec.out_hw
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


def letterbox(im: np.ndarray, new_shape=(640, 640),
              color=(114, 114, 114), auto: bool = True,
              scaleFill: bool = False, scaleup: bool = True,
              stride: int = 32):
    """Host-side letterbox with the reference utility's full surface and
    return contract (image_processing.py:7-70): returns
    ``(padded_image, (r, r), (dw, dh))``.

    The geometry comes from :func:`letterbox_spec` (shared with the
    device path); pixel work is cv2 (host I/O layer, like the reference).
    Defaults mirror the reference utility (``auto=True, scaleup=True``),
    NOT the detect pipeline's configuration (``auto=False,
    scaleup=False``).
    """
    import cv2

    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    spec = letterbox_spec(im.shape[:2], new_shape, scaleup=scaleup,
                          auto=auto, scale_fill=scaleFill, stride=stride)
    out = im
    if spec.unpad_hw != spec.src_hw:
        out = cv2.resize(im, (spec.unpad_hw[1], spec.unpad_hw[0]),
                         interpolation=cv2.INTER_LINEAR)
    out = cv2.copyMakeBorder(out, spec.top, spec.bottom, spec.left,
                             spec.right, cv2.BORDER_CONSTANT, value=color)
    return out, (spec.ratio, spec.ratio), spec.pad_wh


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
