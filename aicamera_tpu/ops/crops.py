"""On-device ReID crop extraction: gather + resize + normalize, batched.

The reference extracts crops on the host (``deepsort_tracker.py:143-159``:
integer-clamped slicing of the BGR frame) and preprocesses each with cv2
(``image_processing.py:105-138``: resize to 128x64, BGR->RGB, ImageNet
mean/std, NCHW) before a separate GPU round trip. Here the whole thing runs
inside the jitted step: each crop's resize is two small dense matmuls
(separable bilinear with box-dependent weight matrices), vmapped over a
fixed padded crop batch — MXU work instead of host loops.

Semantics parity: crop bounds are the truncated box coords clamped to the
frame (int(x) then clamp, matching Python ``int()`` truncation for the
positive clamped range); boxes with empty clamped extent produce a zero
crop and ``valid=False`` (the reference's ``feature=None`` path).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import jax

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _axis_weights(lo, hi, out_size: int, src_size: int):
    """Bilinear sampling weights (out_size, src_size) for crop [lo, hi).

    Half-pixel mapping within the crop (cv2.INTER_LINEAR), edge-clamped.
    lo/hi are traced scalars (crop bounds in source pixels).
    """
    extent = (hi - lo).astype(jnp.float32)
    scale = extent / out_size
    coords = lo + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, lo.astype(jnp.float32),
                      jnp.maximum(hi.astype(jnp.float32) - 1.0, lo.astype(jnp.float32)))
    src = jnp.arange(src_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - src[None, :]))


def extract_reid_crops(frame_bgr: jnp.ndarray, boxes_xyxy: jnp.ndarray,
                       out_hw: Tuple[int, int] = (128, 64),
                       compute_dtype=None):
    """Extract, resize and normalize ReID crops for a batch of boxes.

    Args:
        frame_bgr: ``(H, W, 3)`` uint8 (or float) BGR source frame.
        boxes_xyxy: ``(N, 4)`` float boxes in frame coordinates.
        out_hw: output crop size (H, W) — the ReID input shape.
        compute_dtype: resize/normalize dtype. Defaults to the backend
            policy (bf16 on TPU, f32 elsewhere) so CPU parity runs keep
            full precision.

    Returns:
        crops: ``(N, out_h, out_w, 3)`` normalized RGB (ImageNet mean/std).
        valid: ``(N,)`` bool — False where the clamped box was empty.
    """
    if compute_dtype is None:
        from ..runtime.params import compute_dtype as _policy
        compute_dtype = _policy()
    h, w = frame_bgr.shape[:2]
    oh, ow = out_hw
    img = frame_bgr.astype(compute_dtype)

    x1 = jnp.clip(jnp.trunc(boxes_xyxy[:, 0]), 0, w).astype(jnp.int32)
    y1 = jnp.clip(jnp.trunc(boxes_xyxy[:, 1]), 0, h).astype(jnp.int32)
    x2 = jnp.clip(jnp.trunc(boxes_xyxy[:, 2]), 0, w).astype(jnp.int32)
    y2 = jnp.clip(jnp.trunc(boxes_xyxy[:, 3]), 0, h).astype(jnp.int32)
    valid = (x1 < x2) & (y1 < y2)

    def one_crop(x1i, y1i, x2i, y2i):
        wy = _axis_weights(y1i, y2i, oh, h).astype(compute_dtype)  # (oh, H)
        wx = _axis_weights(x1i, x2i, ow, w).astype(compute_dtype)  # (ow, W)
        tmp = jnp.einsum("oh,hwc->owc", wy, img)
        return jnp.einsum("pw,owc->opc", wx, tmp)  # (oh, ow, 3) BGR

    crops = jax.vmap(one_crop)(x1, y1, x2, y2)
    crops = crops[..., ::-1]  # BGR -> RGB
    mean = jnp.asarray(_IMAGENET_MEAN, compute_dtype)
    std = jnp.asarray(_IMAGENET_STD, compute_dtype)
    crops = (crops / 255.0 - mean) / std
    crops = jnp.where(valid[:, None, None, None], crops, 0)
    return crops, valid
