"""Fused letterbox preprocess as a Pallas TPU kernel.

One kernel pass fuses everything the reference does on the host with cv2
(``image_processing.py:73-102``: bilinear resize, 114-padding, BGR->RGB,
/255 normalize, dtype convert) and that the XLA path does as several ops:

- **both resample passes as MXU matmuls** against precomputed bilinear
  weight matrices — (tile, src_h) @ (src_h, src_w) vertical, then
  (tile, src_w) @ (src_w, dst_w) horizontal,
- pad region fill, BGR->RGB (grid channel remap), and [0,1] normalization
  in the fused epilogue (VPU) — no full-frame f32 intermediate in HBM.

Input is the raw uint8 BGR frame; output is the planar (3, dst, dst)
normalized RGB tensor (transposed to NHWC by XLA afterwards).

Grid: (channels, row-tiles of 64 output rows). The whole source plane and
both weight matrices sit in VMEM; frames too large for the f32 budget
stage in bf16, and frames too large for even that fall back to the XLA
path with identical semantics.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preprocess import LetterboxSpec

_ROW_TILE = 64


def _vertical_weights(spec: LetterboxSpec):
    """(dst_h, src_h) bilinear matrix for the vertical pass (+ content
    mask); pad rows are all-zero."""
    dst_h = spec.dst_hw[0]
    src_h = spec.src_hw[0]
    uh = spec.unpad_hw[0]
    oy = np.arange(dst_h)
    inside = (oy >= spec.top) & (oy < spec.top + uh)
    sy = (oy - spec.top + 0.5) * (src_h / uh) - 0.5
    sy = np.clip(sy, 0.0, src_h - 1)
    w = np.zeros((dst_h, src_h), np.float32)
    y0 = np.floor(sy).astype(np.int32)
    frac = (sy - y0).astype(np.float32)
    for d in np.nonzero(inside)[0]:
        i0 = min(int(y0[d]), src_h - 1)
        i1 = min(i0 + 1, src_h - 1)
        w[d, i0] += 1.0 - frac[d]
        w[d, i1] += frac[d]
    return w, inside.astype(np.float32)


def _horizontal_weights(spec: LetterboxSpec) -> np.ndarray:
    """(src_w, dst_w) bilinear matrix including horizontal padding columns
    (pad columns have all-zero weight; the pad value is added in the
    epilogue)."""
    dst_w = spec.dst_hw[1]
    src_w = spec.src_hw[1]
    uw = spec.unpad_hw[1]
    w = np.zeros((src_w, dst_w), np.float32)
    ox = np.arange(dst_w)
    inside = (ox >= spec.left) & (ox < spec.left + uw)
    sx = (ox - spec.left + 0.5) * (src_w / uw) - 0.5
    sx = np.clip(sx, 0.0, src_w - 1)
    x0 = np.floor(sx).astype(np.int32)
    frac = (sx - x0).astype(np.float32)
    for d in np.nonzero(inside)[0]:
        i0 = min(int(x0[d]), src_w - 1)
        i1 = min(i0 + 1, src_w - 1)
        w[i0, d] += 1.0 - frac[d]
        w[i1, d] += frac[d]
    return w, inside.astype(np.float32)


def _kernel(plane_ref, wy_ref, wx_ref, inside_y_ref, inside_x_ref,
            out_ref, *, pad_val: float):
    # Both resample passes are MXU matmuls: (TILE, src_h) @ (src_h, src_w)
    # then (TILE, src_w) @ (src_w, dst_w); the epilogue fuses round /
    # normalize / pad on the VPU. cv2 resizes in uint8 and rounds between
    # passes; we round once at the end (sub-LSB difference vs cv2).
    #
    # Letterbox pad rows are all-zero in wy: tiles made entirely of pad
    # rows (40% of the canvas for the standard 540p/720p/1080p -> 640x640
    # geometries, top/bottom bands of 140 rows) skip both matmuls and just
    # write the pad constant — the resize is MXU-bound, so this is a
    # proportional cut.
    has_content = jnp.any(inside_y_ref[0, :, 0] > 0)

    @pl.when(has_content)
    def _content():
        rows = jnp.dot(wy_ref[:], plane_ref[0, :, :],
                       preferred_element_type=jnp.float32)
        resized = jnp.dot(rows, wx_ref[:], preferred_element_type=jnp.float32)
        mask = inside_y_ref[0, :, :] * inside_x_ref[0, :, :]  # (T,1)x(1,W)
        out = jnp.clip(jnp.round(resized), 0.0, 255.0) / 255.0
        out_ref[0, :, :] = (out * mask + pad_val * (1.0 - mask)).astype(
            out_ref.dtype)

    @pl.when(jnp.logical_not(has_content))
    def _pad():
        out_ref[0, :, :] = jnp.full_like(out_ref[0, :, :], pad_val)


@functools.partial(jax.jit, static_argnames=("spec", "out_dtype"))
def preprocess_yolo_pallas(frame_bgr_u8: jnp.ndarray, spec: LetterboxSpec,
                           out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 BGR (H, W, 3) -> letterboxed normalized RGB (1, Dh, Dw, 3).

    Drop-in replacement for :func:`aicamera_tpu.ops.preprocess.
    preprocess_yolo`, fused as one Pallas kernel.
    """
    src_h, src_w = spec.src_hw
    dst_h, dst_w = spec.dst_hw
    assert dst_h % _ROW_TILE == 0

    # VMEM budget check: the whole source plane + both weight matrices live
    # in VMEM (~16 MB/core). Large frames stage in bf16; frames too big even
    # for bf16 fall back to the XLA path (identical semantics).
    def vmem_bytes(itemsize):
        return itemsize * (src_h * src_w            # source plane
                           + src_w * dst_w          # wx
                           + _ROW_TILE * src_h      # wy tile
                           + 2 * _ROW_TILE * dst_w)  # out + slack

    if vmem_bytes(4) <= 13 * 2**20:
        stage_dtype = jnp.float32
    elif vmem_bytes(2) <= 13 * 2**20:
        stage_dtype = jnp.bfloat16
    else:
        from .preprocess import preprocess_yolo
        return preprocess_yolo(frame_bgr_u8, spec, out_dtype)

    wy, inside_y = _vertical_weights(spec)
    wx, inside_x = _horizontal_weights(spec)

    # BGR -> RGB: planar with channels reversed. Mosaic cannot do
    # single-row dynamic loads from uint8 (32-sublane) tiles, so the
    # planes enter the kernel as f32/bf16 (XLA fuses the convert+transpose).
    planes = frame_bgr_u8.transpose(2, 0, 1)[::-1].astype(stage_dtype)

    grid = (3, dst_h // _ROW_TILE)
    out = pl.pallas_call(
        functools.partial(_kernel, pad_val=114.0 / 255.0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, src_h, src_w), lambda c, t: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, src_h), lambda c, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((src_w, dst_w), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROW_TILE, 1), lambda c, t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dst_w), lambda c, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROW_TILE, dst_w),
                               lambda c, t: (c, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, dst_h, dst_w), out_dtype),
    )(planes, jnp.asarray(wy, stage_dtype),
      jnp.asarray(wx, stage_dtype),
      jnp.asarray(inside_y).reshape(1, dst_h, 1),
      jnp.asarray(inside_x).reshape(1, 1, dst_w))
    return out.transpose(1, 2, 0)[None]  # (1, Dh, Dw, 3) NHWC
