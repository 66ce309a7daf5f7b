"""Fused letterbox preprocess as a Pallas TPU kernel.

One kernel pass fuses everything the reference does on the host with cv2
(``image_processing.py:73-102``: bilinear resize, 114-padding, BGR->RGB,
/255 normalize, dtype convert) and that the XLA path does as several ops:

- **both resample passes as MXU matmuls** against precomputed bilinear
  weight matrices — vertical against a per-tile *windowed* weight slice
  (the bilinear matrix is 2-banded, so a 64-row output tile only reads a
  ~`WIN` source-row window: (tile, WIN) @ (WIN, src_w) instead of
  (tile, src_h) @ (src_h, src_w)), then (tile, src_w) @ (src_w, dst_w)
  horizontal,
- pad region fill, BGR->RGB (grid channel remap), and [0,1] normalization
  in the fused epilogue (VPU) — no full-frame f32 intermediate in HBM,
- tiles made entirely of letterbox padding (40% of the canvas for the
  standard 540p/720p/1080p -> 640x640 geometries) skip both matmuls and
  write the pad constant.

Input is the raw uint8 BGR frame; output is the planar (3, dst, dst)
normalized RGB tensor (transposed to NHWC by XLA afterwards).

Grid: (channels, row-tiles of 64 output rows). The whole source plane and
both weight tensors sit in VMEM; the per-tile window offsets live in SMEM
(scalars for the dynamic-slice starts). Frames too large for the f32
budget stage in bf16, and frames too large for even that fall back to the
XLA path with identical semantics.
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


def _vertical_geometry(spec: LetterboxSpec):
    """Static vertical bilinear geometry: per-output-row flags/taps."""
    dst_h = spec.out_hw[0]
    src_h = spec.src_hw[0]
    uh = spec.unpad_hw[0]
    oy = np.arange(dst_h)
    inside = (oy >= spec.top) & (oy < spec.top + uh)
    sy = (oy - spec.top + 0.5) * (src_h / uh) - 0.5
    sy = np.clip(sy, 0.0, src_h - 1)
    y0 = np.minimum(np.floor(sy).astype(np.int64), src_h - 1)
    frac = (sy - y0).astype(np.float32)
    return inside, y0, frac


def _vertical_windows(spec: LetterboxSpec, row_tile: int):
    """Per-tile windowed vertical weights.

    Returns ``(los (n_tiles,) i32, wy (n_tiles, row_tile, WIN) f32,
    inside (dst_h,) f32)`` such that a tile's content rows are
    ``wy[t] @ plane[los[t] : los[t] + WIN]`` — exact, because the bilinear
    matrix has 2 taps per row and consecutive output rows read
    monotonically increasing source rows.
    """
    src_h = spec.src_hw[0]
    dst_h = spec.out_hw[0]
    inside, y0, frac = _vertical_geometry(spec)
    n_tiles = dst_h // row_tile

    spans = [8]
    tile_lo = np.zeros(n_tiles, np.int64)
    for t in range(n_tiles):
        rows = np.arange(t * row_tile, (t + 1) * row_tile)
        c = inside[rows]
        if not c.any():
            continue
        lo = int(y0[rows[c]].min()) & ~7  # sublane-aligned window start
        hi = min(int(y0[rows[c]].max()) + 1, src_h - 1)
        tile_lo[t] = lo
        spans.append(hi - lo + 1)
    # Window size such that every 8-aligned start fits: tiles whose natural
    # window would run past src_h clamp their start to lo_base; win is
    # exactly src_h - lo_base so the clamped window ends at src_h. (win is
    # NOT required to be a multiple of 8 — only the dynamic start is.)
    lo_base = (src_h - max(spans)) & ~7
    win = src_h - lo_base

    los = np.zeros(n_tiles, np.int32)
    wy = np.zeros((n_tiles, row_tile, win), np.float32)
    for t in range(n_tiles):
        rows = np.arange(t * row_tile, (t + 1) * row_tile)
        if not inside[rows].any():
            continue
        lo = int(min(tile_lo[t], lo_base))
        los[t] = lo // 8  # stored in units of 8 rows (see _kernel)
        for k, o in enumerate(rows):
            if not inside[o]:
                continue
            i0 = int(y0[o])
            i1 = min(i0 + 1, src_h - 1)
            assert lo <= i0 and i1 - lo < win, (t, o, lo, i0, i1, win)
            wy[t, k, i0 - lo] += 1.0 - frac[o]
            wy[t, k, i1 - lo] += frac[o]
    return los, wy, inside.astype(np.float32)


def _horizontal_weights(spec: LetterboxSpec) -> np.ndarray:
    """(src_w, dst_w) bilinear matrix including horizontal padding columns
    (pad columns have all-zero weight; the pad value is added in the
    epilogue)."""
    dst_w = spec.out_hw[1]
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


def _kernel(plane_ref, wy_ref, wx_ref, inside_y_ref, inside_x_ref, lo_ref,
            out_ref, *, pad_val: float, win: int):
    # Both resample passes are MXU matmuls: (TILE, WIN) @ (WIN, src_w) on
    # the tile's source-row window, then (TILE, src_w) @ (src_w, dst_w);
    # the epilogue fuses round / normalize / pad on the VPU. cv2 resizes in
    # uint8 and rounds between passes; we round once at the end (sub-LSB
    # difference vs cv2). Pure-pad tiles skip both matmuls.
    t = pl.program_id(1)
    has_content = jnp.any(inside_y_ref[0, :, 0] > 0)

    @pl.when(has_content)
    def _content():
        # lo_ref holds the window start in units of 8 rows — the `* 8`
        # lets Mosaic statically prove the dynamic-slice start is
        # sublane-aligned. The bf16 plane window upcasts to the weight
        # dtype in registers (bf16 holds uint8 values exactly).
        window = plane_ref[0, pl.ds(lo_ref[t] * 8, win), :].astype(
            wy_ref.dtype)
        rows = jnp.dot(wy_ref[0], window, preferred_element_type=jnp.float32)
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
    dst_h, dst_w = spec.out_hw
    if dst_h % _ROW_TILE != 0:
        # e.g. `auto` (stride-modulo minimum rectangle) canvases that are
        # not a row-tile multiple: identical-semantics XLA path
        from .preprocess import preprocess_yolo
        return preprocess_yolo(frame_bgr_u8, spec, out_dtype)

    los, wy, inside_y = _vertical_windows(spec, _ROW_TILE)
    win = wy.shape[2]
    wx, inside_x = _horizontal_weights(spec)
    n_tiles = dst_h // _ROW_TILE

    # VMEM budget check: the whole source plane + both weight tensors live
    # in VMEM (~16 MB/core). Large frames stage in bf16; frames too big even
    # for bf16 fall back to the XLA path (identical semantics).
    # Planes stage in bf16 — EXACT for uint8 pixel values (0..255 needs 8
    # significand bits; bf16 has them), at half the staging traffic of
    # f32. Weights stay f32 when the VMEM budget allows (sub-LSB resize
    # accuracy); the kernel's dot upcasts the window.
    def vmem_bytes(w_itemsize):
        return (2 * src_h * src_w                      # bf16 source plane
                + w_itemsize * (src_w * dst_w          # wx
                                + _ROW_TILE * win)     # wy tile
                + 2 * 2 * _ROW_TILE * dst_w)           # out + slack

    if vmem_bytes(4) <= 13 * 2**20:
        weight_dtype = jnp.float32
    elif vmem_bytes(2) <= 13 * 2**20:
        weight_dtype = jnp.bfloat16
    else:
        from .preprocess import preprocess_yolo
        return preprocess_yolo(frame_bgr_u8, spec, out_dtype)

    # BGR -> RGB: planar with channels reversed. Mosaic cannot do
    # single-row dynamic loads from uint8 (32-sublane) tiles, so the
    # planes enter the kernel as bf16 (XLA fuses the convert+transpose).
    planes = frame_bgr_u8.transpose(2, 0, 1)[::-1].astype(jnp.bfloat16)

    grid = (3, n_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, pad_val=114.0 / 255.0, win=win),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, src_h, src_w), lambda c, t: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROW_TILE, win), lambda c, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((src_w, dst_w), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROW_TILE, 1), lambda c, t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dst_w), lambda c, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROW_TILE, dst_w),
                               lambda c, t: (c, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, dst_h, dst_w), out_dtype),
    )(planes, jnp.asarray(wy, weight_dtype),
      jnp.asarray(wx, weight_dtype),
      jnp.asarray(inside_y).reshape(1, dst_h, 1),
      jnp.asarray(inside_x).reshape(1, 1, dst_w),
      jnp.asarray(los))
    return out.transpose(1, 2, 0)[None]  # (1, Dh, Dw, 3) NHWC
