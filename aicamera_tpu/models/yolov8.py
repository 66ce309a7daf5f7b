"""YOLOv8 detector family (n/s/m/l/x) in Flax, NHWC, anchor-free with DFL.

Replaces the reference's AOT TensorRT engine (`yolov8n.engine`, built fixed
at 1x3x640x640 fp16 by ``scripts/export_trt_engines.sh:26-28``) with a
first-party Flax implementation compiled by XLA: convs run in bf16 on the
MXU with f32 params, control flow is static, and the raw multi-scale head
outputs feed the fixed-shape decode+NMS in :mod:`aicamera_tpu.ops.nms`
(the analog of the NMS plugin baked into the reference engine,
``yolo_detector.py:100-112``).

Architecture per the public YOLOv8 spec (CSP backbone with C2f blocks, SPPF,
PAN-FPN neck, decoupled anchor-free head with distribution focal loss bins):
depth/width/max-channel multiples per variant.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import C2f, ConvBlock, SPPF, scale_channels, upsample2x

# variant: (depth_multiple, width_multiple, max_channels)
YOLOV8_VARIANTS = {
    "n": (0.34, 0.25, 1024),
    "s": (0.34, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}

_BASE_CHANNELS = [64, 128, 256, 512, 1024]
_BASE_DEPTHS = [3, 6, 6, 3]

REG_MAX = 16
STRIDES = (8, 16, 32)


def _depth(n: int, d: float) -> int:
    return max(1, int(round(n * d)))


class Backbone(nn.Module):
    variant: str = "n"
    dtype: jnp.dtype = jnp.bfloat16
    concat_impl: str = "concat"

    @nn.compact
    def __call__(self, x):
        d, w, mc = YOLOV8_VARIANTS[self.variant]
        ch = scale_channels(_BASE_CHANNELS, w, mc)
        dep = [_depth(n, d) for n in _BASE_DEPTHS]

        x = ConvBlock(ch[0], 3, 2, dtype=self.dtype, name="stem")(x)       # P1
        x = ConvBlock(ch[1], 3, 2, dtype=self.dtype, name="down1")(x)      # P2
        x = C2f(ch[1], dep[0], True, dtype=self.dtype, concat_impl=self.concat_impl, name="c2f1")(x)
        x = ConvBlock(ch[2], 3, 2, dtype=self.dtype, name="down2")(x)      # P3
        p3 = C2f(ch[2], dep[1], True, dtype=self.dtype, concat_impl=self.concat_impl, name="c2f2")(x)
        x = ConvBlock(ch[3], 3, 2, dtype=self.dtype, name="down3")(p3)     # P4
        p4 = C2f(ch[3], dep[2], True, dtype=self.dtype, concat_impl=self.concat_impl, name="c2f3")(x)
        x = ConvBlock(ch[4], 3, 2, dtype=self.dtype, name="down4")(p4)     # P5
        x = C2f(ch[4], dep[3], True, dtype=self.dtype, concat_impl=self.concat_impl, name="c2f4")(x)
        p5 = SPPF(ch[4], dtype=self.dtype, name="sppf")(x)
        return p3, p4, p5


class Neck(nn.Module):
    """PAN-FPN: top-down then bottom-up feature fusion."""
    variant: str = "n"
    dtype: jnp.dtype = jnp.bfloat16
    concat_impl: str = "concat"

    @nn.compact
    def __call__(self, p3, p4, p5):
        d, w, mc = YOLOV8_VARIANTS[self.variant]
        ch = scale_channels(_BASE_CHANNELS, w, mc)
        n = _depth(3, d)

        x = jnp.concatenate([upsample2x(p5), p4], axis=-1)
        t1 = C2f(ch[3], n, False, dtype=self.dtype, concat_impl=self.concat_impl, name="up_c2f1")(x)

        x = jnp.concatenate([upsample2x(t1), p3], axis=-1)
        n3 = C2f(ch[2], n, False, dtype=self.dtype, concat_impl=self.concat_impl, name="up_c2f2")(x)

        x = ConvBlock(ch[2], 3, 2, dtype=self.dtype, name="down_conv1")(n3)
        x = jnp.concatenate([x, t1], axis=-1)
        n4 = C2f(ch[3], n, False, dtype=self.dtype, concat_impl=self.concat_impl, name="down_c2f1")(x)

        x = ConvBlock(ch[3], 3, 2, dtype=self.dtype, name="down_conv2")(n4)
        x = jnp.concatenate([x, p5], axis=-1)
        n5 = C2f(ch[4], n, False, dtype=self.dtype, concat_impl=self.concat_impl, name="down_c2f2")(x)
        return n3, n4, n5


class DetectHead(nn.Module):
    """Decoupled anchor-free head: DFL box bins + class logits per level."""
    variant: str = "n"
    num_classes: int = 80
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        d, w, mc = YOLOV8_VARIANTS[self.variant]
        ch = scale_channels(_BASE_CHANNELS, w, mc)
        c_reg = max(16, ch[2] // 4, REG_MAX * 4)
        c_cls = max(ch[2], min(self.num_classes, 100))

        outs = []
        for i, x in enumerate(feats):
            r = ConvBlock(c_reg, 3, dtype=self.dtype, name=f"reg{i}_cv1")(x)
            r = ConvBlock(c_reg, 3, dtype=self.dtype, name=f"reg{i}_cv2")(r)
            r = nn.Conv(4 * REG_MAX, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"reg{i}_out")(r)
            c = ConvBlock(c_cls, 3, dtype=self.dtype, name=f"cls{i}_cv1")(x)
            c = ConvBlock(c_cls, 3, dtype=self.dtype, name=f"cls{i}_cv2")(c)
            c = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"cls{i}_out")(c)
            outs.append((r, c))
        return outs


class YOLOv8(nn.Module):
    """Full detector. Input NHWC float in [0, 1]; returns per-level
    (box_bins (B,H,W,64), cls_logits (B,H,W,nc)) at strides 8/16/32."""
    variant: str = "n"
    num_classes: int = 80
    dtype: jnp.dtype = jnp.bfloat16
    # C2f cv2-input formation: "concat" | "dus" | "sum" (see layers.C2f —
    # the fusion audit's 13%-copy lever, A/B'd by
    # scripts/profile_c2f_concat.py; params are identical across impls)
    concat_impl: str = "concat"

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        p3, p4, p5 = Backbone(self.variant, dtype=self.dtype,
                              concat_impl=self.concat_impl,
                              name="backbone")(x)
        n3, n4, n5 = Neck(self.variant, dtype=self.dtype,
                          concat_impl=self.concat_impl,
                          name="neck")(p3, p4, p5)
        return DetectHead(self.variant, self.num_classes, dtype=self.dtype,
                          name="head")((n3, n4, n5))


def decode_predictions(level_outputs, input_hw: Tuple[int, int],
                       strides=STRIDES):
    """Decode raw head outputs into (boxes_xyxy (B,A,4), scores (B,A,nc)).

    DFL: softmax over the 16 distance bins -> expected ltrb distances in
    stride units; boxes around cell-center anchors. Class scores are
    sigmoid(logits). All f32, fixed shapes (A = sum of HW per level, 8400 at
    640x640).
    """
    boxes_all, scores_all = [], []
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    for (box_bins, cls_logits), stride in zip(level_outputs, strides):
        b, h, w, _ = box_bins.shape
        bb = box_bins.astype(jnp.float32).reshape(b, h * w, 4, REG_MAX)
        dist = jnp.sum(jax.nn.softmax(bb, axis=-1) * bins, axis=-1)
        # anchor cell centers
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        cx = jnp.broadcast_to(xs, (h, w)).reshape(-1)
        cy = jnp.broadcast_to(ys, (h, w)).reshape(-1)
        x1 = (cx - dist[..., 0]) * stride
        y1 = (cy - dist[..., 1]) * stride
        x2 = (cx + dist[..., 2]) * stride
        y2 = (cy + dist[..., 3]) * stride
        boxes_all.append(jnp.stack([x1, y1, x2, y2], axis=-1))
        scores_all.append(
            nn.sigmoid(cls_logits.astype(jnp.float32).reshape(
                b, h * w, cls_logits.shape[-1])))
    return (jnp.concatenate(boxes_all, axis=1),
            jnp.concatenate(scores_all, axis=1))
