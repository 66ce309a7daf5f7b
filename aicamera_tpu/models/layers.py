"""Building blocks for YOLOv8 in Flax (NHWC, TPU-native layout).

Batch norms are folded into conv biases (inference framework; the ONNX files
the reference consumes are exported with BN already fused, and
``onnx_import`` folds any stray BN at load time), so every block is
conv + bias + SiLU — exactly the fusion XLA emits as one MXU op plus a cheap
VPU epilogue.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    """Conv2D + bias + SiLU ("Conv" in YOLOv8 terms, BN pre-folded)."""
    features: int
    kernel_size: int = 1
    strides: int = 1
    use_act: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.strides
        pad = k // 2
        x = nn.Conv(
            self.features, (k, k), strides=(s, s),
            padding=((pad, pad), (pad, pad)),
            use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv")(x)
        if self.use_act:
            x = nn.silu(x)
        return x


class Bottleneck(nn.Module):
    """Two 3x3 convs with optional residual."""
    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.features, 3, dtype=self.dtype, name="cv1")(x)
        y = ConvBlock(self.features, 3, dtype=self.dtype, name="cv2")(y)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class _Conv1x1Params(nn.Module):
    """Parameter shell matching ``nn.Conv(features, (1,1))``'s tree
    (kernel (1,1,Cin,Cout) + bias), so a module named "cv2" holding one
    of these named "conv" is checkpoint-compatible with
    ``ConvBlock(k=1, name="cv2")``."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


class _VirtualConcatConv(nn.Module):
    """1x1 conv + SiLU over a VIRTUAL concat of chunks: the kernel's
    input-channel axis is sliced per chunk and the partial matmuls are
    summed, so the concat buffer is never materialized. Param tree
    (<name>/conv/{kernel,bias}) mirrors ``ConvBlock(k=1)`` exactly —
    checkpoint-compatible both ways."""
    features: int
    in_features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, chunks):
        kernel, bias = _Conv1x1Params(self.features, self.in_features,
                                      name="conv")()
        out = bias.astype(self.dtype)
        off = 0
        for ch in chunks:
            w = kernel[0, 0, off:off + ch.shape[-1], :].astype(self.dtype)
            out = out + jax.lax.dot_general(
                ch.astype(self.dtype), w, (((3,), (0,)), ((), ())))
            off += ch.shape[-1]
        return nn.silu(out)


class C2f(nn.Module):
    """Cross-stage partial block with 2 splits and n bottlenecks.

    cv1 expands to 2*c hidden channels, the tensor is split in two, each
    bottleneck chews on the latest chunk, and all chunks feed cv2.

    ``concat_impl`` picks how the (2+n)*c-channel cv2 input is formed —
    the fusion audit (docs/ROOFLINE.md) attributes 13% of detector
    device time to copies dominated by these concats:

    - ``"concat"``: ``jnp.concatenate`` then the 1x1 conv (baseline).
    - ``"dus"``: chained ``lax.dynamic_update_slice`` writes into one
      preallocated buffer (bitwise-identical math; gives XLA in-place
      producer->buffer fusion opportunities a concat may not).
    - ``"sum"``: no buffer at all — cv2's 1x1 conv distributes over the
      virtual concat as a sum of per-chunk matmuls against kernel
      slices (same params; reduction ORDER differs, so bf16 outputs
      differ in the last bits; each partial matmul's K dim is only c,
      which can underfill the MXU's 128 reduction lanes).

    Measured on v5e (scripts/profile_c2f_concat.py) before choosing a
    default.
    """
    features: int
    n: int = 1
    shortcut: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    concat_impl: str = "concat"

    @nn.compact
    def __call__(self, x):
        c = self.features // 2
        y = ConvBlock(2 * c, 1, dtype=self.dtype, name="cv1")(x)
        chunks = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            chunks.append(
                Bottleneck(c, self.shortcut, dtype=self.dtype,
                           name=f"m{i}")(chunks[-1]))
        total = (2 + self.n) * c
        if self.concat_impl == "sum":
            return _VirtualConcatConv(self.features, total,
                                      dtype=self.dtype, name="cv2")(chunks)
        if self.concat_impl == "dus":
            b, h, w_, _ = chunks[0].shape
            buf = jnp.zeros((b, h, w_, total), self.dtype)
            off = 0
            for ch in chunks:
                buf = jax.lax.dynamic_update_slice(
                    buf, ch.astype(self.dtype), (0, 0, 0, off))
                off += c
            y = buf
        else:
            y = jnp.concatenate(chunks, axis=-1)
        return ConvBlock(self.features, 1, dtype=self.dtype, name="cv2")(y)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 2
        x = ConvBlock(c, 1, dtype=self.dtype, name="cv1")(x)
        outs = [x]
        for _ in range(3):
            outs.append(nn.max_pool(
                outs[-1], (5, 5), strides=(1, 1), padding="SAME"))
        x = jnp.concatenate(outs, axis=-1)
        return ConvBlock(self.features, 1, dtype=self.dtype, name="cv2")(x)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (NHWC)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def make_divisible(v: float, divisor: int = 8) -> int:
    """Round channel counts the way YOLO scaling does."""
    return max(divisor, int(v + divisor / 2) // divisor * divisor)


def scale_channels(base: Sequence[int], width: float, max_channels: int):
    """YOLOv8 channel scaling: the max-channel cap applies BEFORE the
    width multiple (e.g. m: min(1024, 768)*0.75 = 576, x: 512*1.25 = 640)."""
    return [make_divisible(min(c, max_channels) * width) for c in base]
