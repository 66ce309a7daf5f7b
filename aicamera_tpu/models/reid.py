"""DeepSORT ReID appearance embedder in Flax (NHWC, bf16 MXU path).

Replaces the reference's ``deepsort_reid.engine`` TensorRT artifact
(``src/tracker/reid_model.py``; ONNX from scripts/download_models.sh, a
residual CNN over 128x64 person crops producing 512-d L2-normalized
features, dynamic batch 1..8 per ``scripts/export_trt_engines.sh:32-34``).

Architecture: the standard DeepSORT feature extractor shape — two 3x3 stem
convs, max-pool, four residual stages (64-64, 64-128/2, 128-256/2,
256-512/2), global average pool, L2 normalization. Batch norm is folded
into conv scale/bias at weight import, so blocks are conv+bias+ReLU.

Unlike the reference (dynamic batch with a max of 8, host-side crop
preprocessing per crop), this embedder runs at a fixed padded batch inside
the same jitted step as detection, over crops gathered on-device.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        return nn.relu(x)


class _BasicBlock(nn.Module):
    """Residual block; 1x1 projection shortcut when downsampling."""
    features: int
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = 2 if self.downsample else 1
        y = _ConvBNRelu(self.features, 3, s, dtype=self.dtype, name="cv1")(x)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                    name="cv2")(y)
        if self.downsample or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(s, s), use_bias=True,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(x)
        return nn.relu(x + y)


class ReIDNet(nn.Module):
    """ReID feature extractor: (B, 128, 64, 3) RGB normalized -> (B, 512).

    Output features are L2-normalized (the reference engine's outputs are
    consumed by cosine distance, matching.py:109-141).
    """
    feature_dim: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        # single stem conv + max-pool, matching the deepsort.onnx graph
        # (one Conv before the residual stages) so strict conv-count
        # import mapping lines up
        x = _ConvBNRelu(64, 3, 1, dtype=self.dtype, name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (feats, down) in enumerate(
                [(64, False), (64, False),
                 (128, True), (128, False),
                 (256, True), (256, False),
                 (512, True), (512, False)]):
            x = _BasicBlock(feats, down, dtype=self.dtype, name=f"block{i}")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 512)
        x = x.astype(jnp.float32)
        if self.feature_dim != x.shape[-1]:
            x = nn.Dense(self.feature_dim, param_dtype=jnp.float32,
                         name="fc")(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-7)
