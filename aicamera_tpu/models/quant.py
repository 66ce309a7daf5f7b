"""Post-training int8 quantization (W8A8) for the ReID embedder.

The TPU-native continuation of the reference's reduced-precision story:
its engines are built with ``trtexec --fp16``
(``scripts/export_trt_engines.sh:37``); TensorRT's next notch is
``--int8``, which it applies to exactly this kind of CNN. On TPU the MXU
runs int8 x int8 -> int32 at twice the bf16 rate, and the ReID net is the
single largest FLOP consumer in the saturated pipeline (32 crops/frame x
~2.2 GFLOP = 8x the detector's cost — ``docs/ROOFLINE.md``), so it is the
highest-value quantization target.

Scheme (standard dynamic-range W8A8, no calibration data needed):

* **Weights**: per-output-channel symmetric int8. Scales are computed once
  at quantization time from the f32 weights (max-abs / 127).
* **Activations**: per-sample dynamic symmetric int8 — each crop's conv
  input is scaled by its own max-abs / 127, computed inside the jitted
  program (one cheap VPU reduction per conv). Per-sample (not per-tensor)
  scales keep bright and dark crops from sharing one range.
* **Accumulation**: int32 on the MXU (``preferred_element_type``), then a
  single fused dequant-scale + bias + ReLU in f32. Residual adds and the
  final GAP/L2-norm stay f32 — only the conv MACs (~99.9% of FLOPs) run
  int8.

The quantized tree mirrors the Flax param tree one-to-one, so
:func:`quantize_reid_params` works on any source of ReID weights (ONNX
import, the trained synthetic checkpoint, seeded random init).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["quantize_reid_params", "QuantReIDNet", "quantize_conv"]

# ReIDNet's residual stage plan (models/reid.py::ReIDNet) — (features,
# downsample) per block; blocks where the channel count changes carry a
# 1x1 projection shortcut.
_REID_BLOCKS = [(64, False), (64, False),
                (128, True), (128, False),
                (256, True), (256, False),
                (512, True), (512, False)]


def quantize_conv(kernel: np.ndarray, bias: np.ndarray) -> dict:
    """f32 HWIO kernel + bias -> {'w': int8 HWIO, 'scale': (O,), 'bias'}.

    Per-output-channel symmetric: scale_o = max|w[..., o]| / 127.
    """
    w = np.asarray(kernel, np.float32)
    amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)))  # (O,)
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"w": jnp.asarray(q), "scale": jnp.asarray(scale, jnp.float32),
            "bias": jnp.asarray(np.asarray(bias, np.float32))}


def quantize_reid_params(params) -> dict:
    """Quantize a ReIDNet param tree (as from ``resolve_reid_params``).

    Returns a tree of :func:`quantize_conv` entries keyed like the source
    modules: ``stem``, ``block{i}.cv1/cv2[/proj]`` (+ ``fc`` passthrough
    in f32 when present).
    """
    p = params["params"] if "params" in params else params

    def conv_of(tree):
        # _ConvBNRelu nests its conv under 'conv'; bare nn.Conv does not.
        t = tree["conv"] if "conv" in tree else tree
        return quantize_conv(t["kernel"], t["bias"])

    out = {"stem": conv_of(p["stem"])}
    for i in range(len(_REID_BLOCKS)):
        b = p[f"block{i}"]
        qb = {"cv1": conv_of(b["cv1"]), "cv2": conv_of(b["cv2"])}
        if "proj" in b:
            qb["proj"] = conv_of(b["proj"])
        out[f"block{i}"] = qb
    if "fc" in p:
        out["fc"] = {"kernel": jnp.asarray(p["fc"]["kernel"], jnp.float32),
                     "bias": jnp.asarray(p["fc"]["bias"], jnp.float32)}
    return out


def _qconv(x: jnp.ndarray, q: dict, stride: int, pad: int) -> jnp.ndarray:
    """Dynamic-int8 conv: per-sample activation quant, int8 MXU MAC,
    fused f32 dequant + bias. x is (B, H, W, C) f32."""
    ax = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)  # (B,1,1,1)
    s = jnp.maximum(ax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq, q["w"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    # dequant: x_scale (per sample) * w_scale (per out-channel), + bias
    return y.astype(jnp.float32) * (s * q["scale"]) + q["bias"]


class QuantReIDNet:
    """Drop-in int8 twin of :class:`~aicamera_tpu.models.reid.ReIDNet`.

    Same ``apply(qparams, x) -> (B, feature_dim)`` surface (so
    ``runtime/pipeline.py``'s embed stage uses it unchanged); ``qparams``
    comes from :func:`quantize_reid_params`. Outputs are L2-normalized
    f32 features, cosine-compatible with the f32 net's (the downstream
    tracker consumes cosine distances only).
    """

    def __init__(self, feature_dim: int = 512):
        self.feature_dim = feature_dim
        # input dtype contract for callers (apply() quantizes its own
        # input per crop); int8 lives strictly inside the program
        self.dtype = jnp.float32

    def apply(self, qparams, x):
        x = x.astype(jnp.float32)
        x = jax.nn.relu(_qconv(x, qparams["stem"], 1, 1))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "VALID")
        for i, (feats, down) in enumerate(_REID_BLOCKS):
            qb = qparams[f"block{i}"]
            s = 2 if down else 1
            y = jax.nn.relu(_qconv(x, qb["cv1"], s, 1))
            y = _qconv(y, qb["cv2"], 1, 1)
            if "proj" in qb:
                x = _qconv(x, qb["proj"], s, 0)
            x = jax.nn.relu(x + y)
        x = jnp.mean(x, axis=(1, 2))  # (B, 512) f32
        if "fc" in qparams:
            x = x @ qparams["fc"]["kernel"] + qparams["fc"]["bias"]
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-7)
