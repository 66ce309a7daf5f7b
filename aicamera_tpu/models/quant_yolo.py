"""Static-calibrated int8 (W8A8) quantization for the YOLOv8 detector.

The detector forward is HBM-bound (~113 MB of activations per 640px frame
at bf16 against an ~13 ms/chunk bandwidth floor — ``docs/ROOFLINE.md``),
so unlike the ReID net (compute-bound, per-sample *dynamic* quant in
:mod:`quant`), the detector only wins if activations are **stored** int8:
halved bytes per tensor AND the MXU's 2x int8 MAC rate. Dynamic per-batch
scales can't do that — the global-max reduction forces the f32 tensor to
materialize before it can be quantized. Static calibration can:

* every conv output gets ONE scale (its calibration-time max-abs), a
  Python float baked into the program as a constant;
* the quantize step is then elementwise and fuses into the producing
  conv's epilogue — dequant(int32) + bias + SiLU [+ residual] + requant,
  one pass, int8 in HBM;
* consumer convs eat int8 directly. Input-tensor scales are FOLDED INTO
  THE WEIGHTS per input channel at build time (host): a conv reading a
  concat of tensors with different scales just has its kernel's input-
  channel slices pre-multiplied by each part's dequant factor — so the
  runtime epilogue only ever applies the per-output-channel weight scale.
  Max-pool (SPPF), nearest upsample, channel slice (C2f) and concat all
  commute with positive per-tensor scaling and run on int8 directly.

Three passes share one architecture traversal (:func:`_traverse`, a
mirror of ``models/yolov8.py`` — same channel plan, same param tree):

* **calibrate** — f32 forward over calibration frames, recording each
  tensor's max-abs (returned from the jitted program; running max on
  host across batches).
* **build** — host-side: fold input scales into kernels, per-output-
  channel int8 weight quantization, emit the qparams pytree.
* **run** — the int8 inference program.

This is the TPU-native continuation of the reference's precision story:
its engines are built ``trtexec --fp16`` (export_trt_engines.sh:37);
TensorRT's next notch, ``--int8``, requires exactly this kind of
calibration pass.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .yolov8 import YOLOV8_VARIANTS, _BASE_CHANNELS, _BASE_DEPTHS, _depth
from .layers import scale_channels

__all__ = ["QuantYOLOv8", "quantize_yolo_synthetic"]

_I8_MIN = -127  # symmetric; -128 unused


def _key(path: Tuple[str, ...]) -> str:
    return "/".join(path)


class _T:
    """A traversal tensor: payload + provenance.

    ``parts`` lists ``(scale_key, n_channels)`` spans of the channel axis
    — a conv output has one span; a concat has one per source. The spans
    are what lets build-mode assemble the per-input-channel dequant
    factors to fold into the consumer's kernel.
    """

    __slots__ = ("data", "parts")

    def __init__(self, data, parts: List[Tuple[str, int]]):
        self.data = data
        self.parts = parts

    @property
    def channels(self) -> int:
        return sum(c for _, c in self.parts)


def _lookup(params, path):
    """Kernel+bias for a conv at ``path`` in the Flax param tree
    (ConvBlock nests under 'conv'; the bare head out-convs don't)."""
    t = params["params"] if "params" in params else params
    for p in path:
        t = t[p]
    if "conv" in t:
        t = t["conv"]
    return t["kernel"], t["bias"]


class _CalibCtx:
    """f32 forward; records every quantize-point's max-abs."""

    def __init__(self, params):
        self.params = params
        self.maxes: Dict[str, jnp.ndarray] = {}

    def input(self, x):
        # model input is [0, 1] by the preprocess contract
        return _T(x.astype(jnp.float32), [("__input__", x.shape[-1])])

    def conv(self, path, t, k, s, act=True, residual=None,
             quantize_out=True):
        kern, bias = _lookup(self.params, path)
        pad = k // 2
        y = lax.conv_general_dilated(
            t.data, kern.astype(jnp.float32), (s, s),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        if act:
            y = jax.nn.silu(y)
        if residual is not None:
            y = y + residual.data
        kk = _key(path)
        if quantize_out:
            self.maxes[kk] = jnp.max(jnp.abs(y))
        return _T(y, [(kk, y.shape[-1])])

    def concat(self, ts):
        return _T(jnp.concatenate([t.data for t in ts], axis=-1),
                  [p for t in ts for p in t.parts])

    def slice2(self, t, c):
        kk = t.parts[0][0]
        return (_T(t.data[..., :c], [(kk, c)]),
                _T(t.data[..., c:], [(kk, t.channels - c)]))

    def maxpool(self, t, k):
        return _T(lax.reduce_window(
            t.data, -jnp.inf, lax.max, (1, k, k, 1), (1, 1, 1, 1),
            "SAME"), list(t.parts))

    def upsample(self, t):
        b, h, w, c = t.data.shape
        d = jnp.broadcast_to(t.data[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
        return _T(d, list(t.parts))


class _BuildCtx:
    """Host pass: folds input scales into kernels, quantizes weights."""

    def __init__(self, params, scales: Dict[str, float]):
        self.params = params
        self.scales = scales
        self.qparams: Dict[str, dict] = {}

    def input(self, x):
        return _T(int(x.shape[-1]), [("__input__", int(x.shape[-1]))])

    def conv(self, path, t, k, s, act=True, residual=None,
             quantize_out=True):
        kern, bias = _lookup(self.params, path)
        kern = np.asarray(kern, np.float32)
        bias = np.asarray(bias, np.float32)
        # per-input-channel dequant factor = part_scale / 127, folded in
        sx = np.concatenate([
            np.full(c, self.scales[kk] / 127.0, np.float32)
            for kk, c in t.parts])
        wf = kern * sx[None, None, :, None]
        wmax = np.maximum(np.max(np.abs(wf), axis=(0, 1, 2)), 1e-12)
        wq = np.clip(np.round(wf * (127.0 / wmax)), _I8_MIN, 127)
        kk = _key(path)
        self.qparams[kk] = {
            "w": jnp.asarray(wq.astype(np.int8)),
            "wscale": jnp.asarray(wmax / 127.0, jnp.float32),
            "bias": jnp.asarray(bias)}
        o = kern.shape[-1]
        return _T(o, [(kk, o)])

    def concat(self, ts):
        return _T(sum(t.data for t in ts), [p for t in ts for p in t.parts])

    def slice2(self, t, c):
        kk = t.parts[0][0]
        return _T(c, [(kk, c)]), _T(t.data - c, [(kk, t.data - c)])

    def maxpool(self, t, k):
        return _T(t.data, list(t.parts))

    def upsample(self, t):
        return _T(t.data, list(t.parts))


class _RunCtx:
    """The int8 inference program."""

    def __init__(self, qparams, scales: Dict[str, float]):
        self.qparams = qparams
        self.scales = scales

    def input(self, x):
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * 127.0),
                     _I8_MIN, 127).astype(jnp.int8)
        return _T(q, [("__input__", x.shape[-1])])

    def conv(self, path, t, k, s, act=True, residual=None,
             quantize_out=True):
        kk = _key(path)
        q = self.qparams[kk]
        pad = k // 2
        y = lax.conv_general_dilated(
            t.data, q["w"], (s, s), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        # fused epilogue: dequant + bias (+SiLU) (+residual) (+requant)
        y = y.astype(jnp.float32) * q["wscale"] + q["bias"]
        if act:
            y = jax.nn.silu(y)
        if residual is not None:
            # dequant per provenance span (a concat carries one scale
            # per source tensor)
            r = residual.data.astype(jnp.float32)
            segs, off = [], 0
            for rk, c in residual.parts:
                segs.append(r[..., off:off + c] * (self.scales[rk] / 127.0))
                off += c
            y = y + (segs[0] if len(segs) == 1
                     else jnp.concatenate(segs, axis=-1))
        if not quantize_out:
            return _T(y, [(kk, y.shape[-1])])
        out = jnp.clip(jnp.round(y * (127.0 / self.scales[kk])),
                       _I8_MIN, 127).astype(jnp.int8)
        return _T(out, [(kk, out.shape[-1])])

    def concat(self, ts):
        return _T(jnp.concatenate([t.data for t in ts], axis=-1),
                  [p for t in ts for p in t.parts])

    def slice2(self, t, c):
        kk = t.parts[0][0]
        return (_T(t.data[..., :c], [(kk, c)]),
                _T(t.data[..., c:], [(kk, t.channels - c)]))

    def maxpool(self, t, k):
        # max commutes with the (positive) per-tensor scale: pool int8
        return _T(lax.reduce_window(
            t.data, jnp.int8(-128), lax.max, (1, k, k, 1), (1, 1, 1, 1),
            "SAME"), list(t.parts))

    def upsample(self, t):
        b, h, w, c = t.data.shape
        d = jnp.broadcast_to(t.data[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
        return _T(d, list(t.parts))


def _bottleneck(ctx, path, t, c, shortcut):
    y = ctx.conv(path + ("cv1",), t, 3, 1)
    res = t if (shortcut and t.channels == c) else None
    return ctx.conv(path + ("cv2",), y, 3, 1, residual=res)


def _c2f(ctx, path, t, features, n, shortcut):
    c = features // 2
    y = ctx.conv(path + ("cv1",), t, 1, 1)
    a, b = ctx.slice2(y, c)
    chunks = [a, b]
    for i in range(n):
        chunks.append(_bottleneck(ctx, path + (f"m{i}",), chunks[-1], c,
                                  shortcut))
    return ctx.conv(path + ("cv2",), ctx.concat(chunks), 1, 1)


def _sppf(ctx, path, t, features):
    x = ctx.conv(path + ("cv1",), t, 1, 1)
    outs = [x]
    for _ in range(3):
        outs.append(ctx.maxpool(outs[-1], 5))
    return ctx.conv(path + ("cv2",), ctx.concat(outs), 1, 1)


def _traverse(ctx, x, variant: str, num_classes: int = 80):
    """One shared walk of the YOLOv8 architecture (mirrors yolov8.py's
    Backbone/Neck/DetectHead — same channel plan, same param paths)."""
    d, w, mc = YOLOV8_VARIANTS[variant]
    ch = scale_channels(_BASE_CHANNELS, w, mc)
    dep = [_depth(n, d) for n in _BASE_DEPTHS]

    t = ctx.input(x)
    B = lambda *p: ("backbone",) + p  # noqa: E731
    t = ctx.conv(B("stem"), t, 3, 2)
    t = ctx.conv(B("down1"), t, 3, 2)
    t = _c2f(ctx, B("c2f1"), t, ch[1], dep[0], True)
    t = ctx.conv(B("down2"), t, 3, 2)
    p3 = _c2f(ctx, B("c2f2"), t, ch[2], dep[1], True)
    t = ctx.conv(B("down3"), p3, 3, 2)
    p4 = _c2f(ctx, B("c2f3"), t, ch[3], dep[2], True)
    t = ctx.conv(B("down4"), p4, 3, 2)
    t = _c2f(ctx, B("c2f4"), t, ch[4], dep[3], True)
    p5 = _sppf(ctx, B("sppf"), t, ch[4])

    N = lambda *p: ("neck",) + p  # noqa: E731
    n = _depth(3, d)
    t = ctx.concat([ctx.upsample(p5), p4])
    t1 = _c2f(ctx, N("up_c2f1"), t, ch[3], n, False)
    t = ctx.concat([ctx.upsample(t1), p3])
    n3 = _c2f(ctx, N("up_c2f2"), t, ch[2], n, False)
    t = ctx.conv(N("down_conv1"), n3, 3, 2)
    n4 = _c2f(ctx, N("down_c2f1"), ctx.concat([t, t1]), ch[3], n, False)
    t = ctx.conv(N("down_conv2"), n4, 3, 2)
    n5 = _c2f(ctx, N("down_c2f2"), ctx.concat([t, p5]), ch[4], n, False)

    H = lambda *p: ("head",) + p  # noqa: E731
    from .yolov8 import REG_MAX
    c_reg = max(16, ch[2] // 4, REG_MAX * 4)  # noqa: F841 (plan parity)
    outs = []
    for i, feat in enumerate((n3, n4, n5)):
        r = ctx.conv(H(f"reg{i}_cv1"), feat, 3, 1)
        r = ctx.conv(H(f"reg{i}_cv2"), r, 3, 1)
        r = ctx.conv(H(f"reg{i}_out"), r, 1, 1, act=False,
                     quantize_out=False)
        c = ctx.conv(H(f"cls{i}_cv1"), feat, 3, 1)
        c = ctx.conv(H(f"cls{i}_cv2"), c, 3, 1)
        c = ctx.conv(H(f"cls{i}_out"), c, 1, 1, act=False,
                     quantize_out=False)
        outs.append((r, c))
    return outs


class QuantYOLOv8:
    """Drop-in int8 twin of :class:`~aicamera_tpu.models.yolov8.YOLOv8`.

    Usage::

        q = QuantYOLOv8(variant="n")
        scales = q.calibrate(params, frames01)   # (N,H,W,3) f32 in [0,1]
        qparams = q.build(params, scales)        # int8 weight pytree
        levels = q.apply(qparams, x01)           # same output contract

    ``apply(qparams, x)`` matches ``YOLOv8.apply`` (per-level
    ``(box_bins, cls_logits)``) so ``ops/nms.fused_decode_nms`` and the
    pipeline's chunk step consume it unchanged. The calibration scales
    become trace-time constants of the program — a given QuantYOLOv8
    instance is bound to the scales passed to :meth:`build`.
    """

    def __init__(self, variant: str = "n", num_classes: int = 80):
        self.variant = variant
        self.num_classes = num_classes
        self.scales: Dict[str, float] | None = None
        # input dtype contract for callers' preprocess (apply() quantizes
        # its own input); int8 lives strictly inside the program
        self.dtype = jnp.float32

    def calibrate(self, params, frames, batch: int = 8,
                  margin: float = 1.0) -> Dict[str, float]:
        """Per-tensor max-abs over calibration inputs (``frames`` f32 in
        [0, 1], NHWC — i.e. post-letterbox model inputs). Running max
        across batches on the host; ``margin`` scales the result (e.g.
        1.05 leaves clip headroom for unseen data)."""

        @jax.jit
        def one(params, x):
            ctx = _CalibCtx(params)
            _traverse(ctx, x, self.variant, self.num_classes)
            return ctx.maxes

        acc: Dict[str, float] = {}
        frames = jnp.asarray(frames, jnp.float32)
        for i in range(0, frames.shape[0], batch):
            m = jax.device_get(one(params, frames[i:i + batch]))
            for k, v in m.items():
                acc[k] = max(acc.get(k, 0.0), float(v))
        scales = {k: max(v, 1e-6) * margin for k, v in acc.items()}
        scales["__input__"] = 1.0  # preprocess contract: [0, 1]
        return scales

    def build(self, params, scales: Dict[str, float]):
        """Fold + quantize weights against ``scales``; binds this
        instance to the scales and returns the int8 qparams pytree."""
        self.scales = dict(scales)
        ctx = _BuildCtx(params, self.scales)
        _traverse(ctx, np.zeros((1, 32, 32, 3), np.float32), self.variant,
                  self.num_classes)
        return ctx.qparams

    def apply(self, qparams, x):
        if self.scales is None:
            raise RuntimeError("call build(params, scales) first")
        ctx = _RunCtx(qparams, self.scales)
        outs = _traverse(ctx, x, self.variant, self.num_classes)
        return [(r.data, c.data) for r, c in outs]


def quantize_yolo_synthetic(params, variant: str = "n",
                            num_classes: int = 80,
                            input_shape: Tuple[int, int] = (640, 640),
                            letterbox_auto: bool = False,
                            seed: int = 7):
    """Calibrate + build against deterministic synthetic scenes.

    The calibration set is 6 rendered synthetic-world scenes plus 2
    uniform-noise frames, letterboxed to ``input_shape`` — the same
    [0, 1] domain every production frame occupies, so the scales
    transfer across stream resolutions. ~10 f32 forwards, once per
    load. Returns ``(QuantYOLOv8-bound-instance, qparams)``.
    """
    from ..ops.preprocess import letterbox_spec, preprocess_yolo
    from ..synthetic import WorldSpec, random_scene

    spec = WorldSpec(max_objects=12, presence=1.0)
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    frames = [np.asarray(random_scene(k, spec)[0]) for k in keys]
    rng = np.random.RandomState(seed)
    frames += [rng.randint(0, 256, (*spec.hw, 3), np.uint8)
               for _ in range(2)]
    lspec = letterbox_spec(spec.hw, tuple(input_shape), auto=letterbox_auto)
    x = np.stack([
        np.asarray(preprocess_yolo(jnp.asarray(f), lspec,
                                   out_dtype=jnp.float32)[0], np.float32)
        for f in frames])
    q = QuantYOLOv8(variant, num_classes)
    scales = q.calibrate(params, x, batch=4, margin=1.05)
    qparams = q.build(params, scales)
    return q, qparams
