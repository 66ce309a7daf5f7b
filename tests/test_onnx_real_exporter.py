"""ONNX importer vs a REAL exporter-produced file (torch.onnx.export).

The other importer tests validate against hand-rolled wire-format
fixtures; this one closes the remaining gap to the actual artifacts
(reference scripts/download_models.sh:7-8) as far as an offline
environment allows: faithful torch mirrors of the YOLOv8n and DeepSORT
ReID architectures are exported through torch's own legacy ONNX exporter
(the same TorchScript-trace pipeline ultralytics used for yolov8n.onnx),
producing genuine exporter output — trace-ordered nodes, Constant/Slice/
Resize/Transpose/Softmax plumbing, Conv+BN fused at trace time exactly
like the real fused ultralytics export, and the fixed arange(16) DFL conv
in the decode tail. The import must then reproduce the torch model's
outputs through the Flax modules. (Unfused BN folding is covered
separately by test_onnx_import.py::test_bn_folding_matches_torch.)

torch's exporter only needs the `onnx` package for an onnxscript
post-processing step that is a no-op for standard ops
(torch/onnx/_internal/torchscript_exporter/onnx_proto_utils.py:
_add_onnxscript_fn re-serializes unchanged when no custom functions
exist); it is patched to identity since `onnx` is not installed here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aicamera_tpu.models.layers import scale_channels  # noqa: E402
from aicamera_tpu.models.onnx_import import (import_reid_params,  # noqa: E402
                                             import_yolo_params, parse_onnx)
from aicamera_tpu.models.yolov8 import (_BASE_CHANNELS, _BASE_DEPTHS,  # noqa: E402
                                        REG_MAX, STRIDES, YOLOV8_VARIANTS,
                                        YOLOv8, _depth, decode_predictions)


def _patch_exporter():
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils
    onnx_proto_utils._add_onnxscript_fn = \
        lambda model_bytes, custom_opsets: model_bytes


try:
    _patch_exporter()
except ImportError:  # private path moves across torch versions
    pytest.skip("legacy TorchScript ONNX exporter not at the known "
                "private path in this torch version", allow_module_level=True)


# --- torch mirror of the Flax YOLOv8 (NCHW, BN unfused) -------------------

class TConv(tnn.Module):
    """Conv + BN + SiLU — ultralytics 'Conv' before fusing."""

    def __init__(self, cin, cout, k=1, s=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.silu(x) if self.act else x


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, cin, cout, n, shortcut):
        super().__init__()
        self.c = cout // 2
        self.cv1 = TConv(cin, 2 * self.c, 1)
        self.m = tnn.ModuleList(TBottleneck(self.c, shortcut)
                                for _ in range(n))
        self.cv2 = TConv((2 + n) * self.c, cout, 1)

    def forward(self, x):
        y = self.cv1(x)
        chunks = [y[:, :self.c], y[:, self.c:]]
        for m in self.m:
            chunks.append(m(chunks[-1]))
        return self.cv2(torch.cat(chunks, 1))


class TSPPF(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        c = cin // 2
        self.cv1 = TConv(cin, c, 1)
        self.cv2 = TConv(4 * c, cout, 1)
        self.pool = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        x = self.cv1(x)
        outs = [x]
        for _ in range(3):
            outs.append(self.pool(outs[-1]))
        return self.cv2(torch.cat(outs, 1))


class TDFL(tnn.Module):
    """The fixed arange(REG_MAX) conv of the ultralytics decode tail."""

    def __init__(self):
        super().__init__()
        self.conv = tnn.Conv2d(REG_MAX, 1, 1, bias=False)
        with torch.no_grad():
            self.conv.weight.copy_(
                torch.arange(REG_MAX, dtype=torch.float32).view(
                    1, REG_MAX, 1, 1))
        self.conv.weight.requires_grad_(False)

    def forward(self, box):
        b, _, a = box.shape
        x = box.view(b, 4, REG_MAX, a).transpose(2, 1).softmax(1)
        return self.conv(x).view(b, 4, a)


class TYOLOv8(tnn.Module):
    """Mirror of models/yolov8.py with the exported decode tail.

    Submodule calls happen in exactly the Flax forward order, so the
    trace's Conv node order is the real thing the importer must map.
    """

    def __init__(self, variant="n", num_classes=80, input_hw=(128, 128)):
        super().__init__()
        d, w, mc = YOLOV8_VARIANTS[variant]
        ch = scale_channels(_BASE_CHANNELS, w, mc)
        dep = [_depth(n, d) for n in _BASE_DEPTHS]
        n = _depth(3, d)
        self.nc = num_classes

        # backbone (yolov8.py Backbone)
        self.stem = TConv(3, ch[0], 3, 2)
        self.down1 = TConv(ch[0], ch[1], 3, 2)
        self.c2f1 = TC2f(ch[1], ch[1], dep[0], True)
        self.down2 = TConv(ch[1], ch[2], 3, 2)
        self.c2f2 = TC2f(ch[2], ch[2], dep[1], True)
        self.down3 = TConv(ch[2], ch[3], 3, 2)
        self.c2f3 = TC2f(ch[3], ch[3], dep[2], True)
        self.down4 = TConv(ch[3], ch[4], 3, 2)
        self.c2f4 = TC2f(ch[4], ch[4], dep[3], True)
        self.sppf = TSPPF(ch[4], ch[4])
        # neck (yolov8.py Neck)
        self.up_c2f1 = TC2f(ch[4] + ch[3], ch[3], n, False)
        self.up_c2f2 = TC2f(ch[3] + ch[2], ch[2], n, False)
        self.down_conv1 = TConv(ch[2], ch[2], 3, 2)
        self.down_c2f1 = TC2f(ch[2] + ch[3], ch[3], n, False)
        self.down_conv2 = TConv(ch[3], ch[3], 3, 2)
        self.down_c2f2 = TC2f(ch[3] + ch[4], ch[4], n, False)
        # head (yolov8.py DetectHead)
        c_reg = max(16, ch[2] // 4, REG_MAX * 4)
        c_cls = max(ch[2], min(num_classes, 100))
        self.reg = tnn.ModuleList()
        self.cls = tnn.ModuleList()
        for cin in (ch[2], ch[3], ch[4]):
            self.reg.append(tnn.Sequential(
                TConv(cin, c_reg, 3), TConv(c_reg, c_reg, 3),
                tnn.Conv2d(c_reg, 4 * REG_MAX, 1, bias=True)))
            self.cls.append(tnn.Sequential(
                TConv(cin, c_cls, 3), TConv(c_cls, c_cls, 3),
                tnn.Conv2d(c_cls, num_classes, 1, bias=True)))
        self.dfl = TDFL()
        pts, strd = [], []
        for s in STRIDES:
            h, w_ = input_hw[0] // s, input_hw[1] // s
            gy, gx = torch.meshgrid(torch.arange(h) + 0.5,
                                    torch.arange(w_) + 0.5, indexing="ij")
            pts.append(torch.stack([gx.reshape(-1), gy.reshape(-1)], 0))
            strd.append(torch.full((1, h * w_), float(s)))
        self.register_buffer("anchors", torch.cat(pts, 1).float())   # (2,A)
        self.register_buffer("strides", torch.cat(strd, 1).float())  # (1,A)

    def levels(self, x):
        p3_in = self.c2f2(self.down2(self.c2f1(self.down1(self.stem(x)))))
        p4 = self.c2f3(self.down3(p3_in))
        p5 = self.sppf(self.c2f4(self.down4(p4)))
        t1 = self.up_c2f1(torch.cat(
            [F.interpolate(p5, scale_factor=2.0, mode="nearest"), p4], 1))
        n3 = self.up_c2f2(torch.cat(
            [F.interpolate(t1, scale_factor=2.0, mode="nearest"), p3_in], 1))
        n4 = self.down_c2f1(torch.cat([self.down_conv1(n3), t1], 1))
        n5 = self.down_c2f2(torch.cat([self.down_conv2(n4), p5], 1))
        # per level: full reg branch then full cls branch (DetectHead loop)
        return [(self.reg[i](f), self.cls[i](f))
                for i, f in enumerate((n3, n4, n5))]

    def forward(self, x):
        outs = self.levels(x)
        box = torch.cat([r.flatten(2) for r, _ in outs], 2)   # (B,64,A)
        cls = torch.cat([c.flatten(2) for _, c in outs], 2)   # (B,nc,A)
        dist = self.dfl(box)                                  # (B,4,A)
        x1y1 = self.anchors - dist[:, :2]
        x2y2 = self.anchors + dist[:, 2:]
        boxes = torch.cat([x1y1, x2y2], 1) * self.strides
        return torch.cat([boxes, cls.sigmoid()], 1)           # (B,4+nc,A)


# --- torch mirror of the Flax ReID net ------------------------------------

class TConvBNRelu(tnn.Module):
    def __init__(self, cin, cout, k=3, s=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x


class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        s = 2 if downsample else 1
        self.cv1 = TConvBNRelu(cin, cout, 3, s)
        self.cv2 = TConvBNRelu(cout, cout, 3, 1, act=False)
        self.proj = (TConvBNRelu(cin, cout, 1, s, act=False)
                     if downsample or cin != cout else None)

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        if self.proj is not None:
            x = self.proj(x)
        return F.relu(x + y)


class TReIDNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stem = TConvBNRelu(3, 64, 3, 1)
        self.pool = tnn.MaxPool2d(3, 2, 1)
        stages = [(64, False), (64, False), (128, True), (128, False),
                  (256, True), (256, False), (512, True), (512, False)]
        blocks, cin = [], 64
        for feats, down in stages:
            blocks.append(TBasicBlock(cin, feats, down))
            cin = feats
        self.blocks = tnn.ModuleList(blocks)

    def forward(self, x):
        x = self.pool(self.stem(x))
        for b in self.blocks:
            x = b(x)
        x = x.mean(dim=(2, 3))
        return x / x.norm(dim=-1, keepdim=True).clamp_min(1e-7)


# --- helpers ---------------------------------------------------------------

def _randomize(model: tnn.Module, seed: int):
    """Non-default weights + non-trivial BN running stats everywhere."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d) and m.weight.requires_grad:
                m.weight.normal_(0.0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.1, generator=g)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)
    model.eval()


def _export(model, x, path):
    torch.onnx.export(model, x, str(path), opset_version=12, dynamo=False,
                      input_names=["images"], output_names=["output0"])


# --- tests -----------------------------------------------------------------

HW = (128, 128)


@pytest.fixture(scope="module")
def yolo_export(tmp_path_factory):
    tm = TYOLOv8(input_hw=HW)
    _randomize(tm, 0)
    path = tmp_path_factory.mktemp("real_onnx") / "yolov8n.onnx"
    _export(tm, torch.zeros(1, 3, *HW), path)
    return tm, str(path)


def test_yolo_real_export_imports_and_matches(yolo_export):
    tm, path = yolo_export
    model = YOLOv8(variant="n", dtype=jnp.float32)
    example = jnp.zeros((1, *HW, 3))
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), example)
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)

    params = import_yolo_params(path, template, model=model,
                                example_input=example)

    rng = np.random.RandomState(3)
    x = rng.rand(1, *HW, 3).astype(np.float32)
    levels = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        t_levels = tm.levels(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy()))
    for li, ((fr, fc), (tr, tc)) in enumerate(zip(levels, t_levels)):
        np.testing.assert_allclose(
            np.asarray(fr), tr.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=2e-3, err_msg=f"level {li} box bins")
        np.testing.assert_allclose(
            np.asarray(fc), tc.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=2e-3, err_msg=f"level {li} class logits")


def test_yolo_real_export_decode_matches(yolo_export):
    """Our DFL decode == the exported decode tail (boxes and scores)."""
    tm, _ = yolo_export
    rng = np.random.RandomState(4)
    x = rng.rand(1, *HW, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        t_out = tm(xt).numpy()                      # (1, 84, A)
        t_levels = tm.levels(xt)
    levels = [(jnp.asarray(r.numpy().transpose(0, 2, 3, 1)),
               jnp.asarray(c.numpy().transpose(0, 2, 3, 1)))
              for r, c in t_levels]
    boxes, scores = decode_predictions(levels, HW)  # (1,A,4), (1,A,80)
    np.testing.assert_allclose(np.asarray(boxes),
                               t_out[:, :4].transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(scores),
                               t_out[:, 4:].transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


def test_yolo_real_export_has_expected_structure(yolo_export):
    """The export looks like the real yolov8n.onnx: Resize nodes,
    Slice-based C2f splits, one non-learned DFL conv, and BN fused into
    the convs at trace time (torch folds eval-mode Conv+BN exactly like
    ultralytics' fused export — zero BatchNormalization nodes remain,
    every learned conv carries the folded bias)."""
    _, path = yolo_export
    nodes, _ = parse_onnx(path)
    ops = {n.op_type for n in nodes}
    assert {"Conv", "Resize", "Concat", "Softmax"} <= ops
    n_conv = sum(1 for n in nodes if n.op_type == "Conv")
    n_bn = sum(1 for n in nodes if n.op_type == "BatchNormalization")
    assert n_conv == 64      # 63 learned + DFL
    assert n_bn == 0         # fused at trace
    learned = [n for n in nodes if n.op_type == "Conv"
               and len(n.inputs) == 3]
    assert len(learned) == 63  # only the DFL conv is bias-free


def test_reid_real_export_imports_and_matches(tmp_path):
    from aicamera_tpu.models.reid import ReIDNet

    tm = TReIDNet()
    _randomize(tm, 1)
    path = tmp_path / "deepsort_reid.onnx"
    _export(tm, torch.zeros(1, 3, 128, 64), path)

    model = ReIDNet(dtype=jnp.float32)
    example = jnp.zeros((1, 128, 64, 3))
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), example)
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = import_reid_params(str(path), template, model=model,
                                example_input=example)

    rng = np.random.RandomState(5)
    x = rng.rand(4, 128, 64, 3).astype(np.float32)
    feats = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        t_feats = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    np.testing.assert_allclose(feats, t_feats, rtol=1e-3, atol=1e-3)
    # embeddings are unit-norm on both sides
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-5)
