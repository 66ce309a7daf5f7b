"""ONNX importer validated against a hand-serialized wire-format file.

``torch.onnx.export`` requires the (absent) onnx package, so the fixture
serializes a tiny but real ONNX ModelProto byte-by-byte with a minimal
protobuf writer — an independent implementation of the wire format that
cross-checks our reader. Forward parity is verified against torch's
eval-mode execution of the same weights (BN folding, OIHW->HWIO layout).
"""

import struct

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax import linen as nn

from aicamera_tpu.models.onnx_import import (extract_conv_weights,
                                             import_conv_net_params,
                                             parse_onnx)

# --- minimal protobuf writer ----------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int, payload: bytes) -> bytes:
    key = _varint((num << 3) | wire)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    return key + payload


def _str_field(num: int, s: str) -> bytes:
    return _field(num, 2, s.encode())


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    out = b""
    for d in arr.shape:
        out += _field(1, 0, _varint(d))
    out += _field(2, 0, _varint(1))  # data_type float32
    out += _str_field(8, name)
    out += _field(9, 2, arr.astype(np.float32).tobytes())
    return out


def _attr_float(name: str, v: float) -> bytes:
    return _str_field(1, name) + _field(2, 5, struct.pack("<f", v)) + \
        _field(20, 0, _varint(1))  # type FLOAT


def _node(op: str, inputs, outputs, attrs=b"") -> bytes:
    out = b""
    for i in inputs:
        out += _str_field(1, i)
    for o in outputs:
        out += _str_field(2, o)
    out += _str_field(4, op)
    if attrs:
        out += _field(5, 2, attrs)
    return out


def build_onnx_bytes(convs, bns):
    """Serialize graph: conv1 -> bn1 -> conv2 (no bn) as a ModelProto."""
    graph = b""
    inits = {}
    nodes = []
    # conv1 + bn1
    w1, b1 = convs[0]
    inits["w1"], inits["b1"] = w1, b1
    nodes.append(_node("Conv", ["x", "w1", "b1"], ["c1"]))
    g, be, m, v = bns[0]
    inits.update({"g1": g, "be1": be, "m1": m, "v1": v})
    nodes.append(_node("BatchNormalization",
                       ["c1", "g1", "be1", "m1", "v1"], ["n1"],
                       attrs=_attr_float("epsilon", 1e-5)))
    nodes.append(_node("Relu", ["n1"], ["r1"]))
    # conv2 (bias-free, no bn)
    w2, _ = convs[1]
    inits["w2"] = w2
    nodes.append(_node("Conv", ["r1", "w2"], ["y"]))

    for n in nodes:
        graph += _field(1, 2, n)
    for name, arr in inits.items():
        graph += _field(5, 2, _tensor_proto(name, arr))
    graph += _str_field(2, "tiny")
    model = _field(1, 0, _varint(8))       # ir_version
    model += _field(7, 2, graph)           # graph
    return model


@pytest.fixture(scope="module")
def onnx_setup(tmp_path_factory):
    rng = np.random.RandomState(0)
    w1 = rng.randn(8, 3, 3, 3).astype(np.float32) * 0.2
    b1 = rng.randn(8).astype(np.float32) * 0.1
    w2 = rng.randn(4, 8, 1, 1).astype(np.float32) * 0.2
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.uniform(-0.3, 0.3, 8).astype(np.float32)
    mean = rng.uniform(-0.5, 0.5, 8).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    path = tmp_path_factory.mktemp("onnx") / "tiny.onnx"
    path.write_bytes(build_onnx_bytes(
        [(w1, b1), (w2, None)], [(gamma, beta, mean, var)]))
    return str(path), (w1, b1, w2, gamma, beta, mean, var)


def test_parse_structure(onnx_setup):
    path, _ = onnx_setup
    nodes, inits = parse_onnx(path)
    ops = [n.op_type for n in nodes]
    assert ops == ["Conv", "BatchNormalization", "Relu", "Conv"]
    assert inits["w1"].shape == (8, 3, 3, 3)
    assert inits["w2"].shape == (4, 8, 1, 1)


def test_bn_folding_matches_torch(onnx_setup):
    path, (w1, b1, w2, gamma, beta, mean, var) = onnx_setup
    nodes, inits = parse_onnx(path)
    convs = extract_conv_weights(nodes, inits)
    assert len(convs) == 2

    # torch reference net with the same weights
    net = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1),
        torch.nn.BatchNorm2d(8),
        torch.nn.ReLU(),
        torch.nn.Conv2d(8, 4, 1, bias=False),
    ).eval()
    with torch.no_grad():
        net[0].weight.copy_(torch.from_numpy(w1))
        net[0].bias.copy_(torch.from_numpy(b1))
        net[1].weight.copy_(torch.from_numpy(gamma))
        net[1].bias.copy_(torch.from_numpy(beta))
        net[1].running_mean.copy_(torch.from_numpy(mean))
        net[1].running_var.copy_(torch.from_numpy(var))
        net[3].weight.copy_(torch.from_numpy(w2))

    class FlaxNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            # full f32 conv precision: this environment defaults f32 convs
            # to bf16 passes, which would mask real import bugs
            hp = jax.lax.Precision.HIGHEST
            x = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)), precision=hp,
                        name="c1")(x)
            x = nn.relu(x)
            return nn.Conv(4, (1, 1), use_bias=True, precision=hp,
                           name="c2")(x)

    model = FlaxNet()
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 16, 16, 3)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = import_conv_net_params(path, template)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(
        x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_conv_count_mismatch_raises(onnx_setup):
    path, _ = onnx_setup

    class Wrong(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(4, (1, 1))(x)

    template = jax.eval_shape(Wrong().init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 8, 3)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    with pytest.raises(ValueError, match="conv count mismatch"):
        import_conv_net_params(path, template)
