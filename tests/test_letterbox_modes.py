"""Letterbox mode parity vs the REFERENCE's actual utility.

The reference letterbox (src/utils/image_processing.py:7-70) supports
square (auto=False), minimum-rectangle (auto=True, stride-modulo padding)
and scaleFill (stretch) modes; the detect pipeline only uses
(auto=False, scaleup=False). These tests drive the reference function
directly (pure cv2/numpy, hardware-free) against:

  * our host `letterbox` utility — pixel-exact, identical return contract;
  * our `letterbox_spec` geometry — ratio/padding/output-shape parity;
  * the device `preprocess_yolo` path in auto mode — within 1 gray level
    (cv2 resizes in fixed-point; the XLA path in f32).
"""

import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

from src.utils.image_processing import letterbox as ref_letterbox  # noqa: E402

from aicamera_tpu.ops.preprocess import (letterbox, letterbox_spec,  # noqa: E402
                                         preprocess_yolo)

SHAPES = [(540, 960), (720, 1280), (640, 640), (333, 517), (1080, 1920),
          (100, 100), (31, 97)]
MODES = [
    dict(auto=False, scaleFill=False, scaleup=False),  # pipeline config
    dict(auto=False, scaleFill=False, scaleup=True),
    dict(auto=True, scaleFill=False, scaleup=True),
    dict(auto=True, scaleFill=False, scaleup=False),
    dict(auto=False, scaleFill=True, scaleup=True),
]


def _frame(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (*shape, 3), np.uint8)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("mode", MODES, ids=lambda m: "-".join(
    k for k, v in m.items() if v) or "square-noscaleup")
def test_host_letterbox_matches_reference(shape, mode):
    im = _frame(shape)
    ref_im, ref_ratio, ref_pad = ref_letterbox(im, (640, 640), **mode)
    our_im, our_ratio, our_pad = letterbox(im, (640, 640), **mode)
    assert our_im.shape == ref_im.shape
    np.testing.assert_array_equal(our_im, ref_im)
    assert our_ratio == pytest.approx(ref_ratio)
    assert tuple(our_pad) == pytest.approx(tuple(ref_pad))


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("stride", [32, 64])
def test_auto_mode_output_is_stride_friendly(shape, stride):
    """auto mode pads each dimension by (pad % stride) total."""
    spec = letterbox_spec(shape, (640, 640), scaleup=True, auto=True,
                          stride=stride)
    ref_im, _, _ = ref_letterbox(_frame(shape), (640, 640), auto=True,
                                 scaleup=True, stride=stride)
    assert spec.out_hw == ref_im.shape[:2]


def test_scale_fill_keeps_min_ratio_quirk():
    """scaleFill stretches the image but the returned ratio stays the
    min-ratio r (reference :57-61 keeps it for unscaling consistency)."""
    shape = (540, 960)
    _, ref_ratio, ref_pad = ref_letterbox(_frame(shape), (640, 640),
                                          auto=False, scaleFill=True,
                                          scaleup=True)
    spec = letterbox_spec(shape, (640, 640), scaleup=True, scale_fill=True)
    assert spec.ratio == pytest.approx(ref_ratio[0])
    assert spec.unpad_hw == (640, 640)
    assert spec.pad_wh == (0.0, 0.0) == tuple(ref_pad)


@pytest.mark.parametrize("mode", MODES, ids=lambda m: "-".join(
    k for k, v in m.items() if v) or "square-noscaleup")
def test_device_preprocess_matches_reference_pixels(mode):
    """The XLA preprocess path must match the reference's letterbox output
    within 1 gray level in every mode (cv2 fixed-point vs f32 rounding)."""
    import jax.numpy as jnp

    shape = (540, 960)
    im = _frame(shape, seed=3)
    ref_im, _, _ = ref_letterbox(im, (640, 640), **mode)
    spec = letterbox_spec(shape, (640, 640), scaleup=mode["scaleup"],
                          auto=mode["auto"], scale_fill=mode["scaleFill"])
    out = np.asarray(preprocess_yolo(jnp.asarray(im), spec))[0]
    # ours: normalized RGB NHWC; reference: BGR uint8
    ref_rgb = ref_im[..., ::-1].astype(np.float32) / 255.0
    assert out.shape == ref_rgb.shape
    np.testing.assert_allclose(out, ref_rgb, atol=1.01 / 255.0)
