"""Facade-level differential: our DeepSORT vs the reference's DeepSORT.

test_reference_oracle.py validates the *core* (TrackerCore) against the
reference; this test validates the layer above it — the public
``DeepSORT.update(bboxes, confs, class_ids, frame)`` facade
(reference deepsort_tracker.py:63-141) — where a separate set of semantics
lives: the confidence+class prefilter (:88-95), crop extraction validity
(int-truncated clamped boxes, :143-159), the feature<->detection mapping
with feature=None for invalid crops (:161-199), and the output formatting
(confirmed & time_since_update==0, int-rounded boxes, :126-141).

Both facades get the SAME deterministic appearance features: every
identity is painted as a solid unique color and the ReID extractor on
each side is replaced with "L2-normalized mean crop color" — identical
(up to f32 rounding) between the reference's host crops and our on-device
gather for solid regions, so the appearance cascade does real,
deterministic matching work on both sides.

The reference's facade imports its TensorRT wrapper at module load; a
minimal ``tensorrt`` stub satisfies the import (only module-level
attributes are touched — the ReID model runs in its CPU mock mode,
reid_model.py:51-64, and we never call the engine).
"""

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)


def _install_tensorrt_stub():
    """Satisfy `import tensorrt` in reference trt_engine.py:3,13,20-26."""
    if "tensorrt" in sys.modules:
        return
    trt = types.ModuleType("tensorrt")

    class Logger:
        WARNING = 30
        ERROR = 40

        def __init__(self, level=None):
            pass

    trt.Logger = Logger
    for name in ("bool", "int8", "int32", "float16", "float32"):
        setattr(trt, name, object())
    sys.modules["tensorrt"] = trt


_install_tensorrt_stub()

from src.tracker.deepsort_tracker import DeepSORT as RefDeepSORT  # noqa: E402

from aicamera_tpu import config  # noqa: E402
from aicamera_tpu.ops.crops import (_IMAGENET_MEAN,  # noqa: E402
                                    _IMAGENET_STD)
from aicamera_tpu.tracker_api import DeepSORT  # noqa: E402

FRAME_HW = (480, 640)
FEATURE_DIM = 512


# --- identical deterministic appearance features on both sides ----------

def _embed(rgb_mean):
    v = np.zeros(FEATURE_DIM, np.float64)
    v[:3] = rgb_mean
    return v / max(np.linalg.norm(v), 1e-12)


def ref_fake_features(crops_bgr):
    """Mean crop color, reference side (raw clamped BGR uint8 crops)."""
    return np.stack([
        _embed(c[..., ::-1].astype(np.float64).mean(axis=(0, 1)) / 255.0)
        for c in crops_bgr]).astype(np.float32)


class FakeReID:
    """Mean crop color, our side (ImageNet-normalized RGB device crops)."""

    def apply(self, params, crops):
        import jax.numpy as jnp
        mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(_IMAGENET_STD, jnp.float32)
        rgb = crops.astype(jnp.float32) * std + mean
        v = rgb.mean(axis=(1, 2))                       # (B, 3)
        feat = jnp.zeros((crops.shape[0], FEATURE_DIM),
                         jnp.float32).at[:, :3].set(v)
        n = jnp.linalg.norm(feat, axis=-1, keepdims=True)
        return feat / jnp.maximum(n, 1e-12)


# --- deterministic multi-object scenario ---------------------------------

# (BGR paint color, class id, conf, (w, h), (x0, y0), (vx, vy))
IDENTS = {
    "A": ((200, 30, 30), 0, 0.90, (60, 120), (30.37, 40.11), (6.0, 1.0)),
    "B": ((30, 200, 30), 2, 0.85, (90, 70), (350.2, 60.6), (3.0, 2.0)),
    "C": ((30, 30, 200), 0, 0.88, (55, 110), (80.7, 300.3), (5.0, 0.0)),
    "D": ((200, 200, 40), 7, 0.92, (80, 90), (420.9, 300.5), (-4.0, 1.0)),
}


def _present(name, t):
    if name == "A":
        return t not in (12, 13, 14)     # 3-frame occlusion: cascade level 3
    if name == "B":
        return True
    if name == "C":
        return 5 <= t < 25               # late entry, then deleted by max_age
    if name == "D":
        return t >= 8 and t != 20        # 1-frame miss: IoU-stage revival
    raise KeyError(name)


def make_frame_and_dets(t):
    h, w = FRAME_HW
    frame = np.full((h, w, 3), 20, np.uint8)
    boxes, confs, clss = [], [], []
    for name, (color, cls, conf, (bw, bh), (x0, y0), (vx, vy)) in \
            IDENTS.items():
        if not _present(name, t):
            continue
        x1, y1 = x0 + vx * t, y0 + vy * t
        box = [x1, y1, x1 + bw, y1 + bh]
        # paint a solid rect 6px beyond the box so every crop sample
        # (both the reference's clamped slice and our bilinear gather)
        # lands on the identity's pure color
        px1, py1 = max(int(x1) - 6, 0), max(int(y1) - 6, 0)
        px2, py2 = min(int(box[2]) + 7, w), min(int(box[3]) + 7, h)
        frame[py1:py2, px1:px2] = color
        boxes.append(box)
        confs.append(conf)
        clss.append(cls)
    # degenerate box (zero width): valid detection, invalid crop ->
    # feature=None path on both sides (deepsort_tracker.py:155-158)
    if 6 <= t <= 10:
        boxes.append([500.0, 100.0, 500.0, 160.0])
        confs.append(0.80)
        clss.append(0)
    # below min confidence -> prefiltered (deepsort_tracker.py:93)
    boxes.append([250.0, 400.0, 300.0, 450.0])
    confs.append(0.20)
    clss.append(0)
    # class not in CLASSES_TO_TRACK (cat) -> prefiltered (:94)
    boxes.append([550.0, 20.0, 600.0, 80.0])
    confs.append(0.90)
    clss.append(15)
    # out-of-range class id -> "Unknown" -> prefiltered (:92)
    boxes.append([550.0, 120.0, 600.0, 180.0])
    confs.append(0.90)
    clss.append(200)
    return (frame, np.asarray(boxes, np.float32),
            np.asarray(confs, np.float32), np.asarray(clss, np.int64))


# --- lifecycle views ------------------------------------------------------

def ref_lifecycle(ref):
    return sorted((t.track_id, int(t.state), t.time_since_update, t.hits)
                  for t in ref.tracker_core.tracks)


def our_lifecycle(ds):
    st = ds.state
    active = np.asarray(st.active)
    return sorted(zip(np.asarray(st.track_id)[active].tolist(),
                      np.asarray(st.state)[active].tolist(),
                      np.asarray(st.tsu)[active].tolist(),
                      np.asarray(st.hits)[active].tolist()))


def test_facade_matches_reference_facade():
    n_frames = 40
    params = dict(max_age=10, n_init=3)

    ref = RefDeepSORT(reid_model_path="/nonexistent/reid.engine", **params)
    ref.reid_model.extract_features_batched = ref_fake_features

    ds = DeepSORT(reid_model_path=None, nn_budget=config.DEEPSORT_NN_BUDGET,
                  **params)
    ds.reid_model.model = FakeReID()   # before the first update jit-caches

    all_ids = set()
    for t in range(n_frames):
        frame, boxes, confs, clss = make_frame_and_dets(t)
        ref_out = sorted(ref.update(boxes, confs, clss, frame),
                         key=lambda r: r[4])
        our_out = sorted(ds.update(boxes, confs, clss, frame),
                         key=lambda r: r[4])

        assert [o[4] for o in our_out] == [r[4] for r in ref_out], (
            f"frame {t}: emitted ids {[o[4] for o in our_out]} vs "
            f"reference {[r[4] for r in ref_out]}")
        for o, r in zip(our_out, ref_out):
            assert o[5] == r[5], f"frame {t} id {o[4]}: class name"
            assert abs(o[6] - r[6]) < 1e-5, f"frame {t} id {o[4]}: conf"
            assert max(abs(np.array(o[:4]) - np.array(r[:4]))) <= 1, (
                f"frame {t} id {o[4]}: boxes {o[:4]} vs {r[:4]}")

        assert our_lifecycle(ds) == ref_lifecycle(ref), (
            f"frame {t}: lifecycle diverged\n"
            f"  ours: {our_lifecycle(ds)}\n  ref : {ref_lifecycle(ref)}")
        all_ids.update(o[4] for o in our_out)

    # the scenario exercised what it claims: all four painted identities
    # were confirmed and emitted at some point
    assert len(all_ids) >= 4, f"only ids {sorted(all_ids)} ever emitted"
