"""Tiled (sliced) high-res detection: layout, merge NMS, facade, quality.

The quality test builds a 2x2 mosaic of four independent synthetic worlds
(each at the 540p scale the committed checkpoint was trained on): the
full-frame letterbox of the 1080p mosaic sees every object at HALF the
trained scale, while a 2x2 tile grid sees each world at native scale —
exactly the small-object regime SAHI slicing exists for.
"""

import numpy as np
import pytest

from aicamera_tpu.ops.tiling import merge_detections, tile_layout


def _covered(frame_hw, origins, tile_hw):
    h, w = frame_hw
    th, tw = tile_hw
    mask = np.zeros((h, w), bool)
    for y0, x0 in origins:
        assert 0 <= y0 <= h - th and 0 <= x0 <= w - tw
        mask[y0:y0 + th, x0:x0 + tw] = True
    return mask.all()


@pytest.mark.parametrize("frame_hw,grid,overlap", [
    ((540, 960), (2, 2), 0.0),
    ((1080, 1920), (2, 2), 0.2),
    ((2160, 3840), (3, 3), 0.25),
    ((720, 1280), (1, 3), 0.2),
    ((101, 67), (2, 2), 0.3),     # odd sizes: flush-clamped last tiles
    ((64, 64), (1, 1), 0.0),
])
def test_tile_layout_covers_frame(frame_hw, grid, overlap):
    origins, tile_hw = tile_layout(frame_hw, grid, overlap)
    assert len(origins) == grid[0] * grid[1]
    assert _covered(frame_hw, origins, tile_hw)


def test_tile_layout_overlap_fraction():
    origins, (th, tw) = tile_layout((1080, 1920), (2, 2), 0.2)
    # neighbouring tiles overlap by >= the requested fraction
    ys = sorted({y for y, _ in origins})
    xs = sorted({x for _, x in origins})
    assert th - (ys[1] - ys[0]) >= 0.2 * th - 1
    assert tw - (xs[1] - xs[0]) >= 0.2 * tw - 1


def test_tile_layout_validation():
    with pytest.raises(ValueError):
        tile_layout((100, 100), (0, 2), 0.2)
    with pytest.raises(ValueError):
        tile_layout((100, 100), (2, 2), 1.0)


def _nms_oracle(boxes, scores, cls, iou_t):
    """Sequential greedy class-aware NMS (host oracle)."""
    order = np.argsort(-scores)
    kept = []
    for i in order:
        if scores[i] <= 0:
            continue
        ok = True
        for j in kept:
            if cls[j] != cls[i]:
                continue
            b1, b2 = boxes[i], boxes[j]
            ix1, iy1 = max(b1[0], b2[0]), max(b1[1], b2[1])
            ix2, iy2 = min(b1[2], b2[2]), min(b1[3], b2[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            if inter / max(a1 + a2 - inter, 1e-7) > iou_t:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_merge_detections_matches_sequential_oracle(seed):
    rng = np.random.RandomState(seed)
    n = 64
    ctr = rng.rand(n, 2) * 400
    wh = rng.rand(n, 2) * 80 + 5
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(
        np.float32)
    scores = rng.rand(n).astype(np.float32) * 0.9 + 0.05
    # well-separated scores: avoid f32-tie ordering ambiguity vs the oracle
    scores = np.round(scores, 3) + np.arange(n) * 1e-4
    cls = rng.randint(0, 3, n).astype(np.int32)
    valid = rng.rand(n) > 0.2
    num, mb, ms, mc = merge_detections(boxes, scores.astype(np.float32),
                                       cls, valid, 0.5, 32)
    oracle = _nms_oracle(boxes, np.where(valid, scores, -1.0), cls, 0.5)
    oracle = oracle[:32]
    assert int(num) == len(oracle)
    got = {(round(float(s), 5)) for s in np.asarray(ms)[:int(num)]}
    want = {round(float(scores[i]), 5) for i in oracle}
    assert got == want


def test_merge_collapses_cross_tile_duplicates():
    # one object reported by two overlapping tiles at slightly different
    # clip boundaries + the full-frame pass: one survivor, highest score
    boxes = np.array([[100, 100, 200, 200],
                      [102, 101, 200, 200],     # tile-clipped duplicate
                      [99, 100, 201, 201],      # full-frame duplicate
                      [400, 400, 450, 450]], np.float32)
    scores = np.array([0.8, 0.7, 0.9, 0.6], np.float32)
    cls = np.zeros(4, np.int32)
    valid = np.ones(4, bool)
    num, mb, ms, mc = merge_detections(boxes, scores, cls, valid, 0.5, 8)
    assert int(num) == 2
    assert float(ms[0]) == pytest.approx(0.9)
    assert float(ms[1]) == pytest.approx(0.6)


def test_detect_tiled_contract():
    """Facade contract on a tiny frame: shapes, dtypes, in-bounds boxes."""
    from aicamera_tpu.detector import YOLODetector
    det = YOLODetector(conf_threshold=0.0)
    frame = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(
        np.uint8)
    boxes, scores, cls, idx = det.detect_tiled(frame, grid=(2, 2),
                                               overlap=0.2)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert scores.shape == cls.shape == idx.shape == (boxes.shape[0],)
    assert cls.dtype == np.int32
    if len(boxes):
        assert boxes[:, 0].min() >= 0 and boxes[:, 1].min() >= 0
        assert boxes[:, 2].max() <= 128 and boxes[:, 3].max() <= 96
        # scores come out globally sorted from the merge NMS
        assert (np.diff(scores) <= 1e-6).all()


def test_tiled_beats_full_frame_on_small_objects():
    """2x2-tiled detection on a 1080p mosaic of four trained-scale worlds
    recovers the AP the full-frame letterbox loses to object shrink."""
    from pathlib import Path

    from aicamera_tpu.detector import YOLODetector
    from aicamera_tpu.eval import evaluate_detections
    from aicamera_tpu.synthetic import TemporalWorld, WorldSpec

    ckpt = (Path(__file__).resolve().parent.parent / "models" /
            "detection" / "yolov8n_synthetic.msgpack")
    if not ckpt.exists():
        pytest.skip("trained synthetic checkpoint not present")

    spec = WorldSpec(max_objects=6, presence=1.0)
    worlds = [TemporalWorld(spec, seed=50 + i, speed=3.0) for i in range(4)]
    h, w = spec.hw
    frames, gt = [], []
    for _ in range(3):
        tiles, boxes, cls = [], [], []
        for q, world in enumerate(worlds):
            f, b, ids, c, v = world.step()
            tiles.append(np.asarray(f))
            oy, ox = (q // 2) * h, (q % 2) * w
            bb = np.asarray(b)[np.asarray(v)]
            boxes.append(bb + np.array([ox, oy, ox, oy], np.float32))
            cls.append(np.asarray(c)[np.asarray(v)])
        mosaic = np.concatenate(
            [np.concatenate(tiles[:2], 1), np.concatenate(tiles[2:], 1)], 0)
        frames.append(mosaic)
        gt.append((np.concatenate(boxes), np.concatenate(cls)))

    det = YOLODetector(engine_path=str(ckpt), conf_threshold=0.1)
    single, tiled = [], []
    for f in frames:
        b, s, c, _ = det.detect(f)
        single.append((b, s, c))
        b, s, c, _ = det.detect_tiled(f, grid=(2, 2), overlap=0.0,
                                      include_full_frame=False)
        tiled.append((b, s, c))
    ap_single = evaluate_detections(gt, single).ap50
    ap_tiled = evaluate_detections(gt, tiled).ap50
    # the checkpoint never saw half-scale objects; tiles restore its
    # training scale. Demand a decisive margin, not a statistical one.
    assert ap_tiled > ap_single + 0.15, (ap_tiled, ap_single)
    assert ap_tiled > 0.5, ap_tiled


def test_merge_ios_collapses_seam_fragment_iou_keeps_it():
    """A small fragment clipped at a tile boundary, fully inside the
    full-frame detection of the same object: IoU = 20/100 < 0.5 (both
    survive — the seam-duplicate failure mode), IoS = 1.0 (fragment
    collapses under criterion='ios')."""
    boxes = np.array([[100, 100, 200, 200],      # full object
                      [100, 100, 120, 200]], np.float32)  # seam fragment
    scores = np.array([0.9, 0.6], np.float32)
    cls = np.zeros(2, np.int32)
    valid = np.ones(2, bool)
    num_iou, *_ = merge_detections(boxes, scores, cls, valid, 0.5, 8,
                                   criterion="iou")
    assert int(num_iou) == 2  # documented IoU behavior: duplicate survives
    num_ios, mb, ms, mc = merge_detections(boxes, scores, cls, valid, 0.5,
                                           8, criterion="ios")
    assert int(num_ios) == 1
    assert float(ms[0]) == pytest.approx(0.9)
    with pytest.raises(ValueError, match="criterion"):
        merge_detections(boxes, scores, cls, valid, 0.5, 8,
                         criterion="diou")


def test_merge_class_offset_scales_with_frame_size():
    """In frame coordinates a panoramic source can exceed the 8192-px
    class-NMS shift: a class-0 box at x~8200 and a class-1 box at x~10
    land on top of each other after the class-1 shift and cross-suppress.
    Passing frame_hw scales the offset past the frame, keeping the class
    bands disjoint."""
    # class-0 box far down-right; class-1 box near the origin whose
    # +8192 shift (applied to all four coords) lands exactly on it
    boxes = np.array([[8202, 8202, 8292, 8292],
                      [10, 10, 100, 100]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    cls = np.array([0, 1], np.int32)
    valid = np.ones(2, bool)
    # without frame_hw: class-1 shift (+8192) lands exactly on the class-0
    # box -> spurious cross-class suppression (documents the old bug)
    num_old, *_ = merge_detections(boxes, scores, cls, valid, 0.5, 8)
    assert int(num_old) == 1
    # with the frame size known, both survive
    num, mb, ms, mc = merge_detections(boxes, scores, cls, valid, 0.5, 8,
                                       frame_hw=(9000, 20000))
    assert int(num) == 2
