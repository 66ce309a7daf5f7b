"""Camera-motion compensation through the tracker cores and the pipeline.

Scenario: a static world object filmed by an oscillating (panning) camera.
In screen coordinates the object jumps ±PAN px every frame — a motion no
constant-velocity Kalman filter can learn (the velocity estimate is always
a frame behind the direction flip), so every core's IoU gate breaks and
IDs churn. With GMC the estimated inter-frame affine re-aligns the
predicted states each frame and one ID survives.

The reference cannot do this at all (static-camera assumption throughout
src/tracker/); this guards the beyond-parity capability end to end:
estimate (ops/gmc.py) -> core warp hooks -> pipeline wiring.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aicamera_tpu.core import bytetrack as bt
from aicamera_tpu.core import ocsort as oc
from aicamera_tpu.core import state as core_state
from aicamera_tpu.core import tracker as core_tracker
from aicamera_tpu.ops import gmc

H, W = 256, 384
PAN = 28          # px per flip — box is 40 px, so IoU drops to ~0.18
BOX = 40.0
N_FRAMES = 12


def _scene():
    """Frames of a textured world panned by an oscillating camera, plus
    the per-frame screen-space box of one static world object."""
    rng = np.random.RandomState(7)
    world = cv2.GaussianBlur(
        rng.randint(0, 255, (H, W, 3), np.uint8), (5, 5), 0)
    frames, boxes, pans = [], [], []
    pan = 0
    for i in range(N_FRAMES):
        frames.append(np.roll(world, shift=pan, axis=1))
        x1, y1 = 150.0 + pan, 100.0
        boxes.append(np.array([x1, y1, x1 + BOX, y1 + BOX], np.float32))
        pans.append(pan)
        pan = PAN if pan == 0 else 0   # oscillate 0 <-> PAN
    return frames, boxes


def _affines(frames):
    spec = gmc.gmc_spec((H, W))
    est = jax.jit(lambda a, b: gmc.estimate_pair(
        gmc.gray_pooled(a, spec), gmc.gray_pooled(b, spec), spec))
    out = [(jnp.eye(2), jnp.zeros(2))]
    for i in range(1, len(frames)):
        out.append(est(jnp.asarray(frames[i - 1]), jnp.asarray(frames[i])))
    return out


def _ids_deepsort(boxes, affines, use_gmc):
    p = core_state.TrackerParams(max_tracks=16, max_detections=8,
                                 feature_dim=8, n_init=2)
    s = core_state.init_state(p)
    seen = []
    for box, (a_mat, t) in zip(boxes, affines):
        s = core_tracker.predict(s, p)
        if use_gmc:
            m, c = gmc.warp_xyah_bank(s.mean, s.cov, a_mat, t, s.active)
            s = s.replace(mean=m, cov=c)
        tlwh = np.zeros((8, 4), np.float32)
        tlwh[0] = [box[0], box[1], BOX, BOX]
        valid = np.zeros(8, bool)
        valid[0] = True
        d = core_state.make_detections(
            tlwh, np.full(8, 0.9, np.float32), np.zeros(8, np.int32),
            valid=valid, params=p)
        s = core_tracker.update(s, d, p)
        _, ids, _, _, mask = core_tracker.get_outputs(s)
        seen.extend(np.asarray(ids)[np.asarray(mask)].tolist())
    return seen


def _ids_bytetrack(boxes, affines, use_gmc):
    p = bt.ByteTrackParams(max_tracks=16, max_detections=8)
    s = bt.init_state(p)
    seen = []
    for box, (a_mat, t) in zip(boxes, affines):
        tlwh = np.zeros((8, 4), np.float32)
        tlwh[0] = [box[0], box[1], BOX, BOX]
        valid = np.zeros(8, bool)
        valid[0] = True
        d = bt.make_detections(tlwh, np.full(8, 0.9, np.float32),
                               np.zeros(8, np.int32), valid=valid, params=p)
        s = bt.step(s, d, p, gmc=(a_mat, t) if use_gmc else None)
        _, ids, _, _, mask = bt.get_outputs(s)
        seen.extend(np.asarray(ids)[np.asarray(mask)].tolist())
    return seen


def _ids_ocsort(boxes, affines, use_gmc):
    p = oc.OCSortParams(max_tracks=16, max_detections=8, min_hits=2)
    s = oc.init_state(p)
    seen = []
    for box, (a_mat, t) in zip(boxes, affines):
        xyxy = np.zeros((8, 4), np.float32)
        xyxy[0] = box
        valid = np.zeros(8, bool)
        valid[0] = True
        d = oc.make_detections(xyxy, np.full(8, 0.9, np.float32),
                               np.zeros(8, np.int32), valid=valid, params=p)
        s = oc.step(s, d, p, gmc=(a_mat, t) if use_gmc else None)
        _, ids, _, _, mask = oc.get_outputs(s, p)
        seen.extend(np.asarray(ids)[np.asarray(mask)].tolist())
    return seen


@pytest.mark.parametrize("runner", [_ids_deepsort, _ids_bytetrack,
                                    _ids_ocsort],
                         ids=["deepsort", "bytetrack", "ocsort"])
def test_oscillating_pan_keeps_one_id_with_gmc(runner):
    frames, boxes = _scene()
    affines = _affines(frames)
    with_gmc = runner(boxes, affines, True)
    without = runner(boxes, affines, False)
    # GMC: one stable identity, reported on most frames
    assert len(set(with_gmc)) == 1, with_gmc
    assert len(with_gmc) >= N_FRAMES - 4, with_gmc
    # no GMC: the oscillation defeats the IoU gate — identity churn or
    # an unconfirmable track (strictly worse continuity)
    assert (len(set(without)) > 1) or (len(without) < len(with_gmc)), \
        (without, with_gmc)


@pytest.mark.parametrize("kind", ["deepsort", "bytetrack", "ocsort"])
def test_facade_gmc_keeps_one_id(kind):
    """The reference-contract facades with gmc= on the same oscillating
    pan: one stable ID with compensation, churn without."""
    frames, boxes = _scene()

    def run(use_gmc):
        g = "affine" if use_gmc else False
        if kind == "deepsort":
            from aicamera_tpu.tracker_api import DeepSORT
            tr = DeepSORT(n_init=2, max_age=5, gmc=g)
        elif kind == "bytetrack":
            from aicamera_tpu.bytetrack_api import ByteTrack
            tr = ByteTrack(gmc=g)
        else:
            from aicamera_tpu.ocsort_api import OCSort
            tr = OCSort(min_hits=2, gmc=g)
        seen = []
        for frame, box in zip(frames, boxes):
            out = tr.update(box[None], np.array([0.9], np.float32),
                            np.array([0], np.int32), frame)
            seen.extend(t[4] for t in out)
        return seen

    with_gmc = run(True)
    without = run(False)
    assert len(set(with_gmc)) == 1, with_gmc
    assert len(with_gmc) >= N_FRAMES - 4, with_gmc
    assert (len(set(without)) > 1) or (len(without) < len(with_gmc)), \
        (without, with_gmc)


def test_facade_gmc_requires_frame():
    from aicamera_tpu.bytetrack_api import ByteTrack
    tr = ByteTrack(gmc=True)
    with pytest.raises(ValueError):
        tr.update(np.zeros((1, 4), np.float32), np.array([0.9]),
                  np.array([0]), None)


def test_pipeline_gmc_smoke_and_carry():
    """TrackingPipeline(gmc=...) compiles, runs chunked, carries the
    prev-frame across chunks, and reset() clears it."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(variant="n", input_shape=(128, 128),
                            chunk_size=3, gmc="affine", scan_bucket=0)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (96, 128, 3), np.uint8) for _ in range(7)]
    results = list(pipe.process_frames(iter(frames), chunk_size=3))
    assert len(results) == 7
    assert pipe._gmc_prev_frame is not None
    np.testing.assert_array_equal(pipe._gmc_prev_frame, frames[6])
    pipe.reset()
    assert pipe._gmc_prev_frame is None
    # translation mode shares the wiring
    pipe2 = TrackingPipeline(variant="n", input_shape=(128, 128),
                             chunk_size=2, gmc="translation", tracker="ocsort")
    out = pipe2.process_frame(frames[0])
    assert out.frame_index == 0
    with pytest.raises(ValueError):
        TrackingPipeline(variant="n", gmc="bogus")


@pytest.mark.parametrize("kind", ["deepsort", "ocsort"])
def test_multistream_gmc_smoke_carry_and_masking(kind):
    """MultiStreamPipeline(gmc=...): runs for reid and motion cores,
    carries per-stream prev frames, and with frame_valid masking only
    valid slots advance the carry."""
    from aicamera_tpu.parallel import MultiStreamPipeline
    pipe = MultiStreamPipeline(
        n_streams=2, frame_hw=(96, 128), input_shape=(128, 128),
        gmc="affine", tracker=kind, scan_bucket=0)
    rng = np.random.RandomState(0)
    c1 = rng.randint(0, 255, (2, 3, 96, 128, 3), np.uint8)
    c2 = rng.randint(0, 255, (2, 3, 96, 128, 3), np.uint8)
    pipe.step_chunk(c1)
    np.testing.assert_array_equal(pipe._gmc_prev, c1[:, -1])
    # masked: stream 0 valid through slot 1, stream 1 fully invalid
    fv = np.array([[True, True, False], [False, False, False]])
    pipe.step_chunk(c2, frame_valid=fv)
    np.testing.assert_array_equal(pipe._gmc_prev[0], c2[0, 1])
    np.testing.assert_array_equal(pipe._gmc_prev[1], c1[1, -1])
    # single-frame step path shares the carry machinery
    pipe2 = MultiStreamPipeline(
        n_streams=2, frame_hw=(96, 128), input_shape=(128, 128),
        gmc="translation", tracker=kind, scan_bucket=0)
    f = rng.randint(0, 255, (2, 96, 128, 3), np.uint8)
    pipe2.step(f)
    np.testing.assert_array_equal(pipe2._gmc_prev, f)


def test_multistream_gmc_stream_symmetry():
    """Two identical streams through a gmc pipeline must stay identical
    (the per-stream estimate and warp are stream-local)."""
    from aicamera_tpu.parallel import MultiStreamPipeline
    rng = np.random.RandomState(5)
    base = np.stack([cv2.GaussianBlur(
        rng.randint(0, 255, (96, 128, 3), np.uint8), (3, 3), 0)
        for _ in range(4)])
    frames = np.stack([base, base])  # (2, K, H, W, 3), same content
    pipe = MultiStreamPipeline(
        n_streams=2, frame_hw=(96, 128), input_shape=(128, 128),
        conf_threshold=0.05, min_detection_confidence=0.05,
        gmc="affine", scan_bucket=0)
    outs = jax.device_get(pipe.step_chunk(frames))
    for leaf in outs:
        np.testing.assert_array_equal(leaf[0], leaf[1])


def test_bucketed_scan_with_gmc_equals_full():
    """Capacity-bucketed scan under GMC: the warp is active-masked, so
    slicing+warping commutes with warping+slicing — outputs and final
    state must be bitwise equal to the unbucketed run."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    rng = np.random.RandomState(11)
    frames = [cv2.GaussianBlur(
        rng.randint(0, 255, (96, 128, 3), np.uint8), (3, 3), 0)
        for _ in range(6)]

    def run(bucket):
        pipe = TrackingPipeline(
            variant="n", input_shape=(128, 128), chunk_size=3,
            conf_threshold=0.05, min_detection_confidence=0.05,
            gmc="affine", scan_bucket=bucket,
            tracker_params=core_state.TrackerParams(
                max_tracks=64, max_detections=16, n_init=2,
                feature_dim=512))
        outs = [r.tracks for r in pipe.process_frames(iter(frames),
                                                      chunk_size=3)]
        return outs, jax.device_get(pipe.state)

    outs_b, state_b = run(16)
    outs_f, state_f = run(0)
    assert outs_b == outs_f
    for a, b in zip(jax.tree.leaves(state_b), jax.tree.leaves(state_f)):
        np.testing.assert_array_equal(a, b)


def test_pipeline_gmc_static_scene_matches_off():
    """On a static camera the estimate is ~identity, so gmc on/off must
    produce the same track IDs (the warp is then a numerical no-op at
    association granularity)."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    rng = np.random.RandomState(3)
    frame = cv2.GaussianBlur(
        rng.randint(0, 255, (96, 128, 3), np.uint8), (3, 3), 0)
    frames = [frame.copy() for _ in range(6)]

    def run(gmc_mode):
        pipe = TrackingPipeline(
            variant="n", input_shape=(128, 128), chunk_size=3,
            conf_threshold=0.05, min_detection_confidence=0.05,
            gmc=gmc_mode, scan_bucket=0,
            tracker_params=core_state.TrackerParams(
                max_tracks=32, max_detections=16, n_init=2,
                feature_dim=512))
        ids = []
        for r in pipe.process_frames(iter(frames), chunk_size=3):
            ids.append(sorted(t[4] for t in r.tracks))
        return ids

    assert run(False) == run("affine")
