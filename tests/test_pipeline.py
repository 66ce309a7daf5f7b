"""Integration tests: fused pipeline, facades, multistream, checkpointing.

Small frame/model shapes keep CPU compiles tolerable; the persistent
compile cache (conftest) makes reruns compile-free. Detector weights are
the deterministic seeded init (no weight files in CI), so these tests
assert *plumbing* contracts — shapes, chunk/result alignment, state
continuity — not detection quality.
"""

import numpy as np
import pytest

import jax

from aicamera_tpu import config
from aicamera_tpu.core.state import TrackerParams

SMALL_TP = TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                         max_age=10, feature_dim=config.REID_FEATURE_DIM)
FRAME_HW = (96, 128)
INPUT_HW = (128, 128)


@pytest.fixture(scope="module")
def pipeline():
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    return TrackingPipeline(input_shape=INPUT_HW, tracker_params=SMALL_TP,
                            max_reid_crops=4, chunk_size=4)


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (*FRAME_HW, 3), np.uint8) for _ in range(n)]


def test_process_frames_yields_every_frame_in_order(pipeline):
    pipeline.reset()
    results = list(pipeline.process_frames(iter(_frames(10))))
    assert [r.frame_index for r in results] == list(range(10))
    for r in results:
        assert r.det_boxes.shape[1] == 4
        assert r.det_boxes.shape[0] == r.det_scores.shape[0]
        assert isinstance(r.tracks, list)


def test_partial_last_chunk_padding_is_masked(pipeline):
    # (Detection outputs are NOT comparable across different batch sizes
    # with untrained weights — near-equal scores make NMS ordering
    # batch-shape-sensitive — so both runs use the same chunk size.)
    pipeline.reset()
    results = list(pipeline.process_frames(iter(_frames(6))))  # 4 + 2 pad
    assert len(results) == 6
    state_after = jax.device_get(pipeline.state)

    # determinism: identical input -> identical outputs and final state
    pipeline.reset()
    again = list(pipeline.process_frames(iter(_frames(6))))
    for a, b in zip(results, again):
        np.testing.assert_array_equal(a.det_boxes, b.det_boxes)
        assert a.tracks == b.tracks
    for x, y in zip(jax.tree.leaves(state_after),
                    jax.tree.leaves(jax.device_get(pipeline.state))):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # prefix consistency: the first 6 results of an 8-frame run equal the
    # 6-frame (padded last chunk) run — padding lanes must not leak
    pipeline.reset()
    longer = list(pipeline.process_frames(iter(_frames(8))))
    for a, b in zip(results, longer[:6]):
        np.testing.assert_array_equal(a.det_boxes, b.det_boxes)
        assert a.tracks == b.tracks


def test_detector_facade_contract(pipeline):
    from aicamera_tpu.detector import YOLODetector
    det = YOLODetector(input_shape=INPUT_HW)
    boxes, scores, cls, idx = det.detect(_frames(1)[0])
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert boxes.shape[0] == scores.shape[0] == cls.shape[0] == idx.shape[0]
    assert (scores >= det.conf_threshold).all()
    info = det._get_step(FRAME_HW)  # step is cached
    assert det._get_step(FRAME_HW) is info


def test_deepsort_facade_tracks_synthetic_boxes():
    from aicamera_tpu.tracker_api import DeepSORT
    ds = DeepSORT(max_tracks=16, max_detections=8, max_reid_crops=4,
                  n_init=2, max_age=5)
    frame = np.zeros((*FRAME_HW, 3), np.uint8)
    box = np.array([[10.0, 10.0, 40.0, 60.0]], np.float32)
    out1 = ds.update(box, np.array([0.9]), np.array([0]), frame)
    assert out1 == []  # tentative on first sight
    out2 = ds.update(box + 2, np.array([0.9]), np.array([0]), frame)
    assert len(out2) == 1
    x1, y1, x2, y2, tid, name, conf = out2[0]
    assert tid == 1 and name == "person" and conf == pytest.approx(0.9)
    assert x2 > x1 and y2 > y1
    # class filter: a non-tracked class never creates tracks
    ds.reset()
    out = ds.update(box, np.array([0.9]), np.array([14]), frame)  # 'bird'
    out = ds.update(box, np.array([0.9]), np.array([14]), frame)
    assert out == []


def test_multistream_pipeline_single_device():
    from aicamera_tpu.parallel import MultiStreamPipeline
    pipe = MultiStreamPipeline(
        n_streams=2, frame_hw=FRAME_HW, input_shape=INPUT_HW,
        tracker_params=SMALL_TP, max_reid_crops=4)
    frames = np.zeros((2, *FRAME_HW, 3), np.uint8)
    outs = pipe.step(frames)
    jax.block_until_ready(outs)
    tlbr, ids, cls, conf, mask = outs
    assert tlbr.shape == (2, SMALL_TP.max_tracks, 4)
    # states advance independently per stream
    ages_before = np.asarray(pipe.states.age).copy()
    pipe.step(frames)
    assert np.asarray(pipe.states.age).shape == ages_before.shape


def test_multistream_sharded_over_mesh():
    from aicamera_tpu.parallel import MultiStreamPipeline, make_stream_mesh
    n = min(4, len(jax.devices()))
    mesh = make_stream_mesh(n)
    pipe = MultiStreamPipeline(
        n_streams=n, frame_hw=FRAME_HW, input_shape=INPUT_HW, mesh=mesh,
        tracker_params=SMALL_TP, max_reid_crops=4)
    outs = pipe.step(np.zeros((n, *FRAME_HW, 3), np.uint8))
    jax.block_until_ready(outs)
    assert outs[0].shape[0] == n


def test_checkpoint_roundtrip(tmp_path, pipeline):
    from aicamera_tpu.runtime.checkpoint import load_state, save_state
    pipeline.reset()
    list(pipeline.process_frames(iter(_frames(4))))
    path = tmp_path / "tracker_state.msgpack"
    save_state(path, pipeline.state)
    restored = load_state(path, SMALL_TP)
    for a, b in zip(jax.tree.leaves(pipeline.state),
                    jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reid_model_facade_batched_extraction():
    """Reference reid_model.py inline-test parity (:128-236): batched
    shapes/dtype, empty list, mixed valid/invalid crops, all-invalid."""
    from aicamera_tpu.tracker_api import ReIDModel
    rm = ReIDModel()
    rng = np.random.RandomState(0)
    crops = [rng.randint(0, 256, (50, 25, 3), np.uint8),
             np.array([]),                       # invalid (empty)
             rng.randint(0, 256, (80, 40, 3), np.uint8)]
    feats = rm.extract_features_batched(crops)
    assert feats.shape == (3, rm.feature_dim)
    assert feats.dtype == np.float32
    # valid crops give L2-normalized features; invalid ones give zeros
    assert np.linalg.norm(feats[0]) == pytest.approx(1.0, abs=1e-3)
    assert np.linalg.norm(feats[1]) == 0.0
    assert np.linalg.norm(feats[2]) == pytest.approx(1.0, abs=1e-3)
    # empty list
    assert rm.extract_features_batched([]).shape == (0, rm.feature_dim)
    # all-invalid
    out = rm.extract_features_batched([np.array([]), np.zeros((0, 5, 3))])
    assert out.shape == (2, rm.feature_dim) and (out == 0).all()
    # deterministic across calls (unlike the reference's np.random mock)
    again = rm.extract_features_batched(crops)
    np.testing.assert_array_equal(feats, again)


def test_multistream_states_are_independent():
    """Per-stream trackers are isolated: ids in every stream start at 1
    and streams with no detections never advance their id counter."""
    import jax.numpy as jnp
    from aicamera_tpu.core import state as core_state
    from aicamera_tpu.core import tracker as core_tracker
    from aicamera_tpu.core.state import Detections

    p = SMALL_TP
    n = 3
    states = jax.vmap(lambda _: core_state.init_state(p))(jnp.arange(n))

    def per_stream(state, tlwh, valid):
        d = Detections(
            tlwh=tlwh, conf=jnp.full((p.max_detections,), 0.9),
            class_id=jnp.zeros((p.max_detections,), jnp.int32),
            feature=jnp.zeros((p.max_detections, p.feature_dim)),
            has_feature=jnp.zeros((p.max_detections,), bool),
            valid=valid)
        state = core_tracker.predict(state, p)
        return core_tracker.update(state, d, p)

    tlwh = np.zeros((n, p.max_detections, 4), np.float32)
    valid = np.zeros((n, p.max_detections), bool)
    tlwh[0, 0] = [10, 10, 20, 40]     # stream 0: one object
    valid[0, 0] = True
    tlwh[2, :2] = [[10, 10, 20, 40], [100, 100, 20, 40]]  # stream 2: two
    valid[2, :2] = True
    step = jax.jit(jax.vmap(per_stream))
    states = step(states, jnp.asarray(tlwh), jnp.asarray(valid))

    next_ids = np.asarray(states.next_id)
    assert next_ids.tolist() == [2, 1, 3]  # independent id counters
    assert np.asarray(states.active).sum(axis=1).tolist() == [1, 0, 2]


def test_multistream_chunked_matches_per_frame_stepping():
    """step_chunk(K frames) must evolve the tracker states exactly like K
    sequential step() calls (same detection batch shape per program makes
    this comparable even with untrained weights... detection batches
    differ (S vs S*K) so we compare chunked against chunked determinism
    and shape contracts instead)."""
    from aicamera_tpu.parallel import MultiStreamPipeline
    s, k = 2, 3
    pipe = MultiStreamPipeline(
        n_streams=s, frame_hw=FRAME_HW, input_shape=INPUT_HW,
        tracker_params=SMALL_TP, max_reid_crops=4)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (s, k, *FRAME_HW, 3), np.uint8)
    outs = pipe.step_chunk(frames)
    jax.block_until_ready(outs)
    tlbr, ids, cls, conf, mask = outs
    assert tlbr.shape == (s, k, SMALL_TP.max_tracks, 4)
    assert mask.shape == (s, k, SMALL_TP.max_tracks)
    ages1 = np.asarray(pipe.states.age).copy()

    # determinism: rebuild and rerun -> identical states
    pipe2 = MultiStreamPipeline(
        n_streams=s, frame_hw=FRAME_HW, input_shape=INPUT_HW,
        tracker_params=SMALL_TP, max_reid_crops=4)
    outs2 = pipe2.step_chunk(frames)
    jax.block_until_ready(outs2)
    for a, b in zip(jax.tree.leaves(jax.device_get(outs)),
                    jax.tree.leaves(jax.device_get(outs2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(ages1, np.asarray(pipe2.states.age))


def test_tracking_service_async_serving():
    from aicamera_tpu.serving import TrackingService
    svc = TrackingService(chunk_size=4, max_latency_ms=20.0,
                          input_shape=INPUT_HW, tracker_params=SMALL_TP,
                          max_reid_crops=4)
    try:
        futs = [svc.submit(f) for f in _frames(10)]
        results = [f.result(timeout=120) for f in futs]
        assert [r.frame_index for r in results] == list(range(10))
        for r in results:
            assert r.det_boxes.shape[1] == 4
            assert isinstance(r.tracks, list)
        # a lone frame resolves within the latency window (idle flush)
        lone = svc.submit(_frames(1)[0]).result(timeout=120)
        assert lone.frame_index == 10
    finally:
        svc.shutdown()
    with pytest.raises(RuntimeError):
        svc.submit(_frames(1)[0])
    svc.shutdown()  # idempotent


@pytest.mark.slow
def test_tracking_service_shutdown_submit_race():
    """Submits racing shutdown() must never yield a silent, never-resolving
    Future: every Future either resolves or submit raised RuntimeError."""
    import threading

    from aicamera_tpu.serving import TrackingService

    svc = TrackingService(chunk_size=4, max_latency_ms=5.0,
                          input_shape=INPUT_HW, tracker_params=SMALL_TP,
                          max_reid_crops=4)
    frame = _frames(1)[0]
    svc.submit(frame).result(timeout=120)  # warm compile before the race

    futs, lock = [], threading.Lock()
    stop = threading.Event()

    def hammer():
        for _ in range(100):  # bounded: the drain after shutdown is O(futs)
            if stop.is_set():
                return
            try:
                f = svc.submit(frame)
            except RuntimeError:
                return
            with lock:
                futs.append(f)

    threads = [threading.Thread(target=hammer) for _ in range(4)]
    for t in threads:
        t.start()
    import time
    time.sleep(0.2)
    svc.shutdown()
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert all(not t.is_alive() for t in threads)
    # every accepted Future must complete (result or exception), not hang
    for f in futs:
        f.exception(timeout=30)


def test_deepsort_get_active_tracks_includes_tentative():
    from aicamera_tpu.tracker_api import DeepSORT
    ds = DeepSORT(max_tracks=16, max_detections=8, max_reid_crops=4,
                  n_init=3, max_age=5)
    frame = np.zeros((*FRAME_HW, 3), np.uint8)
    box = np.array([[10.0, 10.0, 40.0, 60.0]], np.float32)
    out = ds.update(box, np.array([0.9]), np.array([0]), frame)
    assert out == []  # not confirmed yet
    active = ds.get_active_tracks()
    assert len(active) == 1
    x1, y1, x2, y2, tid, name, conf, tsu = active[0]
    assert tid == 1 and name == "person" and tsu == 0


def test_synthetic_load_saturates_detection_slate():
    """Worst-case bench mode: synthetic_load fills every frame's detection
    slots post-NMS, so all n objects confirm at n_init and stay tracked."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    tp = SMALL_TP
    pipe = TrackingPipeline(chunk_size=2, input_shape=INPUT_HW,
                            tracker_params=tp, max_reid_crops=4,
                            synthetic_load=tp.max_detections)
    # blank frames: no real detections, so the slate is purely synthetic
    # and the id sequence is deterministic
    frames = [np.zeros((*FRAME_HW, 3), np.uint8)] * 4
    results = list(pipe.process_frames(iter(frames)))
    # n_init=3 -> full slate confirmed from frame index 2 onward
    assert len(results[-1].tracks) == tp.max_detections
    ids = sorted(t[4] for t in results[-1].tracks)
    assert ids == list(range(1, tp.max_detections + 1))


def test_letterbox_auto_pipeline_runs_minimum_rectangle():
    """letterbox_auto=True convolves the stride-modulo minimum rectangle
    (reference image_processing.py auto mode) instead of the full square
    canvas; outputs stay well-formed and in frame coordinates."""
    from aicamera_tpu.ops.preprocess import letterbox_spec
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    spec = letterbox_spec(FRAME_HW, INPUT_HW, auto=True)
    assert spec.out_hw == (96, 128)  # non-square: pad rows dropped
    # the production case: the 960x540 clip scales to 640x360 and pads to
    # the next stride-32 multiple -> 640x384 canvas, not 640x640 (40%
    # fewer rows through the whole conv stack)
    assert letterbox_spec((540, 960), (640, 640), auto=True).out_hw \
        == (384, 640)

    pipe = TrackingPipeline(chunk_size=4, input_shape=INPUT_HW,
                            tracker_params=SMALL_TP, max_reid_crops=4,
                            letterbox_auto=True)
    results = list(pipe.process_frames(iter(_frames(8))))
    assert [r.frame_index for r in results] == list(range(8))
    fh, fw = FRAME_HW
    for r in results:
        assert r.det_boxes.shape[1] == 4
        if len(r.det_boxes):
            assert float(r.det_boxes[:, 0::2].max()) <= fw + 1e-3
            assert float(r.det_boxes[:, 1::2].max()) <= fh + 1e-3

    # determinism on the auto canvas
    pipe.reset()
    again = list(pipe.process_frames(iter(_frames(8))))
    for a, b in zip(results, again):
        np.testing.assert_array_equal(a.det_boxes, b.det_boxes)
        assert a.tracks == b.tracks


def test_bytetrack_pipeline_runs_and_matches_facade():
    """ByteTrack mode: the fused pipeline (no ReID stage, low NMS floor)
    must agree frame-by-frame with the ByteTrack facade replaying the
    pipeline's own detection outputs. conf_threshold == low_thresh makes
    the emitted detection lists a superset of what the scan consumed, and
    the facade's class + low-score prefilter reconstructs exactly that
    eligible set in the same order."""
    from aicamera_tpu.bytetrack_api import ByteTrack
    from aicamera_tpu.core.bytetrack import ByteTrackParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    bp = ByteTrackParams(max_tracks=16, max_detections=8)
    pipe = TrackingPipeline(chunk_size=4, input_shape=INPUT_HW,
                            tracker="bytetrack", bytetrack_params=bp,
                            conf_threshold=bp.low_thresh)
    results = list(pipe.process_frames(iter(_frames(8, seed=3))))
    assert [r.frame_index for r in results] == list(range(8))

    facade = ByteTrack(max_tracks=16, max_detections=8)
    for r in results:
        n = len(r.det_boxes)
        replay = facade.update(
            r.det_boxes, r.det_scores,
            r.det_labels, None) if n else facade.update(
            np.zeros((0, 4)), np.zeros(0), np.zeros(0), None)
        assert replay == r.tracks, f"frame {r.frame_index}"

    # determinism of the fused bytetrack step
    pipe.reset()
    again = list(pipe.process_frames(iter(_frames(8, seed=3))))
    for a, b in zip(results, again):
        np.testing.assert_array_equal(a.det_boxes, b.det_boxes)
        assert a.tracks == b.tracks


def test_bytetrack_pipeline_has_no_reid_stage():
    from aicamera_tpu.core.bytetrack import ByteTrackParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    bp = ByteTrackParams(max_tracks=16, max_detections=8)
    pipe = TrackingPipeline(chunk_size=2, input_shape=INPUT_HW,
                            tracker="bytetrack", bytetrack_params=bp)
    assert pipe.with_reid is False
    # NMS floor lowered to the BYTE low-score threshold
    assert pipe._nms_score_floor == bp.low_thresh
    # deepsort pipelines are untouched
    with pytest.raises(ValueError):
        TrackingPipeline(tracker="bytetrack-typo")
    with pytest.raises(ValueError):
        TrackingPipeline(bytetrack_params=bp)  # requires tracker=bytetrack


def test_bytetrack_checkpoint_roundtrip(tmp_path):
    from aicamera_tpu.core.bytetrack import (ByteTrackParams, ByteDetections,
                                             init_state, step)
    from aicamera_tpu.runtime.checkpoint import load_state, save_state
    import jax.numpy as jnp

    p = ByteTrackParams(max_tracks=16, max_detections=8)
    s = init_state(p)
    d = ByteDetections(
        tlwh=jnp.asarray([[10., 10., 30., 60.]] + [[0.] * 4] * 7),
        score=jnp.asarray([0.9] + [0.0] * 7),
        class_id=jnp.zeros((8,), jnp.int32),
        valid=jnp.asarray([True] + [False] * 7))
    s = step(s, d, p)
    path = tmp_path / "bt_state.msgpack"
    save_state(path, s)
    restored = load_state(path, p)
    for a, b in zip(jax.tree.leaves(jax.device_get(s)),
                    jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

def test_ocsort_pipeline_runs_and_matches_facade():
    """OC-SORT mode: the fused pipeline (no ReID stage) must agree
    frame-by-frame with the OCSort facade replaying the pipeline's own
    detection outputs. conf_threshold == det_thresh makes the emitted
    detection lists a superset of what the scan consumed (the output gate
    is >=, the tracker gate strictly >), and the facade's class +
    det_thresh prefilter reconstructs exactly that eligible set in the
    same order."""
    from aicamera_tpu.core.ocsort import OCSortParams
    from aicamera_tpu.ocsort_api import OCSort
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    op = OCSortParams(det_thresh=0.25, max_tracks=16, max_detections=8)
    pipe = TrackingPipeline(chunk_size=4, input_shape=INPUT_HW,
                            tracker="ocsort", ocsort_params=op,
                            conf_threshold=op.det_thresh)
    results = list(pipe.process_frames(iter(_frames(8, seed=3))))
    assert [r.frame_index for r in results] == list(range(8))

    facade = OCSort(det_thresh=0.25, max_tracks=16, max_detections=8)
    for r in results:
        n = len(r.det_boxes)
        replay = facade.update(
            r.det_boxes, r.det_scores,
            r.det_labels, None) if n else facade.update(
            np.zeros((0, 4)), np.zeros(0), np.zeros(0), None)
        assert replay == r.tracks, f"frame {r.frame_index}"

    # determinism of the fused ocsort step
    pipe.reset()
    again = list(pipe.process_frames(iter(_frames(8, seed=3))))
    for a, b in zip(results, again):
        np.testing.assert_array_equal(a.det_boxes, b.det_boxes)
        assert a.tracks == b.tracks


def test_ocsort_pipeline_has_no_reid_stage():
    from aicamera_tpu.core.ocsort import OCSortParams
    from aicamera_tpu.runtime.pipeline import TrackingPipeline

    op = OCSortParams(max_tracks=16, max_detections=8)
    pipe = TrackingPipeline(chunk_size=2, input_shape=INPUT_HW,
                            tracker="ocsort", ocsort_params=op)
    assert pipe.with_reid is False
    # the NMS floor is NOT lowered: OC-SORT's strict det gate (0.6) sits
    # above the default floor already
    assert pipe._nms_score_floor == config.YOLO_NMS_SCORE_THRESHOLD
    with pytest.raises(ValueError):
        TrackingPipeline(ocsort_params=op)  # requires tracker=ocsort


def test_ocsort_checkpoint_roundtrip(tmp_path):
    from aicamera_tpu.core.ocsort import (OCSortDetections, OCSortParams,
                                          init_state, step)
    from aicamera_tpu.runtime.checkpoint import load_state, save_state
    import jax.numpy as jnp

    p = OCSortParams(max_tracks=16, max_detections=8)
    s = init_state(p)
    d = OCSortDetections(
        xyxy=jnp.asarray([[10., 10., 40., 70.]] + [[0.] * 4] * 7),
        score=jnp.asarray([0.9] + [0.0] * 7),
        class_id=jnp.zeros((8,), jnp.int32),
        valid=jnp.asarray([True] + [False] * 7))
    s = step(s, d, p)
    path = tmp_path / "oc_state.msgpack"
    save_state(path, s)
    restored = load_state(path, p)
    for a, b in zip(jax.tree.leaves(jax.device_get(s)),
                    jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_process_chunks_matches_process_frames(pipeline):
    """Chunk-granular streaming (one Python crossing per dispatch) must
    produce the same per-frame results as the frame-iterator path,
    including a padded final partial chunk."""
    frames = np.stack(_frames(10, seed=11))  # 2 full chunks + partial 2

    pipeline.reset()
    want = list(pipeline.process_frames(iter(list(frames))))

    def chunks():
        for i in range(0, len(frames), 4):
            yield frames[i:i + 4]

    pipeline.reset()
    got = list(pipeline.process_chunks(chunks()))

    assert [r.frame_index for r in got] == [r.frame_index for r in want]
    for a, b in zip(got, want):
        assert a.tracks == b.tracks
        np.testing.assert_array_equal(a.det_boxes, b.det_boxes)
        np.testing.assert_array_equal(a.det_scores, b.det_scores)


def test_process_chunks_rejects_oversize_chunk(pipeline):
    frames = np.stack(_frames(6, seed=12))
    pipeline.reset()
    with pytest.raises(ValueError, match="exceeds"):
        list(pipeline.process_chunks(iter([frames])))


def test_detect_dtype_f32_option():
    """detect_dtype='f32' builds the detect forward in full precision
    (batch-shape-stable NMS scores — the clip_parity --f32_detect A/B);
    invalid values and the int8 conflict fail loudly."""
    import jax.numpy as jnp
    from aicamera_tpu.detector import YOLODetector
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    pipe = TrackingPipeline(input_shape=INPUT_HW, tracker_params=SMALL_TP,
                            max_reid_crops=4, chunk_size=2,
                            detect_dtype="f32")
    assert pipe.yolo.dtype == jnp.float32 and pipe._dtype == jnp.float32
    results = list(pipe.process_frames(iter(_frames(2, seed=5))))
    assert len(results) == 2
    det = YOLODetector(input_shape=INPUT_HW, detect_dtype="f32")
    assert det.model.dtype == jnp.float32
    boxes, scores, cls, _ = det.detect(_frames(1, seed=6)[0])
    assert boxes.shape[1] == 4 and len(scores) == len(cls)
    with pytest.raises(ValueError, match="detect_dtype"):
        TrackingPipeline(detect_dtype="fp64")
    with pytest.raises(ValueError, match="conflict"):
        TrackingPipeline(detect_dtype="f32", yolo_quant="int8")
