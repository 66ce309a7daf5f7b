"""Capacity-bucketed tracker scan: bitwise equality with the full scan.

The pipeline runs the chunk's tracker scan on a sliced small-capacity
state whenever all activity fits (runtime/pipeline.py scan_bucket),
falling back to full capacity when a high slot is active or the small
table overflows mid-chunk. These tests pin the exactness claim:

- core level: update() on a sliced state == the first slots of update()
  on the full state, for randomized multi-frame scenes;
- pipeline level: a bucketed pipeline == an unbucketed one on identical
  frames, through all three paths (small, high-slot skip, mid-chunk
  overflow rerun).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# NOTE: this module previously carried a cache-off fixture for the
# XLA:CPU AOT-serializer segfault on its large bucketed-scan
# executables; conftest.py now fork-isolates every cache write
# (a serializer crash kills a disposable child, not the suite), and
# this module additionally runs in its own short-lived subprocess
# (test_scan_bucket.py), which has always been clean.
from aicamera_tpu.core import (TrackerParams, init_state, make_detections,
                               predict, update)
from aicamera_tpu.core.state import slice_tracks, splice_tracks
from aicamera_tpu.core.tracker import get_outputs

from test_tracker_differential import random_frames  # noqa: E402

P_FULL = TrackerParams(max_tracks=32, max_detections=12, nn_budget=4,
                       feature_dim=8, n_init=3, max_age=6)
T_SMALL = 12


def _tree_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def _step(s, dets_list, p):
    n = len(dets_list)
    tlwh = np.zeros((max(n, 1), 4), np.float32)
    feats = np.zeros((max(n, 1), p.feature_dim), np.float32)
    hasf = np.zeros((max(n, 1),), bool)
    for j, (tl, f) in enumerate(dets_list):
        tlwh[j] = tl
        if f is not None:
            feats[j] = f
            hasf[j] = True
    valid = np.zeros((max(n, 1),), bool)
    valid[:n] = True
    d = make_detections(tlwh, np.full(max(n, 1), 0.9, np.float32),
                        np.zeros(max(n, 1), np.int32), feats,
                        has_feature=hasf, valid=valid, params=p)
    s = predict(s, p)
    return update(s, d, p)


@pytest.mark.parametrize("seed", range(6))
def test_sliced_core_equals_full_core(seed):
    """Frame-by-frame: the first T_SMALL slots of the full run equal the
    sliced run exactly (scenes stay far below T_SMALL active tracks)."""
    p_small = dataclasses.replace(P_FULL, max_tracks=T_SMALL)
    frames = random_frames(seed)
    s_full = init_state(P_FULL)
    s_small = init_state(p_small)
    for fi, dets in enumerate(frames):
        s_full = _step(s_full, dets, P_FULL)
        s_small = _step(s_small, dets, p_small)
        assert not np.any(np.asarray(s_full.active)[T_SMALL:]), \
            f"scene {seed} overflowed the probe capacity at frame {fi}"
        _tree_equal(slice_tracks(s_full, T_SMALL), s_small)


def test_splice_roundtrip():
    p_small = dataclasses.replace(P_FULL, max_tracks=T_SMALL)
    frames = random_frames(3)
    s_full = init_state(P_FULL)
    for dets in frames[:10]:
        s_full = _step(s_full, dets, P_FULL)
    _tree_equal(splice_tracks(init_state(P_FULL),
                              slice_tracks(s_full, T_SMALL)),
                s_full)


# --- pipeline level --------------------------------------------------------

def _run_pipeline(scan_bucket, synthetic_load, n_chunks=3, chunk=4,
                  ema_alpha=0.0):
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    tp = TrackerParams(max_tracks=64, max_detections=16,
                       nn_budget=1 if ema_alpha else 4,
                       max_age=10, n_init=2, feature_dim=512,
                       ema_alpha=ema_alpha)
    pipe = TrackingPipeline(chunk_size=chunk, input_shape=(128, 128),
                            tracker_params=tp, max_reid_crops=4,
                            synthetic_load=synthetic_load,
                            scan_bucket=scan_bucket)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (n_chunks * chunk, 96, 128, 3), np.uint8)
    step = pipe._get_step((96, 128), chunk)
    fv = jnp.ones((chunk,), bool)
    state = pipe.state
    outs = []
    for i in range(0, len(frames), chunk):
        state, det_outs, track_outs = step(
            pipe.yolo_params, pipe.reid_params, state,
            jnp.asarray(frames[i:i + chunk]), fv)
        outs.append(jax.device_get(track_outs))
    return jax.device_get(state), outs


def _assert_runs_equal(a, b):
    state_a, outs_a = a
    state_b, outs_b = b
    for ca, cb in zip(outs_a, outs_b):
        _tree_equal(ca, cb)
    _tree_equal(state_a, state_b)


def test_bucketed_pipeline_small_path_equals_full():
    """6 synthetic tracks, bucket 16: the small path runs every chunk."""
    _assert_runs_equal(_run_pipeline(scan_bucket=16, synthetic_load=6),
                       _run_pipeline(scan_bucket=0, synthetic_load=6))


def test_bucketed_pipeline_overflow_and_highslot_paths_equal_full():
    """8 synthetic tracks, bucket 4: chunk 1 overflows the small table
    mid-chunk (initiation dump -> full-capacity rerun), later chunks see
    active high slots (fits=False -> full path directly)."""
    _assert_runs_equal(_run_pipeline(scan_bucket=4, synthetic_load=8),
                       _run_pipeline(scan_bucket=0, synthetic_load=8))


# --- multistream -----------------------------------------------------------

def _run_multistream(scan_bucket, n_chunks=2, chunk=3, streams=2,
                     max_detections=16, ema_alpha=0.0):
    """Zeroed conf thresholds let the seeded random-weight detector emit
    real (deterministic) detections, so tracks initiate and the scan does
    genuine lifecycle work without trained checkpoints."""
    from aicamera_tpu.parallel import MultiStreamPipeline
    tp = TrackerParams(max_tracks=64, max_detections=max_detections,
                       nn_budget=1 if ema_alpha else 4,
                       max_age=10, n_init=2, feature_dim=512,
                       ema_alpha=ema_alpha)
    pipe = MultiStreamPipeline(
        n_streams=streams, frame_hw=(96, 128), input_shape=(128, 128),
        tracker_params=tp, max_reid_crops=4, conf_threshold=0.0,
        min_detection_confidence=0.0, scan_bucket=scan_bucket)
    rng = np.random.RandomState(1)
    outs_all = []
    for _ in range(n_chunks):
        frames = rng.randint(0, 255, (streams, chunk, 96, 128, 3),
                             np.uint8)
        outs = pipe.step_chunk(frames)
        outs_all.append(jax.device_get(outs))
    return jax.device_get(pipe.states), outs_all


def test_bucketed_multistream_equals_full():
    """Bucket 24 with <= 8 dets/stream: the small path has headroom and
    runs (fits = active <= bucket - headroom)."""
    a = _run_multistream(scan_bucket=24, max_detections=8)
    b = _run_multistream(scan_bucket=0, max_detections=8)
    # the zero-conf detector must actually produce tracks for this test
    # to mean anything
    assert np.asarray(a[0].active).sum() > 0
    _assert_runs_equal(a, b)


def test_bucketed_multistream_overflow_equals_full():
    """Bucket 8 with up to 16 dets/stream: chunk 1 starts empty (fits)
    but overflows the small table mid-chunk -> full rerun; later chunks
    fail the fits check outright."""
    a = _run_multistream(scan_bucket=8)
    b = _run_multistream(scan_bucket=0)
    _assert_runs_equal(a, b)


def test_get_outputs_masked_lanes_are_canonical_zeros():
    """A dead slot's stale mean/id/conf must not leak through get_outputs
    (masked lanes are zeros, making bucketed and full outputs bitwise
    equal even after high-slot churn — the reviewer's repro)."""
    s = init_state(P_FULL)
    s = s.replace(
        mean=s.mean.at[20].set(jnp.array([50., 50., 1., 10., 0, 0, 0, 0])),
        track_id=s.track_id.at[20].set(7),
        conf=s.conf.at[20].set(0.9))  # stale data, active stays False
    tlbr, ids, cls, conf, mask = get_outputs(s)
    assert not bool(mask[20])
    assert np.all(np.asarray(tlbr[20]) == 0)
    assert int(ids[20]) == 0 and float(conf[20]) == 0.0


# --- EMA gallery through the bucketed paths ---------------------------------

def test_bucketed_pipeline_ema_equals_full():
    """EMA appearance bank (gallery_strategy='ema') through the bucketed
    scan: slicing must carry the single-slot EMA gallery bitwise (both the
    blended write and the gallery_count==1 invariant live in sliced rows)."""
    _assert_runs_equal(_run_pipeline(scan_bucket=16, synthetic_load=6,
                                     ema_alpha=0.9),
                       _run_pipeline(scan_bucket=0, synthetic_load=6,
                                     ema_alpha=0.9))


def test_bucketed_multistream_ema_equals_full():
    """EMA bank under the vmapped multistream scan + capacity bucketing."""
    a = _run_multistream(scan_bucket=24, max_detections=8, ema_alpha=0.9)
    b = _run_multistream(scan_bucket=0, max_detections=8, ema_alpha=0.9)
    assert np.asarray(a[0].active).sum() > 0
    _assert_runs_equal(a, b)


# --- alternative tracker cores ---------------------------------------------

def _run_pipeline_kind(kind, scan_bucket, synthetic_load, n_chunks=3,
                       chunk=4):
    """Same drive as _run_pipeline, with a motion-only core. OC-SORT's
    det_thresh drops to 0.4 so the synthetic conf-0.5 boxes pass its
    strict input gate."""
    from aicamera_tpu.runtime.pipeline import TrackingPipeline
    if kind == "bytetrack":
        from aicamera_tpu.core.bytetrack import ByteTrackParams
        kw = dict(tracker="bytetrack",
                  bytetrack_params=ByteTrackParams(max_tracks=64,
                                                   max_detections=16))
    else:
        from aicamera_tpu.core.ocsort import OCSortParams
        kw = dict(tracker="ocsort",
                  ocsort_params=OCSortParams(det_thresh=0.4, max_tracks=64,
                                             max_detections=16))
    pipe = TrackingPipeline(chunk_size=chunk, input_shape=(128, 128),
                            synthetic_load=synthetic_load,
                            scan_bucket=scan_bucket, **kw)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (n_chunks * chunk, 96, 128, 3), np.uint8)
    step = pipe._get_step((96, 128), chunk)
    fv = jnp.ones((chunk,), bool)
    state = pipe.state
    outs = []
    for i in range(0, len(frames), chunk):
        state, det_outs, track_outs = step(
            pipe.yolo_params, pipe.reid_params, state,
            jnp.asarray(frames[i:i + chunk]), fv)
        outs.append(jax.device_get(track_outs))
    return jax.device_get(state), outs


@pytest.mark.parametrize("kind", ["bytetrack", "ocsort"])
def test_bucketed_motion_core_small_path_equals_full(kind):
    """6 synthetic tracks, bucket 16: the small path runs every chunk —
    bitwise equality for the generic bucketed scan on the motion cores."""
    _assert_runs_equal(_run_pipeline_kind(kind, 16, 6),
                       _run_pipeline_kind(kind, 0, 6))


@pytest.mark.parametrize("kind", ["bytetrack", "ocsort"])
def test_bucketed_motion_core_overflow_and_highslot_equal_full(kind):
    """8 synthetic tracks, bucket 4: mid-chunk overflow rerun, then
    active-high-slot skip — both fallback paths, bitwise."""
    _assert_runs_equal(_run_pipeline_kind(kind, 4, 8),
                       _run_pipeline_kind(kind, 0, 8))


def _run_multistream_kind(kind, scan_bucket, n_chunks=2, chunk=3,
                          streams=2):
    """_run_multistream with a motion-only core. Thresholds drop so the
    seeded random-weight detector's scores initiate real tracks."""
    from aicamera_tpu.parallel import MultiStreamPipeline
    if kind == "bytetrack":
        from aicamera_tpu.core.bytetrack import ByteTrackParams
        kw = dict(tracker="bytetrack",
                  bytetrack_params=ByteTrackParams(
                      track_thresh=0.05, low_thresh=0.01, det_thresh=0.05,
                      max_tracks=64, max_detections=16))
    else:
        from aicamera_tpu.core.ocsort import OCSortParams
        kw = dict(tracker="ocsort",
                  ocsort_params=OCSortParams(det_thresh=0.02, min_hits=2,
                                             max_tracks=64,
                                             max_detections=16))
    pipe = MultiStreamPipeline(
        n_streams=streams, frame_hw=(96, 128), input_shape=(128, 128),
        conf_threshold=0.0, scan_bucket=scan_bucket, **kw)
    rng = np.random.RandomState(1)
    outs_all = []
    for _ in range(n_chunks):
        frames = rng.randint(0, 255, (streams, chunk, 96, 128, 3),
                             np.uint8)
        outs = pipe.step_chunk(frames)
        outs_all.append(jax.device_get(outs))
    return jax.device_get(pipe.states), outs_all


@pytest.mark.parametrize("kind", ["bytetrack", "ocsort"])
def test_bucketed_multistream_motion_core_equals_full(kind):
    """The generic bucketed scan through MultiStreamPipeline's vmapped
    motion-core step (small path with headroom): bitwise equality."""
    a = _run_multistream_kind(kind, scan_bucket=24)
    b = _run_multistream_kind(kind, scan_bucket=0)
    assert np.asarray(a[0].active).sum() > 0
    _assert_runs_equal(a, b)


@pytest.mark.parametrize("kind", ["bytetrack", "ocsort"])
def test_bucketed_multistream_motion_core_overflow_equals_full(kind):
    """Bucket 8 vs up to 16 dets/stream: overflow rerun + fits-fail
    fallback through the vmapped motion-core scan."""
    a = _run_multistream_kind(kind, scan_bucket=8)
    b = _run_multistream_kind(kind, scan_bucket=0)
    _assert_runs_equal(a, b)
