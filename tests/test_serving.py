"""Multi-tenant serving tests: slot leasing, per-stream SLAs, masked
dispatch isolation, drain semantics.

Uses tiny shapes (96x128 frames, 16-track tables) to keep CPU compiles
tolerable; the masked multistream chunk step compiles once per service.
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


# (cache-off fixture removed: conftest.py fork-isolates persistent-
# cache writes — the serving worker thread's big masked-multistream
# compiles now cache safely; a serializer crash kills only the
# disposable writer child.)


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (*FRAME_HW, 3), np.uint8) for _ in range(n)]


def test_packed_readback_exact_for_large_track_ids():
    """The single-transfer readback packs track ids into two 16-bit f32
    lanes: ids beyond 2^24 (where one f32 lane silently rounds) must
    round-trip exactly — a long-lived service's ids grow monotonically."""
    from aicamera_tpu.serving import MultiTenantTrackingService
    svc = MultiTenantTrackingService.__new__(MultiTenantTrackingService)
    svc._pack = None
    ids = np.array([[[0, 1, 2 ** 24 + 1, 2 ** 31 - 1, 16_777_217,
                      999_999_937, 7, 8]]], np.int64)
    S, K, T = ids.shape
    tlbr = np.arange(S * K * T * 4, dtype=np.float32).reshape(S, K, T, 4)
    cls = np.arange(T, dtype=np.int32).reshape(1, 1, T)
    conf = np.linspace(0, 1, T, dtype=np.float32).reshape(1, 1, T)
    mask = np.array([[[1, 1, 1, 1, 1, 1, 0, 0]]], bool)
    arr = np.asarray(jax.device_get(
        svc._pack_outputs((tlbr, ids, cls, conf, mask))))
    got_ids = (arr[..., 4].astype(np.int64)
               | (arr[..., 5].astype(np.int64) << 16))
    np.testing.assert_array_equal(got_ids, ids)
    np.testing.assert_array_equal(arr[..., :4], tlbr)
    np.testing.assert_array_equal(arr[..., 6].astype(np.int32), cls)
    np.testing.assert_allclose(arr[..., 7], conf, rtol=1e-6)
    np.testing.assert_array_equal(arr[..., 8] != 0.0, mask)


def test_masked_chunk_step_leaves_invalid_stream_untouched():
    """frame_valid=False lanes must not advance that stream's tracker
    state — bitwise — while valid lanes process normally."""
    from aicamera_tpu.parallel import MultiStreamPipeline
    pipe = MultiStreamPipeline(
        n_streams=2, frame_hw=FRAME_HW, input_shape=INPUT_HW,
        tracker_params=SMALL_TP, max_reid_crops=4)
    before = jax.device_get(pipe.states)

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (2, 3, *FRAME_HW, 3), np.uint8)
    valid = np.array([[True, True, True], [False, False, False]])
    outs = pipe.step_chunk(frames, frame_valid=valid)
    jax.block_until_ready(outs)
    after = jax.device_get(pipe.states)

    # stream 1 (all-invalid): every state leaf bitwise unchanged
    for name in ("active", "state", "mean", "cov", "hits", "age", "tsu",
                 "track_id", "gallery", "gallery_count", "next_id"):
        np.testing.assert_array_equal(
            np.asarray(getattr(before, name))[1],
            np.asarray(getattr(after, name))[1], err_msg=name)
    # stream 0 processed: noise frames on the seeded-random detector yield
    # detections, so its state advanced (tracks were initiated; noise
    # tentatives may die again by the last frame, so check next_id, not
    # active)
    assert np.asarray(after.next_id)[0] > 1


@pytest.fixture(scope="module")
def svc():
    from aicamera_tpu.serving import MultiTenantTrackingService
    service = MultiTenantTrackingService(
        n_streams=2, frame_hw=FRAME_HW, chunk_size=2, max_latency_ms=20.0,
        input_shape=INPUT_HW, tracker_params=SMALL_TP, max_reid_crops=4)
    yield service
    service.shutdown()


def test_multitenant_streams_resolve_independently(svc):
    s0 = svc.open_stream()
    s1 = svc.open_stream(max_latency_ms=10.0)
    futs0 = [svc.submit(s0, f) for f in _frames(5, seed=1)]
    futs1 = [svc.submit(s1, f) for f in _frames(2, seed=2)]
    r0 = [f.result(timeout=300) for f in futs0]
    r1 = [f.result(timeout=300) for f in futs1]
    assert [r.frame_index for r in r0] == list(range(5))
    assert [r.frame_index for r in r1] == list(range(2))
    assert all(r.stream_id == s0 for r in r0)
    assert all(r.stream_id == s1 for r in r1)
    for r in r0 + r1:
        assert isinstance(r.tracks, list)
    svc.close_stream(s0)
    svc.close_stream(s1)


def test_slot_leasing_and_relize(svc):
    a = svc.open_stream()
    b = svc.open_stream()
    with pytest.raises(RuntimeError, match="leased"):
        svc.open_stream()
    # closing with no queued frames frees the slot immediately
    svc.close_stream(b)
    with pytest.raises(RuntimeError, match="not open"):
        svc.submit(b, _frames(1)[0])
    c = svc.open_stream()
    assert c == b  # re-leased
    # fresh lease: per-stream frame counter restarts at 0
    res = svc.submit(c, _frames(1)[0]).result(timeout=300)
    assert res.frame_index == 0 and res.stream_id == c
    svc.close_stream(a)
    svc.close_stream(c)


def test_submit_validates_shape_and_state(svc):
    sid = svc.open_stream()
    with pytest.raises(ValueError, match="frame shape"):
        svc.submit(sid, np.zeros((10, 10, 3), np.uint8))
    svc.close_stream(sid)
    with pytest.raises(RuntimeError, match="not open"):
        svc.submit(sid, _frames(1)[0])


def test_close_drains_queued_frames(svc):
    sid = svc.open_stream()
    futs = [svc.submit(sid, f) for f in _frames(3, seed=4)]
    svc.close_stream(sid)  # queued frames must still resolve
    for i, f in enumerate(futs):
        assert f.result(timeout=300).frame_index == i
    # slot frees after the drain; eventually re-leasable
    import time
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            again = svc.open_stream()
            break
        except RuntimeError:
            time.sleep(0.05)
    else:
        pytest.fail("slot never freed after drain")
    svc.close_stream(again)


def test_shutdown_drains_and_rejects():
    from aicamera_tpu.serving import MultiTenantTrackingService
    service = MultiTenantTrackingService(
        n_streams=2, frame_hw=FRAME_HW, chunk_size=2, max_latency_ms=10.0,
        input_shape=INPUT_HW, tracker_params=SMALL_TP, max_reid_crops=4)
    sid = service.open_stream()
    futs = [service.submit(sid, f) for f in _frames(3, seed=5)]
    service.shutdown()
    for f in futs:
        f.exception(timeout=300)  # resolved (result or exception), not hung
    assert all(f.done() for f in futs)
    with pytest.raises(RuntimeError, match="shut down"):
        service.open_stream()
    service.shutdown()  # idempotent


def test_eager_dispatch_under_headroom(svc):
    """A lone frame on an idle service must NOT burn its SLA window
    waiting for batch-mates that the arrival rate says will never come:
    the eager trigger dispatches it at once. (The pre-r4 scheduler waited
    for the full SLA expiry before dispatching a partial window — a lone
    frame with an 8 s SLA took >8 s.)"""
    import time
    sid = svc.open_stream(max_latency_ms=8000.0)
    # warm: first dispatch on a fresh service compiles (~30 s on CPU);
    # the SECOND warm call measures a loaded-host step baseline so the
    # bounds below scale with actual machine load instead of flaking on
    # absolute wall-clock ceilings (warm CPU steps run ~1 s under load).
    svc.submit(sid, _frames(1, seed=98)[0]).result(timeout=300)
    t0 = time.perf_counter()
    svc.submit(sid, _frames(1, seed=96)[0]).result(timeout=300)
    warm_step = time.perf_counter() - t0
    eager_before = svc.stats["eager_fires"]
    t0 = time.perf_counter()
    res = svc.submit(sid, _frames(1, seed=11)[0]).result(timeout=300)
    wall = time.perf_counter() - t0
    svc.close_stream(sid)
    # behavioral: the lone frame rode an eager fire (or a deadline fire
    # if load pushed it there), never a full-window wait
    assert svc.stats["eager_fires"] > eager_before or \
        svc.stats["deadline_fires"] > 0
    # a few warm steps, NOT the 8s SLA window (pre-r4 took >8s)
    assert wall < max(4.0, 4 * warm_step), (
        f"lone frame took {wall:.2f}s against an 8s SLA "
        f"(warm step {warm_step:.2f}s)")
    # timing surface populated and ordered
    assert 0 < res.arrival_ts <= res.dispatch_ts <= res.resolve_ts
    # queue wait is bounded by ~one dispatch cycle, NOT the SLA window
    assert res.dispatch_ts - res.arrival_ts < max(2.5, 3 * warm_step)


def test_deadline_aware_dispatch_meets_sla(svc):
    """Every request must be DISPATCHED before its deadline (the pre-r4
    scheduler fired partial windows only after `now - arrival >= sla`,
    i.e. strictly after the deadline) and, on this warm CPU service,
    resolve within its SLA end-to-end."""
    import time
    sla_ms = 10000.0  # generous: warm CPU steps are ~1s on a loaded host
    sid = svc.open_stream(max_latency_ms=sla_ms)
    # warm: the first dispatch on a fresh service compiles the fused
    # step (~30 s on CPU) — that belongs to startup, not the SLA window
    svc.submit(sid, _frames(1, seed=99)[0]).result(timeout=300)
    futs = [svc.submit(sid, f) for f in _frames(5, seed=12)]
    results = [f.result(timeout=300) for f in futs]
    svc.close_stream(sid)
    for r in results:
        deadline = r.arrival_ts + sla_ms / 1e3
        assert r.dispatch_ts < deadline, (
            f"frame {r.frame_index} dispatched "
            f"{(r.dispatch_ts - deadline) * 1e3:.1f} ms after its deadline")
        assert r.resolve_ts <= deadline + 0.05, (
            f"frame {r.frame_index} resolved late: "
            f"{(r.resolve_ts - r.arrival_ts) * 1e3:.1f} ms vs {sla_ms} ms")
        # queue wait — the scheduler's own contribution — stays small
        # even though each warm CPU step costs ~1s here (the old
        # scheduler's partial-window wait was the full SLA)
        assert r.dispatch_ts - r.arrival_ts < 0.5 * sla_ms / 1e3
    # scheduler accounting: dispatches happened and were categorized
    s = svc.stats
    assert s["dispatches"] >= 1 and s["frames"] >= 5
    assert (s["full_fires"] + s["deadline_fires"] + s["eager_fires"]) >= 1


def test_burst_coalesces_into_batched_dispatches(svc):
    """A burst larger than one chunk must ride fewer dispatches than
    frames (full-window coalescing), not degrade to frame-per-dispatch."""
    before = svc.stats["dispatches"]
    sid = svc.open_stream(max_latency_ms=5000.0)
    futs = [svc.submit(sid, f) for f in _frames(6, seed=13)]
    for f in futs:
        f.result(timeout=300)
    svc.close_stream(sid)
    svc.wait_idle(timeout=60)
    n_dispatches = svc.stats["dispatches"] - before
    assert n_dispatches < 6, (
        f"6-frame burst used {n_dispatches} dispatches (no coalescing)")


def test_per_request_deadline_override(svc):
    """submit(deadline_ms=...) overrides the stream SLA for that request."""
    import time
    sid = svc.open_stream(max_latency_ms=60000.0)  # huge stream SLA
    svc.submit(sid, _frames(1, seed=97)[0],
               deadline_ms=400.0).result(timeout=300)  # warm compile
    t0 = time.perf_counter()
    svc.submit(sid, _frames(1, seed=95)[0],
               deadline_ms=400.0).result(timeout=300)
    warm_step = time.perf_counter() - t0  # loaded-host step baseline
    t0 = time.perf_counter()
    res = svc.submit(sid, _frames(1, seed=14)[0],
                     deadline_ms=400.0).result(timeout=300)
    wall = time.perf_counter() - t0
    svc.close_stream(sid)
    # the tight per-request deadline drove dispatch, not the 60s SLA:
    # bounds scale with measured load instead of absolute ceilings
    assert wall < max(5.0, 4 * warm_step)
    assert res.dispatch_ts - res.arrival_ts < max(0.5, 2 * warm_step)


def test_wait_idle_blocks_until_drained(svc):
    """wait_idle must return only after every submitted frame resolved
    and every slot is FREE — the safe point to re-lease slots for a new
    tenant generation (benchmark config 26's phase boundary)."""
    sid = svc.open_stream()
    futs = [svc.submit(sid, f) for f in _frames(5, seed=9)]
    svc.close_stream(sid)
    svc.wait_idle(timeout=300)
    assert all(f.done() for f in futs)
    # all slots immediately re-leasable, no polling loop needed
    a = svc.open_stream()
    b = svc.open_stream()
    svc.close_stream(a)
    svc.close_stream(b)
    svc.wait_idle(timeout=60)
