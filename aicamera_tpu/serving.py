"""TrackingService: asynchronous request/response serving over the fused
pipeline (production-deployment surface; no analog in the reference).

Callers submit BGR frames and receive ``concurrent.futures.Future`` objects
that resolve to :class:`~aicamera_tpu.runtime.pipeline.FrameResult`. A
single worker thread owns the device (one TPU-attached process/queue) and
batches submissions into fused chunks:

- up to ``chunk_size`` frames ride one device dispatch (throughput);
- a ``max_latency_ms`` window bounds how long a lone frame waits for
  batch-mates (latency);
- a resolver thread owns the blocking readbacks (bounded in-flight
  backpressure), so device compute, readback RPCs and the next chunk's
  gather/dispatch all overlap.
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np

from .runtime.pipeline import TrackingPipeline, _format_tracks


class TrackingService:
    """Threaded tracking server around one :class:`TrackingPipeline`."""

    def __init__(self, pipeline: Optional[TrackingPipeline] = None,
                 chunk_size: int = 8, max_latency_ms: float = 30.0,
                 max_inflight: int = 8, **pipeline_kwargs):
        self.pipeline = pipeline or TrackingPipeline(
            chunk_size=chunk_size, **pipeline_kwargs)
        self.chunk_size = int(chunk_size)
        self.max_latency = max_latency_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._frame_index = 0
        self._running = True
        # guards _running + sentinel enqueue so no submit can slip a frame
        # in behind the shutdown sentinel (whose Future would never resolve)
        self._state_lock = threading.Lock()
        # dispatch/readback decoupling (same design as the multi-tenant
        # service): the gather/dispatch loop never blocks on a readback;
        # a resolver thread owns the blocking _emit/device_get, with at
        # most max_inflight unresolved chunks as backpressure
        self._resolve_q: queue.Queue = queue.Queue(
            maxsize=max(1, int(max_inflight)))
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self._resolver = threading.Thread(target=self._run_resolver,
                                          daemon=True)
        self._resolver.start()

    # --- client API -----------------------------------------------------------

    def submit(self, frame_bgr: np.ndarray) -> Future:
        """Enqueue one frame; returns a Future of FrameResult."""
        fut: Future = Future()
        with self._state_lock:
            if not self._running:
                raise RuntimeError("service is shut down")
            self._q.put((fut, np.asarray(frame_bgr)))
        return fut

    def shutdown(self, timeout: float = 30.0):
        """Drain outstanding work and stop the workers. Idempotent."""
        with self._state_lock:
            if self._running:
                self._running = False
                self._q.put(None)
        t0 = time.perf_counter()
        self._worker.join(timeout=timeout)
        self._resolver.join(
            timeout=max(0.1, timeout - (time.perf_counter() - t0)))

    # --- worker ----------------------------------------------------------------

    def _gather(self) -> Tuple[List[Future], List[np.ndarray], bool]:
        """Collect up to chunk_size frames, waiting at most max_latency
        after the first arrival. Returns (futures, frames, stop)."""
        futures: List[Future] = []
        frames: List[np.ndarray] = []
        try:
            item = self._q.get(timeout=0.05)
        except queue.Empty:
            return futures, frames, False
        if item is None:
            return futures, frames, True
        futures.append(item[0])
        frames.append(item[1])
        import time
        deadline = time.perf_counter() + self.max_latency
        while len(frames) < self.chunk_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                return futures, frames, True
            futures.append(item[0])
            frames.append(item[1])
        return futures, frames, False

    def _resolve(self, pending):
        futures, det_outs, track_outs, base, count = pending
        try:
            results = self.pipeline._emit(det_outs, track_outs, base, count)
            for fut, res in zip(futures, results):
                fut.set_result(res)
        except Exception as e:  # pragma: no cover - device failure path
            for fut in futures:
                if not fut.done():
                    fut.set_exception(e)

    def _run(self):
        stop = False
        while not stop:
            futures, frames, stop = self._gather()
            if frames:
                k = self.chunk_size
                count = len(frames)
                if count < k:
                    frames = frames + [frames[-1]] * (k - count)
                chunk = np.stack(frames)
                base = self._frame_index
                self._frame_index += count
                try:
                    det_outs, track_outs = self.pipeline._dispatch_chunk(
                        chunk, n_valid=count)
                except Exception as e:  # pragma: no cover - device failure
                    for fut in futures:
                        fut.set_exception(e)
                    continue
                # blocks only at max_inflight unresolved chunks
                self._resolve_q.put(
                    (futures, det_outs, track_outs, base, count))
        # reject anything left in the queue
        try:
            while True:
                item = self._q.get_nowait()
                if item is not None:
                    item[0].set_exception(RuntimeError("service shut down"))
        except queue.Empty:
            pass
        self._resolve_q.put(None)  # resolver drains FIFO, then stops

    def _run_resolver(self):
        while True:
            item = self._resolve_q.get()
            if item is None:
                break
            self._resolve(item)


# --- multi-tenant serving ------------------------------------------------


@dataclasses.dataclass
class StreamFrameResult:
    """Per-frame result for one tenant stream.

    The three timestamps (``time.perf_counter`` seconds) decompose the
    request's latency for SLA accounting: ``dispatch_ts - arrival_ts`` is
    queue wait (the scheduler's contribution), ``resolve_ts -
    dispatch_ts`` is device step + readback RPC (on the tunneled dev
    runtime the RPC dominates; benchmark config 26 quotes the measured
    device-only dispatch time separately)."""
    stream_id: int
    frame_index: int   # per-stream frame counter
    tracks: list       # [(x1, y1, x2, y2, track_id, class_name, conf), ...]
    arrival_ts: float = 0.0
    dispatch_ts: float = 0.0
    resolve_ts: float = 0.0


_FREE, _ACTIVE, _DRAINING = 0, 1, 2


class _StreamSlot:
    __slots__ = ("state", "pending", "sla", "next_index", "needs_reset")

    def __init__(self):
        self.state = _FREE
        # (Future, frame, arrival_ts, deadline_ts)
        self.pending = collections.deque()
        self.sla = 0.0
        self.next_index = 0
        self.needs_reset = False


class MultiTenantTrackingService:
    """Tracking-as-a-service for many independent tenant video streams.

    S fixed stream slots ride one :class:`MultiStreamPipeline`: every
    dispatch batches up to ``chunk_size`` frames from each active stream
    into a single fused device program (one YOLO batch over all tenants,
    per-stream tracker states vmapped — see parallel/multistream.py), with
    a per-(stream, frame) validity mask so tenants at different frame
    rates never advance each other's tracker state.

    Deadline-aware adaptive windowing: every request carries a deadline
    (arrival + the stream's ``max_latency_ms``, or an explicit
    ``deadline_ms`` at :meth:`submit`). The worker keeps an EWMA of the
    measured dispatch->result cycle time and fires a dispatch with that
    much lead time *before* the earliest queued deadline — never after
    it — so the window a lone frame waits for batch-mates is
    ``SLA - est_cycle``, shrinking automatically as the device slows.
    Under load, full chunks coalesce (a full slot fires immediately and
    every other tenant's queued frames ride the same fused program);
    under headroom, an EWMA arrival-rate estimate detects that no
    batch-mates are expected inside the deadline budget and dispatches
    the lone frame at once instead of burning its SLA waiting.

    Dispatch and readback are decoupled across two threads: the dispatch
    loop only gathers and enqueues fused device programs (async,
    ``copy_to_host_async`` — the discipline of the reference's engine
    wrapper, trt_utils/trt_engine.py:151-203: execute async on the
    caller's stream, no internal sync), while a resolver thread performs
    the blocking ``device_get``s FIFO. A slow readback RPC therefore
    never serializes the scheduling loop — queue waits stay bounded by
    the dispatch cadence, not the readback latency — with at most
    ``max_inflight`` unresolved chunks as backpressure.

    Slots are leased: :meth:`close_stream` drains the tenant's queued
    frames and frees the slot; the next :meth:`open_stream` re-leases it
    with a fresh tracker state (ids restart at 1, reference
    track.py:160). No analog exists in the reference (single stream,
    single process, aicamera_tracker.py).
    """

    def __init__(self, n_streams: int = 4,
                 frame_hw: Tuple[int, int] = (720, 1280),
                 chunk_size: int = 4,
                 max_latency_ms: float = 30.0,
                 sla_margin_ms: float = 5.0,
                 max_inflight: int = 8,
                 pipeline=None, **pipeline_kwargs):
        if pipeline is None:
            from .parallel import MultiStreamPipeline
            pipeline = MultiStreamPipeline(
                n_streams=n_streams, frame_hw=frame_hw, **pipeline_kwargs)
        self.pipeline = pipeline
        self.n_streams = int(pipeline.n_streams)
        self.frame_hw = tuple(pipeline.frame_hw)
        self.chunk_size = int(chunk_size)
        self.default_sla = max_latency_ms / 1e3
        self.sla_margin = sla_margin_ms / 1e3
        self._slots = [_StreamSlot() for _ in range(self.n_streams)]
        self._outstanding = 0  # submitted frames not yet resolved
        # Dispatch/resolve decoupling: the dispatch loop never blocks on
        # a readback — dispatched chunks are handed to a resolver thread
        # whose device_get runs off the scheduling path (the device
        # executes in submission order regardless; on the tunneled dev
        # runtime this keeps a ~1s readback RPC from serializing the
        # whole loop and inflating every queue wait). Bounded to
        # max_inflight unresolved chunks (HBM + host-memory backpressure).
        self._resolve_q: queue.Queue = queue.Queue(
            maxsize=max(1, int(max_inflight)))
        self._inflight = 0  # dispatched, not yet resolved (under _cond)
        # Output packing: the chunk step returns 5 leaves (tlbr, ids,
        # cls, conf, mask); fetching them is 5 host transfers per chunk.
        # One jitted concat into a single (S, K, T, 9) f32 array makes
        # the readback ONE transfer (ids ride as two 16-bit lanes so the
        # full 32-bit id range survives f32 exactly; on the tunneled dev
        # runtime per-transfer cost dominates).
        self._pack = None
        # Scheduler estimators (EWMA, alpha 0.3). The deadline LEAD is
        # est_resolve — the blocking device_get duration, i.e. the
        # MARGINAL per-chunk cost at which the FIFO resolver drains in
        # steady state. est_cycle (full dispatch->results latency) is
        # kept for stats only: under backlog it includes resolver queue
        # wait, and using it as the lead creates a positive feedback
        # loop (inflated lead -> every arrival deadline-fires -> more
        # tiny dispatches -> deeper backlog -> more inflation) that
        # collapses batching. arrival_rate = 1/EWMA(inter-arrival)
        # across all tenants decides whether waiting for batch-mates
        # can pay off.
        self._est_cycle = 0.0
        self._est_resolve = 0.0
        self._mean_interarrival = 0.0
        self._last_arrival = 0.0
        self.stats = {"dispatches": 0, "frames": 0, "deadline_fires": 0,
                      "full_fires": 0, "eager_fires": 0}
        self._cond = threading.Condition()
        self._running = True
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self._resolver = threading.Thread(target=self._run_resolver,
                                          daemon=True)
        self._resolver.start()

    # --- client API ---------------------------------------------------------

    def open_stream(self, max_latency_ms: float | None = None) -> int:
        """Lease a free stream slot; returns its stream id.

        The slot's tracker state is reset (by the worker, before the
        stream's first frame is processed). Raises RuntimeError when all
        slots are leased."""
        with self._cond:
            if not self._running:
                raise RuntimeError("service is shut down")
            for sid, slot in enumerate(self._slots):
                if slot.state == _FREE:
                    slot.state = _ACTIVE
                    slot.sla = (self.default_sla if max_latency_ms is None
                                else max_latency_ms / 1e3)
                    slot.next_index = 0
                    slot.needs_reset = True
                    return sid
        raise RuntimeError(
            f"all {self.n_streams} stream slots are leased")

    def submit(self, stream_id: int, frame_bgr: np.ndarray,
               deadline_ms: float | None = None) -> Future:
        """Enqueue one frame for a leased stream; Future of
        StreamFrameResult. ``deadline_ms`` overrides the stream's SLA
        window for this request (latency budget from now)."""
        frame = np.asarray(frame_bgr)
        if frame.shape != (*self.frame_hw, 3):
            raise ValueError(
                f"frame shape {frame.shape} != service shape "
                f"{(*self.frame_hw, 3)} (all tenants share one compiled "
                f"step; resize host-side)")
        fut: Future = Future()
        with self._cond:
            if not self._running:
                raise RuntimeError("service is shut down")
            slot = self._slots[stream_id]
            if slot.state != _ACTIVE:
                raise RuntimeError(f"stream {stream_id} is not open")
            now = time.perf_counter()
            budget = slot.sla if deadline_ms is None else deadline_ms / 1e3
            slot.pending.append((fut, frame, now, now + budget))
            self._outstanding += 1
            # arrival-rate EWMA (all tenants): long idle gaps decay the
            # rate so a sporadic frame dispatches eagerly
            if self._last_arrival:
                dt = now - self._last_arrival
                self._mean_interarrival = (
                    dt if self._mean_interarrival == 0.0
                    else 0.7 * self._mean_interarrival + 0.3 * dt)
            self._last_arrival = now
            self._cond.notify()
        return fut

    def wait_idle(self, timeout: float = 300.0) -> None:
        """Block until every slot is FREE and every submitted frame has
        resolved — e.g. between a drain (`close_stream`) and re-leasing
        slots for a new tenant generation."""
        deadline = time.perf_counter() + timeout
        with self._cond:
            while (self._outstanding or
                   any(s.state != _FREE or s.pending
                       for s in self._slots)):
                if time.perf_counter() >= deadline:
                    raise TimeoutError(
                        f"service did not drain within {timeout}s "
                        f"({self._outstanding} outstanding)")
                self._cond.wait(timeout=0.1)

    def _finished(self, n: int) -> None:
        with self._cond:
            self._outstanding -= n
            self._inflight -= 1
            self._cond.notify_all()

    def close_stream(self, stream_id: int):
        """Stop accepting frames for the stream; queued frames still
        resolve, then the slot is freed for re-lease. Idempotent."""
        with self._cond:
            slot = self._slots[stream_id]
            if slot.state == _ACTIVE:
                slot.state = _DRAINING if slot.pending else _FREE
                self._cond.notify()

    def shutdown(self, timeout: float = 60.0):
        """Drain all queued work and stop the workers. Idempotent."""
        with self._cond:
            if self._running:
                self._running = False
                self._cond.notify()
        t0 = time.perf_counter()
        self._worker.join(timeout=timeout)
        self._resolver.join(
            timeout=max(0.1, timeout - (time.perf_counter() - t0)))

    # --- worker --------------------------------------------------------------

    def _earliest_deadline(self) -> Optional[float]:
        dl = None
        for slot in self._slots:
            if slot.pending:
                d = slot.pending[0][3]
                dl = d if dl is None else min(dl, d)
        return dl

    def _dispatch_ready(self, now: float, device_idle: bool) -> bool:
        """True when some queued frame must (or profitably may) ride a
        dispatch now. Lock held. Three triggers:

        - COALESCE: a slot has a full chunk queued — fire at once, and
          every other tenant's queued frames ride the same program.
        - DEADLINE: the earliest queued deadline is within the measured
          dispatch-cycle lead time (+ margin). Fires *before* the
          deadline, by construction, as long as est_cycle tracks truth.
        - EAGER (headroom shrink): the device is idle and either (a) the
          arrival rate says fewer than one batch-mate is expected within
          the remaining deadline budget, or (b) the oldest queued frame
          has already waited one dispatch cycle for batch-mates —
          waiting longer while the device sits idle is strictly worse
          than dispatching now and batching later arrivals into the
          next dispatch.
        """
        pending = False
        oldest = None
        for slot in self._slots:
            if not slot.pending:
                continue
            pending = True
            a = slot.pending[0][2]
            oldest = a if oldest is None else min(oldest, a)
            if len(slot.pending) >= self.chunk_size:
                self.stats["full_fires"] += 1
                return True
        if not pending:
            return False
        dl = self._earliest_deadline()
        lead = self._est_resolve + self.sla_margin
        if now + lead >= dl:
            self.stats["deadline_fires"] += 1
            return True
        if device_idle:
            budget = dl - lead - now
            rate = (1.0 / self._mean_interarrival
                    if self._mean_interarrival > 0 else 0.0)
            if (rate * budget < 1.0 or
                    now - oldest >= max(self._est_resolve,
                                        self.sla_margin)):
                self.stats["eager_fires"] += 1
                return True
        return False

    def _next_wake(self, now: float) -> float:
        """Seconds until the next scheduling event: the earliest queued
        deadline minus dispatch lead (0 floor, 0.05 idle cap — the cap
        also bounds the eager wait-for-batch-mates granularity)."""
        wake = 0.05
        dl = self._earliest_deadline()
        if dl is not None:
            wake = min(wake, dl - self._est_resolve - self.sla_margin
                       - now)
        return max(wake, 0.0)

    def _gather(self):
        """Build one (S, K, H, W, 3) batch from queued frames. Lock held.
        Returns (frames, valid, jobs, earliest_deadline_of_jobs)."""
        k = self.chunk_size
        frames = np.zeros((self.n_streams, k, *self.frame_hw, 3), np.uint8)
        valid = np.zeros((self.n_streams, k), bool)
        jobs = []  # (stream_id, t, future, frame_index, arrival_ts)
        deadline = None
        for sid, slot in enumerate(self._slots):
            if slot.needs_reset:
                # safe here: the worker thread owns the device between
                # dispatches, so no step is in flight over these states
                self.pipeline.reset_stream(sid)
                slot.needs_reset = False
            for t in range(min(k, len(slot.pending))):
                fut, frame, arrival, dl = slot.pending.popleft()
                frames[sid, t] = frame
                valid[sid, t] = True
                jobs.append((sid, t, fut, slot.next_index, arrival))
                deadline = dl if deadline is None else min(deadline, dl)
                slot.next_index += 1
            if slot.state == _DRAINING and not slot.pending:
                slot.state = _FREE
        return frames, valid, jobs, deadline

    def _resolve(self, inflight):
        packed, jobs, dispatch_ts = inflight
        t0 = time.perf_counter()
        try:
            import jax
            arr = jax.device_get(packed)  # ONE transfer per chunk
            tlbr = arr[..., :4]
            ids = (arr[..., 4].astype(np.int64)
                   | (arr[..., 5].astype(np.int64) << 16))
            cls = arr[..., 6].astype(np.int32)
            conf = arr[..., 7]
            mask = arr[..., 8] != 0.0
            resolve_ts = time.perf_counter()
            for sid, t, fut, fidx, arrival in jobs:
                fut.set_result(StreamFrameResult(
                    stream_id=sid, frame_index=fidx,
                    tracks=_format_tracks(tlbr[sid, t], ids[sid, t],
                                          cls[sid, t], conf[sid, t],
                                          mask[sid, t]),
                    arrival_ts=arrival, dispatch_ts=dispatch_ts,
                    resolve_ts=resolve_ts))
        except Exception as e:  # pragma: no cover - device failure path
            resolve_ts = time.perf_counter()
            for _, _, fut, _, _ in jobs:
                if not fut.done():
                    fut.set_exception(e)
        finally:
            # EWMA the scheduler's lead-time estimates from what actually
            # happened: full dispatch->results latency and the blocking
            # device_get portion
            cycle = resolve_ts - dispatch_ts
            blk = resolve_ts - t0
            a = 0.3
            self._est_cycle = (cycle if self._est_cycle == 0.0
                               else (1 - a) * self._est_cycle + a * cycle)
            self._est_resolve = (blk if self._est_resolve == 0.0
                                 else (1 - a) * self._est_resolve + a * blk)
            self._finished(len(jobs))

    def _run(self):
        """Dispatch loop: gathers and dispatches, never blocks on a
        readback (the resolver thread owns device_get). The device
        executes dispatches in submission order; bounded unresolved
        chunks (the _resolve_q maxsize) provide backpressure."""
        while True:
            do_dispatch = False
            with self._cond:
                now = time.perf_counter()
                while self._running:
                    if self._dispatch_ready(now, self._inflight == 0):
                        do_dispatch = True
                        break
                    self._cond.wait(timeout=self._next_wake(now))
                    now = time.perf_counter()
                if not self._running:
                    if any(s.pending for s in self._slots):
                        do_dispatch = True  # drain
                    else:
                        break
                if do_dispatch:
                    frames, valid, jobs, _ = self._gather()
                    do_dispatch = bool(jobs)
                    if do_dispatch:
                        self._inflight += 1
            if do_dispatch:
                dispatch_ts = time.perf_counter()
                try:
                    outs = self.pipeline.step_chunk(frames,
                                                    frame_valid=valid)
                    packed = self._pack_outputs(outs)
                    packed.copy_to_host_async()
                except Exception as e:  # pragma: no cover - device failure
                    for _, _, fut, _, _ in jobs:
                        fut.set_exception(e)
                    self._finished(len(jobs))
                    continue
                self.stats["dispatches"] += 1
                self.stats["frames"] += len(jobs)
                # blocks only when max_inflight chunks are unresolved
                self._resolve_q.put((packed, jobs, dispatch_ts))
        # reject anything that slipped in after the drain loop exited
        with self._cond:
            for slot in self._slots:
                while slot.pending:
                    fut, _, _, _ = slot.pending.popleft()
                    fut.set_exception(RuntimeError("service shut down"))
                    self._outstanding -= 1
            self._cond.notify_all()
        self._resolve_q.put(None)  # resolver drains FIFO, then stops

    def _pack_outputs(self, outs):
        """Fuse the 5 output leaves into one (S, K, T, 9) f32 device
        array (single readback transfer). Track ids ride as two 16-bit
        lanes (lo, hi) — a single f32 lane is exact only below 2^24, and
        a long-lived service's monotonically growing ids would silently
        round past that; two lanes are exact for the full 32-bit range."""
        if self._pack is None:
            import jax
            import jax.numpy as jnp

            @jax.jit
            def pack(tlbr, ids, cls, conf, mask):
                ids32 = ids.astype(jnp.uint32)
                return jnp.concatenate(
                    [tlbr.astype(jnp.float32),
                     (ids32 & 0xFFFF).astype(jnp.float32)[..., None],
                     (ids32 >> 16).astype(jnp.float32)[..., None],
                     cls.astype(jnp.float32)[..., None],
                     conf.astype(jnp.float32)[..., None],
                     mask.astype(jnp.float32)[..., None]], axis=-1)

            self._pack = pack
        return self._pack(*outs)

    def _run_resolver(self):
        """Readback loop: blocking device_gets, FIFO, off the dispatch
        path (reference trt_engine.py:151-203 keeps infer async on the
        caller's stream the same way — no internal sync)."""
        while True:
            item = self._resolve_q.get()
            if item is None:
                break
            self._resolve(item)
