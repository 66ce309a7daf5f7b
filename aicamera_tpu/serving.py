"""TrackingService: asynchronous request/response serving over the fused
pipeline (production-deployment surface; no analog in the reference).

Callers submit BGR frames and receive ``concurrent.futures.Future`` objects
that resolve to :class:`~aicamera_tpu.runtime.pipeline.FrameResult`. A
single worker thread owns the device (one TPU-attached process/queue) and
batches submissions into fused chunks:

- up to ``chunk_size`` frames ride one device dispatch (throughput);
- a ``max_latency_ms`` window bounds how long a lone frame waits for
  batch-mates (latency);
- results resolve one chunk behind the dispatch so device compute and
  readback RPCs overlap (same schedule as the offline pipeline).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np

from .runtime.pipeline import TrackingPipeline


class TrackingService:
    """Threaded tracking server around one :class:`TrackingPipeline`."""

    def __init__(self, pipeline: Optional[TrackingPipeline] = None,
                 chunk_size: int = 8, max_latency_ms: float = 30.0,
                 **pipeline_kwargs):
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
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

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
        """Drain outstanding work and stop the worker. Idempotent."""
        with self._state_lock:
            if self._running:
                self._running = False
                self._q.put(None)
        self._worker.join(timeout=timeout)

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
        pending = None
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
                det_outs, track_outs = self.pipeline._dispatch_chunk(
                    chunk, n_valid=count)
                if pending is not None:
                    self._resolve(pending)
                pending = (futures, det_outs, track_outs, base, count)
            elif pending is not None:
                # idle: flush the outstanding chunk
                self._resolve(pending)
                pending = None
        if pending is not None:
            self._resolve(pending)
        # reject anything left in the queue
        try:
            while True:
                item = self._q.get_nowait()
                if item is not None:
                    item[0].set_exception(RuntimeError("service shut down"))
        except queue.Empty:
            pass
