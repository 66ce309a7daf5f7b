"""Video I/O: threaded decode-ahead reader and writer.

The reference reads frames synchronously in the hot loop
(``aicamera_tracker.py:169-170``) and writes synchronously (:236). Here
decode runs in a background thread feeding a bounded queue so cv2's ffmpeg
work overlaps the TPU chunk dispatch (the "double-buffered host I/O" from
the north star), and writing likewise drains from a queue.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterator, Optional, Tuple

import cv2
import numpy as np

from .. import config


class VideoReader:
    """Threaded frame reader over a file or webcam."""

    def __init__(self, source, queue_depth: int = 64,
                 max_frames: Optional[int] = None):
        if isinstance(source, int):
            self.cap = cv2.VideoCapture(source)
            self.is_webcam = True
        else:
            if not Path(str(source)).exists():
                raise FileNotFoundError(f"Input video not found: {source}")
            self.cap = cv2.VideoCapture(str(source))
            self.is_webcam = False
        if not self.cap.isOpened():
            raise RuntimeError(f"Could not open video source: {source}")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or config.DEFAULT_OUTPUT_FPS
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
        self.max_frames = max_frames
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._thread = threading.Thread(target=self._decode_loop, daemon=True)
        self._stopped = threading.Event()
        self._thread.start()

    def _decode_loop(self):
        n = 0
        while not self._stopped.is_set():
            if self.max_frames is not None and n >= self.max_frames:
                break
            ok, frame = self.cap.read()
            if not ok:
                break
            self._q.put(frame)
            n += 1
        self._q.put(None)  # sentinel

    def frames(self) -> Iterator[np.ndarray]:
        while True:
            frame = self._q.get()
            if frame is None:
                return
            yield frame

    def release(self):
        self._stopped.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
        self.cap.release()


class NativeVideoReader:
    """Frame reader over the native C++ decoder (native/video_reader.cpp).

    Decode runs on a C++ thread with no GIL involvement, buffering into a
    bounded ring; frames are drained in whole chunks with ONE ctypes call
    per ``read_chunk`` (one Python crossing per device dispatch instead of
    one per frame). Same surface as :class:`VideoReader` (``frames()``,
    ``fps/width/height/frame_count/is_webcam``, ``release``) plus
    :meth:`read_chunk`.

    Raises RuntimeError when the native library is unavailable — callers
    that want graceful degradation should check
    ``aicamera_tpu.native.video_available()`` first.
    """

    def __init__(self, source, queue_depth: Optional[int] = None,
                 max_frames: Optional[int] = None,
                 n_threads: Optional[int] = None):
        """``n_threads`` > 1 enables segment-parallel decode for seekable
        files with a known frame count (each worker seeks once to its own
        contiguous segment; frames are merged in order through a bounded
        reorder window). ``queue_depth`` pins the reorder window to that
        many frames (hard memory cap — workers then lead the consumer by
        at most the window, which serializes long parallel decodes; see
        the scaling-limit note in native/video_reader.cpp). ``None``
        (default) lets the decoder auto-size the window from a byte
        budget (AICAM_VR_WINDOW_BYTES, default 2 GiB) so files that fit
        decode at full parallelism. Webcams and unindexed streams always
        decode on one worker with a 64-frame ring. ``n_threads=None``
        uses ``min(4, usable cores)`` — on a single-core host extra
        decode threads only add contention (measured 273 -> 143 FPS at 4
        threads on the 540p reference clip)."""
        import ctypes
        import os

        from .. import native as _native

        if n_threads is None:
            try:
                cores = len(os.sched_getaffinity(0))
            except AttributeError:  # non-Linux
                cores = os.cpu_count() or 1
            n_threads = min(4, max(1, cores))

        lib = _native._load_video()
        if lib is None:
            raise RuntimeError(
                "native video decoder unavailable (OpenCV C++ dev files or "
                "toolchain missing); use utils.video_io.VideoReader")
        self._lib = lib
        depth = 0 if queue_depth is None else int(queue_depth)  # 0 = auto
        if isinstance(source, int):
            self.is_webcam = True
            handle = lib.vr_open(b"", source, depth,
                                 -1 if max_frames is None else max_frames,
                                 1)
        else:
            self.is_webcam = False
            if not Path(str(source)).exists():
                raise FileNotFoundError(f"Input video not found: {source}")
            handle = lib.vr_open(str(source).encode(), -1, depth,
                                 -1 if max_frames is None else max_frames,
                                 max(1, int(n_threads)))
        if not handle:
            raise RuntimeError(f"Could not open video source: {source}")
        self._handle = handle
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        count = ctypes.c_longlong()
        lib.vr_info(handle, ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(fps), ctypes.byref(count))
        self.width = w.value
        self.height = h.value
        self.fps = fps.value or config.DEFAULT_OUTPUT_FPS
        self.frame_count = max(int(count.value), 0)
        self.max_frames = max_frames

    def read_chunk(self, k: int) -> np.ndarray:
        """Block until k frames are decoded (or EOF) and return them as one
        (n, H, W, 3) BGR uint8 array, n <= k; n == 0 at end of stream."""
        import ctypes
        if self._handle is None:
            return np.zeros((0, self.height, self.width, 3), np.uint8)
        buf = np.empty((k, self.height, self.width, 3), np.uint8)
        n = self._lib.vr_read(
            self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            k)
        if n < 0:
            raise RuntimeError("native video read failed")
        return buf[:n]

    def chunks(self, k: int) -> Iterator[np.ndarray]:
        """Yield ``(n <= k, H, W, 3)`` chunks until end of stream — the
        feed for ``TrackingPipeline.process_chunks`` (one Python crossing
        per device dispatch)."""
        while True:
            chunk = self.read_chunk(k)
            if len(chunk) == 0:
                return
            yield chunk

    def frames(self) -> Iterator[np.ndarray]:
        while True:
            chunk = self.read_chunk(1)
            if len(chunk) == 0:
                return
            yield chunk[0]

    def release(self):
        if self._handle is not None:
            self._lib.vr_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass


class VideoWriter:
    """Threaded mp4 writer (mp4v, falling back to XVID/avi like the
    reference, aicamera_tracker.py:138-156)."""

    def __init__(self, path: str, fps: float, frame_hw: Tuple[int, int]):
        h, w = frame_hw
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(str(path), fourcc, fps, (w, h))
        if not self.writer.isOpened():
            path = path.with_suffix(".avi")
            fourcc = cv2.VideoWriter_fourcc(*"XVID")
            self.writer = cv2.VideoWriter(str(path), fourcc, fps, (w, h))
        self.path = path
        self._q: queue.Queue = queue.Queue(maxsize=128)
        self._thread = threading.Thread(target=self._write_loop, daemon=True)
        self._thread.start()

    def _write_loop(self):
        while True:
            frame = self._q.get()
            if frame is None:
                return
            self.writer.write(frame)

    def write(self, frame: np.ndarray):
        self._q.put(frame)

    def release(self):
        self._q.put(None)
        self._thread.join(timeout=10.0)
        self.writer.release()
