"""ctypes bindings for the native host runtime (native/aicam_host.cpp).

Provides first-party C++ replacements for the vendored native code the
reference leans on — scipy's Hungarian (linear_assignment.py:4) and
OpenCV's imgproc letterbox path (image_processing.py) — used for CPU
deployments and as an independent oracle validating the on-device solver.

The shared library is built on first use (``make -C native``); every entry
point degrades gracefully when the toolchain is unavailable
(:func:`available` returns False and callers fall back to scipy/JAX).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libaicam_host.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.lapjv_solve.restype = ctypes.c_int
    lib.lapjv_solve.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.letterbox_u8.restype = None
    lib.letterbox_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native library is built and loadable."""
    return _load() is not None


_VIDEO_LIB_PATH = _NATIVE_DIR / "libaicam_video.so"
_video_lib = None
_video_tried = False


def _load_video():
    """Load the native video decoder library (native/video_reader.cpp).

    Built separately from the core host lib because it links OpenCV C++;
    when the OpenCV dev files or the toolchain are absent the build skips
    it and callers fall back to the Python threaded reader."""
    global _video_lib, _video_tried
    if _video_lib is not None or _video_tried:
        return _video_lib
    _video_tried = True
    if not _VIDEO_LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "video"],
                           check=True, capture_output=True, timeout=300)
        except Exception:
            return None
    if not _VIDEO_LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_VIDEO_LIB_PATH))
    except OSError:
        return None
    lib.vr_open.restype = ctypes.c_void_p
    lib.vr_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                            ctypes.c_longlong, ctypes.c_int]
    lib.vr_info.restype = ctypes.c_int
    lib.vr_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_longlong)]
    lib.vr_read.restype = ctypes.c_int
    lib.vr_read.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.vr_close.restype = None
    lib.vr_close.argtypes = [ctypes.c_void_p]
    _video_lib = lib
    return _video_lib


def video_available() -> bool:
    """True when the native video decoder is built and loadable."""
    return _load_video() is not None


def lapjv(cost: np.ndarray) -> np.ndarray:
    """Optimal assignment on an (nr, nc) cost matrix, nr <= nc.

    Returns col4row (nr,) int32. Raises RuntimeError if the native library
    is unavailable or the problem is infeasible.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; build native/")
    cost = np.ascontiguousarray(cost, np.float32)
    nr, nc = cost.shape
    transposed = False
    if nr > nc:
        cost = np.ascontiguousarray(cost.T)
        nr, nc = nc, nr
        transposed = True
    col4row = np.empty(nr, np.int32)
    rc = lib.lapjv_solve(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nr, nc,
        col4row.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        raise RuntimeError(f"lapjv_solve failed: rc={rc}")
    if transposed:
        out = np.full(nc, -1, np.int32)
        out[col4row] = np.arange(nr, dtype=np.int32)
        return out
    return col4row


def letterbox(frame_bgr_u8: np.ndarray, spec) -> np.ndarray:
    """Fused native letterbox: (H, W, 3) uint8 BGR -> (Dh, Dw, 3) f32 RGB
    in [0, 1], 114-padded. `spec` is an ops.preprocess.LetterboxSpec."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; build native/")
    frame = np.ascontiguousarray(frame_bgr_u8, np.uint8)
    sh, sw = spec.src_hw
    dh, dw = spec.dst_hw
    out = np.empty((dh, dw, 3), np.float32)
    lib.letterbox_u8(
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        spec.unpad_hw[0], spec.unpad_hw[1], spec.top, spec.left)
    return out
