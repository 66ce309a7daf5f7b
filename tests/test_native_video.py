"""Native C++ video decoder tests (native/video_reader.cpp), validated
bitwise against Python cv2.VideoCapture on the reference clip."""

from pathlib import Path

import numpy as np
import pytest

from aicamera_tpu.native import video_available

CLIP = Path("/root/reference/assets/aicamera_test_clip.mp4")

pytestmark = pytest.mark.skipif(
    not video_available() or not CLIP.exists(),
    reason="native video decoder or reference clip unavailable")


def _cv2_frames(n):
    import cv2
    cap = cv2.VideoCapture(str(CLIP))
    out = []
    while len(out) < n:
        ok, f = cap.read()
        if not ok:
            break
        out.append(f)
    cap.release()
    return out


def test_info_matches_cv2():
    import cv2
    from aicamera_tpu.utils.video_io import NativeVideoReader
    cap = cv2.VideoCapture(str(CLIP))
    r = NativeVideoReader(CLIP)
    try:
        assert r.width == int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        assert r.height == int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        assert r.fps == pytest.approx(cap.get(cv2.CAP_PROP_FPS))
        assert r.frame_count == int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        assert not r.is_webcam
    finally:
        r.release()
        cap.release()


def test_frames_bitwise_match_cv2():
    from aicamera_tpu.utils.video_io import NativeVideoReader
    want = _cv2_frames(40)
    r = NativeVideoReader(CLIP, max_frames=40)
    try:
        got = list(r.frames())
    finally:
        r.release()
    assert len(got) == len(want) == 40
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_read_chunk_drains_and_signals_eof():
    from aicamera_tpu.utils.video_io import NativeVideoReader
    r = NativeVideoReader(CLIP, max_frames=100)
    try:
        total = 0
        sizes = []
        while True:
            c = r.read_chunk(64)
            if len(c) == 0:
                break
            assert c.shape[1:] == (r.height, r.width, 3)
            assert c.dtype == np.uint8
            sizes.append(len(c))
            total += len(c)
        assert total == 100
        # full chunks except possibly the last (blocking-fill semantics)
        assert sizes[:-1] == [64] * (len(sizes) - 1)
        # EOF is sticky
        assert len(r.read_chunk(8)) == 0
    finally:
        r.release()


def test_chunk_content_matches_cv2():
    from aicamera_tpu.utils.video_io import NativeVideoReader
    want = np.stack(_cv2_frames(32))
    r = NativeVideoReader(CLIP, max_frames=32)
    try:
        got = r.read_chunk(32)
    finally:
        r.release()
    np.testing.assert_array_equal(got, want)


def test_missing_file_raises():
    from aicamera_tpu.utils.video_io import NativeVideoReader
    with pytest.raises(FileNotFoundError):
        NativeVideoReader("/nonexistent/video.mp4")


def test_release_mid_stream_joins_cleanly():
    from aicamera_tpu.utils.video_io import NativeVideoReader
    r = NativeVideoReader(CLIP)
    r.read_chunk(8)
    r.release()   # decode thread blocked on a full ring must unblock
    r.release()   # idempotent

def _read_all(nt, max_frames=None):
    from aicamera_tpu.utils.video_io import NativeVideoReader
    r = NativeVideoReader(CLIP, n_threads=nt, max_frames=max_frames)
    try:
        out = []
        while True:
            c = r.read_chunk(96)
            if len(c) == 0:
                break
            out.append(c.copy())
    finally:
        r.release()
    return np.concatenate(out)


def test_parallel_decode_bitwise_matches_sequential():
    """Segment-parallel decode (multiple workers, one keyframe seek
    each, in-order reorder window) must reproduce the sequential stream
    bitwise — fast-tier window: 240 frames / 3 segments exercises two
    verified seek boundaries; the full-clip sweep is the slow-tier
    test below."""
    seq = _read_all(1, max_frames=240)
    par = _read_all(3, max_frames=240)
    assert par.shape == seq.shape
    np.testing.assert_array_equal(par, seq)


@pytest.mark.slow
def test_parallel_decode_bitwise_matches_sequential_full_clip():
    """Whole-clip 4-worker sweep (slow tier, ~43 s: decodes the clip
    twice) — also proves ffmpeg's CAP_PROP_POS_FRAMES seek is
    frame-accurate on the reference asset at every boundary."""
    seq = _read_all(1)
    par = _read_all(4)
    assert par.shape == seq.shape
    np.testing.assert_array_equal(par, seq)


def test_parallel_decode_respects_max_frames():
    from aicamera_tpu.utils.video_io import NativeVideoReader
    want = np.stack(_cv2_frames(200))
    r = NativeVideoReader(CLIP, max_frames=200, n_threads=3)
    try:
        got = []
        while True:
            c = r.read_chunk(64)
            if len(c) == 0:
                break
            got.append(c.copy())
        got = np.concatenate(got)
        # EOF is sticky
        assert len(r.read_chunk(8)) == 0
    finally:
        r.release()
    np.testing.assert_array_equal(got, want)


def test_parallel_decode_tight_window_backpressure():
    """A reorder window smaller than the segment span forces later
    workers to block for space; order and content must still be exact."""
    from aicamera_tpu.utils.video_io import NativeVideoReader
    want = np.stack(_cv2_frames(96))
    r = NativeVideoReader(CLIP, queue_depth=8, max_frames=96, n_threads=4)
    try:
        got = r.read_chunk(96)
    finally:
        r.release()
    np.testing.assert_array_equal(got, want)


def test_parallel_release_mid_stream_joins_cleanly():
    from aicamera_tpu.utils.video_io import NativeVideoReader
    r = NativeVideoReader(CLIP, n_threads=4, queue_depth=16)
    r.read_chunk(8)
    r.release()   # workers blocked on window space must unblock and join
    r.release()   # idempotent


def test_chunk_larger_than_ring_drains_incrementally():
    """read_chunk(k) with k > queue_depth must not deadlock: vr_read
    drains the ring while the decoder refills (a chunk-96 pipeline over
    the default 64-deep ring hung before this was fixed)."""
    from aicamera_tpu.utils.video_io import NativeVideoReader
    want = np.stack(_cv2_frames(96))
    r = NativeVideoReader(CLIP, queue_depth=16, max_frames=96)
    try:
        got = r.read_chunk(96)
    finally:
        r.release()
    np.testing.assert_array_equal(got, want)
