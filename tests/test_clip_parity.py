"""Replay clip-scale track-ID parity vs the reference core, hardware-free.

`scripts/clip_parity.py` runs the full 500-frame harness on the TPU (our
detect path -> identical detections+features into both trackers) and dumps
the raw per-frame detector outputs to ``tests/data/clip_dets.npz``. This
test replays a window of those recorded detections over the REAL clip
frames through the same parity check on the CPU backend: our jitted
facade (on-device crop gather + ReID + associate + lifecycle) vs the
reference's own TrackerCore (/root/reference/src/tracker/core), driven
with bit-identical inputs.

The recorded stream is busy (~29 post-filter detections/frame from the
self-trained detector at conf 0.25 on real video — constant births,
deaths, occlusions and deep cascade levels), which is exactly the load
where association tie-breaks and lifecycle semantics would diverge.
"""

from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data" / "clip_dets.npz"
CLIP = Path("/root/reference/assets/aicamera_test_clip.mp4")

pytestmark = [
    pytest.mark.skipif(not DATA.exists(),
                       reason="recorded detections missing (run "
                              "scripts/clip_parity.py --dump)"),
    pytest.mark.skipif(not CLIP.exists(), reason="reference clip missing"),
]

# A window deep enough to exercise confirmations, max-age deletions and
# multi-level cascade matches, small enough for the CPU backend.
START, N_FRAMES = 120, 48


def _load_window():
    import cv2
    z = np.load(DATA)
    boxes, scores, clss, counts = (z["boxes"], z["scores"],
                                   z["class_ids"], z["counts"])
    cap = cv2.VideoCapture(str(CLIP))
    frames = []
    for i in range(START + N_FRAMES):
        ok, f = cap.read()
        if not ok:
            break
        if i >= START:
            frames.append(f)
    cap.release()
    assert len(frames) == N_FRAMES, "clip shorter than recorded window"
    dets = [(boxes[i, :counts[i]], scores[i, :counts[i]],
             clss[i, :counts[i]].astype(np.int32))
            for i in range(START, START + N_FRAMES)]
    return frames, dets


@pytest.mark.slow
def test_clip_window_matches_reference_core():
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from clip_parity import run_parity

    frames, dets = _load_window()
    assert sum(len(d[1]) for d in dets) > 300, (
        "recorded window unexpectedly sparse — regenerate the dump")
    rep = run_parity(frames, dets, reid_weights=None, min_conf=0.3,
                     progress=False)
    assert rep["unique_track_ids"] >= 10, rep
    assert rep["mismatched_frames"] == 0, rep["mismatches"][:5]
