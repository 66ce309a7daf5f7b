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


def test_pipeline_agreement_regression_floor():
    """CI regression floor on the production-pipeline/facade agreement
    (VERDICT r4 #1): the latest recorded run per detect dtype in
    benchmarks/clip_agreement.jsonl (written by scripts/clip_parity.py
    --pipeline_check --json_out) must stay at or above the floors the
    r5 measurements established. The TPU measurement itself runs in
    scripts/run_parity_ab.py; this guards the recorded numbers against
    a regressing commit going unnoticed."""
    import json
    rec_path = (Path(__file__).parent.parent / "benchmarks"
                / "clip_agreement.jsonl")
    if not rec_path.exists():
        pytest.skip("no recorded agreement metrics yet "
                    "(run scripts/run_parity_ab.py on TPU)")
    latest = {}
    with open(rec_path) as f:
        for line in f:
            row = json.loads(line)
            if "row_agreement" in row:
                key = (row.get("detect_dtype", "bf16"),
                       row.get("pipeline_preprocess", "auto"),
                       row.get("reid_dtype", "bf16"),
                       row.get("pipeline_chunk", 96))
                latest[key] = row
    assert latest, "no pipeline-check rows recorded"
    # facade/reference parity must be perfect in every recorded run
    for key, row in latest.items():
        assert row["mismatched_frames"] == 0, (key, row)
    # production default (bf16, pallas preprocess, chunk 96 throughput
    # mode) floor: self-training round 3 (r5) measured 0.947 (from r4's
    # 0.871) — must not regress below 0.92
    default = latest.get(("bf16", "auto", "bf16", 96))
    if default is not None:
        assert default["row_agreement"] >= 0.92, default
    # throughput parity mode (f32 detect + xla preprocess + f32 reid,
    # chunk 96): detections are bitwise batch-shape-stable here
    # (benchmarks/detect_ab.jsonl: 200/200 frames, zero deltas); the
    # residual is looped-vs-unrolled scan-body f32 scheduling at
    # knife-edge assignment ties — r5 measured 0.9007 / 192 of 500
    parity96 = latest.get(("f32", "xla", "f32", 96))
    if parity96 is not None:
        assert parity96["row_agreement"] >= 0.88, parity96
        assert parity96["id_identical_frames"] >= 150, parity96
    # EXACT mode (parity dtypes at chunk 1 — the CLI's live/webcam
    # configuration, the reference's own per-frame granularity): r5
    # measured 500/500 ID-identical frames, 100.0% row agreement. The
    # north-star track-ID parity holds on the production path; any
    # regression here is a real semantic break.
    exact = latest.get(("f32", "xla", "f32", 1))
    if exact is not None:
        assert exact["row_agreement"] >= 0.999, exact
        assert exact["id_identical_frames"] == exact["frames"], exact
