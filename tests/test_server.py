"""HTTP serving front-end tests (CPU backend, tiny shapes)."""

import json
import urllib.request

import numpy as np
import pytest

from aicamera_tpu.core.state import TrackerParams
from aicamera_tpu.runtime.pipeline import TrackingPipeline
from aicamera_tpu.server import TrackingHTTPServer
from aicamera_tpu.serving import TrackingService


@pytest.fixture(scope="module")
def server():
    params = TrackerParams(max_tracks=16, max_detections=8, nn_budget=4,
                           max_age=10, feature_dim=512)
    pipe = TrackingPipeline(input_shape=(128, 128), chunk_size=2,
                            tracker_params=params, max_reid_crops=4)
    svc = TrackingService(pipeline=pipe, chunk_size=2, max_latency_ms=10.0)
    srv = TrackingHTTPServer(host="127.0.0.1", port=0, service=svc).start()
    yield srv
    srv.shutdown()


def _url(server, path):
    return f"http://127.0.0.1:{server.port}{path}"


def _post(server, path, body=b"", headers=None):
    req = urllib.request.Request(_url(server, path), data=body,
                                 headers=headers or {}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/v1/healthz"), timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["backend"] == "cpu"


def test_track_raw_frames_and_stats(server):
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (96, 128, 3), np.uint8)
    indices = []
    for _ in range(3):
        status, body = _post(server, "/v1/track", frame.tobytes(),
                             {"X-Frame-Height": "96", "X-Frame-Width": "128"})
        assert status == 200
        assert isinstance(body["tracks"], list)
        indices.append(body["frame_index"])
    assert indices == sorted(indices)  # per-stream ordering

    with urllib.request.urlopen(_url(server, "/v1/stats"), timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["frames"] >= 3


def test_track_jpeg(server):
    cv2 = pytest.importorskip("cv2")
    frame = np.full((96, 128, 3), 90, np.uint8)
    ok, buf = cv2.imencode(".jpg", frame)
    assert ok
    status, body = _post(server, "/v1/track", buf.tobytes(),
                         {"Content-Type": "image/jpeg"})
    assert status == 200
    assert "tracks" in body


def test_reset_and_bad_input(server):
    status, body = _post(server, "/v1/reset")
    assert status == 200 and body["status"] == "reset"
    status, body = _post(server, "/v1/track", b"not-an-image")
    assert status == 400
    status, _ = _post(server, "/v1/nope")
    assert status == 404
