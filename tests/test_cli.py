"""CLI end-to-end test on the CPU backend: flags, output video, streaming
checkpoints and resume (reference CLI contract, aicamera_tracker.py:20-67)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = tmp_path_factory.mktemp("clip") / "tiny.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (128, 96))
    rng = np.random.default_rng(0)
    for _ in range(7):
        w.write(rng.integers(0, 255, (96, 128, 3), np.uint8))
    w.release()
    assert path.exists() and path.stat().st_size > 0
    return path


def test_cli_end_to_end_with_checkpoint_and_resume(tiny_clip, tmp_path,
                                                   capsys):
    from aicamera_tpu.cli import main
    ckpt = tmp_path / "state.msgpack"
    out_dir = tmp_path / "out"
    main(["--input", str(tiny_clip), "--device", "cpu",
          "--input_shape", "128", "--chunk_size", "2",
          "--output_dir", str(out_dir), "--output_filename", "t.mp4",
          "--checkpoint", str(ckpt), "--checkpoint_interval", "4",
          "--profile"])
    text = capsys.readouterr().out
    assert "Processed 7 frames" in text
    assert ckpt.exists()          # periodic + final snapshot
    assert (out_dir / "t.mp4").exists()

    # resume: state loads and ids continue (fresh run prints the banner)
    main(["--input", str(tiny_clip), "--device", "cpu",
          "--input_shape", "128", "--chunk_size", "2", "--no_save",
          "--resume", str(ckpt), "--max_frames", "3"])
    text = capsys.readouterr().out
    assert f"Resumed tracker state from {ckpt}" in text
    assert "Processed 3 frames" in text


def test_cli_parse_reference_aliases():
    from aicamera_tpu.cli import parse_arguments
    args = parse_arguments(["--yolo_engine", "a.onnx",
                            "--reid_engine", "b.onnx",
                            "--conf_thresh", "0.4"])
    assert args.yolo_weights == "a.onnx"
    assert args.reid_weights == "b.onnx"
    assert args.conf_thresh == pytest.approx(0.4)


# ---------------------------------------------------------------------------
# Webcam / live-display path (reference aicamera_tracker.py:118-135,230-233):
# a fake camera (monkeypatched cv2.VideoCapture serving canned frames) drives
# the chunk-1 live loop with the display stubbed headless.
# ---------------------------------------------------------------------------

class _FakeCapture:
    """cv2.VideoCapture stand-in: serves `n` random 128x96 frames, then EOF.
    Reports fps/frame_count as 0 like a real webcam."""

    def __init__(self, n=6, seed=3):
        self._rng = np.random.default_rng(seed)
        self._left = n

    def isOpened(self):
        return True

    def get(self, prop):
        import cv2
        return {cv2.CAP_PROP_FRAME_WIDTH: 128,
                cv2.CAP_PROP_FRAME_HEIGHT: 96}.get(prop, 0)

    def read(self):
        if self._left <= 0:
            return False, None
        self._left -= 1
        return True, self._rng.integers(0, 255, (96, 128, 3), np.uint8)

    def release(self):
        pass


@pytest.fixture
def fake_webcam(monkeypatch):
    """Patch the capture + display surface; returns a call recorder."""
    cv2 = pytest.importorskip("cv2")
    from aicamera_tpu.utils import video_io
    calls = {"shown": 0, "destroyed": 0, "windows": 0, "opened_id": None}

    def fake_cap(source):
        assert isinstance(source, int), "webcam path must open by id"
        calls["opened_id"] = source
        return _FakeCapture()

    monkeypatch.setattr(video_io.cv2, "VideoCapture", fake_cap)
    monkeypatch.setattr(cv2, "namedWindow",
                        lambda *a, **k: calls.__setitem__(
                            "windows", calls["windows"] + 1))
    monkeypatch.setattr(cv2, "imshow",
                        lambda *a, **k: calls.__setitem__(
                            "shown", calls["shown"] + 1))
    monkeypatch.setattr(cv2, "waitKey", lambda *a, **k: -1)
    monkeypatch.setattr(cv2, "destroyAllWindows",
                        lambda: calls.__setitem__(
                            "destroyed", calls["destroyed"] + 1))
    return calls


def test_cli_webcam_live_display(fake_webcam, capsys):
    """No --input => webcam by id, chunk-1 live mode, frames flow through
    detect+track+draw+imshow, FPS accounting prints, window torn down."""
    from aicamera_tpu.cli import main
    main(["--device", "cpu", "--input_shape", "128", "--webcam_id", "2",
          "--no_save", "--show_display", "--max_frames", "5"])
    text = capsys.readouterr().out
    assert fake_webcam["opened_id"] == 2
    assert "Input: webcam2" in text
    assert "Processed 5 frames" in text       # FPS summary line ran
    assert "FPS detect+track)" in text
    assert fake_webcam["windows"] == 1
    assert fake_webcam["shown"] == 5          # every frame displayed
    assert fake_webcam["destroyed"] == 1      # cleanup ran


def test_cli_webcam_quit_key_stops_loop(fake_webcam, monkeypatch, capsys):
    """Pressing 'q' in the display window exits the loop early with clean
    teardown (reference :230-233)."""
    import cv2
    from aicamera_tpu.cli import main
    keys = iter([-1, -1, ord("q")])
    monkeypatch.setattr(cv2, "waitKey", lambda *a, **k: next(keys, ord("q")))
    main(["--device", "cpu", "--input_shape", "128", "--no_save",
          "--show_display"])
    text = capsys.readouterr().out
    assert "Processed 3 frames" in text       # stopped at the q-press
    assert fake_webcam["destroyed"] == 1


def test_cli_webcam_interrupt_cleans_up(fake_webcam, monkeypatch, capsys):
    """KeyboardInterrupt mid-stream (ctrl-C) shuts down cleanly: message
    printed, window destroyed, summary still emitted."""
    import cv2
    from aicamera_tpu.cli import main

    count = {"n": 0}

    def imshow_then_interrupt(*a, **k):
        count["n"] += 1
        if count["n"] >= 3:
            raise KeyboardInterrupt

    monkeypatch.setattr(cv2, "imshow", imshow_then_interrupt)
    main(["--device", "cpu", "--input_shape", "128", "--no_save",
          "--show_display"])
    text = capsys.readouterr().out
    assert "Interrupted — shutting down cleanly." in text
    assert fake_webcam["destroyed"] == 1
    assert "Processed" in text                # summary still printed
