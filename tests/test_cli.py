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
