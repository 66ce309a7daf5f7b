"""OpenCV drawing overlays (host-side, after device readback).

Capability parity with reference ``src/utils/visualization.py``:
draw_detections (:9-69), draw_tracks (:72-124), draw_fps (:127-168),
draw_info_panel (:170-228). Drawing stays on the host — it is presentation,
not compute — and runs on frames the device never touched, overlapping with
the next chunk's device work.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import cv2
import numpy as np

from .. import config

_FONT = cv2.FONT_HERSHEY_SIMPLEX


def draw_detections(frame: np.ndarray,
                    bboxes_xyxy: np.ndarray,
                    scores: np.ndarray,
                    class_ids: np.ndarray,
                    thickness: int = 2) -> np.ndarray:
    """Draw raw detection boxes with class-name + score labels."""
    for box, score, cid in zip(bboxes_xyxy, scores, class_ids):
        cid = int(cid)
        name = config.CLASSES[cid] if 0 <= cid < len(config.CLASSES) \
            else "Unknown"
        color = config.get_class_color(name)
        x1, y1, x2, y2 = (int(round(float(v))) for v in box[:4])
        cv2.rectangle(frame, (x1, y1), (x2, y2), color, thickness)
        label = f"{name} {float(score):.2f}"
        (tw, th), _ = cv2.getTextSize(label, _FONT, 0.5, 1)
        cv2.rectangle(frame, (x1, y1 - th - 6), (x1 + tw + 2, y1), color, -1)
        cv2.putText(frame, label, (x1 + 1, y1 - 4), _FONT, 0.5,
                    (0, 0, 0), 1, cv2.LINE_AA)
    return frame


def draw_tracks(frame: np.ndarray,
                tracks: Iterable[Tuple[int, int, int, int, int, str, float]],
                thickness: int = 2) -> np.ndarray:
    """Draw tracked boxes labeled ``ID:{id} {class} {conf}`` (parity with
    reference draw_tracks label format, visualization.py:72-124)."""
    for (x1, y1, x2, y2, track_id, class_name, conf) in tracks:
        color = config.get_track_color(class_name)
        cv2.rectangle(frame, (x1, y1), (x2, y2), color, thickness)
        label = f"ID:{track_id} {class_name} {conf:.2f}"
        (tw, th), _ = cv2.getTextSize(label, _FONT, config.FONT_SCALE_ID, 1)
        y_text = max(y1, th + 8)
        cv2.rectangle(frame, (x1, y_text - th - 8), (x1 + tw + 4, y_text),
                      color, -1)
        cv2.putText(frame, label, (x1 + 2, y_text - 4), _FONT,
                    config.FONT_SCALE_ID, (0, 0, 0), 1, cv2.LINE_AA)
    return frame


def draw_fps(frame: np.ndarray, fps: float,
             position: Tuple[int, int] = (10, 30)) -> np.ndarray:
    """FPS overlay (reference visualization.py:127-168)."""
    cv2.putText(frame, f"FPS: {fps:.1f}", position, _FONT,
                config.FONT_SCALE_INFO, (0, 255, 0),
                config.FONT_THICKNESS, cv2.LINE_AA)
    return frame


def draw_info_panel(frame: np.ndarray, lines: Sequence[str],
                    origin: Tuple[int, int] = (10, 10)) -> np.ndarray:
    """Multi-line top-left info panel with a background box (reference
    visualization.py:170-228)."""
    if not lines:
        return frame
    pad = 8
    line_h = 26
    width = 0
    for line in lines:
        (tw, _), _ = cv2.getTextSize(line, _FONT, 0.6, 1)
        width = max(width, tw)
    x0, y0 = origin
    x1 = x0 + width + 2 * pad
    y1 = y0 + line_h * len(lines) + pad
    overlay = frame.copy()
    cv2.rectangle(overlay, (x0, y0), (x1, y1), (0, 0, 0), -1)
    cv2.addWeighted(overlay, 0.55, frame, 0.45, 0, frame)
    for i, line in enumerate(lines):
        cv2.putText(frame, line, (x0 + pad, y0 + pad + line_h * i + 14),
                    _FONT, 0.6, (255, 255, 255), 1, cv2.LINE_AA)
    return frame
