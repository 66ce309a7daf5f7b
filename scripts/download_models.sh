#!/usr/bin/env bash
# Fetch the ONNX model weights (same files the reference consumes:
# reference scripts/download_models.sh:7-8,27-44 pulls yolov8n.onnx and
# deepsort.onnx from the nabang1010/YOLO_Object_Tracking_TensorRT release).
#
# AICamera-TPU imports these ONNX files directly (aicamera_tpu/models/
# onnx_import.py) — no TensorRT build step; the XLA compile cache is warmed
# by scripts/warm_compile_cache.py instead (the trtexec analog).
set -euo pipefail

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
DET_DIR="$ROOT/models/detection"
REID_DIR="$ROOT/models/reid"
mkdir -p "$DET_DIR" "$REID_DIR"

BASE_URL="https://github.com/nabang1010/YOLO_Object_Tracking_TensorRT/releases/download/model_n"

fetch() {
    local url="$1" out="$2"
    if [[ -f "$out" ]]; then
        echo "already present: $out"
        return
    fi
    echo "downloading $url -> $out"
    curl -L --fail --retry 3 -o "$out" "$url"
}

fetch "$BASE_URL/yolov8n.onnx" "$DET_DIR/yolov8n.onnx"
fetch "$BASE_URL/deepsort.onnx" "$REID_DIR/deepsort_reid.onnx"

echo "done. Convert + warm the XLA cache with:"
echo "  python scripts/warm_compile_cache.py"
