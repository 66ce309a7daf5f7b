"""Run the clip-parity pipeline-agreement A/B (bf16 vs f32 detect) in ONE
TPU process (VERDICT r4 #1b): two full clip_parity passes — each arm
re-detects (batch-1 facade path), replays the reference TrackerCore, and
measures the chunked pipeline's agreement — with the detect forward at
the default bf16 and then at f32. One process sidesteps the
post-heavy-run backend-init stall (CLAUDE.md). Appends both metric lines
to benchmarks/clip_agreement.jsonl.

Usage: python scripts/run_parity_ab.py [--weights path] (TPU, sequential)
"""

import argparse
import gc
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=str(
        ROOT / "models" / "detection" / "yolov8n_clip_adapted.msgpack"))
    ap.add_argument("--json_out", default=str(
        ROOT / "benchmarks" / "clip_agreement.jsonl"))
    ap.add_argument("--arms", default="bf16,f32",
                    help="comma list; each arm is DTYPE[:PREPROC[:REID]] "
                         "(preproc in auto/xla/pallas for the pipeline "
                         "side — the facade side always letterboxes via "
                         "xla, so 'bf16:xla' removes the pallas-vs-xla "
                         "1-LSB input confound)")
    args = ap.parse_args()

    import clip_parity

    for arm in args.arms.split(","):
        parts = arm.split(":")
        dtype = parts[0]
        preproc = parts[1] if len(parts) > 1 else ""
        reid = parts[2] if len(parts) > 2 else ""
        bucket = parts[3] if len(parts) > 3 else ""
        chunk = parts[4] if len(parts) > 4 else ""
        argv = ["clip_parity.py", "--pipeline_check",
                "--weights", args.weights, "--json_out", args.json_out]
        if bucket != "":
            argv += ["--pipeline_scan_bucket", bucket]
        if chunk != "":
            argv += ["--pipeline_chunk", chunk]
        if dtype == "f32":
            argv.append("--f32_detect")
        if preproc:
            argv += ["--pipeline_preprocess", preproc]
        if reid == "f32":
            argv.append("--f32_reid")
        print(f"=== arm: {arm} ===", flush=True)
        sys.argv = argv
        try:
            clip_parity.main()
        except SystemExit as e:
            if e.code not in (0, None):
                raise
        gc.collect()


if __name__ == "__main__":
    main()
