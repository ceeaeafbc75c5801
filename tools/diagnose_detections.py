#!/usr/bin/env python
"""Serving-detection count on the REAL device chain (VERDICT r3 #3).

Runs the exact serving path bench.py times (fused bf16 frame program,
i420 transfer, trained weights) over the 30 bench frames and records how
many produce >=1 surviving detection at the serving conf threshold. The
round-3 23/30 figure was measured on CPU-f32 during a relay outage; this
tool pins the number on whatever backend actually executes and stamps the
device so the chip bf16 figure is unambiguous.

Writes diagnostics/serving_detections_<tag>.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def parse_args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tag", nargs="?", default="current",
                    help="suffix for diagnostics/serving_detections_<tag>.json")
    ap.add_argument("--weights", default=None,
                    help="checkpoint path (default: the promoted flagship)")
    ap.add_argument("--arch", default=None,
                    help="model arch (default: flagship record)")
    ap.add_argument("--imgsz", type=int, default=None,
                    help="on-device letterbox target (default: flagship)")
    return ap.parse_args()


def main() -> None:
    args = parse_args()
    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    import jax

    from vision_assist_tpu.config import PipelineConfig
    from vision_assist_tpu.models import flagship as flagship_mod
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

    from bench import load_frames, ensure_quiet_chip

    quiet = ensure_quiet_chip()
    device = jax.devices()[0]
    frame_h = frame_w = 640
    cfg = PipelineConfig(frame_height=frame_h, frame_width=frame_w,
                         transfer_format="i420")
    # Model selection: the promoted flagship record by default (the same
    # checkpoint bench.py serves), overridable for pre-promotion A/B runs.
    flag = flagship_mod.flagship()
    weights = pathlib.Path(args.weights) if args.weights else (
        flagship_mod.weights_path() or REPO / "assets" / "weights" / flag["asset"])
    mcfg = flagship_mod.model_config(
        **{k: v for k, v in (("arch", args.arch), ("imgsz", args.imgsz))
           if v is not None})
    variables = None
    if weights.exists():
        from vision_assist_tpu.models.checkpoint import load_variables
        variables = load_variables(weights)
    seg = Segmenter(mcfg, variables=variables,
                    example_hw=(frame_h, frame_w),
                    grid_size=cfg.grid.grid_size)
    fp = FrameProcessor(cfg, segmenter=seg)

    n = 30
    frames = load_frames(n, (frame_h, frame_w))
    det, answers = 0, []
    for i in range(n):
        res = fp(frames[i], now_ms=1000 + i * 33)
        det += int(res.n_detections > 0)
        answers.append(res.final_answer)
    tag = args.tag
    out = {
        "frames_with_detections": f"{det}/{n}",
        "weights": str(weights) if weights.exists() else "random-init",
        "arch": mcfg.arch,
        "imgsz": mcfg.imgsz,
        "conf": mcfg.conf_threshold,
        "answers_nonempty": sum(1 for a in answers if a),
        "transfer_format": cfg.transfer_format,
        "device": str(device),
        "platform": jax.devices()[0].platform,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **quiet,
    }
    path = REPO / "diagnostics" / f"serving_detections_{tag}.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
