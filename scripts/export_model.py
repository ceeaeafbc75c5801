#!/usr/bin/env python
"""Export a trained checkpoint to a deployable artifact.

Counterpart of the reference's model/export.py (best.pt -> TFLite). Here the
portable format is StableHLO via jax.export — a serialized, version-stable
compiled program of the full inference chain (letterbox -> forward -> decode),
plus the msgpack weights themselves.

Usage:
  python scripts/export_model.py --weights runs/v8n_640/best.msgpack \
      --out runs/v8n_640/export [--imgsz 640] [--frame-hw 1280 720]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--arch", default="yolov8n-seg")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--frame-hw", type=int, nargs=2, default=(1280, 720))
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from vision_assist_tpu.config import ModelConfig
    from vision_assist_tpu.models.checkpoint import load_variables, save_variables
    from vision_assist_tpu.models.inference import Segmenter

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    variables = load_variables(args.weights)
    cfg = ModelConfig(arch=args.arch, imgsz=args.imgsz)
    seg = Segmenter(cfg, variables=variables, example_hw=tuple(args.frame_hw))

    frame = jnp.zeros((*args.frame_hw, 3), jnp.uint8)

    def infer(frame):
        res = seg._frame_chain(seg.variables, frame)
        return (res.occupancy, res.detections.boxes, res.detections.scores,
                res.detections.valid)

    exported = jax_export.export(jax.jit(infer))(frame)
    blob = exported.serialize()
    (out / "inference.stablehlo").write_bytes(blob)
    save_variables(out / "variables.msgpack", variables)
    print(f"exported StableHLO ({len(blob)} bytes) and "
          f"weights to {out}/")
    print(f"  platforms: {exported.platforms}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
