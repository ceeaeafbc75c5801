#!/bin/bash
# End-of-round finalisation: stop training, promote the best checkpoint,
# run the full validation eval, and run the benchmark.
#
# Usage: scripts/finalize_round.sh [runs/v8n_640]
set -x
OUT="${1:-runs/v8n_640}"

# Stop helpers by exact argv match — NEVER by pattern (pkill -f can match
# unrelated processes whose -c string mentions these names).
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/stop_training.py
sleep 5

mkdir -p assets/weights
ls -la assets/weights/

python - <<EOF
import json, pathlib, shutil
from vision_assist_tpu.utils.cache import enable; enable()
from vision_assist_tpu.models.checkpoint import load_variables
from vision_assist_tpu.models.evaluate import evaluate
from vision_assist_tpu.models.yolo import YoloSeg

model = YoloSeg(arch="yolov8n-seg", num_classes=1)

# "best" was selected on a noisy 256-image eval subset during training;
# full-evaluate best AND last and promote whichever truly scores higher.
candidates = [p for p in (pathlib.Path("$OUT/best.msgpack"),
                          pathlib.Path("$OUT/last.msgpack")) if p.exists()]
if not candidates:
    candidates = [pathlib.Path("assets/weights/v8n_640_best.msgpack")]
scored = []
for p in candidates:
    mm = evaluate(model, load_variables(p), "/root/reference/model",
                  "valid", imgsz=640, batch_size=16, verbose=True)
    print(f"FULL VAL {p}:", json.dumps(mm))
    scored.append((mm["map50_mask"], str(p), mm))
scored.sort(reverse=True)
_, chosen, m = scored[0]
shutil.copy(chosen, "assets/weights/v8n_640_best.msgpack")
print("promoted", chosen)

history = []
hp = pathlib.Path("$OUT/history.json")
if hp.exists():
    history = json.loads(hp.read_text())
result = {
    "full_val": m,
    "arch": "yolov8n-seg",
    "imgsz": 640,
    "epochs_completed": history[-1]["epoch"] if history else None,
    "training": "from scratch on the bundled sidewalk dataset (the "
                "reference's COCO-pretrained best.pt is not in its repo; "
                "its SavedModels are 4KB stubs). Lineage: 12 round-1 epochs "
                "-> round-2 run to epoch 40 (collapsed; archived in "
                "runs/v8n_640_collapsed, see TRAINING.md) -> restart from "
                "its healthy epoch-20 best with collapse guards, so "
                "effective epochs = epochs_completed + 32",
    "reference_baseline": {
        "map50_mask": 0.8588, "map50_95_mask": 0.7337,
        "map50_box": 0.8644, "map50_95_box": 0.7751,
        "source": "reference model/runs/segment/train11/results.csv final "
                  "row (COCO-pretrained, 100 epochs)",
    },
    "eval_protocol": "models/evaluate.py — conf 0.001, IoU 0.7, max_det "
                     "300, full valid split (1059 images), mask IoU at "
                     "prototype resolution",
}
# Second architecture (yolo11n-seg @ 256 — the reference's train16 recipe,
# 0.8103 mAP50(M) baseline), when that run exists.
sp = pathlib.Path("runs/y11n_256/best.msgpack")
if not sp.exists():
    sp = pathlib.Path("runs/y11n_256/last.msgpack")
if sp.exists():
    import shutil
    shutil.copy(sp, "assets/weights/y11n_256_best.msgpack")
    v2 = load_variables("assets/weights/y11n_256_best.msgpack")
    m2 = evaluate(YoloSeg(arch="yolo11n-seg", num_classes=1), v2,
                  "/root/reference/model", "valid", imgsz=256,
                  batch_size=32, verbose=True)
    print("FULL VAL (yolo11n-seg@256):", json.dumps(m2))
    h2p = pathlib.Path("runs/y11n_256/history.json")
    h2 = json.loads(h2p.read_text()) if h2p.exists() else []
    result["second_arch"] = {
        "arch": "yolo11n-seg", "imgsz": 256, "full_val": m2,
        "epochs_completed": h2[-1]["epoch"] if h2 else None,
        "reference_baseline": {
            "map50_mask": 0.8103,
            "source": "reference model/runs/segment/train16/results.csv "
                      "final row (COCO-pretrained, 150 epochs)",
        },
    }

open("TRAINING_RESULTS.json", "w").write(json.dumps(result, indent=1))
EOF

# Training curves + results.csv-style table (ultralytics results.png twin).
for RUN in "$OUT" runs/y11n_256; do
  if [ -f "$RUN/history.json" ]; then
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/plot_training.py \
        "$RUN/history.json" -o "assets/$(basename "$RUN")_training_curves.png" \
        --csv "assets/$(basename "$RUN")_results.csv" || true
  fi
done

# Pin model-in-the-loop goldens with the promoted weights (CPU numerics —
# the test suite replays them on CPU) and check they replay green.
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/generate_model_goldens.py || true
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/test_model_goldens.py -q || true

# Multi-frame VIDEO golden (temporal-memory effects across a pseudo-clip,
# BASELINE config 2 spirit) with the promoted weights.
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/generate_video_golden.py || true
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/test_video_golden.py -q || true

# Refresh latency diagnostics on the now-quiet chip (earlier numbers taken
# while the trainer shared the relay are contaminated — see
# diagnostics/batch1_latency.json).
python tools/diagnose_latency.py || true
python tools/diagnose_fused.py || true
python tools/diagnose_batch1.py || true
# All three pathfinding engines measured on the quiet chip — the served
# default is a published, measured choice (diagnostics/engine_latency.json).
python tools/diagnose_engines.py || true

# End-to-end demo overlays on real val photos with the promoted weights
# (one process, one compile).
python scripts/render_demo.py -n 6 --out assets/demo || true

python bench.py

# Per-stage timing artifact on the real chip (reference timing_data.txt
# format + raw samples for the box-plot tool).
python tools/profile_pipeline.py --frames 40 --engine exact \
    --timing-data-path timing_data_tpu.txt \
    --samples-path timing_samples_tpu.json || true
python tools/profile_pipeline.py --frames 40 --engine wavefront \
    --timing-data-path timing_data_tpu_wavefront.txt \
    --samples-path timing_samples_tpu_wavefront.json || true
