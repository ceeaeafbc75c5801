#!/bin/bash
# Trimmed end-of-round finalisation for a mid-round re-run: park training,
# full-evaluate ONLY the newly-trained last.msgpack (best was already
# full-evaluated this round), promote the better of (existing promoted best,
# new last), regenerate the model-in-the-loop artifacts, and re-bench.
# The heavyweight diagnostics (diagnose_{latency,fused,batch1,engines}) are
# NOT re-run: they were captured quiet-chip this round and do not depend on
# the weights.
#
# Usage: scripts/finalize_quick.sh [runs/v8n_640]
set -x
OUT="${1:-runs/v8n_640}"

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/stop_training.py
sleep 5

python - <<EOF
import json, pathlib, shutil
from vision_assist_tpu.utils.cache import enable; enable()
from vision_assist_tpu.models.checkpoint import load_variables
from vision_assist_tpu.models.evaluate import evaluate
from vision_assist_tpu.models.yolo import YoloSeg

model = YoloSeg(arch="yolov8n-seg", num_classes=1)
results_path = pathlib.Path("TRAINING_RESULTS.json")
result = json.loads(results_path.read_text())
prev = result["full_val"]

cand = pathlib.Path("$OUT/last.msgpack")
m = evaluate(model, load_variables(cand), "/root/reference/model",
             "valid", imgsz=640, batch_size=16, verbose=True)
print(f"FULL VAL {cand}:", json.dumps(m))
hp = pathlib.Path("$OUT/history.json")
history = json.loads(hp.read_text()) if hp.exists() else []
if m["map50_mask"] > prev["map50_mask"]:
    shutil.copy(cand, "assets/weights/v8n_640_best.msgpack")
    result["full_val"] = m
    print("promoted", cand)
else:
    print("kept previously promoted best", prev)
result["epochs_completed"] = history[-1]["epoch"] if history else None
result["extension_run"] = {
    "note": "cosine warm restart epochs 81..115 after the 80-epoch run",
    "last_full_val": m,
}
results_path.write_text(json.dumps(result, indent=1))
# also eval the in-run best if it changed vs last (subset-eval promotions)
best = pathlib.Path("$OUT/best.msgpack")
if best.exists() and best.read_bytes() != cand.read_bytes():
    mb = evaluate(model, load_variables(best), "/root/reference/model",
                  "valid", imgsz=640, batch_size=16, verbose=True)
    print(f"FULL VAL {best}:", json.dumps(mb))
    if mb["map50_mask"] > result["full_val"]["map50_mask"]:
        shutil.copy(best, "assets/weights/v8n_640_best.msgpack")
        result["full_val"] = mb
        result["extension_run"]["best_full_val"] = mb
        print("promoted", best)
    results_path.write_text(json.dumps(result, indent=1))
EOF

# The snapshotter's history copy is a single-run recovery artifact with no
# arch label; replace it with a labelled per-run dict now that both runs are
# final.
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import json, pathlib
out = {}
for run in ("v8n_640", "y11n_256"):
    p = pathlib.Path(f"runs/{run}/history.json")
    if p.exists():
        out[run] = json.loads(p.read_text())
pathlib.Path("assets/weights/history.json").write_text(json.dumps(out))
EOF

for RUN in "$OUT"; do
  if [ -f "$RUN/history.json" ]; then
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/plot_training.py \
        "$RUN/history.json" -o "assets/$(basename "$RUN")_training_curves.png" \
        --csv "assets/$(basename "$RUN")_results.csv" || true
  fi
done

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/generate_model_goldens.py || true
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/test_model_goldens.py -q || true
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/generate_video_golden.py || true
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/test_video_golden.py -q || true

python scripts/render_demo.py -n 6 --out assets/demo || true

python bench.py
