#!/bin/bash
# Generic relay-abort CPU study stage (round-5 outage contingency).
# Usage: IMGSZ=256 EPOCHS=5 LR=0.003 BATCH=24 RESUME=<ckpt> OUT=<run> bash scripts/cpu_study_stage.sh
set -u
cd "$(dirname "$0")/.."
RESUME_ARGS=()
[ -n "${RESUME:-}" ] && RESUME_ARGS=(--resume "$RESUME")
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu nohup python scripts/train_model.py \
  --imgsz "${IMGSZ:?}" --batch "${BATCH:-24}" --epochs "${EPOCHS:?}" \
  --lr0 "${LR:-0.003}" --close-mosaic "${CLOSE:-2}" \
  --eval-every 5 --eval-images 256 --workers 2 \
  "${RESUME_ARGS[@]}" \
  --out "runs/${OUT:?}" > "runs/${OUT}.log" 2>&1 &
PID=$!
echo $PID > /tmp/cpu_study.pid
echo "cpu study stage ${OUT} pid $PID"
while kill -0 "$PID" 2>/dev/null; do
  if timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/8093" 2>/dev/null; then
    echo "relay returned; stopping CPU study trainer $PID"
    kill "$PID"; sleep 15; kill -9 "$PID" 2>/dev/null
    exit 0
  fi
  sleep 30
done
echo "cpu study stage ${OUT} exited on its own"
