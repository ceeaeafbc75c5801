#!/bin/bash
# Extension of the round-5 CPU study row: 10 more epochs at lower LR from
# the 10-epoch checkpoint (params-only resume; fresh short cosine), same
# relay-abort contract as cpu_study_wrapper.sh.
set -u
cd "$(dirname "$0")/.."
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu nohup python scripts/train_model.py \
  --imgsz 192 --batch 32 --epochs 10 --lr0 0.004 --close-mosaic 4 \
  --eval-every 5 --eval-images 256 --workers 2 \
  --resume runs/v8n_192_cpu_study/best.msgpack \
  --out runs/v8n_192_cpu_study_ext > runs/v8n_192_cpu_study_ext.log 2>&1 &
PID=$!
echo $PID > /tmp/cpu_study.pid
echo "cpu study extension pid $PID"
while kill -0 "$PID" 2>/dev/null; do
  if timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/8093" 2>/dev/null; then
    echo "relay returned; stopping CPU study trainer $PID"
    kill "$PID"; sleep 15; kill -9 "$PID" 2>/dev/null
    exit 0
  fi
  sleep 30
done
echo "cpu study extension exited on its own"
