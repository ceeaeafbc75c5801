#!/bin/bash
# Relay-outage contingency (VERDICT r4 #8): run ONE short-budget CPU
# study row (v8n@192, 10 epochs) while the chip is unreachable, and
# SIGTERM it the moment the relay returns so round3b_chain's
# wait_for_training_idle is never blocked by a CPU probe when real chip
# training can run.
set -u
cd "$(dirname "$0")/.."
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu nohup python scripts/train_model.py \
  --imgsz 192 --batch 32 --epochs 10 --close-mosaic 2 \
  --eval-every 5 --eval-images 256 --workers 2 \
  --out runs/v8n_192_cpu_study > runs/v8n_192_cpu_study.log 2>&1 &
PID=$!
echo $PID > /tmp/cpu_study.pid
echo "cpu study trainer pid $PID"
while kill -0 "$PID" 2>/dev/null; do
  if timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/8093" 2>/dev/null; then
    echo "relay returned; stopping CPU study trainer $PID"
    kill "$PID"; sleep 15; kill -9 "$PID" 2>/dev/null
    exit 0
  fi
  sleep 30
done
echo "cpu study trainer exited on its own"
