#!/bin/bash
# Bank the chip artifacts the moment the TPU relay tunnel returns
# (VERDICT r3 #1/#3/#4: capture early and often, not only at the round
# boundary). Order: scoreboard bench first, then the serving-detection
# count on the real device, then the device-time p50 profile (long fresh
# compiles over the relay, so it goes last). Reserves the chip via the
# fresh runs/STOP convention the training chains respect (<30 min =
# reserved), keeps the flag fresh throughout, then releases it so the
# chains relaunch training.
set -u
cd "$(dirname "$0")/.."

while ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; do
  sleep 60
done
echo "relay up at $(date -u +%FT%TZ); reserving chip"

touch runs/STOP
# The keepalive checks its parent each cycle: a SIGKILL of the watcher
# (OOM killer) must not leave an orphan touching runs/STOP forever, which
# would block every training chain's idle-wait permanently.
PARENT=$$
( while kill -0 "$PARENT" 2>/dev/null; do touch runs/STOP; sleep 300; done ) &
KEEPALIVE=$!
trap 'kill "$KEEPALIVE" 2>/dev/null; rm -f runs/STOP' EXIT

echo "=== bench ==="
timeout 7200 python bench.py > /tmp/bench_r4_first.json 2> /tmp/bench_r4_first.err
echo "bench exit=$?: $(tail -c 2000 /tmp/bench_r4_first.json)"

echo "=== serving detections (chip) ==="
timeout 3600 python tools/diagnose_detections.py chip \
  > /tmp/detections_r4.log 2>&1
echo "detections exit=$?: $(tail -n 1 /tmp/detections_r4.log)"

echo "=== device p50 ==="
timeout 10800 python tools/diagnose_device_p50.py \
  > /tmp/device_p50_r4.log 2>&1
echo "device_p50 exit=$?: $(tail -n 1 /tmp/device_p50_r4.log)"
echo "watcher done at $(date -u +%FT%TZ)"
