#!/bin/bash
# Bank the chip artifacts the moment the TPU relay tunnel returns
# (VERDICT r3 #1/#3/#4: capture early and often, not only at the round
# boundary). Order: scoreboard bench first, then the serving-detection
# count on the real device, then the device-time p50 profile (long fresh
# compiles over the relay, so it goes last), then COMMIT the banked
# artifacts (VERDICT r4 #6: a crash after banking must not lose them).
# Reserves the chip via the fresh runs/STOP convention the training
# chains respect (<30 min = reserved), keeps the flag fresh throughout,
# then releases it so the chains relaunch training.
#
# Rehearsal mode (VERDICT r4 #6 — "its first real firing must not be its
# first execution"): REHEARSAL=1 RELAY_PORT=<mock port> runs the SAME
# banking path end-to-end against a mock TCP listener with the CPU
# backend, short budgets, and rehearsal-suffixed artifact paths so no
# real-chip artifact can be clobbered.
set -u
cd "$(dirname "$0")/.."

# Single-instance lock (per mode): repeated nohup launches across
# sessions left several watchers polling concurrently; on relay return
# they would all fire and race the bench/STOP lifecycle. First instance
# wins. The rehearsal gets its own lock so it can run while the real
# watcher polls the real port.
mkdir -p runs
if [ "${REHEARSAL:-0}" = "1" ]; then LOCK=runs/watcher_rehearsal.lock; else LOCK=runs/watcher.lock; fi
exec 9>"$LOCK"
if ! flock -n 9; then
  echo "another watcher holds $LOCK; exiting"
  exit 0
fi

REHEARSAL="${REHEARSAL:-0}"
RELAY_PORT="${RELAY_PORT:-8093}"
if [ "$REHEARSAL" = "1" ]; then
  TAG="rehearsal_cpu"
  P50_OUT="diagnostics/device_p50_rehearsal.json"
  WIRE_OUT="diagnostics/wire_ceiling_rehearsal.json"
  BENCH_T=1800; DET_T=900; P50_T=1800; WIRE_T=600
  # CPU backend; skip relay registration. RELAY_PORT points bench at the
  # mock listener so its relay gate opens and the full measure path runs.
  export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
else
  TAG="chip"
  P50_OUT="diagnostics/device_p50.json"
  WIRE_OUT="diagnostics/wire_ceiling.json"
  BENCH_T=7200; DET_T=3600; P50_T=10800; WIRE_T=1800
fi
export RELAY_PORT
mkdir -p runs diagnostics

# Children close the lock fd (9>&-): a killed watcher must release the
# flock immediately, not when its orphaned sleep/python children exit
# (observed: an orphan `sleep 60` held the lock past its parent's death).
while ! timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/$RELAY_PORT" 2>/dev/null 9>&-; do
  sleep "${POLL_S:-60}" 9>&-
done
echo "relay up (port $RELAY_PORT) at $(date -u +%FT%TZ); reserving chip"

touch runs/STOP
# The keepalive checks its parent each cycle: a SIGKILL of the watcher
# (OOM killer) must not leave an orphan touching runs/STOP forever, which
# would block every training chain's idle-wait permanently.
PARENT=$$
( while kill -0 "$PARENT" 2>/dev/null; do touch runs/STOP; sleep 300; done ) 9>&- &
KEEPALIVE=$!
trap 'kill "$KEEPALIVE" 2>/dev/null; rm -f runs/STOP' EXIT

echo "=== bench ==="
timeout "$BENCH_T" python bench.py 9>&- \
  > "runs/watcher_bench_${TAG}.json" 2> "runs/watcher_bench_${TAG}.err"
echo "bench exit=$?: $(tail -c 2000 "runs/watcher_bench_${TAG}.json")"

echo "=== serving detections ($TAG) ==="
timeout "$DET_T" python tools/diagnose_detections.py "$TAG" 9>&- \
  > "runs/watcher_detections_${TAG}.log" 2>&1
echo "detections exit=$?: $(tail -n 1 "runs/watcher_detections_${TAG}.log")"

echo "=== device p50 ==="
timeout "$P50_T" python tools/diagnose_device_p50.py "$P50_OUT" 9>&- \
  > "runs/watcher_device_p50_${TAG}.log" 2>&1
echo "device_p50 exit=$?: $(tail -n 1 "runs/watcher_device_p50_${TAG}.log")"

echo "=== wire ceiling ==="
timeout "$WIRE_T" python tools/diagnose_wire.py "$WIRE_OUT" 9>&- \
  > "runs/watcher_wire_${TAG}.log" 2>&1
echo "wire exit=$?: $(tail -n 1 "runs/watcher_wire_${TAG}.log")"

echo "=== commit banked artifacts ==="
git add BENCH_LOCAL.json "$P50_OUT" "$WIRE_OUT" \
        "diagnostics/serving_detections_${TAG}.json" 2>/dev/null
# runs/ is gitignored — the step logs are round evidence, force-add them.
git add -f "runs/watcher_bench_${TAG}.json" "runs/watcher_detections_${TAG}.log" \
        "runs/watcher_device_p50_${TAG}.log" "runs/watcher_wire_${TAG}.log" \
        2>/dev/null
if [ "$REHEARSAL" = "1" ]; then
  MSG="Watcher rehearsal: banked CPU-backend bench + detections + device_p50 + wire"
else
  MSG="Bank chip artifacts on relay return: bench + detections + device_p50 + wire"
fi
git commit -m "$MSG" || echo "commit failed or nothing to commit"
echo "watcher done at $(date -u +%FT%TZ)"
