#!/bin/bash
# Bank a real driver-grade bench the moment the TPU relay tunnel returns
# (VERDICT r3 #1: the scoreboard number must be captured early and often,
# not only at the round boundary). Reserves the chip via the fresh
# runs/STOP convention the training chains respect (<30 min = reserved),
# keeps the flag fresh while the bench runs, then releases it so the
# chains relaunch training.
set -u
cd "$(dirname "$0")/.."

while ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; do
  sleep 60
done
echo "relay up at $(date -u +%FT%TZ); reserving chip and benching"

touch runs/STOP
( while true; do sleep 300; touch runs/STOP; done ) &
KEEPALIVE=$!
trap 'kill "$KEEPALIVE" 2>/dev/null; rm -f runs/STOP' EXIT

python bench.py > /tmp/bench_r4_first.json 2> /tmp/bench_r4_first.err
echo "bench exit=$?: $(tail -c 2000 /tmp/bench_r4_first.json)"
