#!/bin/bash
# End-of-round banking: permanently stop the training chains, then bank the
# full quiet-chip artifact bundle (bench -> detections -> device_p50 ->
# wire, committed by scripts/watch_relay_bench.sh) plus a quiet host-side
# stage breakdown. Run ~60-90 min before the round boundary so the driver's
# own bench.py scoreboard run finds a quiet chip and a fresh staged record.
set -u
cd "$(dirname "$0")/.."

echo "=== stop the endgame chain (no relaunches after this) ==="
if [ -f runs/endgame_chain.pid ]; then
  PID=$(cat runs/endgame_chain.pid)
  # Exact-PID with argv check: never a pattern kill.
  if ps -p "$PID" -o args= 2>/dev/null | grep -q "endgame_r5_chain.py"; then
    kill "$PID" && echo "killed endgame chain $PID"
  fi
fi
python scripts/stop_training.py
# Leave runs/STOP in place: with the chain dead nothing relaunches, and a
# fresh STOP keeps any straggler supervisor loop from starting a trainer.
touch runs/STOP

echo "=== bank the chip bundle (bench + detections + p50 + wire; commits) ==="
bash scripts/watch_relay_bench.sh

# The watcher's EXIT trap removes runs/STOP; re-raise it so no straggler
# supervisor loop can start a trainer during the remaining quiet window.
touch runs/STOP

echo "=== quiet host-side breakdown ==="
timeout 1800 python tools/diagnose_host_breakdown.py \
  && git add diagnostics/host_breakdown.json \
  && git commit -m "Quiet-chip host-breakdown re-measure at round end" \
  || echo "host breakdown failed or nothing to commit"

echo "banking done at $(date -u +%FT%TZ)"
