#!/bin/bash
# Waits for a specific (pre-existing, unsupervised) trainer PID to exit, then
# hands control to the auto-resuming supervisor. Used once after an in-place
# watchdog fix so the already-compiled trainer keeps its progress.
PID="$1"; shift
while kill -0 "$PID" 2>/dev/null; do sleep 20; done
echo "trainer $PID exited; starting supervisor with resume" >&2
exec bash "$(dirname "$0")/train_supervised.sh" "$@"
