#!/bin/bash
# Waits for a specific (pre-existing, unsupervised) trainer PID to exit, then
# hands control to the auto-resuming supervisor. Used once after an in-place
# watchdog fix so the already-compiled trainer keeps its progress.
PID="$1"; shift
if [ -z "$PID" ] || ! [[ "$PID" =~ ^[0-9]+$ ]]; then
  echo "usage: babysit_trainer.sh <trainer-pid> [supervisor args...]" >&2
  exit 2
fi
# Guard against typos and already-recycled PIDs: the target must actually be
# the trainer, or we'd start a second trainer racing on the same run dir.
if ! tr '\0' ' ' < "/proc/$PID/cmdline" 2>/dev/null | grep -q "train_model.py"; then
  echo "PID $PID is not a running train_model.py process; refusing" >&2
  exit 2
fi
while kill -0 "$PID" 2>/dev/null; do sleep 20; done
echo "trainer $PID exited; starting supervisor with resume" >&2
exec bash "$(dirname "$0")/train_supervised.sh" "$@"
