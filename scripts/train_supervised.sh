#!/bin/bash
# Supervised training: restarts the trainer when the in-process watchdog
# aborts (exit 42) on a stalled TPU relay, resuming exactly from the orbax
# TrainState checkpoint when one exists.
OUT="${OUT:-runs/v8n_640}"
ARGS=("$@")
while true; do
  RESUME=()
  if [ -d "$OUT/state" ]; then
    RESUME=(--resume-state "$OUT/state")
  elif [ -f "$OUT/last.msgpack" ]; then
    RESUME=(--resume "$OUT/last.msgpack")
  fi
  python scripts/train_model.py --out "$OUT" --save-state-every 1 \
      "${RESUME[@]}" "${ARGS[@]}"
  code=$?
  if [ $code -ne 42 ]; then
    echo "trainer exited with code $code; stopping supervisor"
    exit $code
  fi
  echo "trainer watchdog abort; restarting with resume..."
  sleep 10
done
