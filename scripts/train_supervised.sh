#!/bin/bash
# Supervised training: restarts the trainer when the in-process watchdog
# aborts (exit 42) on a stalled TPU relay, resuming exactly from the orbax
# TrainState checkpoint when one exists.
OUT="${OUT:-runs/v8n_640}"
ARGS=("$@")
while true; do
  if [ -f runs/STOP ]; then
    echo "runs/STOP present; supervisor exiting"
    exit 0
  fi
  RESUME=()
  if [ -d "$OUT/state" ]; then
    RESUME=(--resume-state "$OUT/state")
  elif [ -f "$OUT/last.msgpack" ]; then
    RESUME=(--resume "$OUT/last.msgpack")
  fi
  python scripts/train_model.py --out "$OUT" --save-state-every 1 \
      "${RESUME[@]}" "${ARGS[@]}"
  code=$?
  # Restart-and-resume on: 42 (in-process watchdog / RSS hygiene),
  # 137 (SIGKILL, i.e. the kernel OOM killer — the relay client leaks host
  # memory per step), 143 (SIGTERM). Anything else is a real failure.
  case $code in
    42|137|143) ;;
    *)
      echo "trainer exited with code $code; stopping supervisor"
      exit $code
      ;;
  esac
  echo "trainer exited $code; restarting with resume..."
  sleep 10
done
