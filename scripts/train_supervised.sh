#!/bin/bash
# Supervised training: restarts the trainer when the in-process watchdog
# aborts (exit 42) on a stalled TPU relay, resuming exactly from the orbax
# TrainState checkpoint when one exists.
OUT="${OUT:-runs/v8n_640}"
ARGS=("$@")
# A stale runs/STOP from a previous stop_training.py would make this loop
# exit 0 immediately at both queue stages; a fresh launch is an explicit
# request to train, so clear it (ADVICE r2: stale-STOP silent no-op).
rm -f runs/STOP
# Crash-atomic state recovery: dying between rename(state->state_prev) and
# rename(state_new->state) leaves no $OUT/state and the resume silently
# falls back to params-only (step 0). Orbax commits the directory by rename,
# so whichever rotation dir exists is a complete checkpoint — prefer the
# newer one (ADVICE r2).
if [ ! -d "$OUT/state" ]; then
  if [ -d "$OUT/state_new" ]; then
    echo "recovering interrupted state rotation: state_new -> state"
    mv "$OUT/state_new" "$OUT/state"
  elif [ -d "$OUT/state_prev" ]; then
    echo "recovering interrupted state rotation: state_prev -> state"
    mv "$OUT/state_prev" "$OUT/state"
  fi
fi
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
  # RESUME after ARGS: argparse is last-wins, and chain launchers put their
  # own "--resume assets/weights/<best>" in ARGS. On a crash-restart the
  # run's OWN progress ($OUT/state, else $OUT/last.msgpack) must take
  # precedence over the schedule's initial checkpoint, or a damaged run
  # silently restarts from the committed best at step 0 while history.json
  # still claims high epochs.
  python scripts/train_model.py --out "$OUT" --save-state-every 1 \
      "${ARGS[@]}" "${RESUME[@]}"
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
