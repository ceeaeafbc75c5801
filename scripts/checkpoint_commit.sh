#!/bin/bash
# Periodically snapshot the training run's best checkpoint + history into
# git so a machine reset cannot lose training progress (runs/ is gitignored;
# assets/ is tracked). Safe to run alongside interactive git use: it retries
# on index-lock contention and commits only when the checkpoint changed.
OUT="${OUT:-runs/v8n_640}"
INTERVAL="${INTERVAL:-1500}"
cd "$(dirname "$0")/.." || exit 1
mkdir -p assets/weights
while true; do
  sleep "$INTERVAL"
  SRC="$OUT/best.msgpack"
  [ -f "$SRC" ] || SRC="$OUT/last.msgpack"
  [ -f "$SRC" ] || continue
  cp "$SRC" assets/weights/v8n_640_best.msgpack.tmp
  # Never commit a torn snapshot: verify the copy parses as msgpack (the
  # writer may not be atomic in older trainer processes).
  if ! PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
from flax import serialization
serialization.msgpack_restore(open('assets/weights/v8n_640_best.msgpack.tmp','rb').read())
" 2>/dev/null; then
    rm -f assets/weights/v8n_640_best.msgpack.tmp
    continue
  fi
  if ! cmp -s assets/weights/v8n_640_best.msgpack.tmp assets/weights/v8n_640_best.msgpack 2>/dev/null; then
    mv assets/weights/v8n_640_best.msgpack.tmp assets/weights/v8n_640_best.msgpack
    [ -f "$OUT/history.json" ] && cp "$OUT/history.json" assets/weights/history.json
    for i in 1 2 3; do
      git add assets/weights/v8n_640_best.msgpack assets/weights/history.json 2>/dev/null \
        && git commit -m "training checkpoint snapshot ($(date -u +%H:%M))" --only \
             assets/weights/v8n_640_best.msgpack assets/weights/history.json \
        && break
      sleep 20
    done
  else
    rm -f assets/weights/v8n_640_best.msgpack.tmp
  fi
done
