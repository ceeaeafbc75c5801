#!/bin/bash
# Periodically snapshot the training run's best checkpoint + history into a
# dedicated git ref (refs/heads/ckpt) so a machine reset cannot lose training
# progress (runs/ is gitignored). The ref is FORCE-UPDATED each time via a
# temporary index: main's history stays free of multi-MB snapshot commits
# (they land on main exactly once, at finalize), and the working tree / main
# index are never touched, so this is safe alongside interactive git use.
#
# Recovery after a reset:
#   git checkout ckpt -- assets/weights/   # newest snapshot
OUT="${OUT:-runs/v8n_640}"
# Asset basename for the snapshot (y11n stage: NAME=y11n_256_best).
NAME="${NAME:-v8n_640_best}"
INTERVAL="${INTERVAL:-1500}"
cd "$(dirname "$0")/.." || exit 1
mkdir -p assets/weights
REPO_ROOT="$(pwd)"
PREV_SUM=""
while true; do
  sleep "$INTERVAL"
  SRC="$OUT/best.msgpack"
  [ -f "$SRC" ] || SRC="$OUT/last.msgpack"
  [ -f "$SRC" ] || continue
  cp "$SRC" assets/weights/${NAME}.msgpack.tmp
  # Never snapshot torn files: the checkpoint must parse as msgpack and the
  # history copy must parse as JSON (the trainer writes both atomically now,
  # but older processes / partial copies are still guarded against).
  if ! PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
from flax import serialization
serialization.msgpack_restore(open('assets/weights/${NAME}.msgpack.tmp','rb').read())
" 2>/dev/null; then
    rm -f assets/weights/${NAME}.msgpack.tmp
    continue
  fi
  SUM=$(sha256sum assets/weights/${NAME}.msgpack.tmp | cut -d' ' -f1)
  if [ "$SUM" = "$PREV_SUM" ]; then
    rm -f assets/weights/${NAME}.msgpack.tmp
    continue
  fi
  mv assets/weights/${NAME}.msgpack.tmp assets/weights/${NAME}.msgpack
  if [ -f "$OUT/history.json" ]; then
    cp "$OUT/history.json" assets/weights/history.json.tmp
    if python -c "import json,sys; json.load(open('assets/weights/history.json.tmp'))" 2>/dev/null; then
      mv assets/weights/history.json.tmp assets/weights/history.json
    else
      rm -f assets/weights/history.json.tmp
    fi
  fi
  # Build the snapshot commit with a scratch index; force-update the ckpt ref.
  export GIT_INDEX_FILE="$REPO_ROOT/.git/ckpt-index"
  rm -f "$GIT_INDEX_FILE"
  git read-tree HEAD 2>/dev/null
  git update-index --add assets/weights/${NAME}.msgpack \
      $( [ -f assets/weights/history.json ] && echo assets/weights/history.json )
  TREE=$(git write-tree)
  COMMIT=$(echo "training checkpoint snapshot ($(date -u +%H:%M))" | \
           git commit-tree "$TREE" -p HEAD)
  git update-ref refs/heads/ckpt "$COMMIT"
  unset GIT_INDEX_FILE
  PREV_SUM="$SUM"
  echo "snapshotted $SRC -> ckpt ref $COMMIT" >&2
done
