#!/bin/bash
# Run the two training recipes back to back under the crash-resuming
# supervisor: yolov8n-seg @ 640 (the reference's deployed train11 recipe),
# then yolo11n-seg @ 256 (its train16 recipe, 0.8103 mAP50(M) baseline).
# Both resume exactly from their orbax state if partially done.
# Launch detached: nohup bash scripts/queue_y11n.sh > runs/chain.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
# Resume from the healthy epoch-20 best of the collapsed run (the round-2
# run died at epoch 40 — see TRAINING.md "model collapse"; the trainer now
# carries a collapse guard + TAL minimum assignment so a recurrence reverts
# instead of poisoning the run).
OUT=runs/v8n_640 bash scripts/train_supervised.sh \
    --epochs 80 --eval-every 10 --eval-images 256 --max-rss-gb 100 \
    --resume runs/v8n_640_collapsed/best.msgpack
echo "v8n_640 finished (rc=$?); launching yolo11n-seg @ 256" >&2
OUT=runs/y11n_256 exec bash scripts/train_supervised.sh \
    --arch yolo11n-seg --imgsz 256 --epochs 150 --batch 64 \
    --eval-every 10 --eval-images 256 --max-rss-gb 100
