#!/bin/bash
# Run the two training recipes back to back under the crash-resuming
# supervisor: yolov8n-seg @ 640 (the reference's deployed train11 recipe),
# then yolo11n-seg @ 256 (its train16 recipe, 0.8103 mAP50(M) baseline).
# Both resume exactly from their orbax state if partially done.
# Launch detached: nohup bash scripts/queue_y11n.sh > runs/chain.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
OUT=runs/v8n_640 bash scripts/train_supervised.sh \
    --epochs 100 --eval-every 10 --eval-images 256 --max-rss-gb 100 \
    --resume assets/weights/v8n_640_best.msgpack
echo "v8n_640 finished (rc=$?); launching yolo11n-seg @ 256" >&2
OUT=runs/y11n_256 exec bash scripts/train_supervised.sh \
    --arch yolo11n-seg --imgsz 256 --epochs 150 --batch 64 \
    --eval-every 10 --eval-images 256 --max-rss-gb 100
