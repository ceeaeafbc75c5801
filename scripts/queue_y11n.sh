#!/bin/bash
# Chain the second-architecture run: wait for the v8n_640 trainer to finish,
# then train yolo11n-seg @ 256 (the reference's train16 recipe: 150 epochs,
# imgsz 256 — its COCO-pretrained baseline is 0.8103 mAP50(M)).
# Launch detached: nohup bash scripts/queue_y11n.sh > runs/y11n_queue.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
while pgrep -f "train_model.py --out runs/v8n_640" > /dev/null; do
  sleep 60
done
echo "v8n_640 trainer finished; launching yolo11n-seg @ 256" >&2
OUT=runs/y11n_256 exec bash scripts/train_supervised.sh \
    --arch yolo11n-seg --imgsz 256 --epochs 150 --batch 64 \
    --eval-every 10 --eval-images 256
