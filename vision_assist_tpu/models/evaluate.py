"""Validation loop: jitted inference over the val split -> box/mask mAP.

Counterpart of ultralytics val (the source of BASELINE.md's mAP numbers).
Predictions use conf 0.001 / IoU 0.7 / max_det 300 like the reference's
validator; mask IoU is scored at prototype resolution (mask_ratio 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vision_assist_tpu.data.dataset import SegDataset, polygons_to_overlap_mask
from vision_assist_tpu.data.augment import letterbox_np
from vision_assist_tpu.models.decode import assemble_masks, decode_boxes, nms
from vision_assist_tpu.models.metrics import MapAccumulator
from vision_assist_tpu.models.yolo import YoloSeg


def make_eval_step(model: YoloSeg, imgsz: int, reg_max: int = 16,
                   max_det: int = 300):
    @jax.jit
    def eval_step(variables, images_u8):
        images = images_u8.astype(jnp.float32) / 255.0
        outs = model.apply(variables, images, train=False)
        boxes, cls_logits, coeffs = decode_boxes(outs, reg_max)

        def per_image(b, c, m, proto):
            dets = nms(b, c, m, conf_threshold=0.001, iou_threshold=0.7,
                       max_candidates=1024, max_det=max_det)
            masks = assemble_masks(proto, dets, (imgsz, imgsz)) > 0
            return dets, masks

        return jax.vmap(per_image)(boxes, cls_logits, coeffs, outs.protos)

    return eval_step


def evaluate(model: YoloSeg, variables, root: str, split: str = "valid",
             imgsz: int = 640, batch_size: int = 16, mask_ratio: int = 4,
             max_images: int | None = None, max_det: int = 300,
             verbose: bool = False) -> dict[str, float]:
    ds = SegDataset(root, split)
    n = len(ds) if max_images is None else min(max_images, len(ds))
    step = make_eval_step(model, imgsz, max_det=max_det)
    mh = imgsz // mask_ratio
    acc = MapAccumulator()

    for start in range(0, n, batch_size):
        idxs = range(start, min(start + batch_size, n))
        imgs = np.zeros((batch_size, imgsz, imgsz, 3), np.uint8)
        gts = []
        for bi, i in enumerate(idxs):
            rec = ds.records[i]
            img = ds.load_image(i)
            h, w = img.shape[:2]
            polys = [p * [w, h] for p in rec.polygons]
            lb_img, lb_polys = letterbox_np(img, polys, imgsz)
            imgs[bi] = lb_img[..., ::-1]
            mask, boxes, classes, valid = polygons_to_overlap_mask(
                lb_polys, rec.classes, (imgsz, imgsz), (mh, mh),
                max_instances=32)
            # Index by the VALID slots, not range(valid.sum()): a degenerate
            # polygon leaves a hole in valid[] but still occupies its
            # painted value slot+1, so positional indexing would pair GT
            # boxes with the wrong instances' masks.
            inst_masks = np.stack(
                [mask == (k + 1) for k in np.flatnonzero(valid)]
            ) if valid.any() else np.zeros((0, mh, mh), bool)
            gts.append((boxes[valid], inst_masks))

        dets, masks = step(variables, jnp.asarray(imgs))
        dets_np = jax.tree.map(np.asarray, dets)
        masks_np = np.asarray(masks)

        for bi, (gt_boxes, gt_masks) in enumerate(gts):
            valid = dets_np.valid[bi]
            acc.add_image(
                conf=dets_np.scores[bi][valid],
                pred_boxes=dets_np.boxes[bi][valid],
                pred_masks=masks_np[bi][valid],
                gt_boxes=gt_boxes,
                gt_masks=gt_masks,
            )
        if verbose:
            print(f"eval {min(start + batch_size, n)}/{n}", flush=True)

    return acc.result()
