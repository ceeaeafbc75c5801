"""YOLO-seg training loss: task-aligned assignment + CIoU + DFL + mask BCE.

Functional JAX re-derivation of the v8 segmentation training objective the
reference relies on through ultralytics (model/train.py:12-13; hyperparameters
at model/runs/segment/train11/args.yaml: box 7.5, cls 0.5, dfl 1.5,
overlap_mask true, mask_ratio 4). Everything is fixed-shape and batched:

* TAL: align = score^alpha * CIoU^beta, top-10 candidates inside each GT box,
  conflicts resolved by max overlap, targets soft-labelled by normalised
  alignment.
* Box: CIoU loss + distribution-focal loss on the two adjacent bins.
* Masks: per-foreground-anchor BCE against the instance's overlap-mask slice,
  box-cropped and area-normalised. A top-K gather (static K) bounds the
  (B, K, Hm, Wm) mask tensor instead of torch's per-image Python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from vision_assist_tpu.models.decode import make_anchors
from vision_assist_tpu.models.yolo import YoloSegOutputs


@dataclasses.dataclass(frozen=True)
class LossConfig:
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    reg_max: int = 16
    num_classes: int = 1
    mask_topk: int = 64   # static cap of per-image fg anchors for mask loss
    # Robustness extension beyond ultralytics' TAL (deliberate deviation,
    # flag-gated): pure TAL assigns ZERO anchors to a GT whose predicted
    # boxes all have IoU 0 (align = score^a * iou^b = 0), so a model that
    # collapses to "predict nothing" receives no positive gradient and can
    # never recover — observed once in from-scratch bf16 training (round-2
    # v8n run, epoch 40: fg/img 3.3 -> 0.05, eval mAP -> 0). With
    # tal_min_assign, any valid GT with no TAL candidate is assigned its
    # nearest in-box anchor at a fixed soft-target floor, guaranteeing
    # gradient flow toward every GT.
    tal_min_assign: bool = True
    tal_min_assign_score: float = 0.2


def _bce_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def ciou(box1, box2, eps: float = 1e-7):
    """Complete IoU between xyxy boxes (broadcasting elementwise)."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)

    w1 = box1[..., 2] - box1[..., 0]
    h1 = box1[..., 3] - box1[..., 1]
    w2 = box2[..., 2] - box2[..., 0]
    h2 = box2[..., 3] - box2[..., 1]
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(box1[..., 2], box2[..., 2]) - jnp.minimum(
        box1[..., 0], box2[..., 0])
    ch = jnp.maximum(box1[..., 3], box2[..., 3]) - jnp.minimum(
        box1[..., 1], box2[..., 1])
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = (((box2[..., 0] + box2[..., 2]) - (box1[..., 0] + box1[..., 2])) ** 2
            + ((box2[..., 1] + box2[..., 3]) - (box1[..., 1] + box1[..., 3])) ** 2) / 4
    v = (4 / jnp.pi ** 2) * (jnp.arctan(w2 / (h2 + eps))
                             - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def task_aligned_assign(pred_scores, pred_boxes, anchor_pts, gt_boxes,
                        gt_classes, gt_valid, cfg: LossConfig):
    """TaskAlignedAssigner.

    pred_scores (B, A, nc) sigmoid scores; pred_boxes (B, A, 4) xyxy pixels;
    anchor_pts (A, 2) pixels; gt_boxes (B, N, 4) xyxy pixels; gt_classes
    (B, N); gt_valid (B, N) bool.

    Returns fg_mask (B, A), assigned_gt (B, A) int, target_scores (B, A, nc).
    """
    b, a, nc = pred_scores.shape
    n = gt_boxes.shape[1]

    # Anchor centre inside GT box.
    ax = anchor_pts[None, None, :, 0]
    ay = anchor_pts[None, None, :, 1]
    in_gt = ((ax > gt_boxes[..., 0:1]) & (ax < gt_boxes[..., 2:3])
             & (ay > gt_boxes[..., 1:2]) & (ay < gt_boxes[..., 3:4]))  # (B,N,A)
    in_gt &= gt_valid[..., None]

    cls_score = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1),            # (B, nc, A)
        jnp.clip(gt_classes, 0, nc - 1)[:, :, None], axis=1)  # (B, N, A)
    overlaps = jnp.clip(
        ciou(gt_boxes[:, :, None, :], pred_boxes[:, None, :, :]), 0)  # (B,N,A)
    align = (cls_score ** cfg.tal_alpha) * (overlaps ** cfg.tal_beta)
    align = jnp.where(in_gt, align, 0.0)

    # Top-k per GT.
    topk_vals, _ = jax.lax.top_k(align, cfg.tal_topk)       # (B, N, k)
    kth = topk_vals[..., -1:]
    cand = (align >= jnp.maximum(kth, 1e-12)) & (align > 0)  # (B, N, A)

    # Minimum-assignment fallback (see LossConfig.tal_min_assign): a valid GT
    # with no candidate gets its nearest anchor (preferring anchors inside
    # the box) so it always receives gradient.
    if cfg.tal_min_assign:
        need = gt_valid & ~cand.any(axis=-1)                 # (B, N)
        gcx = (gt_boxes[..., 0:1] + gt_boxes[..., 2:3]) * 0.5  # (B, N, 1)
        gcy = (gt_boxes[..., 1:2] + gt_boxes[..., 3:4]) * 0.5
        d2 = (ax - gcx) ** 2 + (ay - gcy) ** 2               # (B, N, A)
        d2_in = jnp.where(in_gt, d2, jnp.inf)
        any_in = in_gt.any(axis=-1, keepdims=True)
        d2_use = jnp.where(any_in, d2_in, d2)
        fallback = (jax.nn.one_hot(jnp.argmin(d2_use, axis=-1), a, dtype=bool)
                    & need[..., None])                       # (B, N, A)
        cand = cand | fallback
    else:
        fallback = jnp.zeros_like(cand)

    # Conflict resolution: anchor claimed by the GT with highest overlap.
    # A needy GT's fallback claim outranks genuine candidacies (bonus 2.0
    # dominates overlaps in [0, 1]): that anchor is the needy GT's ONLY
    # gradient path, while a genuine candidate GT has up to tal_topk
    # others — resolving by raw overlap would steal it and void the
    # min-assign guarantee. (Two needy GTs sharing a nearest anchor still
    # tie-break to the first; a GT pair that close is one instance for
    # gradient purposes.)
    conflict = cand.sum(axis=1, keepdims=True) > 1           # (B, 1, A)
    claim = jnp.where(cand, overlaps, -1.0)
    if cfg.tal_min_assign:
        claim = claim + 2.0 * fallback
    best_gt = jnp.argmax(claim, axis=1)                      # (B, A)
    is_best = best_gt[:, None, :] == jnp.arange(n)[None, :, None]
    cand = jnp.where(conflict, cand & is_best, cand)

    fg_mask = cand.any(axis=1)                               # (B, A)
    assigned_gt = jnp.argmax(cand, axis=1)                   # (B, A)

    # Normalised soft targets.
    align_sel = jnp.where(cand, align, 0.0)
    pos_align = align_sel.max(axis=-1, keepdims=True)        # (B, N, 1)
    pos_iou = jnp.where(cand, overlaps, 0.0).max(axis=-1, keepdims=True)
    norm = align_sel * pos_iou / (pos_align + 1e-9)          # (B, N, A)
    norm_per_anchor = norm.max(axis=1)                       # (B, A)

    gt_cls_per_anchor = jnp.take_along_axis(gt_classes, assigned_gt, axis=1)
    target_scores = (jax.nn.one_hot(gt_cls_per_anchor, nc)
                     * (norm_per_anchor * fg_mask)[..., None])

    # Fallback anchors have align = 0 so their normalised target (and with
    # it the box-loss weight) would be 0 — floor it so the rescue assignment
    # actually pulls the prediction toward the GT.
    if cfg.tal_min_assign:
        floor = cfg.tal_min_assign_score
        # Mask from the RESOLVED assignment (fallback & cand), not the raw
        # fallback proposals: an anchor that lost its fallback claim to a
        # genuine low-align TAL candidacy in conflict resolution must keep
        # its earned soft target, not the inflated floor (ADVICE r2).
        need_floor = ((fallback & cand).any(axis=1) & fg_mask
                      & (target_scores.sum(-1) < floor))     # (B, A)
        target_scores = jnp.where(
            need_floor[..., None],
            jax.nn.one_hot(gt_cls_per_anchor, nc) * floor, target_scores)
    return fg_mask, assigned_gt, target_scores


def yolo_seg_loss(outputs: YoloSegOutputs, batch: dict[str, Any],
                  cfg: LossConfig, imgsz: int):
    """Total loss + component dict for one batch.

    batch: images-derived targets — boxes (B,N,4) xyxy pixels, classes (B,N),
    valid (B,N), masks (B,Hm,Wm) overlap-index uint8.
    """
    hw = [tuple(x.shape[1:3]) for x in outputs.box_logits]
    anchors_px, strides = make_anchors(hw, outputs.strides)  # pixels, (A,1)

    def flat(xs):
        return jnp.concatenate(
            [x.reshape(x.shape[0], -1, x.shape[-1]) for x in xs], axis=1)

    box_logits = flat(outputs.box_logits)      # (B, A, 4*reg_max)
    cls_logits = flat(outputs.cls_logits)      # (B, A, nc)
    coeffs = flat(outputs.coeffs)              # (B, A, nm)
    b, a, _ = cls_logits.shape
    rm = cfg.reg_max

    # DFL expectation -> boxes (pixels).
    probs = jax.nn.softmax(box_logits.reshape(b, a, 4, rm), axis=-1)
    dist = jnp.sum(probs * jnp.arange(rm, dtype=jnp.float32), axis=-1)
    x1y1 = anchors_px[None] - dist[..., :2] * strides[None]
    x2y2 = anchors_px[None] + dist[..., 2:] * strides[None]
    pred_boxes = jnp.concatenate([x1y1, x2y2], axis=-1)

    pred_scores = jax.nn.sigmoid(cls_logits)
    # The assigner is a LABELLING step, not part of the differentiable
    # objective (ultralytics runs TaskAlignedAssigner under torch.no_grad()).
    # Without stop_gradient the optimizer gets a degenerate descent
    # direction — drive scores down so the soft targets shrink — which
    # reinforces the "predict nothing" collapse tal_min_assign guards
    # against, and d(x**0.5)/dx at x=0 injects NaNs through underflowed
    # sigmoid scores (silently zeroed by zero_nonfinite = wasted steps).
    fg, assigned_gt, target_scores = task_aligned_assign(
        jax.lax.stop_gradient(pred_scores),
        jax.lax.stop_gradient(pred_boxes), anchors_px,
        batch["boxes"], batch["classes"], batch["valid"], cfg)

    ts_sum = jnp.maximum(target_scores.sum(), 1.0)

    # Classification BCE with soft targets.
    cls_loss = _bce_logits(cls_logits, target_scores).sum() / ts_sum

    # Box losses on foreground anchors.
    tgt_boxes = jnp.take_along_axis(
        batch["boxes"], assigned_gt[..., None], axis=1)      # (B, A, 4)
    weight = target_scores.sum(-1)                           # (B, A)
    iou_term = ciou(pred_boxes / strides[None], tgt_boxes / strides[None])
    box_loss = jnp.sum((1.0 - iou_term) * weight * fg) / ts_sum

    # DFL on stride-normalised target distances.
    anchors_g = anchors_px / strides                         # grid units
    t_lt = anchors_g[None] - tgt_boxes[..., :2] / strides[None]
    t_rb = tgt_boxes[..., 2:] / strides[None] - anchors_g[None]
    t_dist = jnp.clip(jnp.concatenate([t_lt, t_rb], -1), 0, rm - 1 - 0.01)
    tl = jnp.floor(t_dist)
    wl = tl + 1 - t_dist
    logp = jax.nn.log_softmax(box_logits.reshape(b, a, 4, rm), axis=-1)
    tl_i = tl.astype(jnp.int32)
    ce_l = -jnp.take_along_axis(logp, tl_i[..., None], -1)[..., 0]
    ce_r = -jnp.take_along_axis(
        logp, jnp.clip(tl_i + 1, 0, rm - 1)[..., None], -1)[..., 0]
    dfl = (ce_l * wl + ce_r * (1 - wl)).mean(-1)             # (B, A)
    dfl_loss = jnp.sum(dfl * weight * fg) / ts_sum

    # Mask loss: top-K foreground anchors per image (static K).
    k = cfg.mask_topk
    sel_score = jnp.where(fg, weight, -1.0)
    _, sel = jax.lax.top_k(sel_score, k)                     # (B, K)
    sel_fg = jnp.take_along_axis(fg, sel, axis=1)
    sel_coeff = jnp.take_along_axis(coeffs, sel[..., None], axis=1)
    sel_gt = jnp.take_along_axis(assigned_gt, sel, axis=1)   # (B, K)
    sel_boxes = jnp.take_along_axis(tgt_boxes, sel[..., None], axis=1)

    protos = outputs.protos                                  # (B, Hm, Wm, nm)
    mh, mw = protos.shape[1:3]
    pred_masks = jnp.einsum("bkn,bhwn->bkhw", sel_coeff, protos,
                            preferred_element_type=jnp.float32)

    inst = batch["masks"].astype(jnp.int32)                  # (B, Hm, Wm)
    gt_masks = (inst[:, None, :, :] == (sel_gt[..., None, None] + 1))

    scale = jnp.array([mw / imgsz, mh / imgsz, mw / imgsz, mh / imgsz])
    bx = sel_boxes * scale[None, None]
    xs = jnp.arange(mw, dtype=jnp.float32)[None, None, None, :]
    ys = jnp.arange(mh, dtype=jnp.float32)[None, None, :, None]
    in_box = ((xs >= bx[..., 0, None, None]) & (xs < bx[..., 2, None, None])
              & (ys >= bx[..., 1, None, None]) & (ys < bx[..., 3, None, None]))

    bce = _bce_logits(pred_masks, gt_masks.astype(jnp.float32))
    area_n = jnp.clip(
        ((sel_boxes[..., 2] - sel_boxes[..., 0]) / imgsz)
        * ((sel_boxes[..., 3] - sel_boxes[..., 1]) / imgsz), 1e-4)
    per_anchor = (bce * in_box).mean(axis=(-1, -2)) / area_n  # (B, K)
    seg_loss = jnp.sum(per_anchor * sel_fg) / jnp.maximum(fg.sum(), 1.0)

    total = (cfg.box_gain * box_loss + cfg.box_gain * seg_loss
             + cfg.cls_gain * cls_loss + cfg.dfl_gain * dfl_loss) * b
    return total, {
        "box": box_loss, "seg": seg_loss, "cls": cls_loss, "dfl": dfl_loss,
        "fg_per_img": fg.sum() / b,
    }
