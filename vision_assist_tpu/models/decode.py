"""Detection decode: DFL box regression, fixed-shape NMS, mask assembly.

TPU-native equivalents of the ultralytics postprocessing the reference leans
on (vendored torch copies at testing/old/segmenting_using_tflite/ops.py:
non_max_suppression :214-363, crop_mask :688-704, process_mask :707-737).
Everything here is static-shape: candidate counts, kept detections, and masks
are padded with validity flags so the whole chain lives inside one jitted
program and vmaps over the stream axis.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from vision_assist_tpu.models.yolo import YoloSegOutputs

NEG = -1.0e30


def make_anchors(hw_per_level: list[tuple[int, int]],
                 strides: tuple[int, ...],
                 offset: float = 0.5) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor centre points (A, 2) in input-image pixels and per-anchor stride
    (A, 1) — ultralytics make_anchors semantics."""
    pts, sts = [], []
    for (h, w), s in zip(hw_per_level, strides):
        xs = (jnp.arange(w, dtype=jnp.float32) + offset)
        ys = (jnp.arange(h, dtype=jnp.float32) + offset)
        xv, yv = jnp.meshgrid(xs, ys)
        pts.append(jnp.stack([xv.reshape(-1), yv.reshape(-1)], axis=-1) * s)
        sts.append(jnp.full((h * w, 1), s, dtype=jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(sts)


def dfl_expectation(box_logits: jax.Array, reg_max: int) -> jax.Array:
    """Distribution-focal decode: softmax over reg_max bins -> expected value.
    box_logits (..., 4*reg_max) -> distances (..., 4) in stride units (ltrb)."""
    shape = box_logits.shape[:-1] + (4, reg_max)
    probs = jax.nn.softmax(box_logits.reshape(shape), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(probs * bins, axis=-1)


def decode_boxes(outputs: YoloSegOutputs, reg_max: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Flatten levels and decode to xyxy boxes in letterboxed-image pixels.

    Returns (boxes (B, A, 4) xyxy, cls_logits (B, A, nc), coeffs (B, A, nm)).
    """
    hw = [tuple(b.shape[1:3]) for b in outputs.box_logits]
    anchors, strides = make_anchors(hw, outputs.strides)

    def flat(xs):
        return jnp.concatenate(
            [x.reshape(x.shape[0], -1, x.shape[-1]) for x in xs], axis=1)

    box = dfl_expectation(flat(outputs.box_logits), reg_max)   # (B, A, 4) ltrb
    lt, rb = box[..., :2], box[..., 2:]
    x1y1 = anchors[None] - lt * strides[None]
    x2y2 = anchors[None] + rb * strides[None]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    return boxes, flat(outputs.cls_logits), flat(outputs.coeffs)


def _box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of xyxy boxes a (N,4) x b (M,4) -> (N,M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Detections:
    """Padded, fixed-size detection set for one image."""

    boxes: jax.Array    # (D, 4) xyxy, letterboxed-image pixels
    scores: jax.Array   # (D,)
    classes: jax.Array  # (D,) int32
    coeffs: jax.Array   # (D, nm)
    valid: jax.Array    # (D,) bool

    def tree_flatten(self):
        return ((self.boxes, self.scores, self.classes, self.coeffs,
                 self.valid), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@functools.partial(jax.jit, static_argnames=(
    "conf_threshold", "iou_threshold", "max_candidates", "max_det"))
def nms(boxes: jax.Array, cls_logits: jax.Array, coeffs: jax.Array,
        conf_threshold: float = 0.5, iou_threshold: float = 0.7,
        max_candidates: int = 256, max_det: int = 32) -> Detections:
    """Greedy class-aware NMS with static shapes, matching torchvision.ops.nms
    semantics as used by ultralytics (ops.py:335-344, best-class-only path).

    boxes (A, 4), cls_logits (A, nc), coeffs (A, nm) for ONE image; vmap for a
    batch. Candidates are the top max_candidates by best-class confidence.
    """
    scores_all = jax.nn.sigmoid(cls_logits)
    best = jnp.max(scores_all, axis=-1)                      # (A,)
    cls = jnp.argmax(scores_all, axis=-1).astype(jnp.int32)

    cand = jnp.where(best > conf_threshold, best, NEG)
    k = min(max_candidates, cand.shape[0])
    top_scores, idx = jax.lax.top_k(cand, k)                 # sorted desc
    if k < max_candidates:
        top_scores = jnp.pad(top_scores, (0, max_candidates - k),
                             constant_values=NEG)
        idx = jnp.pad(idx, (0, max_candidates - k))
    cand_valid = top_scores > conf_threshold
    cand_boxes = boxes[idx]
    cand_cls = cls[idx]

    # Class-aware: offset boxes per class (ops.py:336-342, max_wh trick).
    offs = cand_cls.astype(jnp.float32)[:, None] * 7680.0
    iou = _box_iou(cand_boxes + offs, cand_boxes + offs)

    order = jnp.arange(max_candidates)

    def body(i, keep):
        alive = keep[i]
        suppress = (iou[i] > iou_threshold) & (order > i)
        return jnp.where(alive, keep & ~suppress, keep)

    keep = jax.lax.fori_loop(0, max_candidates, body, cand_valid)

    # Gather the first max_det kept (already in descending score order).
    kept_rank = jnp.where(keep, order, max_candidates)
    sel = jnp.argsort(kept_rank)[:max_det]
    valid = keep[sel] & (kept_rank[sel] < max_candidates)

    return Detections(
        boxes=jnp.where(valid[:, None], cand_boxes[sel], 0.0),
        scores=jnp.where(valid, top_scores[sel], 0.0),
        classes=jnp.where(valid, cand_cls[sel], -1),
        coeffs=jnp.where(valid[:, None], coeffs[idx][sel], 0.0),
        valid=valid,
    )


def assemble_masks(protos: jax.Array, dets: Detections,
                   input_hw: tuple[int, int]) -> jax.Array:
    """Mask logits at prototype resolution, box-cropped (NOT thresholded).

    protos (Hp, Wp, nm); returns (D, Hp, Wp) float32. Mirrors process_mask
    (ops.py:707-737): coeff @ proto matmul, box crop via iota comparisons;
    thresholding (> 0) is left to the consumer so downstream sampling can
    interpolate logits bilinearly first, which commutes with the reference's
    "upsample then threshold" order.
    """
    hp, wp, nm = protos.shape
    ih, iw = input_hw
    masks = jnp.einsum("dn,hwn->dhw", dets.coeffs, protos,
                       preferred_element_type=jnp.float32)

    scale = jnp.array([wp / iw, hp / ih, wp / iw, hp / ih], jnp.float32)
    b = dets.boxes * scale[None]
    xs = jnp.arange(wp, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(hp, dtype=jnp.float32)[None, :, None]
    inside = ((xs >= b[:, 0, None, None]) & (xs < b[:, 2, None, None])
              & (ys >= b[:, 1, None, None]) & (ys < b[:, 3, None, None]))
    # Multiplicative crop (zeros outside), exactly like crop_mask
    # (ops.py:688-704): downstream bilinear-resample-then-threshold then sees
    # the same soft box edges the reference produces.
    return masks * (inside & dets.valid[:, None, None]).astype(masks.dtype)
