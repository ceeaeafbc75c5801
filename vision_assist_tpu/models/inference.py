"""Segmentation inference: one jitted chain from raw frame to cell occupancy.

frame (H0, W0, 3 uint8 BGR)
  -> letterbox 640 (ops.letterbox)
  -> YoloSeg forward (bf16)
  -> DFL decode + NMS (models.decode)
  -> proto matmul + box crop (models.decode.assemble_masks)
  -> winning-mask selection (largest area, the reference picks the largest
     polygon at FrameProcessor.py:73)
  -> occupancy: bilinear logit sampling at every cell centre > 0
     (replacing rasterize-polygon-then-sample, FrameProcessor.py:85-97)

The mask never materialises at frame resolution: sampling prototype logits at
the mapped cell centres equals the reference's upsample-then-threshold at
those pixels (see ops/letterbox.py:sample_mask_logits_at_points).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vision_assist_tpu.config import ModelConfig
from vision_assist_tpu.models.decode import (
    Detections,
    assemble_masks,
    decode_boxes,
    nms,
)
from vision_assist_tpu.models.yolo import YoloSeg
from vision_assist_tpu.ops.letterbox import (
    LetterboxSpec,
    letterbox,
    sample_mask_logits_at_points,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SegFrameResult:
    occupancy: jax.Array      # (R, C) bool — winning mask sampled at centres
    detections: Detections
    mask_logits: jax.Array    # (D, Hp, Wp) cropped logits
    winner: jax.Array         # () int32 index into detections, -1 if none
    any_detection: jax.Array  # () bool

    def tree_flatten(self):
        return ((self.occupancy, self.detections, self.mask_logits,
                 self.winner, self.any_detection), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def cell_centres_dst(frame_h: int, frame_w: int, grid_size: int,
                     spec: LetterboxSpec) -> np.ndarray:
    """(R*C, 2) letterboxed coordinates of every cell-centre pixel."""
    rows, cols = frame_h // grid_size, frame_w // grid_size
    cy, cx = np.meshgrid(
        np.arange(rows) * grid_size + grid_size // 2,
        np.arange(cols) * grid_size + grid_size // 2,
        indexing="ij",
    )
    pts = np.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1).astype(np.float32)
    mapped = np.stack(
        [spec.frame_to_dst(float(x), float(y)) for x, y in pts]
    ).astype(np.float32)
    return mapped


class Segmenter:
    """Holds the Flax model + params and exposes the jitted per-frame chain."""

    def __init__(self, cfg: ModelConfig, variables: Any | None = None,
                 rng: jax.Array | None = None,
                 example_hw: tuple[int, int] = (1280, 720),
                 grid_size: int = 20):
        self.cfg = cfg
        self.model = YoloSeg(
            arch=cfg.arch, num_classes=cfg.num_classes, reg_max=cfg.reg_max,
            num_masks=cfg.num_mask_coeffs,
            dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            variables = self.model.init(
                rng, jnp.zeros((1, cfg.imgsz, cfg.imgsz, 3), jnp.float32),
                train=False)
        # Commit the weights to the device ONCE. Checkpoints restore as host
        # numpy arrays; passing those to a jitted call re-uploads every
        # param leaf each call — ~200 relay transfers per frame (measured
        # ~600 ms/frame on this TPU relay).
        self.variables = jax.device_put(variables)
        self.frame_h, self.frame_w = example_hw
        self.grid_size = grid_size
        self.spec = LetterboxSpec.create(self.frame_h, self.frame_w, cfg.imgsz)
        self._centres = jnp.asarray(cell_centres_dst(
            self.frame_h, self.frame_w, grid_size, self.spec))

        self._jitted = jax.jit(self._frame_chain)

    # -- pure functions (jit/vmap-able) ------------------------------------------

    def _frame_chain(self, variables, frame_bgr: jax.Array) -> SegFrameResult:
        cfg = self.cfg
        img = letterbox(frame_bgr, dst=cfg.imgsz)
        outs = self.model.apply(variables, img[None], train=False)
        boxes, cls_logits, coeffs = decode_boxes(outs, cfg.reg_max)
        dets = nms(boxes[0], cls_logits[0], coeffs[0],
                   conf_threshold=cfg.conf_threshold,
                   iou_threshold=cfg.iou_threshold,
                   max_det=cfg.max_detections)
        mask_logits = assemble_masks(outs.protos[0], dets,
                                     (cfg.imgsz, cfg.imgsz))

        # Winner = largest mask area at prototype resolution; the reference
        # keeps only the largest of several masks (FrameProcessor.py:71-73).
        areas = jnp.sum(mask_logits > 0, axis=(-1, -2))
        areas = jnp.where(dets.valid, areas, -1)
        any_det = jnp.any(dets.valid)
        winner = jnp.where(any_det, jnp.argmax(areas), -1).astype(jnp.int32)

        samples = sample_mask_logits_at_points(
            mask_logits, self._centres, dst=cfg.imgsz, threshold=True)
        rows = self.frame_h // self.grid_size
        cols = self.frame_w // self.grid_size
        win_occ = jnp.where(
            any_det,
            samples[jnp.maximum(winner, 0)].reshape(rows, cols),
            jnp.zeros((rows, cols), bool),
        )
        return SegFrameResult(
            occupancy=win_occ, detections=dets, mask_logits=mask_logits,
            winner=winner, any_detection=any_det)

    # -- public API ----------------------------------------------------------------

    def __call__(self, frame_bgr) -> SegFrameResult:
        frame_bgr = jnp.asarray(frame_bgr)
        if frame_bgr.shape[:2] != (self.frame_h, self.frame_w):
            # jit would happily retrace for the new shape, letterbox the
            # model input correctly, and then sample cell centres with the
            # STALE example_hw geometry — a plausible-looking but
            # geometrically wrong occupancy grid. Fail loudly instead.
            raise ValueError(
                f"frame shape {frame_bgr.shape[:2]} != Segmenter example_hw "
                f"({self.frame_h}, {self.frame_w}); build the Segmenter "
                "with example_hw matching the camera")
        return self._jitted(self.variables, frame_bgr)
