"""Unit tests for the mAP evaluator (models/metrics.py)."""

from __future__ import annotations

import numpy as np

from vision_assist_tpu.models.metrics import (
    MapAccumulator,
    average_precision,
    box_iou_matrix,
    mask_iou_matrix,
    match_predictions,
)


def test_box_iou_matrix():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [10, 10, 20, 20]], float)
    iou = box_iou_matrix(a, b)
    np.testing.assert_allclose(iou, [[1.0, 0.0]])


def test_mask_iou_matrix():
    p = np.zeros((1, 4, 4), bool)
    p[0, :2] = True
    g = np.zeros((2, 4, 4), bool)
    g[0, :2] = True          # identical
    g[1, :1] = True          # half of it
    iou = mask_iou_matrix(p, g)
    np.testing.assert_allclose(iou[0], [1.0, 0.5])


def test_match_predictions_greedy_unique():
    # Two detections both overlapping one GT: only the higher-confidence
    # (earlier) one may match.
    iou = np.array([[0.9], [0.8]])
    tp = match_predictions(iou, thresholds=np.array([0.5]))
    assert tp[0, 0] and not tp[1, 0]


def test_perfect_detections_ap_one():
    acc = MapAccumulator()
    boxes = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)
    masks = np.zeros((2, 8, 8), bool)
    masks[0, :4] = True
    masks[1, 4:] = True
    acc.add_image(np.array([0.9, 0.8]), boxes, masks, boxes, masks)
    r = acc.result()
    # trapezoidal 101-point AP tops out at 0.995 for a perfect detector
    # (the appended (recall 0 -> first point) ramp), same as ultralytics.
    assert r["map50_box"] > 0.99
    assert r["map50_95_box"] > 0.99
    assert r["map50_mask"] > 0.99


def test_false_positives_reduce_ap():
    acc = MapAccumulator()
    gt_boxes = np.array([[0, 0, 10, 10]], float)
    gt_masks = np.zeros((1, 8, 8), bool)
    gt_masks[0, :4] = True
    # One perfect detection + one total miss with HIGHER confidence.
    det_boxes = np.array([[50, 50, 60, 60], [0, 0, 10, 10]], float)
    det_masks = np.zeros((2, 8, 8), bool)
    det_masks[1, :4] = True
    acc.add_image(np.array([0.95, 0.9]), det_boxes, det_masks,
                  gt_boxes, gt_masks)
    r = acc.result()
    # ultralytics-style trapezoidal AP: precision 0.5 across the curve.
    assert abs(r["map50_box"] - 0.4975) < 1e-6


def test_missed_gt_caps_recall():
    acc = MapAccumulator()
    gt_boxes = np.array([[0, 0, 10, 10], [30, 30, 40, 40]], float)
    gt_masks = np.zeros((2, 8, 8), bool)
    gt_masks[0, :2] = True
    gt_masks[1, 6:] = True
    det_boxes = gt_boxes[:1]
    det_masks = gt_masks[:1]
    acc.add_image(np.array([0.9]), det_boxes, det_masks, gt_boxes, gt_masks)
    r = acc.result()
    # ultralytics-style trapezoidal interpolation credits the linear ramp
    # beyond the last achieved recall point: AP = 0.5 + 0.5*0.5 = 0.75
    # (matches ultralytics compute_ap, the source of BASELINE.md numbers).
    assert abs(r["map50_box"] - 0.75) < 0.02


def test_ap_empty_inputs():
    assert average_precision(np.zeros((0, 10), bool), np.zeros(0), 0).sum() == 0
    acc = MapAccumulator()
    assert acc.result()["map50_mask"] == 0.0


def test_match_predictions_equals_reference_scan():
    """The vectorised matcher must reproduce the naive per-threshold greedy
    scan exactly, including last-index-wins on exact IoU ties."""
    def naive(iou, thresholds):
        d, n = iou.shape
        t = len(thresholds)
        tp = np.zeros((d, t), bool)
        for ti, thr in enumerate(thresholds):
            taken = np.zeros(n, bool)
            for di in range(d):
                best, best_iou = -1, thr
                for gi in range(n):
                    if not taken[gi] and iou[di, gi] >= best_iou:
                        best, best_iou = gi, iou[di, gi]
                if best >= 0:
                    taken[best] = True
                    tp[di, ti] = True
        return tp

    rng = np.random.default_rng(0)
    thresholds = np.linspace(0.5, 0.95, 10)
    for d, n in [(1, 1), (5, 3), (3, 5), (40, 12), (12, 40)]:
        iou = rng.random((d, n))
        # Inject exact ties (duplicate columns + quantised values).
        iou[:, : n // 2] = np.round(iou[:, : n // 2] * 4) / 4
        if n >= 2:
            iou[:, -1] = iou[:, 0]
        np.testing.assert_array_equal(
            match_predictions(iou, thresholds), naive(iou, thresholds))
