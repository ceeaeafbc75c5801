"""Tests for the YOLO-seg model family, decode chain, and preprocessing ops."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vision_assist_tpu.config import ModelConfig
from vision_assist_tpu.models.decode import (
    _box_iou,
    dfl_expectation,
    make_anchors,
    nms,
)
from vision_assist_tpu.models.yolo import YoloSeg
from vision_assist_tpu.ops.letterbox import (
    LetterboxSpec,
    letterbox,
    sample_mask_logits_at_points,
)
from vision_assist_tpu.ops.blur import laplacian_variance


class TestModel:
    @pytest.mark.parametrize("arch,params", [
        ("yolov8n-seg", 3_263_795),   # ultralytics yolov8n-seg @ nc=1
        # Faithful yolo11.yaml semantics (head C3k2 shortcut=True, c3k in
        # the final P5 block, act=False attention/FFN convs).
        ("yolo11n-seg", 2_842_787),
        # Pre-fix v11 variant the first trained y11n checkpoint uses —
        # pinned so that artifact stays loadable.
        ("yolo11n-seg-legacy", 2_809_379),
    ])
    def test_param_count_matches_ultralytics(self, arch, params):
        m = YoloSeg(arch=arch, num_classes=1)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
        assert sum(x.size for x in jax.tree.leaves(v["params"])) == params

    def test_output_shapes(self):
        m = YoloSeg(arch="yolov8n-seg", num_classes=1)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
        out = m.apply(v, jnp.zeros((2, 256, 256, 3)))
        assert [b.shape for b in out.box_logits] == [
            (2, 32, 32, 64), (2, 16, 16, 64), (2, 8, 8, 64)]
        assert [c.shape[-1] for c in out.cls_logits] == [1, 1, 1]
        assert [c.shape[-1] for c in out.coeffs] == [32, 32, 32]
        assert out.protos.shape == (2, 64, 64, 32)
        assert out.strides == (8, 16, 32)


class TestDecode:
    def test_anchors(self):
        pts, strides = make_anchors([(2, 2), (1, 1)], (8, 16))
        np.testing.assert_allclose(
            np.asarray(pts),
            [[4, 4], [12, 4], [4, 12], [12, 12], [8, 8]])
        np.testing.assert_allclose(np.asarray(strides).ravel(),
                                   [8, 8, 8, 8, 16])

    def test_dfl_uniform_is_midpoint(self):
        logits = jnp.zeros((5, 64))
        np.testing.assert_allclose(np.asarray(dfl_expectation(logits, 16)),
                                   np.full((5, 4), 7.5), atol=1e-6)

    def test_dfl_peaked(self):
        logits = np.full((1, 64), -1e9, np.float32)
        logits[0, 3] = 0          # side 0 -> bin 3
        logits[0, 16 + 10] = 0    # side 1 -> bin 10
        out = np.asarray(dfl_expectation(jnp.asarray(logits), 16))
        np.testing.assert_allclose(out[0, :2], [3, 10], atol=1e-4)

    def test_iou(self):
        a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                        jnp.float32)
        np.testing.assert_allclose(
            np.asarray(_box_iou(a, b))[0], [1.0, 25 / 175, 0.0], atol=1e-6)


def _numpy_greedy_nms(boxes, scores, iou_thr):
    """Reference greedy NMS (torchvision.ops.nms semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-9)
        suppressed |= iou > iou_thr
    return keep


class TestNMS:
    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(42)
        n = 400
        centres = rng.uniform(50, 590, (n, 2))
        wh = rng.uniform(10, 120, (n, 2))
        boxes = np.concatenate([centres - wh / 2, centres + wh / 2], -1)
        scores = rng.uniform(0, 1, n).astype(np.float32)

        logits = np.log(scores / (1 - scores))[:, None]  # sigmoid^-1
        coeffs = rng.normal(size=(n, 32)).astype(np.float32)

        dets = nms(jnp.asarray(boxes, jnp.float32), jnp.asarray(logits),
                   jnp.asarray(coeffs), conf_threshold=0.5,
                   iou_threshold=0.45, max_candidates=512, max_det=32)

        conf_mask = scores > 0.5
        ref_idx = _numpy_greedy_nms(boxes[conf_mask], scores[conf_mask], 0.45)
        ref_boxes = boxes[conf_mask][ref_idx][:32]

        got = np.asarray(dets.boxes)[np.asarray(dets.valid)]
        assert len(got) == len(ref_boxes)
        np.testing.assert_allclose(got, ref_boxes, atol=1e-4)
        # Scores descending
        s = np.asarray(dets.scores)[np.asarray(dets.valid)]
        assert np.all(np.diff(s) <= 1e-7)

    def test_below_threshold_empty(self):
        boxes = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        dets = nms(boxes, jnp.asarray([[-3.0]]), jnp.zeros((1, 32)),
                   conf_threshold=0.5, max_candidates=8, max_det=4)
        assert not bool(dets.valid.any())


class TestLetterbox:
    def test_geometry_portrait(self):
        spec = LetterboxSpec.create(1280, 720, 640)
        assert (spec.new_h, spec.new_w) == (640, 360)
        assert spec.pad_top == 0 and spec.pad_left == 140
        # centre maps to centre
        x, y = spec.frame_to_dst(359.5, 639.5)
        assert abs(x - 319.5) < 1e-6 and abs(y - 319.5) < 1e-6

    def test_letterbox_values(self):
        frame = np.full((1280, 720, 3), 200, np.uint8)
        out = np.asarray(letterbox(jnp.asarray(frame)))
        assert out.shape == (640, 640, 3)
        np.testing.assert_allclose(out[:, :140], 114 / 255, atol=1e-6)  # pad
        np.testing.assert_allclose(out[:, 140:500], 200 / 255, atol=1e-6)
        np.testing.assert_allclose(out[:, 500:640], 114 / 255, atol=1e-6)

    def test_bgr_to_rgb(self):
        frame = np.zeros((1280, 720, 3), np.uint8)
        frame[..., 0] = 255  # blue in BGR
        out = np.asarray(letterbox(jnp.asarray(frame)))
        np.testing.assert_allclose(out[320, 320], [0, 0, 1.0], atol=1e-6)


class TestMaskSampling:
    def test_matches_torch_bilinear_upsample(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(3, 160, 160)).astype(np.float32)

        up = torch.nn.functional.interpolate(
            torch.from_numpy(logits)[None], (640, 640), mode="bilinear",
            align_corners=False)[0].numpy()

        pts = rng.uniform(0, 639, (500, 2)).astype(np.float32)
        pts_int = np.round(pts).astype(np.int64)
        mine = np.asarray(sample_mask_logits_at_points(
            jnp.asarray(logits), jnp.asarray(pts_int.astype(np.float32)),
            dst=640, threshold=False))
        theirs = up[:, pts_int[:, 1], pts_int[:, 0]]
        np.testing.assert_allclose(mine, theirs, atol=1e-4)


class TestBlur:
    def test_flat_image_zero_variance(self):
        img = jnp.full((64, 64, 3), 37, jnp.uint8)
        assert float(laplacian_variance(img)) == 0.0

    def test_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (128, 96, 3), dtype=np.uint8)
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        ref = cv2.Laplacian(gray, cv2.CV_64F).var()
        mine = float(laplacian_variance(jnp.asarray(img)))
        assert abs(mine - ref) / max(ref, 1) < 0.02


class TestSegmenterEndToEnd:
    def test_random_weights_chain_runs(self):
        from vision_assist_tpu.models.inference import Segmenter
        cfg = ModelConfig(imgsz=256, conf_threshold=0.5)
        seg = Segmenter(cfg, example_hw=(320, 240))
        frame = np.random.default_rng(0).integers(
            0, 255, (320, 240, 3), dtype=np.uint8)
        res = seg(frame)
        assert res.occupancy.shape == (16, 12)
        # Random-weight output almost surely has no >0.5-confident detection,
        # and then occupancy must be all-empty, not garbage.
        if not bool(res.any_detection):
            assert not bool(res.occupancy.any())
