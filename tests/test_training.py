"""Tests for the training stack: data packing, augmentation geometry, TAL
assignment, loss behaviour, and one full train step (tiny shapes, CPU)."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vision_assist_tpu.data.augment import (
    AugmentConfig,
    flip_lr,
    letterbox_np,
    mosaic4,
)
from vision_assist_tpu.data.dataset import polygons_to_overlap_mask
from vision_assist_tpu.models.losses import (
    LossConfig,
    ciou,
    task_aligned_assign,
    yolo_seg_loss,
)
from vision_assist_tpu.models.train import (
    TrainConfig,
    create_train_state,
    lr_schedule,
    make_train_step,
)
from vision_assist_tpu.models.yolo import YoloSeg, YoloSegOutputs


def _square_poly(x1, y1, x2, y2):
    return np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32)


class TestData:
    def test_overlap_mask_order(self):
        # Smaller instance must overwrite larger (drawn later).
        big = _square_poly(0, 0, 80, 80)
        small = _square_poly(20, 20, 40, 40)
        mask, boxes, classes, valid = polygons_to_overlap_mask(
            [small, big], np.array([0, 0]), (80, 80), (80, 80), 8)
        assert valid[:2].all() and not valid[2:].any()
        # big drawn first (slot 1), small overwrites (slot 2)
        assert mask[10, 10] == 1
        assert mask[30, 30] == 2
        np.testing.assert_allclose(boxes[0], [0, 0, 80, 80])

    def test_letterbox_np_polygons(self):
        img = np.zeros((100, 50, 3), np.uint8)
        polys = [_square_poly(0, 0, 50, 100)]
        out, tp = letterbox_np(img, polys, 200)
        assert out.shape == (200, 200, 3)
        # ratio 2, pad left (200-100)/2 = 50
        np.testing.assert_allclose(tp[0][2], [150, 200])

    def test_flip_lr(self):
        img = np.zeros((10, 100, 3), np.uint8)
        _, polys = flip_lr(img, [_square_poly(10, 0, 30, 5)])
        np.testing.assert_allclose(sorted(polys[0][:, 0]), [70, 70, 90, 90])

    def test_mosaic_shapes(self):
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (100, 80, 3), np.uint8) for _ in range(4)]
        polys = [[_square_poly(0, 0, 80, 100)] for _ in range(4)]
        canvas, out = mosaic4(imgs, polys, rng, 160)
        assert canvas.shape == (320, 320, 3)
        assert len(out) == 4
        for p in out:
            assert (p >= 0).all() and (p < 320).all()

    def test_device_hsv_matches_cv2_host(self):
        """The on-device HSV jitter (data/augment_device.py) must reproduce
        the host cv2 LUT transform (data/augment.py hsv_jitter) up to uint8
        LUT quantisation."""
        cv2 = pytest.importorskip("cv2")
        from vision_assist_tpu.data.augment import hsv_jitter
        from vision_assist_tpu.data.augment_device import hsv_jitter_rgb

        rng = np.random.default_rng(3)
        img_bgr = rng.integers(0, 256, (64, 64, 3), np.uint8)
        gains = np.array([1.01, 1.3, 0.8], np.float32)

        class _FixedRng:
            def uniform(self, lo, hi, n):
                # reproduce augment.hsv_jitter's gains = u*[h,s,v]+1
                cfg_scale = np.array([0.015, 0.7, 0.4])
                return (gains - 1) / cfg_scale

        host_bgr = hsv_jitter(img_bgr, _FixedRng(), AugmentConfig())
        host_rgb = host_bgr[..., ::-1].astype(np.float32) / 255.0

        dev_rgb = np.asarray(hsv_jitter_rgb(
            jnp.asarray(img_bgr[None, ..., ::-1], jnp.float32) / 255.0,
            jnp.asarray(gains[None])))[0]

        diff = np.abs(dev_rgb - host_rgb)
        # cv2 quantises H to 180 uint8 bins and S/V to 256; allow a few
        # pixels at hue-sector boundaries to differ by a bin or two.
        assert np.mean(diff) < 0.01, np.mean(diff)
        assert np.quantile(diff, 0.99) < 0.05

    def test_hsv_unity_gains_noop(self):
        from vision_assist_tpu.data.augment_device import hsv_jitter_rgb

        rng = np.random.default_rng(0)
        img = rng.random((2, 8, 8, 3), np.float32)
        out = np.asarray(hsv_jitter_rgb(jnp.asarray(img),
                                        jnp.ones((2, 3), jnp.float32)))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_pack_contract_bgr_flip_gains(self, tmp_path):
        """_pack ships BGR images, polygon-flip matches the image flip flag,
        and hsv_gains ride the batch."""
        cv2 = pytest.importorskip("cv2")
        from vision_assist_tpu.data.dataset import SegDataset
        from vision_assist_tpu.data.loader import BatchLoader

        (tmp_path / "train" / "images").mkdir(parents=True)
        (tmp_path / "train" / "labels").mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(4):
            img = np.zeros((64, 64, 3), np.uint8)
            img[:, :, 0] = 200  # strongly blue in BGR
            cv2.imwrite(str(tmp_path / "train" / "images" / f"i{i}.jpg"), img)
            # an off-centre square so a flip visibly moves it
            (tmp_path / "train" / "labels" / f"i{i}.txt").write_text(
                "0 0.1 0.1 0.4 0.1 0.4 0.4 0.1 0.4\n")
        ds = SegDataset(tmp_path, "train")
        loader = BatchLoader(ds, batch_size=4, imgsz=64, augment=True, seed=0)
        batch = loader._pack(np.arange(4), np.random.default_rng(5))
        assert batch["hsv_gains"].shape == (4, 3)
        assert (batch["hsv_gains"] != 1).any()  # gains actually drawn
        # BGR convention: blue channel (index 0) dominates where not padding
        img0 = batch["images"][0]
        content = img0[(img0 != 114).any(-1)]
        if len(content):
            assert content[:, 0].astype(int).sum() >= \
                content[:, 2].astype(int).sum()


    def test_wire_format_i420_matches_bgr(self, tmp_path):
        """wire_format='i420' ships the packed YUV plane; unpacked on
        device it must match the bgr wire to within chroma subsampling
        (the train step consumes it via the same ops/yuv.py kernel)."""
        cv2 = pytest.importorskip("cv2")
        from vision_assist_tpu.data.dataset import SegDataset
        from vision_assist_tpu.data.loader import BatchLoader
        from vision_assist_tpu.ops.yuv import i420_to_bgr

        (tmp_path / "train" / "images").mkdir(parents=True)
        (tmp_path / "train" / "labels").mkdir(parents=True)
        rng = np.random.default_rng(3)
        for i in range(4):
            img = rng.integers(0, 255, (64, 64, 3), np.uint8)
            img = cv2.GaussianBlur(img, (5, 5), 0)  # camera-like smoothness
            cv2.imwrite(str(tmp_path / "train" / "images" / f"i{i}.jpg"),
                        img, [cv2.IMWRITE_JPEG_QUALITY, 95])
            (tmp_path / "train" / "labels" / f"i{i}.txt").write_text(
                "0 0.1 0.1 0.4 0.1 0.4 0.4 0.1 0.4\n")
        ds = SegDataset(tmp_path, "train")
        kw = dict(batch_size=4, imgsz=64, augment=True, seed=0)
        bgr = BatchLoader(ds, **kw)._pack(np.arange(4),
                                          np.random.default_rng(5))
        i420 = BatchLoader(ds, wire_format="i420",
                           **kw)._pack(np.arange(4),
                                       np.random.default_rng(5))
        assert i420["images"].shape == (4, 96, 64)  # packed 64*3/2 plane
        # identical augmentation draws -> same labels
        np.testing.assert_array_equal(bgr["boxes"], i420["boxes"])
        np.testing.assert_array_equal(bgr["hsv_gains"], i420["hsv_gains"])
        unpacked = np.asarray(jax.vmap(
            lambda p: i420_to_bgr(p, 64, 64))(jnp.asarray(i420["images"])))
        # chroma subsampling: luma-accurate, small mean error overall
        err = np.abs(unpacked.astype(int) - bgr["images"].astype(int))
        assert err.mean() < 6.0 and np.median(err) <= 2.0


class TestLosses:
    def test_ciou_perfect_overlap(self):
        b = jnp.asarray([[0.0, 0, 10, 10]])
        np.testing.assert_allclose(np.asarray(ciou(b, b)), [1.0], atol=1e-5)

    def test_ciou_disjoint_negative(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[100.0, 100, 110, 110]])
        assert float(ciou(a, b)[0]) < 0

    def test_tal_assigns_inside_anchors(self):
        a = 16
        xs = (jnp.arange(4, dtype=jnp.float32) + 0.5) * 8
        xv, yv = jnp.meshgrid(xs, xs)
        anchors = jnp.stack([xv.ravel(), yv.ravel()], -1)       # 4x4 grid
        gt = jnp.asarray([[[0.0, 0, 16, 16]]])                  # top-left cell
        gt_cls = jnp.zeros((1, 1), jnp.int32)
        gt_valid = jnp.ones((1, 1), bool)
        # Perfect prediction at every anchor.
        pred_boxes = jnp.tile(gt[0], (1, a, 1))
        scores = jnp.full((1, a, 1), 0.9)
        fg, assigned, tgt = task_aligned_assign(
            scores, pred_boxes, anchors, gt, gt_cls, gt_valid, LossConfig())
        fg = np.asarray(fg)[0]
        # Only anchors inside the GT box (x,y < 16 -> anchors (4,4) and (12,12)
        # etc: first 2 of each row/col) can be foreground.
        inside = (np.asarray(anchors)[:, 0] < 16) & (np.asarray(anchors)[:, 1] < 16)
        assert fg[~inside].sum() == 0
        assert fg[inside].sum() > 0
        assert np.asarray(tgt).max() <= 1.0 + 1e-6

    def _tiny_outputs_and_batch(self, b=2, s=64):
        model = YoloSeg(arch="yolov8n-seg", num_classes=1)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)))
        out = model.apply(v, jnp.zeros((b, s, s, 3)))
        mh = s // 4
        masks = np.zeros((b, mh, mh), np.uint8)
        masks[:, 2:10, 2:10] = 1
        batch = {
            "boxes": jnp.tile(jnp.asarray([[8.0, 8, 40, 40]]), (b, 4, 1)),
            "classes": jnp.zeros((b, 4), jnp.int32),
            "valid": jnp.asarray(np.tile([True, False, False, False], (b, 1))),
            "masks": jnp.asarray(masks),
        }
        return out, batch

    def test_loss_finite_and_components(self):
        out, batch = self._tiny_outputs_and_batch()
        loss, parts = yolo_seg_loss(out, batch, LossConfig(mask_topk=8), 64)
        assert np.isfinite(float(loss))
        for k in ("box", "seg", "cls", "dfl"):
            assert np.isfinite(float(parts[k])), k
        assert float(parts["fg_per_img"]) > 0

    def test_no_gt_only_cls_loss(self):
        out, batch = self._tiny_outputs_and_batch()
        batch["valid"] = jnp.zeros_like(batch["valid"])
        loss, parts = yolo_seg_loss(out, batch, LossConfig(mask_topk=8), 64)
        assert np.isfinite(float(loss))
        assert float(parts["fg_per_img"]) == 0
        assert float(parts["box"]) == 0


class TestTrainStep:
    def test_lr_schedule(self):
        cfg = TrainConfig(epochs=10, warmup_epochs=1, lr0=0.01, lrf=0.1)
        sched = lr_schedule(cfg, steps_per_epoch=100)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(100)), 0.01, rtol=1e-5)
        np.testing.assert_allclose(float(sched(1000)), 0.001, rtol=1e-4)

    def test_one_step_updates_params_and_loss_decreases(self):
        cfg = TrainConfig(imgsz=64, batch_size=2, lr0=0.01, warmup_epochs=0)
        model = YoloSeg(arch="yolov8n-seg", num_classes=1)
        state = create_train_state(model, jax.random.PRNGKey(0), cfg,
                                   steps_per_epoch=10)
        step = make_train_step(model, LossConfig(mask_topk=8), cfg)

        rng = np.random.default_rng(0)
        mh = 16
        masks = np.zeros((2, mh, mh), np.uint8)
        masks[:, 2:10, 2:10] = 1
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)),
            "boxes": jnp.tile(jnp.asarray([[8.0, 8, 40, 40]]), (2, 4, 1)),
            "classes": jnp.zeros((2, 4), jnp.int32),
            "valid": jnp.asarray(np.tile([True, False, False, False], (2, 1))),
            "masks": jnp.asarray(masks),
        }
        losses = []
        for _ in range(6):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 6
        assert all(np.isfinite(losses))
        # Overfitting a single tiny batch must reduce the loss.
        assert losses[-1] < losses[0]

    def test_train_step_i420_wire_matches_bgr(self):
        """cfg.wire_format='i420' unpacks on-device; gradients must match
        a bgr step fed the unpacked images exactly (same compute graph
        after conversion)."""
        from vision_assist_tpu.ops.yuv import bgr_to_i420_host, i420_to_bgr

        cfg = TrainConfig(imgsz=64, batch_size=2, lr0=0.01, warmup_epochs=0)
        model = YoloSeg(arch="yolov8n-seg", num_classes=1)
        state = create_train_state(model, jax.random.PRNGKey(0), cfg,
                                   steps_per_epoch=10)
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
        planes = np.stack([bgr_to_i420_host(f) for f in imgs])
        masks = np.zeros((2, 16, 16), np.uint8)
        masks[:, 2:10, 2:10] = 1
        common = {
            "boxes": jnp.tile(jnp.asarray([[8.0, 8, 40, 40]]), (2, 4, 1)),
            "classes": jnp.zeros((2, 4), jnp.int32),
            "valid": jnp.asarray(np.tile([True, False, False, False],
                                         (2, 1))),
            "masks": jnp.asarray(masks),
        }
        import dataclasses
        step_i420 = make_train_step(
            model, LossConfig(mask_topk=8),
            dataclasses.replace(cfg, wire_format="i420"))
        s1, m1 = step_i420(state, {"images": jnp.asarray(planes), **common})
        # bgr step on the device-unpacked images == the i420 step (the
        # step donates its state, so rebuild an identical one)
        state2 = create_train_state(model, jax.random.PRNGKey(0), cfg,
                                    steps_per_epoch=10)
        unpacked = jax.vmap(lambda p: i420_to_bgr(p, 64, 64))(
            jnp.asarray(planes))
        step_bgr = make_train_step(model, LossConfig(mask_topk=8), cfg)
        s2, m2 = step_bgr(state2, {"images": unpacked, **common})
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)

    def test_tal_min_assign_rescues_dead_model(self):
        """A predict-nothing model (degenerate far-away boxes, ~zero scores)
        gets zero foreground from pure TAL — the observed epoch-40 collapse
        death spiral. tal_min_assign must assign every valid GT its nearest
        anchor at the soft-target floor so gradient flow resumes."""
        import dataclasses

        from vision_assist_tpu.models.losses import task_aligned_assign

        B, A, N = 2, 84, 3
        anchors = jnp.asarray(np.stack(
            np.meshgrid(np.arange(12) * 8 + 4, np.arange(7) * 8 + 4),
            -1).reshape(-1, 2).astype(np.float32))[:A]
        gt = jnp.asarray(np.array(
            [[[8, 8, 60, 50], [20, 10, 80, 40], [0, 0, 0, 0]]] * B,
            np.float32))
        gt_cls = jnp.zeros((B, N), jnp.int32)
        valid = jnp.asarray(np.array([[True, True, False]] * B))
        cfg = LossConfig()

        dead_boxes = jnp.tile(jnp.asarray([500.0, 500, 501, 501]), (B, A, 1))
        dead_scores = jnp.full((B, A, 1), 1e-4)
        fg, _, ts = task_aligned_assign(
            dead_scores, dead_boxes, anchors, gt, gt_cls, valid, cfg)
        assert int(np.asarray(fg).sum(1).min()) >= 2  # one per valid GT
        assert float(ts.max()) >= cfg.tal_min_assign_score - 1e-6

        fg_off, _, ts_off = task_aligned_assign(
            dead_scores, dead_boxes, anchors, gt, gt_cls, valid,
            dataclasses.replace(cfg, tal_min_assign=False))
        assert int(np.asarray(fg_off).sum()) == 0  # the death spiral
        assert float(ts_off.max()) == 0.0

    def test_tal_min_assign_noop_when_healthy(self):
        """When every GT has TAL candidates the fallback must be inert:
        assignments identical with the flag on and off."""
        import dataclasses

        from vision_assist_tpu.models.losses import task_aligned_assign

        B, A, N = 2, 84, 3
        anchors = jnp.asarray(np.stack(
            np.meshgrid(np.arange(12) * 8 + 4, np.arange(7) * 8 + 4),
            -1).reshape(-1, 2).astype(np.float32))[:A]
        gt = jnp.asarray(np.array(
            [[[8, 8, 60, 50], [20, 10, 80, 40], [0, 0, 0, 0]]] * B,
            np.float32))
        gt_cls = jnp.zeros((B, N), jnp.int32)
        valid = jnp.asarray(np.array([[True, True, False]] * B))
        ctrs = np.asarray(anchors)
        hb = np.stack([ctrs[:, 0] - 12, ctrs[:, 1] - 12,
                       ctrs[:, 0] + 12, ctrs[:, 1] + 12], -1)
        boxes = jnp.asarray(np.tile(hb[None], (B, 1, 1)).astype(np.float32))
        scores = jnp.asarray(np.random.default_rng(0).uniform(
            0.3, 0.9, (B, A, 1)).astype(np.float32))
        cfg = LossConfig()
        r_on = task_aligned_assign(scores, boxes, anchors, gt, gt_cls,
                                   valid, cfg)
        r_off = task_aligned_assign(
            scores, boxes, anchors, gt, gt_cls, valid,
            dataclasses.replace(cfg, tal_min_assign=False))
        for a_, b_ in zip(jax.tree.leaves(r_on), jax.tree.leaves(r_off)):
            np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))

    def test_optimizer_zeroes_nonfinite_grads(self):
        """An inf grad must not poison params (inf -> clip scale 0 ->
        inf*0=NaN with plain zero_nans)."""
        import optax

        from vision_assist_tpu.models.train import make_optimizer

        cfg = TrainConfig(imgsz=64, batch_size=2, warmup_epochs=0)
        tx = make_optimizer(cfg, steps_per_epoch=10)
        params = {"a": {"kernel": jnp.ones((3,))},
                  "b": {"bias": jnp.ones((3,))}}
        opt = tx.init(params)
        grads = {"a": {"kernel": jnp.array([1.0, jnp.inf, jnp.nan])},
                 "b": {"bias": jnp.array([0.5, -jnp.inf, 2.0])}}
        updates, _ = tx.update(grads, opt, params)
        new = optax.apply_updates(params, updates)
        for leaf in jax.tree.leaves(new):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_train_step_yolo11n_arch(self):
        """The second training recipe (yolo11n-seg @ 256, the reference's
        train16 run) must have a working train step, including the device-side
        HSV-jitter path the real loader feeds (data/augment_device.py)."""
        cfg = TrainConfig(imgsz=64, batch_size=2, warmup_epochs=0)
        model = YoloSeg(arch="yolo11n-seg", num_classes=1)
        state = create_train_state(model, jax.random.PRNGKey(0), cfg,
                                   steps_per_epoch=10)
        step = make_train_step(model, LossConfig(mask_topk=8), cfg)

        rng = np.random.default_rng(0)
        masks = np.zeros((2, 16, 16), np.uint8)
        masks[:, 4:14, 2:12] = 1
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)),
            "boxes": jnp.tile(jnp.asarray([[8.0, 8, 48, 56]]), (2, 4, 1)),
            "classes": jnp.zeros((2, 4), jnp.int32),
            "valid": jnp.ones((2, 4), bool),
            "masks": jnp.asarray(masks),
        }
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        batch["hsv_gains"] = jnp.ones((2, 3), jnp.float32)
        state, metrics = step(state, batch)
        assert int(state.step) == 2
        assert np.isfinite(float(metrics["loss"]))


class TestCheckpointResume:
    def test_full_train_state_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vision_assist_tpu.models.checkpoint import (
            load_train_state,
            save_train_state,
        )

        cfg = TrainConfig(imgsz=64, batch_size=2, warmup_epochs=0)
        model = YoloSeg(arch="yolov8n-seg", num_classes=1)
        state = create_train_state(model, jax.random.PRNGKey(0), cfg, 10)
        step = make_train_step(model, LossConfig(mask_topk=8), cfg)

        rng = np.random.default_rng(0)
        batch = {
            "images": jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3),
                                               dtype=np.uint8)),
            "boxes": jnp.tile(jnp.asarray([[8.0, 8, 40, 40]]), (2, 4, 1)),
            "classes": jnp.zeros((2, 4), jnp.int32),
            "valid": jnp.asarray(np.tile([True, False, False, False], (2, 1))),
            "masks": jnp.asarray(np.zeros((2, 16, 16), np.uint8)),
        }
        state, _ = step(state, batch)
        state, _ = step(state, batch)
        save_train_state(tmp_path / "ckpt", state)

        fresh = create_train_state(model, jax.random.PRNGKey(1), cfg, 10)
        restored = load_train_state(tmp_path / "ckpt", fresh)
        assert int(restored.step) == 2
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Resumed training continues deterministically.
        s1, m1 = step(state, batch)
        s2, m2 = step(restored, batch)
        assert float(m1["loss"]) == float(m2["loss"])


class TestLoaderShutdown:
    def test_early_abandon_releases_threads(self, tmp_path):
        """Abandoning epoch() mid-stream (the trainer's steps_per_epoch
        break in multi-process runs) must wind down the worker/flusher
        threads instead of stranding them on the queue/reorder window."""
        import threading
        import time as _time

        import cv2

        from vision_assist_tpu.data.dataset import SegDataset
        from vision_assist_tpu.data.loader import BatchLoader

        (tmp_path / "train" / "images").mkdir(parents=True)
        (tmp_path / "train" / "labels").mkdir(parents=True)
        for i in range(12):
            img = np.full((64, 64, 3), 128, np.uint8)
            cv2.imwrite(str(tmp_path / "train" / "images" / f"i{i}.jpg"), img)
            (tmp_path / "train" / "labels" / f"i{i}.txt").write_text(
                "0 0.1 0.1 0.4 0.1 0.4 0.4 0.1 0.4\n")
        ds = SegDataset(tmp_path, "train")
        loader = BatchLoader(ds, batch_size=2, imgsz=64, augment=False,
                             seed=0, prefetch=1)

        before = threading.active_count()
        gen = loader.epoch(workers=2)
        next(gen)
        gen.close()  # GeneratorExit -> finally -> stop.set()

        deadline = _time.time() + 20
        while threading.active_count() > before and _time.time() < deadline:
            _time.sleep(0.2)
        assert threading.active_count() <= before

        # And a full pass still terminates normally afterwards.
        n = sum(1 for _ in loader.epoch(workers=2))
        assert n == len(loader)


def test_overlap_mask_cap_keeps_largest_instances():
    """When an image (e.g. a mosaic composite) carries more polygons than
    max_instances, the LARGEST instances must be kept — truncating in
    label-file order would leave big real objects painted as background."""
    from vision_assist_tpu.data.dataset import polygons_to_overlap_mask

    def square(x, y, s):
        return np.array([[x, y], [x + s, y], [x + s, y + s], [x, y + s]],
                        np.float32)

    # 4 tiny squares first in file order, then one huge one.
    polys = [square(2 * i, 2 * i, 1) for i in range(4)] + [square(10, 10, 40)]
    classes = np.zeros(5, np.int32)
    mask, boxes, _, valid = polygons_to_overlap_mask(
        polys, classes, (64, 64), (64, 64), max_instances=2)
    kept_areas = sorted(
        (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        for i in range(2))
    assert valid[:2].all()
    assert kept_areas[-1] == 1600.0  # the huge square survived the cap
    assert (mask == 1).sum() > 1000  # ...and is painted (slot 0 = largest)


class TestRecipeLevers:
    """Round-4 augmentation levers (VERDICT r3 #2): copy-paste and
    rotation/shear/perspective. Defaults-off must be bit-identical to the
    reference recipe path; enabled levers must keep pixels and labels
    geometrically consistent."""

    def test_affine_levers_off_bit_identical(self):
        from vision_assist_tpu.data.augment import AugmentConfig, random_affine
        img = np.random.default_rng(3).integers(
            0, 255, (120, 120, 3)).astype(np.uint8)
        polys = [_square_poly(20, 20, 60, 60)]
        a, pa = random_affine(img, polys, np.random.default_rng(7),
                              AugmentConfig(), 120)
        b, pb = random_affine(img, polys, np.random.default_rng(7),
                              AugmentConfig(shear=0.0, degrees=0.0,
                                            perspective=0.0), 120)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(pa[0], pb[0])

    def test_affine_rotation_polygon_tracks_pixels(self):
        """With rotation/shear/perspective on, the transformed polygon must
        land on the warped pixels: rasterise the polygon before (then warp)
        and after (transformed coords) — IoU must stay high."""
        import cv2
        from vision_assist_tpu.data.augment import AugmentConfig, random_affine
        dst = 160
        img = np.zeros((160, 160, 3), np.uint8)
        poly = _square_poly(40, 50, 70, 60)
        cv2.fillPoly(img, [poly.astype(np.int32)], (255, 255, 255))
        cfg = AugmentConfig(scale=0.2, translate=0.05, degrees=15.0,
                            shear=4.0, perspective=0.0005)
        out, tp = random_affine(img, [poly], np.random.default_rng(5),
                                cfg, dst)
        mask_poly = np.zeros((dst, dst), np.uint8)
        cv2.fillPoly(mask_poly, [np.round(tp[0]).astype(np.int32)], 1)
        mask_pix = (out[:, :, 0] > 127).astype(np.uint8)
        inter = (mask_poly & mask_pix).sum()
        union = (mask_poly | mask_pix).sum()
        assert union > 300  # the square survived the warp
        assert inter / union > 0.9, f"IoU {inter / union:.3f}"

    def test_copy_paste_pastes_pixels_and_labels(self):
        from vision_assist_tpu.data.augment import copy_paste
        rng = np.random.default_rng(11)
        img = np.zeros((100, 100, 3), np.uint8)
        donor = np.full((100, 100, 3), 200, np.uint8)
        dpoly = _square_poly(10, 10, 30, 30)
        out, polys, classes = copy_paste(
            img, [], [], donor, [dpoly], [0], rng)
        assert len(polys) == 1 and classes == [0]
        import cv2
        m = np.zeros((100, 100), np.uint8)
        cv2.fillPoly(m, [np.round(polys[0]).astype(np.int32)], 1)
        sel = m.astype(bool)
        assert sel.sum() > 400
        assert (out[sel] == 200).all()        # donor pixels inside the poly
        assert (out[~sel] == 0).all()         # background untouched

    def test_copy_paste_respects_overlap_guard(self):
        from vision_assist_tpu.data.augment import copy_paste
        img = np.zeros((50, 50, 3), np.uint8)
        donor = np.full((50, 50, 3), 99, np.uint8)
        # Donor instance covers nearly the whole frame: any placement
        # overlaps the existing full-frame instance -> must be skipped.
        existing = [_square_poly(0, 0, 50, 50)]
        dpoly = _square_poly(1, 1, 46, 46)
        out, polys, classes = copy_paste(
            img, existing, [0], donor, [dpoly], [0],
            np.random.default_rng(0))
        assert len(polys) == 1 and classes == [0]
        assert (out == 0).all()

    def test_loader_copy_paste_adds_instances(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from vision_assist_tpu.data.augment import AugmentConfig
        from vision_assist_tpu.data.dataset import SegDataset
        from vision_assist_tpu.data.loader import BatchLoader

        (tmp_path / "train" / "images").mkdir(parents=True)
        (tmp_path / "train" / "labels").mkdir(parents=True)
        for i in range(4):
            img = np.full((64, 64, 3), 60, np.uint8)
            cv2.imwrite(str(tmp_path / "train" / "images" / f"i{i}.jpg"), img)
            (tmp_path / "train" / "labels" / f"i{i}.txt").write_text(
                "0 0.1 0.1 0.35 0.1 0.35 0.35 0.1 0.35\n")
        ds = SegDataset(tmp_path, "train")
        base = BatchLoader(ds, batch_size=4, imgsz=64, augment=True,
                           seed=0, aug=AugmentConfig(mosaic=0.0))
        lever = BatchLoader(ds, batch_size=4, imgsz=64, augment=True, seed=0,
                            aug=AugmentConfig(mosaic=0.0, copy_paste=1.0))
        nb = int(base._pack(np.arange(4),
                            np.random.default_rng(9))["valid"].sum())
        nl = int(lever._pack(np.arange(4),
                             np.random.default_rng(9))["valid"].sum())
        assert nl > nb

    def test_dataset_multi_split_concatenates(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from vision_assist_tpu.data.dataset import SegDataset
        for split, n in (("train", 3), ("test", 2)):
            (tmp_path / split / "images").mkdir(parents=True)
            (tmp_path / split / "labels").mkdir(parents=True)
            for i in range(n):
                cv2.imwrite(str(tmp_path / split / "images" / f"{split}{i}.jpg"),
                            np.zeros((32, 32, 3), np.uint8))
                (tmp_path / split / "labels" / f"{split}{i}.txt").write_text(
                    "0 0.2 0.2 0.8 0.2 0.8 0.8\n")
        assert len(SegDataset(tmp_path, "train")) == 3
        both = SegDataset(tmp_path, "train+test")
        assert len(both) == 5
        assert all(r.polygons for r in both.records)
