"""Batch loader: geometry augmentation + fixed-shape packing + prefetch.

Host side of the training input pipeline; the TPU step consumes fully-packed
dense batches (images, overlap masks, padded boxes) so the jitted program
never sees a dynamic shape. Augmentation follows the reference recipe
(data/augment.py); rasterisation happens once, after all geometry.

Split of work (single-core host, idle chip):
  host   — geometry only: mosaic placement, scale+translate affine, polygon
           transforms, mask rasterisation. Packed images are **BGR uint8**.
  device — photometrics: BGR->RGB reorder + per-image HSV jitter, fused into
           the train step via the packed ``hsv_gains`` (B, 3) array
           (data/augment_device.py).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from vision_assist_tpu.data.augment import (
    AugmentConfig,
    flip_polys,
    letterbox_np,
    mosaic4,
    random_affine,
)
from vision_assist_tpu.data.dataset import SegDataset, polygons_to_overlap_mask


class BatchLoader:
    def __init__(self, dataset: SegDataset, batch_size: int = 16,
                 imgsz: int = 640, mask_ratio: int = 4,
                 max_instances: int = 32, augment: bool = True,
                 aug: AugmentConfig | None = None, seed: int = 0,
                 prefetch: int = 4, wire_format: str = "bgr"):
        self.ds = dataset
        # "i420": pack batch images to the (B, S*3/2, S) YUV 4:2:0 plane
        # (cv2, ~0.3 ms/img) so 2.13x fewer bytes cross the relay per step;
        # the train step converts back on-device (models/train.py).
        self.wire_format = wire_format
        self.batch_size = batch_size
        self.imgsz = imgsz
        self.mask_hw = (imgsz // mask_ratio, imgsz // mask_ratio)
        self.max_instances = max_instances
        self.augment = augment
        self.aug = aug or AugmentConfig()
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.mosaic_enabled = augment and self.aug.mosaic > 0

    def __len__(self) -> int:
        return len(self.ds) // self.batch_size

    # -- single sample -------------------------------------------------------------

    def _sample(self, idx: int, rng: np.random.Generator
                ) -> tuple[np.ndarray, list[np.ndarray], list[int],
                           bool, np.ndarray]:
        """One augmented sample. Returns (image BGR — unflipped, polygons —
        flip already applied, classes, flip flag, hsv gains).

        Photometric work (HSV jitter, channel order, the pixel flip) runs
        on-device inside the train step (data/augment_device.py); the host
        does only geometry, keeping the single-core loader off the critical
        path."""
        rec = self.ds.records[idx]
        img = self.ds.load_image(idx)
        h, w = img.shape[:2]
        polys = [p * [w, h] for p in rec.polygons]
        classes = list(rec.classes)
        flip = False
        gains = np.ones(3, np.float32)

        if self.augment:
            if self.mosaic_enabled and rng.random() < self.aug.mosaic:
                extra = rng.integers(0, len(self.ds), 3)
                imgs, plists, clists = [img], [polys], [classes]
                for j in extra:
                    rj = self.ds.records[int(j)]
                    ij = self.ds.load_image(int(j))
                    hj, wj = ij.shape[:2]
                    imgs.append(ij)
                    plists.append([p * [wj, hj] for p in rj.polygons])
                    clists.append(list(rj.classes))
                img, polys = mosaic4(imgs, plists, rng, self.imgsz)
                classes = [c for cl in clists for c in cl]
                img, polys = random_affine(img, polys, rng, self.aug,
                                           self.imgsz)
            else:
                img, polys = letterbox_np(img, polys, self.imgsz)
                img, polys = random_affine(img, polys, rng, self.aug,
                                           self.imgsz)
            if self.aug.copy_paste > 0 and rng.random() < self.aug.copy_paste:
                from vision_assist_tpu.data.augment import copy_paste
                j = int(rng.integers(0, len(self.ds)))
                rj = self.ds.records[j]
                ij = self.ds.load_image(j)
                hj, wj = ij.shape[:2]
                dimg, dpolys = letterbox_np(
                    ij, [p * [wj, hj] for p in rj.polygons], self.imgsz)
                img, polys, classes = copy_paste(
                    img, polys, classes, dimg, dpolys, list(rj.classes), rng)
            gains = (rng.uniform(-1, 1, 3)
                     * [self.aug.hsv_h, self.aug.hsv_s, self.aug.hsv_v]
                     + 1).astype(np.float32)
            if rng.random() < self.aug.fliplr:
                flip = True
                polys = flip_polys(polys, img.shape[1])
        else:
            img, polys = letterbox_np(img, polys, self.imgsz)

        # Drop degenerate polygons (fully clipped away).
        kept_polys, kept_classes = [], []
        for p, c in zip(polys, classes):
            x1, y1 = p.min(axis=0)
            x2, y2 = p.max(axis=0)
            if (x2 - x1) > 2 and (y2 - y1) > 2:
                kept_polys.append(p)
                kept_classes.append(c)
        return img, kept_polys, kept_classes, flip, gains

    def _pack(self, idxs: np.ndarray,
              rng: np.random.Generator | None = None) -> dict[str, np.ndarray]:
        rng = rng if rng is not None else self.rng
        b = len(idxs)
        s = self.imgsz
        mh, mw = self.mask_hw
        images = np.zeros((b, s, s, 3), np.uint8)
        masks = np.zeros((b, mh, mw), np.uint8)
        boxes = np.zeros((b, self.max_instances, 4), np.float32)
        classes = np.zeros((b, self.max_instances), np.int32)
        valid = np.zeros((b, self.max_instances), bool)

        hsv_gains = np.ones((b, 3), np.float32)
        for i, idx in enumerate(idxs):
            img, polys, cls, flip, gains = self._sample(int(idx), rng)
            # Images stay BGR; the train step flips channels on-device along
            # with the HSV jitter. The lr-flip is one strided copy here
            # (polygons were already flipped in _sample).
            images[i] = img[:, ::-1] if flip else img
            hsv_gains[i] = gains
            m, bx, cl, vd = polygons_to_overlap_mask(
                polys, np.asarray(cls, np.int32), (s, s), (mh, mw),
                self.max_instances)
            masks[i], boxes[i], classes[i], valid[i] = m, bx, cl, vd
        if self.wire_format == "i420":
            from vision_assist_tpu.ops.yuv import bgr_to_i420_host
            packed = np.empty((b, s * 3 // 2, s), np.uint8)
            for i in range(b):
                packed[i] = bgr_to_i420_host(images[i])
            images = packed
        return {"images": images, "masks": masks, "boxes": boxes,
                "classes": classes, "valid": valid, "hsv_gains": hsv_gains}

    # -- iteration -------------------------------------------------------------------

    def epoch(self, shuffle: bool = True, workers: int = 4):
        """Yield packed batches in deterministic order; packing (decode,
        augment, rasterise) is parallelised across worker threads, each with
        its own per-batch Generator so results don't depend on scheduling."""
        order = np.arange(len(self.ds))
        if shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        batch_seeds = self.rng.integers(0, 2 ** 63 - 1, size=n_batches)

        results: dict[int, dict] = {}
        next_needed = [0]
        cond = threading.Condition()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        window = max(self.prefetch, workers) + workers

        # Cooperative shutdown: a consumer that abandons the generator early
        # (break/close — e.g. the trainer's `si >= steps_per_epoch` guard in
        # multi-process runs) must not strand the flusher on a full queue and
        # the workers in cond.wait, each pinning a packed ~20 MB batch.
        stop = threading.Event()

        def worker(wid: int):
            for bi in range(wid, n_batches, workers):
                if stop.is_set():
                    return
                idxs = order[bi * self.batch_size:(bi + 1) * self.batch_size]
                packed = self._pack(idxs, np.random.default_rng(batch_seeds[bi]))
                with cond:
                    # Bounded reorder window relative to the flush head; the
                    # worker holding the head batch never waits, so this
                    # cannot deadlock.
                    while bi - next_needed[0] >= window and not stop.is_set():
                        cond.wait(timeout=1.0)
                    if stop.is_set():
                        return
                    results[bi] = packed
                    cond.notify_all()

        def flusher():
            for bi in range(n_batches):
                with cond:
                    while bi not in results and not stop.is_set():
                        cond.wait(timeout=1.0)
                    if stop.is_set():
                        return
                    packed = results.pop(bi)
                    next_needed[0] = bi + 1
                    cond.notify_all()
                while not stop.is_set():  # blocks on queue backpressure
                    try:
                        q.put(packed, timeout=1.0)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(None)

        for w in range(workers):
            threading.Thread(target=worker, args=(w,), daemon=True).start()
        flusher_t = threading.Thread(target=flusher, daemon=True)
        flusher_t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            with cond:
                cond.notify_all()
            # Drain until the flusher has actually exited (ADVICE r3): its
            # in-flight q.put can succeed after a single drain, pinning one
            # packed ~20 MB batch until the daemon thread notices stop.
            deadline = 5.0
            while True:
                try:
                    while True:
                        q.get_nowait()
                except queue.Empty:
                    pass
                if not flusher_t.is_alive() or deadline <= 0:
                    break
                flusher_t.join(timeout=0.2)
                deadline -= 0.2
            results.clear()
