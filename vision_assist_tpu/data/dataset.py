"""YOLO-seg dataset: polygon label parsing and fixed-shape packing.

Reads the reference's Roboflow "sidewalk" dataset layout
(model/{train,valid,test}/{images,labels}, model/data.yaml — 1 class, polygon
labels "cls x1 y1 x2 y2 ..." normalised to [0,1]).

Packing is TPU-first: every image becomes fixed-shape targets
(max_instances boxes/classes + one overlap-index mask at imgsz/mask_ratio,
ultralytics overlap_mask=True semantics) so batches are static and the whole
train step jits once.
"""

from __future__ import annotations

import dataclasses
import pathlib

import numpy as np


@dataclasses.dataclass
class ImageRecord:
    image_path: pathlib.Path
    polygons: list[np.ndarray]      # each (Ni, 2) float32, normalised [0,1]
    classes: np.ndarray             # (N,) int32


def parse_label_file(path: pathlib.Path) -> tuple[list[np.ndarray], np.ndarray]:
    polygons: list[np.ndarray] = []
    classes: list[int] = []
    if not path.exists():
        return polygons, np.zeros((0,), np.int32)
    for line in path.read_text().strip().splitlines():
        parts = line.split()
        if len(parts) < 7 or len(parts) % 2 == 0:
            # class + at least 3 points; an odd coordinate count (even
            # token total) is a malformed line — skip it like short lines
            # instead of crashing the whole split's reshape at startup.
            continue
        classes.append(int(float(parts[0])))
        pts = np.array(parts[1:], dtype=np.float32).reshape(-1, 2)
        polygons.append(pts)
    return polygons, np.asarray(classes, np.int32)


class SegDataset:
    """Index of (image, polygons) records for one split.

    ``cache_images=N`` decodes every image once (in parallel) and keeps a
    max-side-N resized uint8 copy in RAM (~0.4 MB/image at 640), removing JPEG
    decode from the training hot loop — mosaic batches read 4x batch_size
    images per step.
    """

    def __init__(self, root: str | pathlib.Path, split: str = "train",
                 cache_images: int | None = None):
        root = pathlib.Path(root)
        self.records: list[ImageRecord] = []
        # "train+test" concatenates labelled splits — an extra-data recipe
        # lever (the Roboflow test split carries 530 labelled frames from the
        # SAME source videos as train; the frame-level split regime is
        # unchanged and valid stays eval-only).
        for part in split.split("+"):
            img_dir = root / part / "images"
            lbl_dir = root / part / "labels"
            before = len(self.records)
            for img_path in (sorted(img_dir.glob("*.jpg"))
                             + sorted(img_dir.glob("*.png"))):
                polys, classes = parse_label_file(
                    lbl_dir / (img_path.stem + ".txt"))
                self.records.append(ImageRecord(img_path, polys, classes))
            # Per-part check: a missing/empty part after the first must not
            # be silently ignored — 'train+test' claiming extra data while
            # training on train only would falsify the run's provenance.
            if len(self.records) == before:
                raise FileNotFoundError(f"no images under {img_dir}")

        self._cache: list[np.ndarray] | None = None
        if cache_images:
            import concurrent.futures

            def load_resized(i: int) -> np.ndarray:
                import cv2

                img = self._read(i)
                h, w = img.shape[:2]
                r = cache_images / max(h, w)
                if r < 1.0:
                    img = cv2.resize(img, (round(w * r), round(h * r)),
                                     interpolation=cv2.INTER_AREA)
                return np.ascontiguousarray(img)

            with concurrent.futures.ThreadPoolExecutor(16) as ex:
                self._cache = list(ex.map(load_resized, range(len(self.records))))

    def __len__(self) -> int:
        return len(self.records)

    def _read(self, idx: int) -> np.ndarray:
        import cv2

        img = cv2.imread(str(self.records[idx].image_path))
        if img is None:
            raise IOError(f"failed to read {self.records[idx].image_path}")
        return img  # BGR uint8

    def load_image(self, idx: int) -> np.ndarray:
        if self._cache is not None:
            return self._cache[idx]
        return self._read(idx)


def polygons_to_overlap_mask(polygons: list[np.ndarray], classes: np.ndarray,
                             hw: tuple[int, int], mask_hw: tuple[int, int],
                             max_instances: int
                             ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Rasterise polygons (in PIXEL coords of an hw-sized image) to the
    overlap-index mask + packed boxes, ultralytics overlap_mask semantics:
    instances sorted by area descending, drawn with values 1..N so smaller
    instances overwrite larger ones.

    Returns (index_mask (mh, mw) uint8, boxes_xyxy (max_instances, 4) pixels,
    classes (max_instances,), valid (max_instances,)).
    """
    import cv2

    h, w = hw
    mh, mw = mask_hw
    sx, sy = mw / w, mh / h

    # Rank ALL instances by bbox area, then keep the largest max_instances:
    # truncating first would drop overflow instances in arbitrary label-file
    # order (a mosaic batch can exceed the cap) and leave their real object
    # pixels labelled background. The kept list is already area-descending,
    # which is the required paint order (smaller instances overwrite).
    areas = []
    for p in polygons:
        x1, y1 = p.min(axis=0)
        x2, y2 = p.max(axis=0)
        areas.append(max(x2 - x1, 0) * max(y2 - y1, 0))
    order = (np.argsort(-np.asarray(areas))[:max_instances]
             if polygons else np.zeros(0, np.int64))

    mask = np.zeros((mh, mw), np.uint8)
    boxes = np.zeros((max_instances, 4), np.float32)
    cls_out = np.zeros((max_instances,), np.int32)
    valid = np.zeros((max_instances,), bool)

    for slot, inst in enumerate(order):
        p = polygons[inst]
        scaled = np.round(p * [sx, sy]).astype(np.int32)
        cv2.fillPoly(mask, [scaled], slot + 1)
        x1, y1 = p.min(axis=0)
        x2, y2 = p.max(axis=0)
        boxes[slot] = [x1, y1, x2, y2]
        cls_out[slot] = classes[inst] if inst < len(classes) else 0
        valid[slot] = (x2 > x1) and (y2 > y1)

    return mask, boxes, cls_out, valid
