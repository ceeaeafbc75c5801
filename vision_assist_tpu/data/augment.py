"""Training augmentations (host-side, numpy/cv2) operating on
(image, polygons) pairs; polygons stay exact under the affine transforms and
are rasterised only after all geometry is applied.

Mirrors the reference training recipe (model/runs/segment/train11/args.yaml:
mosaic 1.0, translate 0.1, scale 0.5, fliplr 0.5, hsv 0.015/0.7/0.4,
close_mosaic 10) without copying ultralytics' implementation.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    mosaic: float = 1.0
    translate: float = 0.1
    scale: float = 0.5
    degrees: float = 0.0
    fliplr: float = 0.5
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    # Round-4 recipe levers (VERDICT r3 #2; all default OFF = the reference
    # recipe exactly). shear in degrees; perspective is the ultralytics-style
    # projective coefficient range; copy_paste is the per-sample probability
    # of pasting donor instances (data from a second image).
    shear: float = 0.0
    perspective: float = 0.0
    copy_paste: float = 0.0


def letterbox_np(img: np.ndarray, polygons: list[np.ndarray], dst: int,
                 pad_value: int = 114) -> tuple[np.ndarray, list[np.ndarray]]:
    """Square letterbox on host; polygons (pixel coords) transformed alongside."""
    import cv2

    h, w = img.shape[:2]
    r = min(dst / h, dst / w)
    nh, nw = round(h * r), round(w * r)
    top = (dst - nh) // 2
    left = (dst - nw) // 2
    resized = (img if (nh, nw) == (h, w)
               else cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR))
    out = np.full((dst, dst, 3), pad_value, np.uint8)
    out[top:top + nh, left:left + nw] = resized
    polys = [p * r + [left, top] for p in polygons]
    return out, polys


def random_affine(img: np.ndarray, polygons: list[np.ndarray],
                  rng: np.random.Generator, cfg: AugmentConfig,
                  dst: int
                  ) -> tuple[np.ndarray, list[np.ndarray]]:
    """Random scale+translate, optionally rotation/shear/perspective.

    The reference recipe runs degrees=shear=perspective=0, and with those
    zeros this is bit-identical to the plain scale+translate warp (the fast
    warpAffine path). The extra terms are the round-4 recipe levers — a
    body-worn camera tilts and pitches, so rotation/perspective jitter is a
    realistic geometry prior for this dataset. Random draws happen in a
    FIXED order regardless of which levers are enabled, so a seeded run's
    scale/translate stream is unchanged when the levers stay off.
    """
    import cv2

    s = rng.uniform(1 - cfg.scale, 1 + cfg.scale)
    tx = rng.uniform(0.5 - cfg.translate, 0.5 + cfg.translate) * dst
    ty = rng.uniform(0.5 - cfg.translate, 0.5 + cfg.translate) * dst
    cx, cy = img.shape[1] / 2, img.shape[0] / 2

    if not (cfg.degrees or cfg.shear or cfg.perspective):
        m = np.array([[s, 0, tx - s * cx], [0, s, ty - s * cy]], np.float32)
        out = cv2.warpAffine(img, m, (dst, dst), borderValue=(114, 114, 114))
        polys = []
        for p in polygons:
            q = p @ m[:, :2].T + m[:, 2]
            q = np.clip(q, 0, dst - 1e-3)
            polys.append(q.astype(np.float32))
        return out, polys

    ang = np.radians(rng.uniform(-cfg.degrees, cfg.degrees))
    shx = np.tan(np.radians(rng.uniform(-cfg.shear, cfg.shear)))
    shy = np.tan(np.radians(rng.uniform(-cfg.shear, cfg.shear)))
    px = rng.uniform(-cfg.perspective, cfg.perspective)
    py = rng.uniform(-cfg.perspective, cfg.perspective)

    centre = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], np.float64)
    persp = np.array([[1, 0, 0], [0, 1, 0], [px, py, 1]], np.float64)
    rot = np.array([[s * np.cos(ang), -s * np.sin(ang), 0],
                    [s * np.sin(ang), s * np.cos(ang), 0],
                    [0, 0, 1]], np.float64)
    shear = np.array([[1, shx, 0], [shy, 1, 0], [0, 0, 1]], np.float64)
    trans = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float64)
    m3 = trans @ shear @ rot @ persp @ centre

    out = cv2.warpPerspective(img, m3, (dst, dst),
                              borderValue=(114, 114, 114))
    polys = []
    for p in polygons:
        q = np.concatenate([p, np.ones((len(p), 1), p.dtype)], axis=1) @ m3.T
        q = q[:, :2] / q[:, 2:3]
        q = np.clip(q, 0, dst - 1e-3)
        polys.append(q.astype(np.float32))
    return out, polys


def copy_paste(img: np.ndarray, polys: list[np.ndarray], classes: list[int],
               donor_img: np.ndarray, donor_polys: list[np.ndarray],
               donor_classes: list[int], rng: np.random.Generator,
               max_paste: int = 3, max_ioa: float = 0.3
               ) -> tuple[np.ndarray, list[np.ndarray], list[int]]:
    """Instance copy-paste (round-4 lever): paste up to ``max_paste`` donor
    instances at random positions; a candidate is skipped when its bbox
    covers an existing instance's bbox by more than ``max_ioa``.

    Both images must share the same (square, letterboxed) geometry. Pixels
    are hard-pasted inside the exact polygon raster; the pasted polygon and
    class join the label set, so masks/boxes stay consistent downstream
    (rasterisation happens after all geometry, loader.py).
    """
    import cv2

    h, w = img.shape[:2]
    if not donor_polys:
        return img, polys, classes
    out = img.copy()
    polys = list(polys)
    classes = list(classes)
    order = rng.permutation(len(donor_polys))[:max_paste]
    for i in order:
        p = donor_polys[int(i)]
        x1, y1 = p.min(axis=0)
        x2, y2 = p.max(axis=0)
        bw, bh = x2 - x1, y2 - y1
        if bw < 8 or bh < 8 or bw >= w - 2 or bh >= h - 2:
            continue
        tx = rng.uniform(0, w - 1 - bw) - x1
        ty = rng.uniform(0, h - 1 - bh) - y1
        q = (p + [tx, ty]).astype(np.float32)
        qx1, qy1 = q.min(axis=0)
        qx2, qy2 = q.max(axis=0)
        blocked = False
        for e in polys:
            ex1, ey1 = e.min(axis=0)
            ex2, ey2 = e.max(axis=0)
            iw = min(qx2, ex2) - max(qx1, ex1)
            ih = min(qy2, ey2) - max(qy1, ey1)
            if iw <= 0 or ih <= 0:
                continue
            area = max((ex2 - ex1) * (ey2 - ey1), 1e-6)
            if iw * ih / area > max_ioa:
                blocked = True
                break
        if blocked:
            continue
        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [np.round(q).astype(np.int32)], 1)
        shift = np.float32([[1, 0, tx], [0, 1, ty]])
        moved = cv2.warpAffine(donor_img, shift, (w, h))
        sel = mask.astype(bool)
        out[sel] = moved[sel]
        polys.append(q)
        classes.append(donor_classes[int(i)])
    return out, polys, classes


def hsv_jitter(img: np.ndarray, rng: np.random.Generator,
               cfg: AugmentConfig) -> np.ndarray:
    import cv2

    if not (cfg.hsv_h or cfg.hsv_s or cfg.hsv_v):
        return img
    gains = rng.uniform(-1, 1, 3) * [cfg.hsv_h, cfg.hsv_s, cfg.hsv_v] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(256)
    lut_h = ((x * gains[0]) % 180).astype(np.uint8)
    lut_s = np.clip(x * gains[1], 0, 255).astype(np.uint8)
    lut_v = np.clip(x * gains[2], 0, 255).astype(np.uint8)
    merged = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                        cv2.LUT(val, lut_v)))
    return cv2.cvtColor(merged, cv2.COLOR_HSV2BGR)


def flip_polys(polygons: list[np.ndarray], w: int) -> list[np.ndarray]:
    """Mirror polygons about the vertical centre of a width-w image."""
    return [np.stack([w - p[:, 0], p[:, 1]], -1).astype(np.float32)
            for p in polygons]


def flip_lr(img: np.ndarray, polygons: list[np.ndarray]
            ) -> tuple[np.ndarray, list[np.ndarray]]:
    return np.ascontiguousarray(img[:, ::-1]), flip_polys(polygons,
                                                          img.shape[1])


def mosaic4(images: list[np.ndarray], polys_list: list[list[np.ndarray]],
            rng: np.random.Generator, dst: int
            ) -> tuple[np.ndarray, list[np.ndarray]]:
    """4-image mosaic on a 2*dst canvas centred at a random point; the caller
    follows with random_affine which crops back to dst."""
    import cv2

    s = dst
    canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
    xc = int(rng.uniform(s * 0.5, s * 1.5))
    yc = int(rng.uniform(s * 0.5, s * 1.5))
    out_polys: list[np.ndarray] = []

    for i, (img, polys) in enumerate(zip(images, polys_list)):
        h, w = img.shape[:2]
        r = min(s / h, s / w)
        nh, nw = round(h * r), round(w * r)
        if (nh, nw) != (h, w):
            img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)

        if i == 0:    # top-left of centre
            x1, y1 = max(xc - nw, 0), max(yc - nh, 0)
            hr, wr = yc - y1, xc - x1
            canvas[y1:yc, x1:xc] = img[nh - hr:, nw - wr:]
            ox, oy = xc - nw, yc - nh
        elif i == 1:  # top-right
            x2, y1 = min(xc + nw, 2 * s), max(yc - nh, 0)
            hr, wr = yc - y1, x2 - xc
            canvas[y1:yc, xc:x2] = img[nh - hr:, :wr]
            ox, oy = xc, yc - nh
        elif i == 2:  # bottom-left
            x1, y2 = max(xc - nw, 0), min(yc + nh, 2 * s)
            hr, wr = y2 - yc, xc - x1
            canvas[yc:y2, x1:xc] = img[:hr, nw - wr:]
            ox, oy = xc - nw, yc
        else:         # bottom-right
            x2, y2 = min(xc + nw, 2 * s), min(yc + nh, 2 * s)
            hr, wr = y2 - yc, x2 - xc
            canvas[yc:y2, xc:x2] = img[:hr, :wr]
            ox, oy = xc, yc

        for p in polys:
            q = p * r + [ox, oy]
            q = np.clip(q, 0, 2 * s - 1e-3)
            out_polys.append(q.astype(np.float32))

    return canvas, out_polys
