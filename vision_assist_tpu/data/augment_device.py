"""Device-side photometric augmentation, fused into the jitted train step.

The host on this class of machine is loader-bound (a single core packs
mosaics at ~25 img/s while the chip idles), so the per-pixel photometric ops
— HSV jitter and channel reordering — run on-chip as elementwise float math
that XLA fuses straight into the model's input normalisation. The host keeps
only the geometry (mosaic placement, scale+translate affine, polygon
transforms), which is exact and cheap.

Semantics follow the reference recipe's HSV augmentation (ultralytics
augment_hsv, driven by model/runs/segment/train11/args.yaml hsv_h/s/v =
0.015/0.7/0.4): hue rotated by a gain, saturation/value scaled with clipping.
cv2 implements it as uint8 LUTs in HSV space; this is the same transform in
float32 (the ~1/255 quantisation difference is noise relative to the random
gains themselves).
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsv(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """img (..., 3) float32 RGB in [0, 1] -> (h_degrees [0,360), s [0,1], v [0,1])."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.max(img, axis=-1)
    c = v - jnp.min(img, axis=-1)
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r, ((g - b) / safe_c) % 6.0,
        jnp.where(v == g, (b - r) / safe_c + 2.0, (r - g) / safe_c + 4.0))
    h = jnp.where(c > 0, h * 60.0, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return h, s, v


def hsv_to_rgb(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rgb_to_hsv; returns (..., 3) float32 RGB in [0, 1]."""
    hp = (h % 360.0) / 60.0
    c = v * s
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = v - c
    sector = jnp.floor(hp).astype(jnp.int32)
    zeros = jnp.zeros_like(c)
    r = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4],
                   [c, x, zeros, zeros, x], c)
    g = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4],
                   [x, c, c, x, zeros], zeros)
    b = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4],
                   [zeros, zeros, x, c, c], x)
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def hsv_jitter_rgb(images: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """Apply per-image HSV gains on-device.

    images: (B, H, W, 3) float32 RGB in [0, 1].
    gains:  (B, 3) float32 (hue_gain, sat_gain, val_gain); (1, 1, 1) is a
            no-op. Matches the host cv2 LUT transform: hue rotates
            multiplicatively mod a full turn, sat/val scale with clipping.
    """
    h, s, v = rgb_to_hsv(images)
    gh = gains[:, 0][:, None, None]
    gs = gains[:, 1][:, None, None]
    gv = gains[:, 2][:, None, None]
    h = (h * gh) % 360.0
    s = jnp.clip(s * gs, 0.0, 1.0)
    v = jnp.clip(v * gv, 0.0, 1.0)
    return hsv_to_rgb(h, s, v)
