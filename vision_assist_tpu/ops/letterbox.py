"""Letterbox preprocessing: aspect-preserving resize + grey pad + normalize.

TPU twin of the preprocessing ultralytics applies before the reference's
model.predict (vendored copy: testing/old/segmenting_using_tflite/
just_segmentation_using_tflite_model.py:36-115 — min-ratio resize, 114-grey
padding, /255). Fixed square output (rectangular/auto mode is a dynamic-shape
hazard on TPU; the accuracy effect is nil at nc=1 and documented).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LetterboxSpec:
    """Static geometry of a letterbox transform (computed at trace time)."""

    src_h: int
    src_w: int
    dst: int                 # square destination size
    ratio: float
    new_h: int
    new_w: int
    pad_top: int
    pad_left: int

    @classmethod
    def create(cls, src_h: int, src_w: int, dst: int) -> "LetterboxSpec":
        r = min(dst / src_h, dst / src_w)
        new_h, new_w = round(src_h * r), round(src_w * r)
        # ultralytics splits padding evenly and rounds with the -0.1/+0.1 trick.
        dh, dw = (dst - new_h) / 2, (dst - new_w) / 2
        return cls(src_h=src_h, src_w=src_w, dst=dst, ratio=r,
                   new_h=new_h, new_w=new_w,
                   pad_top=int(round(dh - 0.1)), pad_left=int(round(dw - 0.1)))

    def frame_to_dst(self, x: float, y: float) -> tuple[float, float]:
        """Map a source-frame pixel coordinate into letterboxed continuous
        coordinates (align_corners=False convention)."""
        return ((x + 0.5) * self.ratio - 0.5 + self.pad_left,
                (y + 0.5) * self.ratio - 0.5 + self.pad_top)


@functools.partial(jax.jit, static_argnames=("dst", "bgr_to_rgb", "pad_value"))
def letterbox(image: jax.Array, dst: int = 640, bgr_to_rgb: bool = True,
              pad_value: float = 114.0) -> jax.Array:
    """uint8 (H, W, 3) frame -> float32 (dst, dst, 3) in [0, 1]."""
    h, w = image.shape[0], image.shape[1]
    spec = LetterboxSpec.create(h, w, dst)
    img = image.astype(jnp.float32)
    if bgr_to_rgb:
        img = img[..., ::-1]
    # antialias=False: cv2.resize(INTER_LINEAR) — the reference
    # preprocessing AND this repo's host training/eval letterbox — never
    # antialiases, so the default antialiased kernel would skew serving
    # inputs away from what the model was trained on.
    resized = jax.image.resize(img, (spec.new_h, spec.new_w, 3), "bilinear",
                               antialias=False)
    out = jnp.full((dst, dst, 3), pad_value, jnp.float32)
    out = jax.lax.dynamic_update_slice(
        out, resized, (spec.pad_top, spec.pad_left, 0))
    return out / 255.0


@functools.partial(jax.jit, static_argnames=("threshold",))
def sample_mask_logits_at_points(mask_logits: jax.Array, points_dst: jax.Array,
                                 dst: int = 640,
                                 threshold: bool = True) -> jax.Array:
    """Bilinearly sample (D, Hp, Wp) mask logits at continuous letterboxed
    coordinates points_dst (N, 2) and (optionally) threshold at 0.

    Equivalent to the reference chain "upsample masks to the letterboxed input
    bilinearly, then test > 0 at a pixel" (ops.py:735-737) without ever
    materialising full-resolution masks: sampling the logits at the mapped
    point IS the bilinear upsample evaluated there.
    """
    d, hp, wp = mask_logits.shape
    sx = wp / dst
    sy = hp / dst
    # align_corners=False: dst pixel p samples source at (p + .5) * scale - .5,
    # with the source coordinate clamped into [0, n-1] BEFORE the floor/frac
    # split (torch/F.interpolate edge behaviour).
    px = jnp.clip((points_dst[:, 0] + 0.5) * sx - 0.5, 0, wp - 1)
    py = jnp.clip((points_dst[:, 1] + 0.5) * sy - 0.5, 0, hp - 1)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[None, :]
    fy = (py - y0)[None, :]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, wp - 1)
    x1i = jnp.clip(x0i + 1, 0, wp - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, hp - 1)
    y1i = jnp.clip(y0i + 1, 0, hp - 1)

    g = lambda yy, xx: mask_logits[:, yy, xx]  # noqa: E731  (D, N)
    val = (g(y0i, x0i) * (1 - fx) * (1 - fy) + g(y0i, x1i) * fx * (1 - fy)
           + g(y1i, x0i) * (1 - fx) * fy + g(y1i, x1i) * fx * fy)
    return val > 0 if threshold else val
