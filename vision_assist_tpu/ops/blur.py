"""Blur metric: Laplacian variance, jitted.

Twin of the reference's blur gate (FrameProcessor.py:44-48: BGR->gray,
cv2.Laplacian CV_64F, variance < 100 => blurry; disabled by default in the
live path, FrameProcessor.py:314-319 — same default here via BlurConfig).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# cv2.cvtColor BGR2GRAY weights.
_BGR_WEIGHTS = jnp.array([0.114, 0.587, 0.299], jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def laplacian_variance(image_bgr: jax.Array) -> jax.Array:
    """Variance of the 3x3 Laplacian of the grayscale image (float32 scalar).

    cv2 rounds the grayscale to uint8 before the Laplacian; we keep float
    precision (the metric only feeds a threshold comparison).
    """
    gray = jnp.tensordot(image_bgr.astype(jnp.float32), _BGR_WEIGHTS, axes=1)
    g = jnp.round(gray)  # match cv2's uint8 quantisation of the gray image
    # 3x3 Laplacian [[0,1,0],[1,-4,1],[0,1,0]] with BORDER_REFLECT_101 (cv2
    # default): pad by edge mirror excluding the border pixel.
    p = jnp.pad(g, 1, mode="reflect")
    lap = (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
           - 4.0 * g)
    return jnp.var(lap)


def is_blurry(image_bgr: jax.Array, threshold: float = 100.0) -> jax.Array:
    return laplacian_variance(image_bgr) < threshold
