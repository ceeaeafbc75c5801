"""YUV 4:2:0 (I420) frame transfer: host packs, device unpacks.

Cameras deliver YUV 4:2:0 natively (V4L2/NV12; the reference's
``cv2.VideoCapture`` frames decode from 4:2:0 sources — MockCamera.py:21-38),
and the sidewalk dataset's JPEGs are 4:2:0 chroma-subsampled already, so
streaming I420 to the device carries the same information as BGR at 2.13x
fewer bytes (H*W*1.5 vs H*W*3).  On this box the host->device wire is the
serving bottleneck (~20 MB/s effective for execute-consumed uploads,
diagnostics/h2d_overlap.json), so the transfer format roughly doubles
end-to-end throughput; on a PCIe-attached TPU host it is still the format a
zero-copy camera DMA path would use.

The device-side conversion matches OpenCV's ``COLOR_YUV2BGR_I420`` (ITU-R
BT.601 studio-swing constants, the same fixed-point values cv2 uses,
``ITUR_BT_601_CY`` etc.) so ``i420_to_bgr(bgr_to_i420_host(f))`` equals
``cv2.cvtColor(cv2.cvtColor(f, BGR2YUV_I420), YUV2BGR_I420)`` to within
one code value (validated in tests/test_yuv.py).
"""

from __future__ import annotations

import numpy as np

# OpenCV's ITU-R BT.601 fixed-point constants, >> 20 (modules/imgproc/src/
# color_yuv.simd.hpp): CY=1220542 CUB=2116026 CUG=-409993 CVG=-852492
# CVR=1673527.
_CY = 1220542 / (1 << 20)
_CUB = 2116026 / (1 << 20)
_CUG = -409993 / (1 << 20)
_CVG = -852492 / (1 << 20)
_CVR = 1673527 / (1 << 20)


def i420_shape(h: int, w: int) -> tuple[int, int]:
    """Shape of the packed I420 plane for an (h, w, 3) frame."""
    if h % 2 or w % 2:
        raise ValueError(f"I420 needs even dimensions, got {h}x{w}")
    return (h * 3 // 2, w)


def bgr_to_i420_host(frame_bgr: np.ndarray) -> np.ndarray:
    """Pack a (H, W, 3) uint8 BGR frame into cv2's (H*3/2, W) I420 layout.

    Uses cv2's own converter (SIMD, sub-ms) — this is the host half of the
    transfer and stands in for a camera that produces I420 directly.
    """
    import cv2

    return cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2YUV_I420)


def i420_to_bgr(plane, h: int, w: int):
    """Device-side (H*3/2, W) uint8 I420 -> (H, W, 3) uint8 BGR.

    jnp elementwise + 2x nearest chroma upsample; negligible next to the
    conv stack it feeds. Matches cv2 COLOR_YUV2BGR_I420 within +-1.
    """
    import jax.numpy as jnp

    y = plane[:h].astype(jnp.float32)
    # The U and V planes are CONTIGUOUS h*w/4-byte runs after Y; when
    # h % 4 != 0 (e.g. 270) they do not fall on whole rows of the packed
    # (h*3/2, w) layout, so split the flattened chroma bytes, never rows.
    chroma = plane[h:].reshape(-1)
    q = (h // 2) * (w // 2)
    u = chroma[:q].reshape(h // 2, w // 2).astype(jnp.float32)
    v = chroma[q:].reshape(h // 2, w // 2).astype(jnp.float32)
    # 2x2 nearest upsample of the chroma planes.
    u = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1)
    v = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1)

    c = (y - 16.0) * _CY
    d = u - 128.0
    e = v - 128.0
    b = c + _CUB * d
    g = c + _CUG * d + _CVG * e
    r = c + _CVR * e
    bgr = jnp.stack([b, g, r], axis=-1)
    # cv2 rounds-half-up in fixed point ((x + (1<<19)) >> 20); round() here,
    # the residual half-ulp cases are the +-1 tolerance.
    return jnp.clip(jnp.round(bgr), 0.0, 255.0).astype(jnp.uint8)
