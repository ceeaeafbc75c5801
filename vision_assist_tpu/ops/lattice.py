"""On-chip lattice ops: occupancy extraction, artificial-cell injection, and
binary-image rasterisation.

TPU-first reformulation of the reference's polygon/dict machinery
(FrameProcessor.py:85-171, ProtrusionDetector.py:38-57): masks stay dense
arrays end-to-end, the lattice has a fixed full-frame shape, and every op is a
fixed-shape jnp program that batches over a leading stream axis with vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vision_assist_tpu.golden.lattice import (
    artificial_column_mask,
    artificial_start_row,
)


def occupancy_from_mask(mask: jax.Array, grid_size: int = 20) -> jax.Array:
    """Cell occupancy by sampling each cell's centre pixel of a dense
    {0,1}/bool segmentation mask — exactly the reference's in-mask test
    (FrameProcessor.py:88-97: mask_img[centre_y, centre_x] > 0)."""
    h, w = mask.shape[-2:]
    half = grid_size // 2
    return mask[..., half:h:grid_size, half:w:grid_size] > 0


@functools.partial(jax.jit, static_argnames=(
    "frame_width", "frame_height", "grid_size", "half_span",
    "row_start_frac", "replay_rounding"))
def inject_artificial_cells(
    occupancy: jax.Array,
    *,
    frame_width: int,
    frame_height: int,
    grid_size: int = 20,
    half_span: int = 8,
    row_start_frac: float = 0.8375,
    replay_rounding: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Always-walkable cells at the user's feet; static masks, elementwise OR.
    Twin of golden.lattice.inject_artificial_cells (reference
    FrameProcessor.py:126-165 / run_on_main.py:104-143)."""
    rows = occupancy.shape[-2]
    cols = occupancy.shape[-1]
    col_mask = np.asarray(
        artificial_column_mask(cols, frame_width, grid_size, half_span))
    start_row = artificial_start_row(frame_height, grid_size, row_start_frac,
                                     replay_rounding)
    row_mask = np.zeros(rows, dtype=bool)
    if start_row < rows:
        row_mask[start_row:] = True
    injected = jnp.asarray(row_mask[:, None] & col_mask[None, :])

    occupancy = occupancy.astype(bool)
    artificial = injected & ~occupancy
    walkable = occupancy | injected
    return walkable, artificial


@functools.partial(jax.jit, static_argnames=("grid_size",))
def rasterize_cells(walkable: jax.Array, grid_size: int = 20) -> jax.Array:
    """Binary (H, W) bool image of walkable cells painted as *inclusive*
    (grid_size+1)^2 squares, clipped at the frame edge — identical to the
    union of the reference's per-cell cv2.fillPoly calls
    (ProtrusionDetector.py:38-57; verified against cv2 in the host twin tests).

    Upsample by grid_size, then OR in one-pixel down/right shifts so each
    cell also owns the first pixel row/column of its successor (the shared
    boundary cv2 paints).
    """
    rep = jnp.repeat(jnp.repeat(walkable.astype(bool), grid_size, axis=-2),
                     grid_size, axis=-1)
    down = jnp.pad(rep[..., :-1, :], [(1, 0), (0, 0)])
    right = jnp.pad(rep[..., :, :-1], [(0, 0), (1, 0)])
    diag = jnp.pad(rep[..., :-1, :-1], [(1, 0), (1, 0)])
    return rep | down | right | diag
