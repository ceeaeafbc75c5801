"""On-chip peak (goal point) detection — fixed-shape twin of
ProtrusionDetector's active path (ProtrusionDetector.py:59-158).

The reference materialises a pixel image and runs np.where scans; here the
binary image is produced by ops.lattice.rasterize_cells and every scan becomes
a masked reduction. Outputs are padded to ``max_peaks`` with a validity mask so
the whole op jits with static shapes and batches with vmap.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

_BIG = jnp.int32(1 << 30)

# Orientation codes (match types.Peak.orientation)
ORIENT_UP, ORIENT_LEFT, ORIENT_RIGHT = 0, 1, 2
ORIENTATION_NAMES = ("up", "left", "right")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PeakSet:
    """Fixed-size batch of detected peaks."""

    centre_x: jax.Array   # (P,) int32
    centre_y: jax.Array   # (P,) int32
    left_x: jax.Array     # (P,) int32
    right_x: jax.Array    # (P,) int32
    orientation: jax.Array  # (P,) int32, ORIENT_*
    valid: jax.Array      # (P,) bool

    def tree_flatten(self):
        return ((self.centre_x, self.centre_y, self.left_x, self.right_x,
                 self.orientation, self.valid), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@functools.partial(jax.jit, static_argnames=("grid_size", "max_peaks"))
def find_peaks(binary: jax.Array, grid_size: int = 20,
               max_peaks: int = 8) -> PeakSet:
    """Peaks of the walkable region from its binary pixel image.

    Exactly reproduces the host twin (golden/peaks.py): topmost filled pixel
    row, runs split on gaps > grid_size//4 (contiguous pixel runs — any cell
    gap is >= grid_size-1 pixels), centre/left/right per run, and the
    up/left/right orientation classification from the vertical-slice geometry.
    """
    h, w = binary.shape[-2], binary.shape[-1]
    b = binary.astype(bool)

    filled_any = jnp.any(b)
    row_any = jnp.any(b, axis=-1)                      # (H,)
    min_y = jnp.argmax(row_any).astype(jnp.int32)      # topmost filled row

    top = jax.lax.dynamic_index_in_dim(b, min_y, axis=0, keepdims=False)  # (W,)

    # Run starts/ends on the top pixel row. Pixel runs are contiguous, and
    # distinct cell groups are >= grid_size-1 pixels apart, which always
    # exceeds the reference's gap threshold grid_size//4
    # (ProtrusionDetector.py:91-93) for grid_size >= 2.
    prev = jnp.pad(top[:-1], (1, 0))
    nxt = jnp.pad(top[1:], (0, 1))
    starts = top & ~prev
    ends = top & ~nxt
    xs = jnp.arange(w, dtype=jnp.int32)
    start_xs = jnp.sort(jnp.where(starts, xs, _BIG))[:max_peaks]   # ascending
    end_xs = jnp.sort(jnp.where(ends, xs, _BIG))[:max_peaks]
    valid = (start_xs < _BIG) & (end_xs < _BIG) & filled_any

    run_len = end_xs - start_xs + 1
    centre_x = start_xs + run_len // 2                 # == group[len//2]

    # Global extent / mean of ALL filled pixels (ProtrusionDetector.py:111-121).
    col_any = jnp.any(b, axis=-2)                      # (W,)
    global_min_x = jnp.argmax(col_any).astype(jnp.int32)
    global_max_x = (w - 1 - jnp.argmax(col_any[::-1])).astype(jnp.int32)
    global_width = global_max_x - global_min_x
    col_counts = jnp.sum(b, axis=-2, dtype=jnp.int32)  # filled pixels per column
    total = jnp.sum(col_counts)
    # f32 accumulation: the int32 product-sum overflows for mostly-filled
    # frames beyond ~1920x1080 (sum approaches H*W^2/2), flipping every
    # orientation; the f32 rounding (~1e-7 relative) is below the division's
    # own f32 precision, which the differential suite already tolerates.
    mean_x = (jnp.dot(col_counts.astype(jnp.float32), xs.astype(jnp.float32))
              / jnp.maximum(total, 1).astype(jnp.float32))

    # Vertical slice stats per peak: columns within +/- grid_size//2 of centre.
    half = grid_size // 2
    in_slice = (xs[None, :] >= centre_x[:, None] - half) & \
               (xs[None, :] <= centre_x[:, None] + half)          # (P, W)
    slice_count = jnp.sum(jnp.where(in_slice, col_counts[None, :], 0), axis=-1)

    # max filled y within the slice: per-column last filled row.
    ys = jnp.arange(h, dtype=jnp.int32)
    col_max_y = jnp.where(col_any,
                          h - 1 - jnp.argmax(b[::-1, :], axis=0), -1)  # (W,)
    slice_max_y = jnp.max(
        jnp.where(in_slice & col_any[None, :], col_max_y[None, :], -1), axis=-1)

    height = slice_max_y - min_y
    is_up = (height.astype(jnp.float32) > global_width.astype(jnp.float32) * 0.5) \
        & (slice_count.astype(jnp.float32) > height.astype(jnp.float32) * 0.5)
    orientation = jnp.where(
        is_up, ORIENT_UP,
        jnp.where(centre_x.astype(jnp.float32) > mean_x, ORIENT_RIGHT, ORIENT_LEFT),
    ).astype(jnp.int32)

    centre_y = jnp.where(valid, min_y, 0)
    return PeakSet(
        centre_x=jnp.where(valid, centre_x, 0),
        centre_y=centre_y,
        left_x=jnp.where(valid, start_xs, 0),
        right_x=jnp.where(valid, end_xs, 0),
        orientation=jnp.where(valid, orientation, 0),
        valid=valid,
    )
