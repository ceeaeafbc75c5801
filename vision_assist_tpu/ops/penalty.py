"""On-chip distance-from-edge penalty field.

Same scan formulation as the host twin (golden/lattice.py), expressed in jnp:
two cumulative scans per axis give each cell's contiguous-run extents, then an
elementwise blend reproduces PenaltyCalculator.calculate_penalty
(PenaltyCalculator.py:57-142). O(R*C), fully fused by XLA, batches over a
leading stream axis via vmap. The reference's per-cell dict walk is
O(cells * run length) Python (its profiled hotspot: 0.10 s/frame,
images/profiling_21_02/unoptimised_starter/timing_data.txt).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _run_extents_lastaxis(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inclusive run start/end indices along the last axis (junk outside runs)."""
    n = w.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.broadcast_to(idx, w.shape)
    last_gap = jax.lax.cummax(jnp.where(~w, idx, -1), axis=w.ndim - 1)
    start = last_gap + 1
    next_gap = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(~w, idx, n), axis=-1), axis=w.ndim - 1),
        axis=-1,
    )
    end = next_gap - 1
    return start, end


def _segment_penalty(pos: jax.Array, start: jax.Array, end: jax.Array) -> jax.Array:
    denom = (end - start).astype(jnp.float32)
    ratio = jnp.where(denom == 0, 0.5, (pos - start).astype(jnp.float32)
                      / jnp.where(denom == 0, 1.0, denom))
    return 2.0 * jnp.abs(ratio - 0.5)


@functools.partial(jax.jit, static_argnames=("saturation_threshold", "dominance_gain"))
def penalty_field(walkable: jax.Array,
                  saturation_threshold: float = 0.99,
                  dominance_gain: float = 0.25) -> jax.Array:
    """float32 (R, C) penalty in [0, 1]; 0 on non-walkable cells."""
    w = walkable.astype(bool)
    rows, cols = w.shape[-2], w.shape[-1]

    col_idx = jnp.broadcast_to(jnp.arange(cols, dtype=jnp.int32), w.shape)
    row_idx = jnp.broadcast_to(
        jnp.arange(rows, dtype=jnp.int32)[:, None], w.shape)

    rstart, rend = _run_extents_lastaxis(w)
    cstart_t, cend_t = _run_extents_lastaxis(jnp.swapaxes(w, -1, -2))
    cstart = jnp.swapaxes(cstart_t, -1, -2)
    cend = jnp.swapaxes(cend_t, -1, -2)

    row_p = _segment_penalty(col_idx, rstart, rend)
    col_p = _segment_penalty(row_idx, cstart, cend)

    total = row_p + col_p
    dominance = jnp.where(total == 0, 0.0,
                          jnp.abs(row_p - col_p) / jnp.where(total == 0, 1.0, total))
    row_w = jnp.where(row_p > col_p, 0.5 + dominance_gain * dominance,
                      0.5 - dominance_gain * dominance)
    blended = row_p * row_w + col_p * (1.0 - row_w)

    penalty = jnp.where(
        (row_p > saturation_threshold) | (col_p > saturation_threshold),
        1.0,
        jnp.where(total == 0, 0.0, blended),
    )
    return jnp.where(w, penalty, 0.0)
