"""Pallas TPU kernel: fused wavefront relaxation.

The XLA while_loop version (planning/wavefront.relax) converges in up to a few
hundred tiny iterations; on TPU each iteration is dominated by loop/dispatch
overhead, not math (the state is only R x C x 4 floats — ~37 KB, far below
VMEM). This kernel runs the whole relaxation INSIDE one pallas_call: state
lives in VMEM scratch, the sweep loop is an in-kernel fori_loop over shifted
min-plus updates, and convergence is checked every ``check_every`` sweeps via
an SMEM flag, so the hot loop never leaves the core.

Grid: one program per stream (batch) element — multi-stream serving relaxes
all lattices concurrently across the batch dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_assist_tpu.planning.wavefront import INF, MOVES, _turn_cost_matrix


def _relax_kernel(enter_ref, start_ref, turn_ref, out_ref, *, rows, cols,
                  max_sweeps, check_every):
    """enter (R, C) f32 entry costs (INF on non-walkable), start (1, 2) SMEM,
    turn (4, 4) f32; out (4, R, C) converged distance field.

    The direction axis is MAJOR (4, R, C), not minor: Mosaic (real-chip
    validation) rejects both i1 minor-dim inserts and minor-dim concatenates
    with mismatched lane offsets, so all stacking/broadcasting happens on the
    leading axis while (R, C) stays a clean (sublane, lane) tile.
    """

    turn = turn_ref[:]                       # (4, 4)
    enter = enter_ref[:]                     # (R, C)

    sr = start_ref[0, 0]
    sc = start_ref[0, 1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    start_mask_f = ((row_ids == sr) & (col_ids == sc)).astype(jnp.float32)
    dist0 = jnp.where(start_mask_f[None] > 0, 0.0,
                      jnp.full((4, rows, cols), INF, jnp.float32))

    def shift_from_parent(x, dr, dc):
        pad = [(0, 0), (max(dr, 0), max(-dr, 0)), (max(dc, 0), max(-dc, 0))]
        y = jnp.pad(x, pad, constant_values=INF)
        r0, c0 = max(-dr, 0), max(-dc, 0)
        return jax.lax.slice(
            y, (0, r0, c0), (4, r0 + rows, c0 + cols))

    def sweep(dist):
        cands = []
        for d in range(4):
            dr, dc = int(MOVES[d][0]), int(MOVES[d][1])
            parent = shift_from_parent(dist, dr, dc)
            cands.append(jnp.min(parent + turn[:, d][:, None, None], axis=0)
                         + enter)
        return jnp.minimum(dist, jnp.stack(cands, axis=0))

    def outer(_, carry):
        dist, done = carry

        def inner(_, d):
            return sweep(d)

        new = jax.lax.cond(
            done,
            lambda d: d,
            lambda d: jax.lax.fori_loop(0, check_every, inner, d),
            dist,
        )
        done = done | jnp.all(new == dist)
        return new, done

    n_outer = pl.cdiv(max_sweeps, check_every)
    dist, _ = jax.lax.fori_loop(0, n_outer, outer, (dist0, jnp.bool_(False)))
    out_ref[:] = dist


@functools.partial(jax.jit, static_argnames=(
    "grid_size", "penalty_weight", "angle_weight", "angle_grace_deg",
    "angle_exponent", "angle_denominator", "max_sweeps", "check_every",
    "interpret"))
def relax_pallas(walkable: jax.Array, penalty: jax.Array, start_rc: jax.Array,
                 *, grid_size: int = 20, penalty_weight: float = 0.5,
                 angle_weight: float = 1e-4, angle_grace_deg: float = 30.0,
                 angle_exponent: float = 1.5, angle_denominator: float = 90.0,
                 max_sweeps: int | None = None, check_every: int = 32,
                 interpret: bool | None = None) -> jax.Array:
    """Drop-in replacement for planning.wavefront.relax (same output field).

    interpret=None auto-selects from the PROCESS DEFAULT backend: compiled
    Mosaic kernel when that is TPU, interpreter elsewhere (CPU tests /
    virtual-device meshes). Caveat: the decision is made at trace time from
    ``jax.default_backend()``, not from where the caller actually placed the
    computation — if you jit this onto CPU while TPU is the process default
    (or vice versa), pass ``interpret`` explicitly, e.g.
    ``interpret=(device.platform != "tpu")`` for the device you run on.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, cols = walkable.shape
    turn = jnp.asarray(
        _turn_cost_matrix(angle_grace_deg, angle_exponent, angle_denominator)
        * (grid_size * angle_weight), jnp.float32)
    enter = jnp.where(walkable.astype(bool),
                      grid_size * (1.0 + penalty_weight
                                   * penalty.astype(jnp.float32)),
                      INF)
    start = start_rc.astype(jnp.int32).reshape(1, 2)
    if max_sweeps is None:
        max_sweeps = rows * cols

    kernel = functools.partial(_relax_kernel, rows=rows, cols=cols,
                               max_sweeps=max_sweeps, check_every=check_every)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, rows, cols), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(enter, start, turn)
    # Public contract stays (R, C, 4); the transpose happens in XLA outside
    # the kernel, where layout changes are free to fuse.
    return out.transpose(1, 2, 0)
