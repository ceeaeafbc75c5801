"""On-chip batched pathfinding: direction-expanded min-plus wavefront.

TPU-native replacement for the reference's Python heapq A*
(PathFinder.py:119-186), which was its profiled hotspot (0.10 s/frame,
BASELINE.md). Design per SURVEY.md §7.4:

* State = (row, col, incoming direction). The reference prices curvature from
  a 7-point sliding window over the whole path-so-far (PathFinder.py:51-101,
  non-Markovian); expanding the state by the incoming move turns the dominant
  term — the direction change at the new corner — into a local transition
  cost with the same shape: 0 within the 30-degree grace, else
  (angle/90)**1.5, weighted 1.5, on top of 1 + 0.5 * cell penalty
  (PathFinder.py:168-173).
* One Bellman-Ford relaxation serves ALL goals: peaks share the single-source
  cost-to-come field, so adding peaks is free.
* Everything is fixed-shape: the relaxation is a lax.while_loop of shifted
  4x4 min-plus updates over the (R, C, 4) field; backtrace is a lax.scan
  writing into a padded (max_len, 2) buffer.

Exact reference-algorithm parity (when required) is provided by the host twin
(golden/astar.py) and the native C++ engine; the wavefront engine is the
scalable batched path, validated against the twin's selected paths on the
scenario fixtures (tests/test_tpu_ops.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# Large-but-finite float32 "infinity". Kept a plain Python float on purpose:
# feeding a device array as jnp.pad's constant_values sends XLA:CPU compilation
# into minutes-long constant folding inside the while_loop body.
INF = 3.0e38

# Moves indexed d = 0..3: right, left, down, up — the reference's neighbour
# order (FrameProcessor.py:195-200). Entries are (dr, dc).
MOVES = np.array([(0, 1), (0, -1), (1, 0), (-1, 0)], dtype=np.int32)


def _turn_cost_matrix(angle_grace_deg: float, angle_exponent: float,
                      angle_denominator: float) -> np.ndarray:
    """T[d_prev, d_next] = angle-penalty term for the direction change."""
    t = np.zeros((4, 4), dtype=np.float32)
    for i in range(4):
        for j in range(4):
            vi, vj = MOVES[i], MOVES[j]
            dot = float(vi[0] * vj[0] + vi[1] * vj[1])
            ang = np.degrees(np.arccos(np.clip(dot, -1.0, 1.0)))
            t[i, j] = 0.0 if ang <= angle_grace_deg else (
                (ang / angle_denominator) ** angle_exponent)
    return t


def _scaled_turn(grid_size: float, angle_weight: float,
                 angle_grace_deg: float, angle_exponent: float,
                 angle_denominator: float):
    """The turn-cost matrix in field units — the ONE pricing of direction
    changes shared by relax/relax_sweep (via _field_inputs) and backtrace."""
    return jnp.asarray(
        _turn_cost_matrix(angle_grace_deg, angle_exponent, angle_denominator)
        * (grid_size * angle_weight))


def _field_inputs(walkable, penalty, start_rc, grid_size: float,
                  penalty_weight: float, angle_weight: float,
                  angle_grace_deg: float, angle_exponent: float,
                  angle_denominator: float):
    """The cost-model fields shared by relax/relax_sweep/backtrace:
    (w bool mask, scaled turn matrix, per-cell enter cost, dist0).
    One definition — the three consumers MUST price moves identically or
    backtrace walks a field whose parents it mis-prices.
    """
    rows, cols = walkable.shape
    w = walkable.astype(bool)
    turn = _scaled_turn(grid_size, angle_weight, angle_grace_deg,
                        angle_exponent, angle_denominator)
    # Cost of entering cell (r, c) regardless of direction.
    enter = jnp.where(
        w, grid_size * (1.0 + penalty_weight * penalty.astype(jnp.float32)),
        INF)
    start_mask = (
        (jnp.arange(rows)[:, None] == start_rc[0])
        & (jnp.arange(cols)[None, :] == start_rc[1])
    )
    dist0 = jnp.where(start_mask[:, :, None], 0.0,
                      jnp.full((rows, cols, 4), INF))
    return w, turn, enter, dist0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PathBatch:
    """K padded paths over the lattice (forward order, (row, col) cells)."""

    cells: jax.Array    # (K, L, 2) int32, -1 padded
    lengths: jax.Array  # (K,) int32
    costs: jax.Array    # (K,) float32
    valid: jax.Array    # (K,) bool

    def tree_flatten(self):
        return ((self.cells, self.lengths, self.costs, self.valid), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def closest_walkable_cell(walkable: jax.Array, point_xy: jax.Array,
                          grid_size: int = 20) -> jax.Array:
    """(row, col) of the walkable cell whose centre is nearest the pixel point;
    row-major first-minimum tie-breaking, matching the reference's strict
    improvement scan (utils.py:6-32). Squared integer distances keep the
    comparison exact."""
    rows, cols = walkable.shape[-2], walkable.shape[-1]
    half = grid_size // 2
    cx = jnp.arange(cols, dtype=jnp.int32) * grid_size + half
    cy = jnp.arange(rows, dtype=jnp.int32) * grid_size + half
    dx = point_xy[0].astype(jnp.int32) - cx[None, :]
    dy = point_xy[1].astype(jnp.int32) - cy[:, None]
    d2 = dx * dx + dy * dy
    d2 = jnp.where(walkable, d2, jnp.int32(1 << 30))
    flat = jnp.argmin(d2)  # first occurrence == row-major scan order
    return jnp.stack([flat // cols, flat % cols]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "grid_size", "penalty_weight", "angle_weight", "angle_grace_deg",
    "angle_exponent", "angle_denominator", "max_iters"))
def relax(walkable: jax.Array, penalty: jax.Array, start_rc: jax.Array,
          *, grid_size: int = 20, penalty_weight: float = 0.5,
          angle_weight: float = 1.5, angle_grace_deg: float = 30.0,
          angle_exponent: float = 1.5, angle_denominator: float = 90.0,
          max_iters: int | None = None) -> jax.Array:
    """Single-source cost-to-come field dist (R, C, 4) over (cell, incoming
    direction) states. Converges via while_loop with early exit."""
    rows, cols = walkable.shape
    w, turn, enter, dist0 = _field_inputs(
        walkable, penalty, start_rc, grid_size, penalty_weight, angle_weight,
        angle_grace_deg, angle_exponent, angle_denominator)

    def _shift(x: jax.Array, dr: int, dc: int) -> jax.Array:
        """x sampled at each cell's parent (cell - (dr, dc)), INF off-lattice."""
        pad_cfg = [(max(dr, 0), max(-dr, 0)), (max(dc, 0), max(-dc, 0))] + \
            [(0, 0)] * (x.ndim - 2)
        y = jnp.pad(x, pad_cfg, constant_values=INF)
        r0, c0 = max(-dr, 0), max(-dc, 0)
        return y[r0:r0 + x.shape[0], c0:c0 + x.shape[1]]

    if max_iters is None:
        max_iters = rows * cols

    def body(carry):
        dist, _, it = carry
        cands = []
        for d in range(4):
            dr, dc = int(MOVES[d][0]), int(MOVES[d][1])
            parent = _shift(dist, dr, dc)                 # (R, C, 4) at parent
            cands.append(
                jnp.min(parent + turn[:, d][None, None, :], axis=-1) + enter)
        new = jnp.minimum(dist, jnp.stack(cands, axis=-1))
        changed = jnp.any(new < dist)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
    return dist


@functools.partial(jax.jit, static_argnames=(
    "grid_size", "penalty_weight", "angle_weight", "angle_grace_deg",
    "angle_exponent", "angle_denominator", "max_passes"))
def relax_sweep(walkable: jax.Array, penalty: jax.Array, start_rc: jax.Array,
                *, grid_size: int = 20, penalty_weight: float = 0.5,
                angle_weight: float = 1.5, angle_grace_deg: float = 30.0,
                angle_exponent: float = 1.5, angle_denominator: float = 90.0,
                max_passes: int | None = None) -> jax.Array:
    """Fast-sweeping form of :func:`relax` — same unique min-plus fixed point,
    far fewer iterations.

    :func:`relax` propagates one cell per sweep, so a path of length L needs
    ~L sweeps of tiny (R, C, 4) updates — loop overhead dominates on every
    backend (and is why the Mosaic kernel couldn't win either: the algorithm,
    not the launcher, was the bottleneck). Here each pass runs four
    DIRECTIONAL scans (right, left, down, up, Gauss-Seidel order): a straight
    corridor of any length is relaxed in ONE associative min-plus scan
    (x[c] = min(A[c], x[c-1] + B[c]) composed as the affine min-plus
    semigroup ((a1,b1)*(a2,b2) = (min(a2, a1+b2), b1+b2))), so convergence
    takes O(turns along the optimal paths) passes instead of O(path length)
    sweeps — typically <20 passes even on the maze fixtures vs up to
    R*C capped sweeps for `relax`.
    """
    rows, cols = walkable.shape
    w, turn, enter, dist0 = _field_inputs(
        walkable, penalty, start_rc, grid_size, penalty_weight, angle_weight,
        angle_grace_deg, angle_exponent, angle_denominator)

    def _combine(earlier, later):
        a1, b1 = earlier
        a2, b2 = later
        return jnp.minimum(a2, a1 + b2), b1 + b2

    def _directional(dist, d):
        """One scan for incoming-direction d; returns the updated d-slice."""
        dr, dc = int(MOVES[d][0]), int(MOVES[d][1])
        # h[r, c] = min_d' dist[r, c, d'] + turn[d', d]: best cost of being at
        # (r, c) ready to step in direction d (turn charged at the corner).
        h = jnp.min(dist + turn[:, d][None, None, :], axis=-1)
        axis = 0 if dr != 0 else 1
        flip = (dr + dc) < 0
        if flip:
            h = jnp.flip(h, axis)
            ent = jnp.flip(enter, axis)
            old = jnp.flip(dist[:, :, d], axis)
        else:
            ent = enter
            old = dist[:, :, d]
        # Shift h one step toward the scan origin: A[c] uses h at the parent.
        pad = [(0, 0), (0, 0)]
        pad[axis] = (1, 0)
        h_par = jnp.pad(h, pad, constant_values=INF)
        h_par = jax.lax.slice_in_dim(h_par, 0, h.shape[axis], axis=axis)
        a = jnp.minimum(old, h_par + ent)
        new, _ = jax.lax.associative_scan(_combine, (a, ent), axis=axis)
        if flip:
            new = jnp.flip(new, axis)
        return new

    if max_passes is None:
        max_passes = rows * cols

    def body(carry):
        dist, _, it = carry
        new = dist
        for d in range(4):  # Gauss-Seidel: later scans see earlier updates
            new = new.at[:, :, d].set(_directional(new, d))
        changed = jnp.any(new < dist)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_passes)

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
    return dist


@functools.partial(jax.jit, static_argnames=(
    "grid_size", "angle_grace_deg", "angle_exponent", "angle_denominator",
    "angle_weight", "max_len"))
def backtrace(dist: jax.Array, walkable: jax.Array, start_rc: jax.Array,
              goal_rc: jax.Array, *, grid_size: int = 20,
              angle_grace_deg: float = 30.0, angle_exponent: float = 1.5,
              angle_denominator: float = 90.0, angle_weight: float = 1.5,
              max_len: int = 512) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Extract the forward-order path start->goal from the converged field.

    Returns (cells (max_len, 2) int32 padded with -1, length, cost, valid).
    """
    rows, cols = walkable.shape
    turn = _scaled_turn(grid_size, angle_weight, angle_grace_deg,
                        angle_exponent, angle_denominator)
    moves = jnp.asarray(MOVES)

    goal_dists = dist[goal_rc[0], goal_rc[1]]
    d0 = jnp.argmin(goal_dists).astype(jnp.int32)
    cost = goal_dists[d0]
    valid = cost < INF / 2

    def step(carry, _):
        r, c, d, done = carry
        at_start = (r == start_rc[0]) & (c == start_rc[1])
        emit = jnp.where(done, jnp.array([-1, -1], jnp.int32),
                         jnp.stack([r, c]).astype(jnp.int32))
        # parent of (r, c) under incoming move d
        pr, pc = r - moves[d, 0], c - moves[d, 1]
        pr_c = jnp.clip(pr, 0, rows - 1)
        pc_c = jnp.clip(pc, 0, cols - 1)
        parent_costs = dist[pr_c, pc_c] + turn[:, d]
        pd = jnp.argmin(parent_costs).astype(jnp.int32)
        new_done = done | at_start
        r2 = jnp.where(new_done, r, pr_c)
        c2 = jnp.where(new_done, c, pc_c)
        d2 = jnp.where(new_done, d, pd)
        return (r2, c2, d2, new_done), emit

    (_, _, _, done), rev = jax.lax.scan(
        step, (goal_rc[0], goal_rc[1], d0, ~valid), None, length=max_len)

    # rev is goal->start with -1 padding at the tail; flip to start->goal and
    # left-align.
    length = jnp.sum(jnp.all(rev >= 0, axis=-1)).astype(jnp.int32)
    flipped = rev[::-1]
    cells = jnp.roll(flipped, -(max_len - length), axis=0)
    valid = valid & done  # path fully traced within max_len
    cells = jnp.where(valid, cells, -1)
    length = jnp.where(valid, length, 0)
    cost = jnp.where(valid, cost, INF)
    return cells, length, cost, valid


@functools.partial(jax.jit, static_argnames=(
    "grid_size", "max_len", "penalty_weight", "angle_weight",
    "angle_grace_deg", "angle_exponent", "angle_denominator", "use_pallas",
    "use_sweep"))
def find_paths(walkable: jax.Array, penalty: jax.Array, start_rc: jax.Array,
               goals_rc: jax.Array, goals_valid: jax.Array,
               *, grid_size: int = 20, max_len: int = 512,
               penalty_weight: float = 0.5, angle_weight: float = 1.5,
               angle_grace_deg: float = 30.0, angle_exponent: float = 1.5,
               angle_denominator: float = 90.0,
               use_pallas: bool = False, use_sweep: bool = True) -> PathBatch:
    """Paths from one start to K goal cells sharing a single relaxation.

    The relaxation defaults to the fast-sweeping form (relax_sweep, ~4-8x
    fewer device-loop iterations than relax — same fixed point, identical
    backtraced paths on all 13 fixtures); use_sweep=False selects the plain
    per-cell relaxation, use_pallas the Mosaic kernel.
    """
    kw = dict(grid_size=grid_size, penalty_weight=penalty_weight,
              angle_weight=angle_weight, angle_grace_deg=angle_grace_deg,
              angle_exponent=angle_exponent,
              angle_denominator=angle_denominator)
    if use_pallas:
        # Lazy import: ops.pallas_wavefront imports from this module.
        from vision_assist_tpu.ops.pallas_wavefront import relax_pallas

        dist = relax_pallas(walkable, penalty, start_rc, **kw)
    elif use_sweep:
        dist = relax_sweep(walkable, penalty, start_rc, **kw)
    else:
        dist = relax(walkable, penalty, start_rc, **kw)

    def one(goal, gvalid):
        cells, length, cost, valid = backtrace(
            dist, walkable, start_rc, goal, grid_size=grid_size,
            angle_grace_deg=angle_grace_deg, angle_exponent=angle_exponent,
            angle_denominator=angle_denominator, angle_weight=angle_weight,
            max_len=max_len)
        valid = valid & gvalid
        return cells, jnp.where(valid, length, 0), cost, valid

    cells, lengths, costs, valid = jax.vmap(one)(goals_rc, goals_valid)
    return PathBatch(cells=cells, lengths=lengths, costs=costs, valid=valid)
