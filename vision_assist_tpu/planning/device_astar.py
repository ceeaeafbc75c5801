"""Fully on-chip EXACT A* — the reference pathfinder inside one lax.while_loop.

The wavefront engine (planning/wavefront.py) is the fast batched on-chip
search, but it is Markovian and cannot reproduce the reference's
exploration-order-dependent behaviour on every fixture (insane_case). This
module closes that gap: a sequential A* that replicates PathFinder.py:119-186
decision-for-decision ON THE DEVICE, including every quirk the host twin
(golden/astar.py) documents:

* heap pop order with ties broken on the raw pixel tuple (f, x, y) —
  implemented as a lexicographic argmin over (f_open, col, row);
* stale open-set priorities: an improved node already in the open set keeps
  its old f (PathFinder.py:182-184) — f_open is only written on push;
* per-relaxation path-so-far angle analysis over a 7-point sliding window
  (PathFinder.py:51-101), with the LAST point never participating in any
  window (range(half, len-half-1) stops 2 short — so all four neighbours of
  a pop see the same window set, but NOT the same values, see next);
* the radians/degrees angle-cache bug (PathFinder.py:97-99): fresh
  computations contribute DEGREES but the cache stores RADIANS, so the
  SECOND neighbour of the same pop re-reads the same windows from the cache
  and sees values <= pi — i.e. only the first neighbour of a pop can pay an
  angle penalty through a given window. The cache is carried state: it
  persists across goals within a frame and across frames (the reference's
  PathFinder singleton, PathFinder.py:32);
* dead-end relaxations into non-walkable cells still warm the cache and
  enter the open set (FrameProcessor.py:203 truthiness quirk; see
  golden/astar.py:155-164).

The angle cache is a dense (7*7*5*5,) table: prev vectors span 3 lattice
steps (components in -3..3 cells) and next vectors 2 steps (-2..2), and
angles are scale-invariant, so cell-unit keys cover the full pixel-vector
key space of the reference.

Everything is float32 (TPU-native); the reference computes in float64. On
the 13 scenario fixtures + fuzz lattices the selected paths are identical
(tests/test_device_astar.py); pathological near-ties could in principle
round differently — the host twin remains the bit-exact oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.float32(jnp.inf)


class DeviceAStarResult(NamedTuple):
    cells: jax.Array    # (L, 2) int32 (row, col), -1 padded
    length: jax.Array   # () int32, 0 = no path
    cost: jax.Array     # () f32, inf = no path
    cache: jax.Array    # (1226,) f32 angle cache (last slot is scratch)


def _cache_key(prev_dc, prev_dr, nxt_dc, nxt_dr):
    """Dense index for the angle cache. Vectors are (dx, dy) in CELL units:
    prev spans 3 steps (-3..3), next spans 2 (-2..2)."""
    return (((prev_dc + 3) * 7 + (prev_dr + 3)) * 25
            + (nxt_dc + 2) * 5 + (nxt_dr + 2))


CACHE_SIZE = 49 * 25 + 1   # +1 scratch slot for masked scatters


def empty_cache() -> jnp.ndarray:
    return jnp.full((CACHE_SIZE,), jnp.nan, jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "grid_size", "max_len", "angle_window", "angle_grace_deg",
    "angle_exponent", "angle_denominator", "penalty_weight", "angle_weight",
    "replicate_radians_cache_bug"))
def device_astar(walkable: jax.Array, penalty: jax.Array,
                 start_rc: jax.Array, goal_rc: jax.Array,
                 cache: jax.Array, *, grid_size: int = 20,
                 max_len: int = 512, angle_window: int = 7,
                 angle_grace_deg: float = 30.0, angle_exponent: float = 1.5,
                 angle_denominator: float = 90.0, penalty_weight: float = 0.5,
                 angle_weight: float = 1.5,
                 replicate_radians_cache_bug: bool = True
                 ) -> DeviceAStarResult:
    """One exact search. walkable (R, C) bool, penalty (R, C) f32,
    start/goal (2,) int32 (row, col), cache from empty_cache() or a prior
    result (cross-frame state)."""
    rows, cols = walkable.shape
    n = rows * cols
    g = jnp.float32(grid_size)
    half = angle_window // 2  # 3 for the reference's 7-point window

    walk_f = walkable.reshape(-1)
    pen_f = penalty.astype(jnp.float32).reshape(-1)
    start = start_rc[0] * cols + start_rc[1]
    goal = goal_rc[0] * cols + goal_rc[1]

    idx_row = jnp.arange(n, dtype=jnp.int32) // cols
    idx_col = jnp.arange(n, dtype=jnp.int32) % cols

    def heuristic(idx):
        return g * (jnp.abs(idx // cols - goal_rc[0])
                    + jnp.abs(idx % cols - goal_rc[1])).astype(jnp.float32)

    # Neighbour order right, left, down, up in PIXEL (x, y) coords
    # (FrameProcessor.py:195-200): x = col*g, y = row*g.
    nbr_dr = jnp.array([0, 0, 1, -1], jnp.int32)
    nbr_dc = jnp.array([1, -1, 0, 0], jnp.int32)

    class S(NamedTuple):
        g_score: jax.Array   # (N,) f32
        f_open: jax.Array    # (N,) f32 priority at push time
        in_open: jax.Array   # (N,) bool
        closed: jax.Array    # (N,) bool
        path_buf: jax.Array  # (N, L) int32 — path-so-far per node
        path_len: jax.Array  # (N,) int32
        cache: jax.Array     # (CACHE_SIZE,) f32
        done: jax.Array      # () int32: 0 running, 1 found, 2 exhausted

    g0 = jnp.full((n,), INF, jnp.float32).at[start].set(0.0)
    pb0 = jnp.full((n, max_len), -1, jnp.int32)
    pb0 = pb0.at[start, 0].set(start)
    state = S(
        g_score=g0,
        f_open=jnp.full((n,), INF, jnp.float32).at[start].set(
            heuristic(start)),
        in_open=jnp.zeros((n,), bool).at[start].set(True),
        closed=jnp.zeros((n,), bool),
        path_buf=pb0,
        path_len=jnp.zeros((n,), jnp.int32).at[start].set(1),
        cache=cache,
        done=jnp.int32(0),
    )

    win_idx = jnp.arange(max_len, dtype=jnp.int32)  # candidate window centres

    def window_angles(path, m, cache):
        """Max window angle for a path of length m (+1 appended neighbour —
        which never enters a window), with same-call cache-write visibility.
        Returns (max_angle_degrees, new_cache)."""
        # Window centres i = half .. (m+1) - half - 2  (range(half, len-half-1)
        # over len = m+1 points).
        count = jnp.maximum(m + 1 - 2 * half - 1, 0)
        i = win_idx + half
        mask = win_idx < count
        safe = lambda k: jnp.clip(k, 0, max_len - 1)
        p_i = path[safe(i)]
        p_im = path[safe(i - half)]
        p_ip = path[safe(i + half)]
        p_i1 = path[safe(i + 1)]

        def rc(v):
            return v // cols, v % cols

        ir, ic = rc(p_i)
        mr, mc = rc(p_im)
        pr, pc = rc(p_ip)
        qr, qc = rc(p_i1)
        # pixel vector = cell vector * g; angles are scale-invariant
        prev_dc, prev_dr = ic - mc, ir - mr
        nxt_dc, nxt_dr = pc - qc, pr - qr

        dot = (prev_dc * nxt_dc + prev_dr * nxt_dr).astype(jnp.float32)
        mag_p = jnp.sqrt((prev_dc * prev_dc
                          + prev_dr * prev_dr).astype(jnp.float32))
        mag_n = jnp.sqrt((nxt_dc * nxt_dc
                          + nxt_dr * nxt_dr).astype(jnp.float32))
        nonzero = (mag_p > 0) & (mag_n > 0)
        cosv = jnp.clip(dot / jnp.where(nonzero, mag_p * mag_n, 1.0),
                        -1.0, 1.0)
        radians = jnp.arccos(cosv)
        degrees = radians * jnp.float32(180.0 / np.pi)

        key = _cache_key(prev_dc, prev_dr, nxt_dc, nxt_dr)
        use = mask & nonzero
        key_safe = jnp.where(use, key, CACHE_SIZE - 1)
        cached_val = cache[key_safe]
        fresh = jnp.isnan(cached_val) & use

        # First occurrence of each fresh key within THIS call contributes
        # degrees; later duplicates read the value the first wrote (radians
        # in bug mode). segment-min over keys finds the first index.
        first_at = jnp.full((CACHE_SIZE,), max_len, jnp.int32).at[
            jnp.where(fresh, key_safe, CACHE_SIZE - 1)].min(win_idx)
        is_first = fresh & (first_at[key_safe] == win_idx)

        store = radians if replicate_radians_cache_bug else degrees
        value = jnp.where(fresh,
                          jnp.where(is_first, degrees, store),
                          cached_val)
        max_angle = jnp.max(jnp.where(use, value, -INF))
        max_angle = jnp.where(jnp.any(use), max_angle, 0.0)

        new_cache = cache.at[jnp.where(is_first, key_safe,
                                       CACHE_SIZE - 1)].set(
            jnp.where(is_first, store, cache[CACHE_SIZE - 1]))
        # keep the scratch slot NaN
        new_cache = new_cache.at[CACHE_SIZE - 1].set(jnp.nan)
        return max_angle, new_cache

    def body(s: S) -> S:
        # -- pop: lexicographic argmin of (f_open, col, row) -----------------------
        masked_f = jnp.where(s.in_open, s.f_open, INF)
        fmin = jnp.min(masked_f)
        tie = masked_f == fmin
        tie_key = jnp.where(tie, idx_col * rows + idx_row, n * n)
        cur = jnp.argmin(tie_key).astype(jnp.int32)

        exhausted = ~jnp.isfinite(fmin)
        found = (cur == goal) & ~exhausted

        in_open = s.in_open.at[cur].set(False)
        closed = s.closed.at[cur].set(True)

        # Dead-end pops (non-walkable, non-start) close without expanding
        # (golden/astar.py:162-164).
        expand = ~exhausted & ~found & \
            (walk_f[cur] | (cur == start))

        cur_path = s.path_buf[cur]
        cur_len = s.path_len[cur]
        cur_g = s.g_score[cur]

        g_score, f_open, path_buf, path_len, cache = (
            s.g_score, s.f_open, s.path_buf, s.path_len, s.cache)

        cr, cc = cur // cols, cur % cols
        for k in range(4):  # static unroll, reference neighbour order
            nr, nc = cr + nbr_dr[k], cc + nbr_dc[k]
            nxt = nr * cols + nc
            in_bounds = (nr >= 0) & (nr < rows) & (nc >= 0) & (nc < cols)
            nxt_safe = jnp.clip(nxt, 0, n - 1)
            valid = expand & in_bounds & ~closed[nxt_safe]

            # Angle analysis warms the cache only for valid relaxations
            # (the host skips closed/out-of-bounds before computing).
            max_angle, cache_upd = window_angles(cur_path, cur_len, cache)
            cache = jax.tree.map(
                lambda new, old: jnp.where(valid, new, old),
                cache_upd, cache)
            angle_pen = jnp.where(
                max_angle <= angle_grace_deg, 0.0,
                (max_angle / angle_denominator) ** angle_exponent)

            cell_pen = jnp.where(walk_f[nxt_safe], pen_f[nxt_safe], 0.0)
            mult = (1.0 + penalty_weight * cell_pen
                    + angle_weight * angle_pen)
            tentative = cur_g + g * mult

            improve = valid & (tentative < g_score[nxt_safe])
            g_score = g_score.at[nxt_safe].set(
                jnp.where(improve, tentative, g_score[nxt_safe]))
            new_row = cur_path.at[jnp.clip(cur_len, 0, max_len - 1)].set(nxt)
            path_buf = path_buf.at[nxt_safe].set(
                jnp.where(improve, new_row, path_buf[nxt_safe]))
            path_len = path_len.at[nxt_safe].set(
                jnp.where(improve, cur_len + 1, path_len[nxt_safe]))
            # Push only if not already queued; stale priority kept otherwise.
            push = improve & ~in_open[nxt_safe]
            f_open = f_open.at[nxt_safe].set(
                jnp.where(push, tentative + heuristic(nxt_safe),
                          f_open[nxt_safe]))
            in_open = in_open.at[nxt_safe].set(in_open[nxt_safe] | push)

        done = jnp.where(found, 1, jnp.where(exhausted, 2, 0)).astype(
            jnp.int32)
        return S(g_score=g_score, f_open=f_open, in_open=in_open,
                 closed=closed, path_buf=path_buf, path_len=path_len,
                 cache=cache, done=done)

    final = jax.lax.while_loop(lambda s: s.done == 0, body, state)

    ok = final.done == 1
    # A path that outgrew the buffer (writes clamp to slot max_len-1 while
    # path_len keeps counting) is corrupt — report it invalid rather than
    # returning a truncated path whose tail is an arbitrary later cell
    # (wavefront.backtrace applies the same rule).
    ok = ok & (final.path_len[goal] <= max_len)
    length = jnp.where(ok, final.path_len[goal], 0)
    flat = final.path_buf[goal]
    flat = jnp.where((jnp.arange(max_len) < length) & ok, flat, -1)
    cells = jnp.stack([jnp.where(flat >= 0, flat // cols, -1),
                       jnp.where(flat >= 0, flat % cols, -1)], axis=-1)
    cost = jnp.where(ok, final.g_score[goal], INF)
    return DeviceAStarResult(cells=cells.astype(jnp.int32),
                             length=length.astype(jnp.int32),
                             cost=cost, cache=final.cache)


@functools.partial(jax.jit, static_argnames=(
    "grid_size", "max_len", "angle_window", "angle_grace_deg",
    "angle_exponent", "angle_denominator", "penalty_weight", "angle_weight",
    "replicate_radians_cache_bug"))
def device_astar_paths(walkable: jax.Array, penalty: jax.Array,
                       start_rc: jax.Array, goals_rc: jax.Array,
                       goals_valid: jax.Array, cache: jax.Array,
                       **kwargs):
    """Sequential multi-goal search with the carried angle cache — the
    reference iterates peaks in order through ONE stateful PathFinder
    (FrameProcessor.py:230-271), so goal k's costs depend on the cache
    warmed by goals 0..k-1. Returns (PathBatch, cache_out).

    goals_rc (K, 2) int32, goals_valid (K,) bool. Invalid goals are searched
    against the start cell (a 1-pop no-op that cannot touch the cache) and
    masked out of the result.
    """
    from vision_assist_tpu.planning.wavefront import PathBatch

    def step(cache, inp):
        goal, valid = inp
        safe_goal = jnp.where(valid, goal, start_rc)
        res = device_astar(walkable, penalty, start_rc, safe_goal, cache,
                           **kwargs)
        out_cache = jnp.where(valid, res.cache, cache)
        return out_cache, (res.cells, res.length, res.cost)

    cache_out, (cells, lengths, costs) = jax.lax.scan(
        step, cache, (goals_rc, goals_valid))
    lengths = jnp.where(goals_valid, lengths, 0)
    costs = jnp.where(goals_valid, costs, INF)
    batch = PathBatch(cells=cells, lengths=lengths, costs=costs,
                      valid=goals_valid & (lengths > 0))
    return batch, cache_out
