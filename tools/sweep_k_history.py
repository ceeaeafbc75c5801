#!/usr/bin/env python
"""k-last-move state-expansion sweep for the wavefront divergence (VERDICT r3 #7).

Question under test: can ANY bounded-history Markovian cost model reproduce
the reference pathfinder's behaviour on the insane_case fixture, where the
reference (PathFinder.py:119-186) prefers a corridor that is strictly
costlier in penalty terms? The reference's angle charge is non-Markovian
twice over: each edge relaxation scans the WHOLE path-so-far with a 7-point
sliding window (PathFinder.py:76), and a persistent cross-call angle cache
with a radians/degrees confusion zeroes repeated vector pairs depending on
global search order (PathFinder.py:97-99).

The experiment: expand the search state to (cell, last k moves) and charge
the reference's window-angle penalty on the portion of the window visible in
the k-move tail. Because the window angle depends only on the MOVE SEQUENCE
(path points are prefix sums of moves), the angle charge A(history, move) is
a pure table over 5^k history codes (digit 4 = "no move yet"), and the
expanded relaxation runs as a vectorized numpy Bellman iteration — the same
min-plus algebra as planning/wavefront.py, host-side f64.

Two window variants per k:
  h3  — strict reference geometry only: prev = p[i]-p[i-3], next = p[i+3]-p[i+1]
        (PathFinder.py:79-83 with half=3). Needs a 7-point tail => k >= 5.
  h23 — additionally allows the scaled-down span h=2 when only that fits
        (a generous "any bounded approximation" reading).

For each k and variant, all 13 fixtures run end-to-end (expanded-state paths
-> sectioning -> dedup -> InstructionEngine) and the answers are compared to
the bit-exact goldens. Results: diagnostics/k_history_sweep.json + a table
for PARITY.md.
"""

from __future__ import annotations

import itertools
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from vision_assist_tpu.golden.pipeline import (  # noqa: E402
    GoldenReplayPipeline,
    materialize_cells,
)
from vision_assist_tpu.golden.astar import closest_cell_to_point  # noqa: E402
from vision_assist_tpu.io.scenarios import load_scenario, scenario_names  # noqa: E402
from vision_assist_tpu.planning.dedup import deduplicate_paths  # noqa: E402
from vision_assist_tpu.semantics.analyser import InstructionEngine  # noqa: E402
from vision_assist_tpu.semantics.sections import build_path  # noqa: E402

FRAME_W, FRAME_H = 720, 1280
GRID = 20
MOVES = np.array([(0, 1), (0, -1), (1, 0), (-1, 0)], dtype=np.int64)
ABSENT = 4
INF = np.inf


def decode_hist(code: int, k: int) -> list[int]:
    """Base-5 digits, digit 0 = most recent move; ABSENT-padded tail."""
    digits = []
    for _ in range(k):
        digits.append(code % 5)
        code //= 5
    return digits


def tail_points(hist: list[int], new_move: int) -> list[tuple[int, int]]:
    """Path tail implied by the history + the new move, oldest -> newest,
    relative coordinates (the newest *pre-move* cell at the origin)."""
    moves = [d for d in hist if d != ABSENT]  # newest first
    pts = [(0, 0)]
    for d in moves:  # walk backwards
        dr, dc = MOVES[d]
        pts.append((pts[-1][0] - dr, pts[-1][1] - dc))
    pts.reverse()
    dr, dc = MOVES[new_move]
    pts.append((pts[-1][0] + dr, pts[-1][1] + dc))
    return pts


def window_angle_deg(pts: list[tuple[int, int]], spans: tuple[int, ...]) -> float:
    """Max reference-form window angle (degrees) over centres/spans that fit.

    Reference formula (PathFinder.py:79-83): prev = p[i]-p[i-h],
    next = p[i+h]-p[i+1]; zero-magnitude vectors are skipped."""
    best = 0.0
    n = len(pts)
    for i in range(n):
        for h in spans:
            if i - h < 0 or i + h > n - 1:
                continue
            pv = (pts[i][0] - pts[i - h][0], pts[i][1] - pts[i - h][1])
            nv = (pts[i + h][0] - pts[i + 1][0], pts[i + h][1] - pts[i + 1][1])
            mp = (pv[0] ** 2 + pv[1] ** 2) ** 0.5
            mn = (nv[0] ** 2 + nv[1] ** 2) ** 0.5
            if mp == 0 or mn == 0:
                continue
            dot = pv[0] * nv[0] + pv[1] * nv[1]
            ang = float(np.degrees(np.arccos(np.clip(dot / (mp * mn), -1, 1))))
            best = max(best, ang)
            break  # largest fitting span only, per centre
    return best


def angle_cost_table(k: int, spans: tuple[int, ...],
                     angle_weight: float = 1.5, grace: float = 30.0,
                     exponent: float = 1.5, denom: float = 90.0) -> np.ndarray:
    """acost[hist_code, move] — the additive angle term of one step's cost,
    in pixel units (step length GRID), reference pricing
    (PathFinder.py:168-173: dist * angle_weight * angle_penalty)."""
    H = 5 ** k
    spans = tuple(sorted(spans, reverse=True))
    out = np.zeros((H, 4), dtype=np.float64)
    for code in range(H):
        hist = decode_hist(code, k)
        # unreachable codes (absent digit newer than a concrete one) are
        # never touched by the relaxation; their table rows are harmless.
        for m in range(4):
            ang = window_angle_deg(tail_points(hist, m), spans)
            pen = 0.0 if ang <= grace else (ang / denom) ** exponent
            out[code, m] = GRID * angle_weight * pen
    return out


def expanded_relax(walk: np.ndarray, pen: np.ndarray,
                   start_rc: tuple[int, int], k: int,
                   acost: np.ndarray, max_iters: int = 600,
                   penalty_weight: float = 0.5):
    """Fast-sweeping relaxation over (row, col, history) states.

    dist[r, c, h] = cheapest cost of any path start->(r, c) whose last
    min(k, len) moves encode to h. Four directional Gauss-Seidel scans per
    pass (the relax_sweep ordering, wavefront.py:181-254): a straight
    corridor relaxes in ONE scan, so convergence takes O(turns) passes.
    The scan state is the whole H-vector per cell; the in-run recurrence is
    x_c = min(x_c, T(x_{c-1}) + enter_c) with the history-transition
    min-plus operator T(v)[rest*5+m] = min_d v[d*B+rest] + acost[d*B+rest, m].
    """
    R, C = walk.shape
    H, B = 5 ** k, 5 ** (k - 1)
    enter = np.where(walk, GRID * (1.0 + penalty_weight * pen), INF)
    dist = np.full((R, C, H), INF)
    h0 = 5 ** k - 1  # all-ABSENT history
    dist[start_rc[0], start_rc[1], h0] = 0.0
    idx = {m: np.arange(B) * 5 + m for m in range(4)}
    ac = {m: acost[:, m].reshape(5, B) for m in range(4)}

    def directional(cur: np.ndarray, m: int) -> None:
        """One in-place scan taking move m along its axis."""
        dr, dc = int(MOVES[m][0]), int(MOVES[m][1])
        axis = 0 if dr != 0 else 1
        n = cur.shape[axis]
        rng = range(1, n) if (dr + dc) > 0 else range(n - 2, -1, -1)
        for pos in rng:
            prev = pos - (dr + dc)
            psl = cur[prev] if axis == 0 else cur[:, prev]      # (M, H)
            t = (psl.reshape(-1, 5, B) + ac[m][None]).min(axis=1)  # (M, B)
            e = (enter[pos] if axis == 0 else enter[:, pos])[:, None]
            csl = cur[pos] if axis == 0 else cur[:, pos]
            csl[:, idx[m]] = np.minimum(csl[:, idx[m]], t + e)

    for it in range(max_iters):
        new = dist.copy()
        for m in (0, 1, 2, 3):
            directional(new, m)
        if np.array_equal(new, dist):
            return dist, it
        dist = new
    return dist, max_iters


def backtrace(dist: np.ndarray, enter: np.ndarray, acost: np.ndarray,
              start_rc, goal_rc, k: int, max_len: int = 2048):
    """Greedy parent descent from the cheapest goal state."""
    R, C, H = dist.shape
    B = 5 ** (k - 1)
    r, c = goal_rc
    h = int(np.argmin(dist[r, c]))
    cost = float(dist[r, c, h])
    if not np.isfinite(cost):
        return None, INF
    cells = [(r, c)]
    h0 = 5 ** k - 1
    for _ in range(max_len):
        if (r, c) == tuple(start_rc) and h == h0:
            cells.reverse()
            return cells, cost
        m = h % 5
        rest = h // 5
        pr, pc = r - MOVES[m][0], c - MOVES[m][1]
        if not (0 <= pr < R and 0 <= pc < C):
            return None, INF
        hp = [d * B + rest for d in range(5)]
        cand = dist[pr, pc, hp] + acost[hp, m]
        d = int(np.argmin(cand))
        h = d * B + rest
        r, c = int(pr), int(pc)
        cells.append((r, c))
    return None, INF


def run_fixture(name: str, gold, k: int, acost: np.ndarray):
    walk = gold.walkable.astype(bool)
    pen = gold.penalty.astype(np.float64)
    art = gold.artificial
    start = gold.start_cell
    enter = np.where(walk, GRID * (1.0 + 0.5 * pen), INF)
    dist, iters = expanded_relax(walk, pen, start, k, acost)
    paths = []
    for peak in gold.peaks:
        goal = closest_cell_to_point(walk, (peak.centre.x, peak.centre.y))
        if goal is None:
            continue
        cells, cost = backtrace(dist, enter, acost, start, goal, k)
        if cells is None:
            continue
        paths.append(build_path(materialize_cells(cells, pen, art, GRID), cost))
    answer = InstructionEngine()(FRAME_H, FRAME_W, deduplicate_paths(paths), 0)
    cellsets = [tuple((cc.row, cc.col) for cc in p.cells) for p in paths]
    return answer, cellsets, iters


def main() -> None:
    ks = [int(x) for x in (sys.argv[1:] or ["2", "3", "4", "5"])]
    goldens = {}
    for name in scenario_names():
        goldens[name] = GoldenReplayPipeline().process(load_scenario(name))
    ref_paths = {
        name: [tuple((cc.row, cc.col) for cc in p.cells) for p in g.raw_paths]
        for name, g in goldens.items()
    }
    results = []
    for k, (vname, spans) in itertools.product(ks, [("h3", (3,)),
                                                    ("h23", (3, 2))]):
        t0 = time.time()
        acost = angle_cost_table(k, spans)
        nontrivial = bool((acost > 0).any())
        row = {"k": k, "variant": vname, "angle_charge_nontrivial": nontrivial,
               "answers_matched": 0, "fixtures": {}, "insane_case": {}}
        for name, gold in goldens.items():
            ans, cellsets, iters = run_fixture(name, gold, k, acost)
            match = ans == gold.final_answer
            row["answers_matched"] += int(match)
            row["fixtures"][name] = {"answer": ans, "golden": gold.final_answer,
                                     "match": match, "iters": iters}
            if name == "insane_case":
                row["insane_case"] = {
                    "answer_matches": match,
                    "paths_equal_reference": cellsets == ref_paths[name],
                }
        row["seconds"] = round(time.time() - t0, 1)
        results.append(row)
        print(f"k={k} {vname}: {row['answers_matched']}/13 answers, "
              f"insane_case match={row['insane_case']['answer_matches']} "
              f"paths_equal={row['insane_case']['paths_equal_reference']} "
              f"nontrivial_charge={nontrivial} ({row['seconds']}s)", flush=True)

    out = REPO / "diagnostics" / "k_history_sweep.json"
    existing = json.loads(out.read_text()) if out.exists() else []
    seen = {(r["k"], r["variant"]) for r in results}
    existing = [r for r in existing if (r["k"], r["variant"]) not in seen]
    out.write_text(json.dumps(existing + results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
