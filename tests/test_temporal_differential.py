"""Differential test of the TEMPORAL behaviour: drive the actual reference
PathAnalyser over multi-frame sequences (wall clock mocked) next to our
InstructionEngine with injected timestamps, and require identical answers and
memory evolution. This covers the cross-frame pairing/escalation machinery
(PathAnalyser.py:158-284) that single-frame goldens cannot."""

from __future__ import annotations

import pathlib
import sys
import types

import pytest

REFERENCE = pathlib.Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "models.py").exists(),
    reason="reference checkout not available",
)


@pytest.fixture()
def ref_analyser(monkeypatch):
    shim = pathlib.Path("/tmp/vision_assist_refshim")
    shim.mkdir(exist_ok=True)
    link = shim / "vision_assist"
    if not link.exists():
        link.symlink_to(REFERENCE)
    if str(shim) not in sys.path:
        sys.path.insert(0, str(shim))
    if "ultralytics" not in sys.modules:
        stub = types.ModuleType("ultralytics")
        stub.YOLO = object
        sys.modules["ultralytics"] = stub

    import vision_assist.PathAnalyser as ref_pa
    import vision_assist.models as ref_models

    clock = {"ms": 0}
    monkeypatch.setattr(ref_pa.time, "time", lambda: clock["ms"] / 1000.0)
    ref_pa.PathAnalyser._instance = None
    analyser = ref_pa.PathAnalyser()
    analyser.previous_instructions = {}
    return analyser, ref_models, clock


def _ref_path(m, rcs, cost=100.0):
    grids = []
    for r, c in rcs:
        grids.append(m.Grid(
            coords=m.Coordinate(x=c * 20, y=r * 20),
            centre=m.Coordinate(x=c * 20 + 10, y=r * 20 + 10),
            penalty=0.1, row=r, col=c, empty=False, artificial=False))
    return m.Path(grids=grids, total_cost=cost, path_type="path")


def _my_path(rcs, cost=100.0):
    from vision_assist_tpu.semantics.sections import build_path
    from vision_assist_tpu.types import Cell, Coordinate

    cells = [Cell(coords=Coordinate(c * 20, r * 20),
                  centre=Coordinate(c * 20 + 10, r * 20 + 10),
                  penalty=0.1, row=r, col=c, empty=False, artificial=False)
             for r, c in rcs]
    return build_path(cells, cost)


def _l_path(turn_col_shift):
    """Bottom-centre climb, then a horizontal jog whose extent varies a little
    frame to frame (to exercise pairing + direction-change escalation)."""
    rcs = [(r, 18) for r in range(63, 40, -1)]
    rcs += [(40, c) for c in range(19, 19 + turn_col_shift)]
    rcs += [(r, 18 + turn_col_shift) for r in range(39, 20, -1)]
    return rcs


SEQUENCES = [
    # (name, list of (dt_ms, route))
    ("steady_right_turns", [(0, _l_path(8)), (400, _l_path(9)),
                            (800, _l_path(10)), (1200, _l_path(11))]),
    ("slow_frames_no_pairing", [(0, _l_path(8)), (2000, _l_path(9)),
                                (4000, _l_path(10))]),
    ("memory_prune", [(0, _l_path(8)), (400, _l_path(8)),
                      (6000, _l_path(8)), (6400, _l_path(9))]),
    ("straight_only", [(0, [(r, 18) for r in range(63, 20, -1)]),
                       (500, [(r, 18) for r in range(63, 20, -1)])]),
]


@pytest.mark.parametrize("name,frames", SEQUENCES, ids=[s[0] for s in SEQUENCES])
def test_temporal_sequences_match(ref_analyser, name, frames):
    from vision_assist_tpu.semantics.analyser import InstructionEngine

    analyser, m, clock = ref_analyser
    mine = InstructionEngine()

    t = 0
    for dt, rcs in frames:
        t += dt
        clock["ms"] = t
        theirs = analyser(1280, 720, [_ref_path(m, rcs)])
        ours = mine(1280, 720, [_my_path(rcs)], t)
        assert ours == theirs, f"{name} @ {t}ms: {ours} vs {theirs}"
        assert set(mine.previous_instructions) == \
            set(analyser.previous_instructions), f"{name} @ {t}ms (memory keys)"
        for ts in mine.previous_instructions:
            a = mine.previous_instructions[ts]
            b = analyser.previous_instructions[ts]
            assert len(a) == len(b), f"{name} @ {t}ms ts={ts}"
            for x, y in zip(a, b):
                assert x.danger == y.danger, f"{name} @ {t}ms"
                assert x.direction == y.direction
                assert x.instruction_type == y.instruction_type
                assert abs(x.angle_change - y.angle_change) < 1e-9
