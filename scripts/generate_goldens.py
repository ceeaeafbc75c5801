"""Freeze the exact host-twin outputs for all scenario fixtures as golden
snapshots (tests/fixtures/goldens/). The twin itself is validated against the
actual reference implementation by tests/test_reference_differential.py; these
snapshots make the parity suite self-contained.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from vision_assist_tpu.golden.pipeline import GoldenReplayPipeline
from vision_assist_tpu.io.scenarios import load_scenario, scenario_names

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "goldens"


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for name in scenario_names():
        occ = load_scenario(name)
        res = GoldenReplayPipeline().process(occ)

        np.savez_compressed(
            OUT / f"{name}.npz",
            walkable=res.walkable,
            artificial=res.artificial,
            penalty=res.penalty,
        )
        doc = {
            "final_answer": res.final_answer,
            "start_cell": list(res.start_cell),
            "peaks": [
                {
                    "centre": [p.centre.x, p.centre.y],
                    "left": [p.left.x, p.left.y],
                    "right": [p.right.x, p.right.y],
                    "orientation": p.orientation,
                }
                for p in res.peaks
            ],
            "raw_paths": [
                {
                    "cells_rc": [[c.row, c.col] for c in p.cells],
                    "total_cost": p.total_cost,
                }
                for p in res.raw_paths
            ],
            "paths": [
                {
                    "cells_rc": [[c.row, c.col] for c in p.cells],
                    "total_cost": p.total_cost,
                    "sections": [
                        {
                            "path_type": s.path_type,
                            "cells_rc": [[c.row, c.col] for c in s.cells],
                            "total_cost": s.total_cost,
                        }
                        for s in p.sections
                    ],
                    "corners": [
                        {
                            "direction": c.direction,
                            "sharpness": c.sharpness,
                            "shape": c.shape,
                            "start": [c.start.x, c.start.y],
                            "end": [c.end.x, c.end.y],
                            "angle_change": c.angle_change,
                            "length": c.length,
                        }
                        for c in p.corners
                    ],
                }
                for p in p_list
            ] if (p_list := res.paths) is not None else [],
        }
        (OUT / f"{name}.json").write_text(json.dumps(doc, indent=1))
        print(f"froze {name}: answer={res.final_answer} paths={len(res.paths)}")


if __name__ == "__main__":
    main()
