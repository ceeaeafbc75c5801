#!/usr/bin/env python
"""On-hardware validation of the fused Pallas wavefront relaxation.

Runs ops/pallas_wavefront.relax_pallas (compiled Mosaic kernel, NOT
interpreter) against planning/wavefront.relax (XLA while_loop) on the real
TPU for every scenario fixture: asserts the converged distance fields match,
then times both. Writes diagnostics/pallas_validation.json.

Round-1 state: the kernel was only verified in interpreter mode
(tests/test_pallas_kernels.py); this script is the real-chip check VERDICT.md
asked for.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    from vision_assist_tpu.config import replay_config
    from vision_assist_tpu.golden.lattice import (
        inject_artificial_cells,
        penalty_field,
    )
    from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
    from vision_assist_tpu.ops.pallas_wavefront import relax_pallas
    from vision_assist_tpu.planning.wavefront import relax

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(f"not a TPU ({dev}); this validation must run on hardware")
        return 1

    cfg = replay_config()
    g = cfg.grid.grid_size
    out = {"device": str(dev), "fixtures": {}}
    ok_all = True

    for name in scenario_names():
        occ = load_scenario(name)
        walkable, _ = inject_artificial_cells(
            occ, cfg.frame_width, cfg.frame_height, g,
            half_span=cfg.grid.artificial_half_span_cells,
            row_start_frac=cfg.grid.artificial_row_start_frac,
            replay_rounding=True)
        penalty = penalty_field(
            walkable, saturation_threshold=cfg.penalty.saturation_threshold,
            dominance_gain=cfg.penalty.dominance_gain).astype(np.float32)
        rows, cols = walkable.shape
        start = np.array([rows - 1, cols // 2], np.int32)
        # snap start to a walkable cell
        wr, wc = np.nonzero(walkable)
        k = np.argmin(np.abs(wr - start[0]) + np.abs(wc - start[1]))
        start = np.array([wr[k], wc[k]], np.int32)

        w_dev = jnp.asarray(walkable)
        p_dev = jnp.asarray(penalty)
        s_dev = jnp.asarray(start)

        aw = cfg.pathfinder.wavefront_turn_weight
        d_xla = np.asarray(relax(w_dev, p_dev, s_dev, grid_size=g,
                                 angle_weight=aw))
        d_pal = np.asarray(relax_pallas(w_dev, p_dev, s_dev, grid_size=g,
                                        angle_weight=aw, interpret=False))
        finite = np.isfinite(d_xla)
        same_support = bool((finite == np.isfinite(d_pal)).all())
        max_diff = float(np.max(np.abs(
            np.where(finite, d_xla - d_pal, 0.0)))) if finite.any() else 0.0
        match = same_support and max_diff < 1e-4
        ok_all &= match

        def t(fn, n=10):
            fn()
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            return (time.perf_counter() - t0) / n * 1000

        ms_xla = t(lambda: jax.block_until_ready(
            relax(w_dev, p_dev, s_dev, grid_size=g, angle_weight=aw)))
        ms_pal = t(lambda: jax.block_until_ready(
            relax_pallas(w_dev, p_dev, s_dev, grid_size=g, angle_weight=aw,
                         interpret=False)))
        out["fixtures"][name] = {
            "match": match, "max_diff": max_diff,
            "xla_ms": round(ms_xla, 3), "pallas_ms": round(ms_pal, 3)}
        print(f"{name:28s} match={match} max_diff={max_diff:.2e} "
              f"xla={ms_xla:.2f}ms pallas={ms_pal:.2f}ms", flush=True)

    out["all_match"] = ok_all
    path = pathlib.Path("diagnostics/pallas_validation.json")
    path.parent.mkdir(parents=True, exist_ok=True)
    from vision_assist_tpu.utils.chipquiet import chip_quiet_status
    out.update(chip_quiet_status())
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({"all_match": ok_all}), flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
