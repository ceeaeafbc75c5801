"""Tests for the extended (convexity-defect) protrusion subsystem, including
differential checks against the reference's live building-block methods."""

from __future__ import annotations

import pathlib
import sys
import types

import numpy as np
import pytest

from vision_assist_tpu.golden.peaks import rasterize_cells
from vision_assist_tpu.golden.pipeline import GoldenReplayPipeline
from vision_assist_tpu.golden.protrusions import ExtendedProtrusionDetector
from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
from vision_assist_tpu.types import Coordinate

cv2 = pytest.importorskip("cv2")

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="module")
def golds():
    return {n: GoldenReplayPipeline().process(load_scenario(n))
            for n in scenario_names()}


class TestExtendedDetector:
    def test_returns_superset_of_global_peaks(self, golds):
        det = ExtendedProtrusionDetector()
        for name, gold in golds.items():
            binary = rasterize_cells(gold.walkable, 1280, 720)
            out = det(binary, gold.walkable, 1280, 720)
            gold_centres = [(p.centre.x, p.centre.y) for p in gold.peaks]
            assert [(c.x, c.y) for c in out[:len(gold_centres)]] == \
                gold_centres, name

    def test_empty_image(self):
        det = ExtendedProtrusionDetector()
        out = det(np.zeros((200, 200), np.uint8),
                  np.zeros((10, 10), bool), 200, 200)
        assert out == []


@pytest.mark.skipif(not (REFERENCE / "models.py").exists(),
                    reason="reference checkout not available")
class TestDifferentialPieces:
    """The dormant subsystem's building blocks are LIVE methods in the
    reference; compare ours against them directly."""

    @pytest.fixture(scope="class")
    def ref_detector(self, golds):
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
        import vision_assist.ProtrusionDetector as ref_pd
        import vision_assist.models as ref_models

        ref_pd.ProtrusionDetector._instance = None
        det = ref_pd.ProtrusionDetector(debug=False, imshow=False)
        det.height, det.width = 1280, 720
        det.frame = np.zeros((1280, 720, 3), np.uint8)
        return det, ref_models

    def test_region_crop_matches(self, golds, ref_detector):
        det, ref_models = ref_detector
        mine = ExtendedProtrusionDetector()
        for name in ("right_turn", "two_global_peaks", "insane_case"):
            gold = golds[name]
            binary = rasterize_cells(gold.walkable, 1280, 720)
            det.binary = binary
            for pt in [(100, 400), (600, 1200), (10, 10), (700, 600)]:
                theirs = det._get_region_around_protrusion(
                    ref_models.Coordinate(x=pt[0], y=pt[1]))
                ours = mine.region_around(binary, Coordinate(*pt), 1280, 720)
                np.testing.assert_array_equal(ours, theirs,
                                              err_msg=f"{name}@{pt}")

    def test_point_near_quad_matches(self, golds, ref_detector):
        det, ref_models = ref_detector
        mine = ExtendedProtrusionDetector()
        quad_ref = [ref_models.Coordinate(x=100, y=1200),
                    ref_models.Coordinate(x=600, y=1200),
                    ref_models.Coordinate(x=500, y=200),
                    ref_models.Coordinate(x=150, y=220)]
        quad_mine = [Coordinate(100, 1200), Coordinate(600, 1200),
                     Coordinate(500, 200), Coordinate(150, 220)]
        rng = np.random.default_rng(0)
        for _ in range(50):
            pt = (int(rng.integers(0, 720)), int(rng.integers(0, 1280)))
            theirs = det._is_point_near_quadrilateral(
                ref_models.Coordinate(x=pt[0], y=pt[1]), quad_ref, 150)
            ours = mine.point_near_quadrilateral(Coordinate(*pt), quad_mine, 150)
            assert ours == theirs, pt

    def test_full_orchestration_matches_reconstructed_reference(
            self, golds, ref_detector):
        """Run the reference's commented-out orchestration by calling its live
        methods, and require identical protrusion lists."""
        det, ref_models = ref_detector
        import vision_assist.models as m

        mine = ExtendedProtrusionDetector()
        for name in scenario_names():
            gold = golds[name]
            binary = rasterize_cells(gold.walkable, 1280, 720)

            # Reference side (ProtrusionDetector.py:444-504 reconstructed).
            det.binary = binary
            det.grids = None  # _is_valid_bottom_point needs grids;
            # build reference grids for it:
            rows, cols = gold.walkable.shape
            grids = []
            for r in range(rows):
                row = []
                for c in range(cols):
                    row.append(m.Grid(
                        coords=m.Coordinate(x=c * 20, y=r * 20),
                        centre=m.Coordinate(x=c * 20 + 10, y=r * 20 + 10),
                        penalty=None, row=r, col=c,
                        empty=not bool(gold.walkable[r, c]),
                        artificial=False))
                grids.append(row)
            det.grids = grids

            ref_peaks = det._find_peak()
            contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL,
                                           cv2.CHAIN_APPROX_SIMPLE)
            theirs = [p.centre for p in ref_peaks]
            if contours:
                contour = max(contours, key=cv2.contourArea)
                x, y, w, h = cv2.boundingRect(contour)
                quad = det._get_quadrilateral(ref_peaks, contour)
                quad_pts = np.array([[p.x, p.y] for p in quad], np.int32)
                hull = cv2.convexHull(contour)
                hull_idx = cv2.convexHull(contour, returnPoints=False)
                defects = cv2.convexityDefects(contour, hull_idx)
                prots = []
                if defects is not None:
                    for d in np.asarray(defects).reshape(-1, 4):
                        cd = m.ConvexityDefect(
                            start=m.Coordinate(x=int(contour[d[0]][0][0]),
                                               y=int(contour[d[0]][0][1])),
                            end=m.Coordinate(x=int(contour[d[1]][0][0]),
                                             y=int(contour[d[1]][0][1])),
                            far=m.Coordinate(x=int(contour[d[2]][0][0]),
                                             y=int(contour[d[2]][0][1])),
                            depth=float(d[3]))
                        if not (cd.depth > 0.25 * w
                                and 30 < cd.angle_degrees < 150
                                and cd.start.y < y + 0.8 * h):
                            continue
                        region = det._get_region_around_protrusion(cd.start)
                        pks = det._find_peak(cd.start, region)
                        for pk in pks:
                            near = det._is_point_near_quadrilateral(
                                pk.centre, quad, threshold=150)
                            inside = cv2.pointPolygonTest(
                                quad_pts, pk.centre.to_tuple(), False) >= 0
                            if not near and not inside:
                                prots.append(pk.centre)
                    theirs = theirs + det._filter_protrusions(
                        prots, hull, ref_peaks)

            ours = mine(binary, gold.walkable, 1280, 720)
            assert [(c.x, c.y) for c in ours] == \
                [(c.x, c.y) for c in theirs], name
