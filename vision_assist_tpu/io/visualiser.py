"""Debug overlay rendering.

Behavioural twin of the reference's presentation layer: penalty-coloured
non-path cells (FrameProcessor._draw_non_path_grids, FrameProcessor.py:287-298),
alternating blue/red path sections shaded far/mid/close with white connecting
lines, and corner markers + labels (PathVisualiser.py:44-93). Drawing is
host-side numpy/cv2 — presentation is not a hot path.
"""

from __future__ import annotations

import numpy as np

from vision_assist_tpu.config import PENALTY_COLOUR_GRADIENT, PipelineConfig

_PATH_COLOURS = [
    # (close, mid, far) BGR — PathVisualiser.PATH_COLORS (PathVisualiser.py:13-16)
    ((0, 0, 255), (0, 0, 200), (0, 0, 150)),
    ((255, 0, 0), (200, 0, 0), (150, 0, 0)),
]

_GRADIENT_KEYS = sorted(PENALTY_COLOUR_GRADIENT)


def penalty_colour(penalty: float) -> tuple[int, int, int]:
    """Nearest-stop lookup in the reference's 12-stop gradient
    (PenaltyCalculator.get_penalty_colour, PenaltyCalculator.py:144-152)."""
    key = min(_GRADIENT_KEYS, key=lambda k: abs(k - penalty))
    return PENALTY_COLOUR_GRADIENT[key]


def _fill_cell(img: np.ndarray, x: int, y: int, g: int, colour) -> None:
    img[y:y + g + 1, x:x + g + 1] = colour


def render_overlay(cfg: PipelineConfig, result, frame: np.ndarray | None = None
                   ) -> np.ndarray:
    """Render the debug overlay for a FrameResult onto (a copy of) the frame."""
    g = cfg.grid.grid_size
    h, w = cfg.frame_height, cfg.frame_width
    # ONE C-ordered numpy copy (handles device arrays too) — the previous
    # ascontiguousarray().copy() chain copied non-contiguous frames twice.
    img = (np.array(frame) if frame is not None
           else np.zeros((h, w, 3), np.uint8))

    # Non-path cells with penalty colours.
    walk = result.walkable
    pen = result.penalty
    for r, c in zip(*np.nonzero(walk)):
        _fill_cell(img, c * g, r * g, g, penalty_colour(float(pen[r, c])))

    # Path sections.
    try:
        import cv2
    except ImportError:  # pragma: no cover - cv2 is available in CI
        cv2 = None

    for path in result.paths:
        sections = path.sections
        for i, section in enumerate(sections):
            close, mid, far = _PATH_COLOURS[i % 2]
            progress = i / len(sections) if sections else 0
            colour = far if progress < 0.33 else mid if progress < 0.66 else close
            for cell in section.cells:
                _fill_cell(img, cell.coords.x, cell.coords.y, g, colour)
        if cv2 is not None:
            for section in sections:
                s, e = section.start, section.end
                cv2.line(img, (s.x + g // 2, s.y + g // 2),
                         (e.x + g // 2, e.y + g // 2), (255, 255, 255), 2)
            for idx, corner in enumerate(path.corners):
                cv2.circle(img, (corner.start.x + 10, corner.start.y + 10), 5,
                           (255, 255, 255), -1)
                cv2.circle(img, (corner.end.x + 10, corner.end.y + 10), 5,
                           (255, 255, 255), -1)
                cv2.putText(
                    img,
                    f"{idx + 1} {corner.direction} {corner.shape} {corner.sharpness}",
                    (corner.end.x - 100, corner.end.y - 5),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 2)

    # Peak markers (magenta, ProtrusionDetector debug style :512).
    if cv2 is not None:
        for peak in result.peaks:
            cv2.circle(img, peak.centre.to_tuple(), 8, (255, 0, 255), -1)
    return img
