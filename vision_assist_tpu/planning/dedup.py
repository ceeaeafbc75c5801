"""Path de-duplication via Jaccard similarity on cell sets.

Reference: FrameProcessor.py:209-271 — similarity is intersection/union of the
two paths' coordinate sets, forced to 1.0 when either is a subset of the other;
candidates are considered longest-first (stable sort) and rejected at >= 0.90.
"""

from __future__ import annotations

from typing import Sequence

from vision_assist_tpu.semantics.sections import AnalysedPath


def path_similarity(a: Sequence[tuple[int, int]], b: Sequence[tuple[int, int]]) -> float:
    sa, sb = set(a), set(b)
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    if inter == len(sa) or inter == len(sb):
        return 1.0
    union = len(sa | sb)
    return inter / union if union > 0 else 0.0


def deduplicate_paths(paths: list[AnalysedPath],
                      threshold: float = 0.90) -> list[AnalysedPath]:
    unique: list[AnalysedPath] = []
    for path in sorted(paths, key=lambda p: len(p.cells), reverse=True):
        coords = [(c.coords.x, c.coords.y) for c in path.cells]
        if all(
            path_similarity(coords,
                            [(c.coords.x, c.coords.y) for c in kept.cells])
            < threshold
            for kept in unique
        ):
            unique.append(path)
    return unique
