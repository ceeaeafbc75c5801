#!/usr/bin/env python
"""Scenario editor: paint occupancy lattices for pipeline testing.

Twin of the reference's grid-drawing GUI
(utilities/generate_testing_grids/utility.py): paints a rows x cols boolean
lattice at 10px display cells, saves `<name>_grids.npy` (+ a 20px-cell
`<name>_img.png` preview) compatible with the replay harness and the
tests/fixtures/scenarios format.

Modes:
  GUI (needs a display):   python tools/scenario_editor.py my_case
      left-drag paint, right-drag erase, [1-5] brush size, s save, q quit
  Headless, from an image: python tools/scenario_editor.py my_case \
      --from-image mask.png [--threshold 127]
  Headless, from ASCII:    python tools/scenario_editor.py my_case \
      --from-ascii layout.txt   ('#'/'1' = walkable)
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

GRID = 20


def save_scenario(name: str, occ: np.ndarray, out_dir: pathlib.Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / f"{name}_grids.npy", occ.astype(bool))
    preview = np.zeros((occ.shape[0] * GRID, occ.shape[1] * GRID, 3), np.uint8)
    preview[np.repeat(np.repeat(occ, GRID, 0), GRID, 1)] = (255, 255, 255)
    try:
        import cv2

        cv2.imwrite(str(out_dir / f"{name}_img.png"), preview)
    except ImportError:
        pass
    print(f"saved {out_dir / (name + '_grids.npy')} "
          f"({int(occ.sum())} walkable cells)")


def from_image(path: str, rows: int, cols: int, threshold: int) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.resize(img, (cols, rows), interpolation=cv2.INTER_AREA)
    return img > threshold


def from_ascii(path: str) -> np.ndarray:
    # Keep blank lines: they are intentional all-unwalkable rows; dropping
    # them would shift the layout vertically. Only trailing fully-empty
    # lines (editor artifacts) are stripped.
    lines = pathlib.Path(path).read_text().splitlines()
    while lines and not lines[-1].strip():
        lines.pop()
    rows = [[ch in "#1xX" for ch in line] for line in lines]
    width = max((len(r) for r in rows), default=0)
    return np.array([r + [False] * (width - len(r)) for r in rows])


def run_gui(name: str, rows: int, cols: int, out_dir: pathlib.Path,
            load: np.ndarray | None) -> None:
    import pygame

    cell = 10
    pygame.init()
    screen = pygame.display.set_mode((cols * cell, rows * cell))
    pygame.display.set_caption(f"scenario editor — {name}")
    occ = load.copy() if load is not None else np.zeros((rows, cols), bool)
    brush = 2
    clock = pygame.time.Clock()

    def paint(pos, value):
        c, r = pos[0] // cell, pos[1] // cell
        r0, r1 = max(0, r - brush + 1), min(rows, r + brush)
        c0, c1 = max(0, c - brush + 1), min(cols, c + brush)
        occ[r0:r1, c0:c1] = value

    running = True
    while running:
        for ev in pygame.event.get():
            if ev.type == pygame.QUIT:
                running = False
            elif ev.type == pygame.KEYDOWN:
                if ev.key == pygame.K_q:
                    running = False
                elif ev.key == pygame.K_s:
                    save_scenario(name, occ, out_dir)
                elif pygame.K_1 <= ev.key <= pygame.K_5:
                    brush = ev.key - pygame.K_0
        buttons = pygame.mouse.get_pressed()
        if buttons[0]:
            paint(pygame.mouse.get_pos(), True)
        elif buttons[2]:
            paint(pygame.mouse.get_pos(), False)

        screen.fill((30, 30, 30))
        for r, c in zip(*np.nonzero(occ)):
            pygame.draw.rect(screen, (230, 230, 230),
                             (c * cell, r * cell, cell, cell))
        pygame.display.flip()
        clock.tick(60)
    pygame.quit()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=36)
    ap.add_argument("--out", default="tests/fixtures/scenarios")
    ap.add_argument("--from-image", default=None)
    ap.add_argument("--from-ascii", default=None)
    ap.add_argument("--threshold", type=int, default=127)
    ap.add_argument("--edit", action="store_true",
                    help="load an existing scenario into the GUI")
    args = ap.parse_args()
    out_dir = pathlib.Path(args.out)

    if args.from_image:
        save_scenario(args.name,
                      from_image(args.from_image, args.rows, args.cols,
                                 args.threshold), out_dir)
        return 0
    if args.from_ascii:
        save_scenario(args.name, from_ascii(args.from_ascii), out_dir)
        return 0

    load = None
    rows, cols = args.rows, args.cols
    if args.edit:
        load = np.load(out_dir / f"{args.name}_grids.npy")
        # The loaded grid's shape wins over the --rows/--cols defaults, or a
        # non-64x36 scenario reopens in a wrong-sized window with paint
        # clamped to the smaller bounds.
        rows, cols = load.shape
    run_gui(args.name, rows, cols, out_dir, load)
    return 0


if __name__ == "__main__":
    sys.exit(main())
