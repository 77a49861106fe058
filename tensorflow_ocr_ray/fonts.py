"""Deterministic built-in bitmap font + font-index construction.

Stands in for the reference's per-book font databases
(``main/fontData/*.data`` — 139-1,284 labeled 27-dim tuples).  Our font is a
5x7 letters/digits set (the north star's "rendered-font set"); each label's
index tuples are produced by the SAME feature extractor the pipeline uses
(main/categorize.c semantics), with variants for the line-height contexts a
rendered page can produce (the reference's font files likewise hold multiple
variants per label).
"""

from __future__ import annotations

import numpy as np

from tensorflow_ocr_ray.config import TUPLELENGTH
from tensorflow_ocr_ray.core.features import fill_tuple
from tensorflow_ocr_ray.core.knn import FontIndex

# 5x7 bitmaps, '#'=ink.  Lowercase x-height occupies rows 2-6.
FONT_5X7: dict[str, list[str]] = {
    "0": [".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."],
    "1": ["..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."],
    "2": [".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"],
    "3": [".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."],
    "4": ["...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."],
    "5": ["#####", "#....", "####.", "....#", "....#", "#...#", ".###."],
    "6": ["..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."],
    "7": ["#####", "....#", "...#.", "..#..", "..#..", "..#..", "..#.."],
    "8": [".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."],
    "9": [".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."],
    "A": [".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "B": ["####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."],
    "C": [".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."],
    "D": ["####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."],
    "E": ["#####", "#....", "#....", "####.", "#....", "#....", "#####"],
    "F": ["#####", "#....", "#....", "####.", "#....", "#....", "#...."],
    "G": [".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".###."],
    "H": ["#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "I": [".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."],
    "J": ["..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."],
    "K": ["#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"],
    "L": ["#....", "#....", "#....", "#....", "#....", "#....", "#####"],
    "M": ["#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"],
    "N": ["#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"],
    "O": [".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "P": ["####.", "#...#", "#...#", "####.", "#....", "#....", "#...."],
    "Q": [".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"],
    "R": ["####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"],
    "S": [".####", "#....", "#....", ".###.", "....#", "....#", "####."],
    "T": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."],
    "U": ["#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "V": ["#...#", "#...#", "#...#", "#...#", ".#.#.", ".#.#.", "..#.."],
    "W": ["#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"],
    "X": ["#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"],
    "Y": ["#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."],
    "Z": ["#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"],
    "a": [".....", ".....", ".###.", "....#", ".####", "#...#", ".####"],
    "b": ["#....", "#....", "####.", "#...#", "#...#", "#...#", "####."],
    "c": [".....", ".....", ".###.", "#....", "#....", "#...#", ".###."],
    "d": ["....#", "....#", ".####", "#...#", "#...#", "#...#", ".####"],
    "e": [".....", ".....", ".###.", "#...#", "#####", "#....", ".###."],
    "f": ["..##.", ".#..#", ".#...", "###..", ".#...", ".#...", ".#..."],
    "g": [".....", ".####", "#...#", "#...#", ".####", "....#", ".###."],
    "h": ["#....", "#....", "####.", "#...#", "#...#", "#...#", "#...#"],
    "i": [".....", "..#..", ".##..", "..#..", "..#..", "..#..", ".###."],
    "j": [".....", "...#.", "..##.", "...#.", "...#.", "#..#.", ".##.."],
    "k": ["#....", "#....", "#..#.", "#.#..", "##...", "#.#..", "#..#."],
    "l": [".##..", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."],
    "m": [".....", ".....", "##.#.", "#.#.#", "#.#.#", "#.#.#", "#.#.#"],
    "n": [".....", ".....", "####.", "#...#", "#...#", "#...#", "#...#"],
    "o": [".....", ".....", ".###.", "#...#", "#...#", "#...#", ".###."],
    "p": [".....", "####.", "#...#", "#...#", "####.", "#....", "#...."],
    "q": [".....", ".####", "#...#", "#...#", ".####", "....#", "....#"],
    "r": [".....", ".....", "#.##.", "##..#", "#....", "#....", "#...."],
    "s": [".....", ".....", ".####", "#....", ".###.", "....#", "####."],
    "t": [".#...", ".#...", "###..", ".#...", ".#...", ".#..#", "..##."],
    "u": [".....", ".....", "#...#", "#...#", "#...#", "#..##", ".##.#"],
    "v": [".....", ".....", "#...#", "#...#", "#...#", ".#.#.", "..#.."],
    "w": [".....", ".....", "#...#", "#.#.#", "#.#.#", "#.#.#", ".#.#."],
    "x": [".....", ".....", "#...#", ".#.#.", "..#..", ".#.#.", "#...#"],
    "y": [".....", "#...#", "#...#", ".####", "....#", "#...#", ".###."],
    "z": [".....", ".....", "#####", "...#.", "..#..", ".#...", "#####"],
}

DEFAULT_SCALE = 3
NOMINAL_CELL_ROWS = 7


_BITMAP_CACHE: dict[tuple[str, int], np.ndarray] = {}


def glyph_bitmap(label: str, scale: int = DEFAULT_SCALE) -> np.ndarray:
    """Trimmed, scaled bitonal bitmap (uint8 0/1) for one font label."""
    key = (label, scale)
    cached = _BITMAP_CACHE.get(key)
    if cached is not None:
        return cached
    rows = FONT_5X7[label]
    arr = np.array(
        [[1 if ch == "#" else 0 for ch in row] for row in rows], dtype=np.uint8
    )
    ys, xs = np.nonzero(arr)
    arr = arr[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
    out = np.kron(arr, np.ones((scale, scale), dtype=np.uint8))
    out.setflags(write=False)  # shared cache entry; callers must not mutate
    _BITMAP_CACHE[key] = out
    return out


def glyph_cell_top_offset(label: str, scale: int = DEFAULT_SCALE) -> int:
    """Rows of leading blank cell space (baseline alignment when rendering)."""
    rows = FONT_5X7[label]
    arr = np.array(
        [[1 if ch == "#" else 0 for ch in row] for row in rows], dtype=np.uint8
    )
    return int(np.nonzero(arr.any(axis=1))[0][0]) * scale


def font_labels() -> list[str]:
    return list(FONT_5X7.keys())


def build_font_index(scale: int = DEFAULT_SCALE) -> FontIndex:
    """Build the exact-NN index from the built-in font.

    For each label we extract the 27-dim tuple with the pipeline's feature
    code over an isolated rendering, once per line-height context that can
    occur on a fixture page: the glyph's own height and the full nominal
    line height (7*scale).  Mirrors readTuples loading multiple variants per
    label (main/kd.c:645-724).
    """
    tuples: list[np.ndarray] = []
    labels: list[str] = []
    full_line = NOMINAL_CELL_ROWS * scale
    for label in font_labels():
        bmp = glyph_bitmap(label, scale)
        h, w = bmp.shape
        page = np.zeros((h + 2, w + 2), dtype=np.uint8)
        page[1 : 1 + h, 1 : 1 + w] = bmp
        seen: set[bytes] = set()
        for line_height in {h, full_line}:
            tup = fill_tuple(
                page, 1, 1 + w, 1, 1 + h,
                line_height=line_height, fallback_glyph_height=line_height,
            )
            key = tup.tobytes()
            if key not in seen:
                seen.add(key)
                tuples.append(tup)
                labels.append(label)
    return FontIndex(np.stack(tuples), labels)


_INDEX_CACHE: dict[int, FontIndex] = {}


def get_font_index(scale: int = DEFAULT_SCALE) -> FontIndex:
    if scale not in _INDEX_CACHE:
        _INDEX_CACHE[scale] = build_font_index(scale)
    return _INDEX_CACHE[scale]
