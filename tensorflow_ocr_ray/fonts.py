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

# A small Hebrew letter set (square forms, 5x7) — a SEPARATE alphabet,
# mirroring the reference's per-book font databases: loading it flips the
# index's RTL sniff (kd.c:700-711) exactly as the Yiddish .data files do.
HEBREW_5X7: dict[str, list[str]] = {
    "א": ["#...#", "#..#.", ".#.#.", "..#..", ".#.#.", ".#..#", "#...#"],
    "ב": [".....", "####.", "....#", "....#", "....#", "....#", "#####"],
    "ג": [".....", ".###.", "...#.", "...#.", "..##.", ".#.#.", "#..#."],
    "ד": [".....", "#####", "...#.", "...#.", "...#.", "...#.", "...#."],
    "ה": [".....", "#####", "....#", "....#", "#...#", "#...#", "#...#"],
    "ו": [".....", "..##.", "...#.", "...#.", "...#.", "...#.", "...#."],
    "ל": ["#....", ".#...", ".###.", "...#.", "...#.", "..#..", ".#..."],
    "ם": [".....", "####.", "#...#", "#...#", "#...#", "#...#", "####."],
    "ש": [".....", "#.#.#", "#.#.#", "#.#.#", "#.#.#", "#....", "#####"],
    "ת": [".....", ".####", "..#.#", "..#.#", "..#.#", ".##.#", "#..##"],
}

DEFAULT_SCALE = 3
NOMINAL_CELL_ROWS = 7


_ALL_GLYPHS: dict[str, list[str]] = {**FONT_5X7, **HEBREW_5X7}
_BITMAP_CACHE: dict[tuple[str, int], np.ndarray] = {}


def glyph_bitmap(label: str, scale: int = DEFAULT_SCALE) -> np.ndarray:
    """Trimmed, scaled bitonal bitmap (uint8 0/1) for one font label."""
    key = (label, scale)
    cached = _BITMAP_CACHE.get(key)
    if cached is not None:
        return cached
    rows = _ALL_GLYPHS[label]
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
    rows = _ALL_GLYPHS[label]
    arr = np.array(
        [[1 if ch == "#" else 0 for ch in row] for row in rows], dtype=np.uint8
    )
    return int(np.nonzero(arr.any(axis=1))[0][0]) * scale


def font_labels(alphabet: str = "latin") -> list[str]:
    if alphabet == "latin":
        return list(FONT_5X7.keys())
    if alphabet == "hebrew":
        return list(HEBREW_5X7.keys())
    raise ValueError(f"unknown alphabet {alphabet!r}")


def build_font_index(scale: int = DEFAULT_SCALE, alphabet: str = "latin") -> FontIndex:
    """Build the exact-NN index from a built-in font alphabet.

    For each label we extract the 27-dim tuple with the pipeline's feature
    code over an isolated rendering, once per line-height context that can
    occur on a fixture page: the glyph's own height and the full nominal
    line height (7*scale).  Mirrors readTuples loading multiple variants per
    label (main/kd.c:645-724); loading the hebrew alphabet flips the
    index's RTL sniff exactly as the reference's Yiddish .data files do.
    """
    tuples: list[np.ndarray] = []
    labels: list[str] = []
    full_line = NOMINAL_CELL_ROWS * scale
    for label in font_labels(alphabet):
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


_INDEX_CACHE: dict[tuple[int, str], FontIndex] = {}


def get_font_index(scale: int = DEFAULT_SCALE, alphabet: str = "latin") -> FontIndex:
    key = (scale, alphabet)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build_font_index(scale, alphabet)
    return _INDEX_CACHE[key]
