"""27-dim glyph feature extraction — bit-faithful to the reference.

Reference semantics (``main/categorize.c:47-140``, ``main/kd.c:639-643``):

- The glyph bbox is divided into a 5x5 grid whose cell boundaries come from
  ``lroundf`` of ``(dim-1)/GRID * k`` (cells OVERLAP by one row/col because
  ``lastLine = lround(rowDelta*(row+1)) + 1``).
- Each cell's fraction of black pixels is rounded to 3 decimals via an
  ``sprintf("%0.3f")`` / ``sscanf`` round-trip — ties near .0005 decide NN
  winners, so we reproduce the round-trip exactly.
- Pixels left of ``leftPath`` / right-or-at ``rightPath`` are excluded from
  the numerator but still count in the denominator (``categorize.c:89-98``:
  the ``continue`` skips after ``totalCells += 1``).
- dim 25: aspect ``h<w ? h/2w : 1 - w/2h``; dim 26: ``h / lineHeight``
  (falling back to the page-average glyph height when lineHeight is 0).
- ``normalizeTuple`` multiplies dims 25,26 by 3 to weight them in the metric.
"""

from __future__ import annotations

import numpy as np

from tensorflow_ocr_ray.config import GRID, TUPLELENGTH


def lroundf(x: float) -> int:
    """C lroundf for non-negative inputs: round half away from zero."""
    return int(np.floor(x + 0.5))


def _grid_edges(lo: int, extent: float) -> tuple[list[int], list[int]]:
    delta = np.float32(extent - 1) / np.float32(GRID)
    first = [lo + lroundf(float(delta * np.float32(k))) for k in range(GRID)]
    last = [lo + lroundf(float(delta * np.float32(k + 1))) + 1 for k in range(GRID)]
    return first, last


def round3(x: float) -> np.float32:
    """The sprintf(%0.3f)/sscanf round-trip of categorize.c:106-109."""
    return np.float32(f"{x:.3f}")


def fill_tuple(
    image: np.ndarray,
    left: int,
    right: int,
    top: int,
    bottom: int,
    line_height: int,
    fallback_glyph_height: int,
    left_path: np.ndarray | None = None,
    right_path: np.ndarray | None = None,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """fillTuple (main/categorize.c:47-125) over a page image (uint8 0/1/2).

    ``right``/``bottom`` are exclusive, as in the reference.  ``left_path`` /
    ``right_path``, when given, are int arrays of length ``bottom-top``
    indexed by row offset from ``top``.  Flood-marked pixels (value 2) count
    as filled, as in the reference where ISFILLED tests non-zero.
    """
    gheight = np.float32(bottom - top)
    gwidth = np.float32(right - left)
    tup = out if out is not None else np.empty(TUPLELENGTH, dtype=np.float32)

    first_line, last_line = _grid_edges(top, float(gheight))
    first_pos, last_pos = _grid_edges(left, float(gwidth))

    # Vectorized per-cell fraction with the path-exclusion rule.
    crop_filled = image[top:bottom, left:right] != 0
    if left_path is not None or right_path is not None:
        cols = np.arange(left, right)
        keep = np.ones((bottom - top, right - left), dtype=bool)
        if left_path is not None:
            keep &= cols[None, :] >= np.asarray(left_path)[: bottom - top, None]
        if right_path is not None:
            keep &= cols[None, :] < np.asarray(right_path)[: bottom - top, None]
        counted = crop_filled & keep
    else:
        counted = crop_filled

    # prefix sums let each (overlapping) cell be a 4-corner lookup
    ps = np.zeros((bottom - top + 1, right - left + 1), dtype=np.int64)
    np.cumsum(np.cumsum(counted, axis=0), axis=1, out=ps[1:, 1:])

    for r in range(GRID):
        r0 = min(max(first_line[r] - top, 0), bottom - top)
        r1 = min(max(last_line[r] - top, 0), bottom - top)
        for c in range(GRID):
            c0 = min(max(first_pos[c] - left, 0), right - left)
            c1 = min(max(last_pos[c] - left, 0), right - left)
            total = (last_line[r] - first_line[r]) * (last_pos[c] - first_pos[c])
            filled = int(ps[r1, c1] - ps[r0, c1] - ps[r1, c0] + ps[r0, c0])
            content = np.float32(filled) / np.float32(total)
            tup[r * GRID + c] = round3(float(content))

    # aspect ratio (categorize.c:115-116), float32 arithmetic
    if gheight < gwidth:
        tup[GRID * GRID] = gheight / (np.float32(2.0) * gwidth)
    else:
        tup[GRID * GRID] = np.float32(1.0) - gwidth / (np.float32(2.0) * gheight)
    # height relative to line (categorize.c:120-122)
    denom = np.float32(line_height if line_height else fallback_glyph_height)
    tup[GRID * GRID + 1] = gheight / denom
    normalize_tuple(tup)
    return tup


def refill_tuple(
    tup: np.ndarray,
    left: int,
    right: int,
    top: int,
    bottom: int,
    line_height: int,
    fallback_glyph_height: int,
) -> None:
    """refillTuple (main/categorize.c:127-140): recompute dims 25,26 only.

    NOTE the reference quirk: refillTuple calls normalizeTuple on the whole
    tuple, which re-multiplies nothing for dims 0..24 (they are untouched)
    but the aspect/height dims are freshly computed then x3 — identical to
    our behavior here.
    """
    gheight = np.float32(bottom - top)
    gwidth = np.float32(right - left)
    if gheight < gwidth:
        tup[GRID * GRID] = gheight / (np.float32(2.0) * gwidth)
    else:
        tup[GRID * GRID] = np.float32(1.0) - gwidth / (np.float32(2.0) * gheight)
    denom = np.float32(line_height if line_height else fallback_glyph_height)
    tup[GRID * GRID + 1] = gheight / denom
    tup[GRID * GRID] *= np.float32(3)
    tup[GRID * GRID + 1] *= np.float32(3)


def normalize_tuple(tup: np.ndarray) -> None:
    """normalizeTuple (main/kd.c:639-643): x3 weight on dims 25,26."""
    tup[GRID * GRID] *= np.float32(3)
    tup[GRID * GRID + 1] *= np.float32(3)
