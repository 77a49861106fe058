"""Generative segmentation invariants: the run-based flood fill must
agree with an independent naive BFS connected-component labeling on
random blob images (same components, same bboxes, same size filtering)."""

from collections import deque

import numpy as np
from hypothesis import given, settings, strategies as st

from tensorflow_ocr_ray.config import FIXTURE_CONFIG
from tensorflow_ocr_ray.core.knn import FontIndex
from tensorflow_ocr_ray.core.segment import PageSegmenter


def naive_components(img: np.ndarray) -> list[tuple[int, int, int, int]]:
    """8-connected components via BFS; returns bboxes (top, left,
    bottom_excl, right_excl)."""
    h, w = img.shape
    seen = np.zeros_like(img, dtype=bool)
    out = []
    for r in range(h):
        for c in range(w):
            if img[r, c] != 1 or seen[r, c]:
                continue
            q = deque([(r, c)])
            seen[r, c] = True
            t, l, b, rr = r, c, r, c
            while q:
                y, x = q.popleft()
                t, b = min(t, y), max(b, y)
                l, rr = min(l, x), max(rr, x)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = y + dy, x + dx
                        if (0 <= ny < h and 0 <= nx < w
                                and img[ny, nx] == 1 and not seen[ny, nx]):
                            seen[ny, nx] = True
                            q.append((ny, nx))
            out.append((t, l, b + 1, rr + 1))
    return out


def _size_ok(box, cfg) -> bool:
    t, l, b, r = box
    wdt, hgt = r - l, b - t
    return (
        wdt >= cfg.min_glyph_width
        and hgt >= cfg.min_glyph_height
        and wdt * hgt >= cfg.min_glyph_area
        and hgt <= cfg.max_glyph_height
        and wdt <= cfg.max_glyph_width
    )


@settings(max_examples=30, deadline=None, derandomize=True)
@given(st.integers(min_value=0, max_value=10**9))
def test_flood_matches_naive_ccl(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    img = np.zeros((40, 60), dtype=np.uint8)
    # scatter random rectangles and specks
    for _ in range(int(rng.integers(1, 8))):
        r, c = int(rng.integers(0, 34)), int(rng.integers(0, 52))
        hh, ww = int(rng.integers(1, 7)), int(rng.integers(1, 9))
        img[r : r + hh, c : c + ww] = 1
    for _ in range(int(rng.integers(0, 20))):
        img[int(rng.integers(0, 40)), int(rng.integers(0, 60))] = 1

    # -X disables the classifier-in-the-loop combines so the comparison is
    # PURELY component discovery (an empty index makes every distance
    # BIGDIST, which would otherwise let x-overlap combines fire)
    cfg = FIXTURE_CONFIG.with_(use_flood=True, may_combine=False)
    seg = PageSegmenter(img.copy(), cfg, FontIndex.empty())
    seg.find_lines(0)
    got = sorted(
        (g.top, g.left, g.bottom, g.right)
        for line in seg.lines
        for g in line.glyphs
    )
    want = sorted(
        b for b in naive_components(img) if _size_ok(b, cfg)
    )
    assert got == want, (seed, got, want)
