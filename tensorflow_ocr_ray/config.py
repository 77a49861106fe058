"""Typed configuration mirroring every tunable of the reference engine.

Each field corresponds to a CLI flag / compile-time constant of the reference
(defaults from ``main/ocr.h:44-69``, flags parsed in ``main/main.c:119-231``).
The reference's Makefile per-book targets (e.g. KAFKA at ``main/Makefile:684``)
become named ``OcrConfig`` presets.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

# main/ocr.h:208 — the glyph emitted when no font entry is close enough.
OCRFAILS = "▮"  # ▮
# main/kd.c:238 — value returned for an empty font index.
EMPTY_TREE_VALUE = "·"  # ·
# main/kd.c:233 — unknown-glyph marker in the TF feature dump.
TF_UNKNOWN = "XX"

GRID = 5  # main/ocr.h:45
TUPLELENGTH = GRID * GRID + 2  # main/ocr.h:46 — 27


@dataclass(frozen=True)
class OcrConfig:
    """All segmentation/matching knobs (reference defaults).

    Citations point at the reference's definition of each knob.
    """

    # -w / -h / -W / -H (main/ocr.h:51-54, main/main.c:157-165)
    min_glyph_width: int = 10
    min_glyph_height: int = 10
    max_glyph_width: int = 150
    max_glyph_height: int = 150
    # -d (main/main.c:206-209; default 1 in main.c:44 despite header comment)
    min_glyph_area: int = 1
    # -m (main/ocr.h:48) distance limit to accept a match (compared squared)
    min_match: float = 0.9
    # -g (main/ocr.h:63) distance for a "good" match
    good_match: float = 0.40
    # -s (main/ocr.h:62) fraction of average glyph width that counts a space
    space_fraction: float = 0.60
    # -p (main/ocr.h:64) width multiple that makes a glyph a split candidate
    splittable: float = 1.10
    # -C (main/ocr.h:69) binarization threshold as a fraction of full white
    cutoff: float = 0.50
    # -c (main/main.c:180-182) number of text columns on the page
    columns: int = 1
    # -i (main/kd.c:35-36) drop dim 26 from the distance metric
    ignore_vertical: bool = False
    # -S (main/main.c:187-188) skip the deskew shear search
    no_shear: bool = False
    # -L (main/ocr.h:68) italic correction: dx = dy / slant
    slant: float = 3.65
    # -x (main/main.c:194-197) flood fill instead of recursive XY-cut
    use_flood: bool = False
    # -X (main/main.c:198-201) disable combine/split entirely
    may_combine: bool = True
    # -A (main/main.c:202-205) combine horizontal overlaps even if worse
    always_combine: bool = False

    # constants that the reference does not expose as flags
    max_shear: int = 4  # main/ocr.h:59
    shear_scale: int = 100  # main/ocr.h:67
    light_sum: int = 20  # main/ocr.h:66
    split_gap: int = 40  # main/segment.c:23 (SPLITGAP)
    some_dark: int = 30  # main/segment.c:354 (SOMEDARK)

    @property
    def min_match2(self) -> float:
        return self.min_match * self.min_match

    @property
    def good_match2(self) -> float:
        return self.good_match * self.good_match

    def with_(self, **kw) -> "OcrConfig":
        return replace(self, **kw)


# Named presets mirroring the reference Makefile's per-book tuned flag sets.
# KAFKA = -H 600 -W 600 -d 10 -w 3 -h 2 -x -i -p 1.8 -s 0.4 -A -m 1.1
# (main/Makefile:684)
KAFKA_CONFIG = OcrConfig(
    max_glyph_height=600,
    max_glyph_width=600,
    min_glyph_area=10,
    min_glyph_width=3,
    min_glyph_height=2,
    use_flood=True,
    ignore_vertical=True,
    splittable=1.8,
    space_fraction=0.4,
    always_combine=True,
    min_match=1.1,
)

# Config used by this repo's deterministic fixture corpus: glyphs are rendered
# from a 5x7 bitmap font at small scale, so the minimum-size gates are lowered
# the same way the reference lowers them for its test books.
FIXTURE_CONFIG = OcrConfig(
    min_glyph_width=3,
    min_glyph_height=3,
    min_glyph_area=9,
    no_shear=True,
)

PRESETS = {
    "default": OcrConfig(),
    "kafka": KAFKA_CONFIG,
    "fixture": FIXTURE_CONFIG,
}
