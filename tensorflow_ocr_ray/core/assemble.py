"""Line/text assembly — the batch-mode displayText path of the reference.

Reproduces (``main/gtkDisplay.c:202-365``):

- glyph → string via the classifier (``ocrValue``), ``▮`` on weak match
- inter-word spaces: emitted when the gap to the next glyph exceeds
  ``spaceFraction * glyphWidth``; count = ``max(1, gap/glyphWidth - 1)``
  with C integer division (gtkDisplay.c:211-219)
- blank lines between text lines: ``(top - prevBottom) / lineHeight`` with C
  integer division, clamped at 0; ``>2 → n/2 + 1`` (gtkDisplay.c:268-271)
- indentation: ``(leftBorder - leftMargin) / glyphWidth`` spaces (RTL: from
  the right margin) prepended OUTSIDE the bidi reordering (gtkDisplay.c:294-304)
- bidi visual reordering of each assembled line (fribidi_log2vis with the
  paragraph direction forced to the font's RTL flag, gtkDisplay.c:311-332).
  We implement the subset of the Unicode BiDi algorithm those corpora
  exercise: directional runs with neutrals resolved toward the base
  direction and bracket mirroring in RTL runs.
"""

from __future__ import annotations

import unicodedata

_MIRROR = {"(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{",
           "<": ">", ">": "<"}


def _char_class(ch: str) -> str:
    """Bidi class, reduced to the UBA categories this engine resolves:
    R/AL (strong RTL, AL kept distinct for W2), L, EN, AN, ES/CS/ET
    (number separators/terminators), NSM (marks), N (all other
    neutrals, incl. whitespace)."""
    bd = unicodedata.bidirectional(ch)
    if bd in ("R",):
        return "R"
    if bd in ("AL",):
        return "AL"
    if bd in ("L",):
        return "L"
    if bd in ("EN", "AN", "ES", "CS", "ET", "NSM"):
        return bd
    return "N"


def log2vis(line: str, rtl_base: bool) -> str:
    """Logical→visual reorder of one line: an implementation of the
    Unicode BiDi algorithm's implicit part — weak rules W2/W4/W5/W7,
    neutral rules N1/N2 (EN/AN count as R context), implicit levels
    I1/I2 and the L2 level-run reversal — without explicit
    embedding/override/isolate controls (the reference never feeds
    fribidi control characters; gtkDisplay.c:311-332)."""
    if not line:
        return line
    # fast path: an LTR paragraph whose characters are all below U+0590
    # (no RTL scripts possible) and free of bidi controls reorders to
    # itself — the overwhelming case for Latin corpora, and ~50 us of
    # per-line UBA machinery skipped (measured in the flagship profile)
    if not rtl_base and max(line) < "֐":
        return line
    # cluster combining marks with their base character (they travel
    # with it through reordering)
    clusters: list[list] = []  # [text, class]
    for ch in line:
        cls = _char_class(ch)
        if cls == "NSM" and clusters:
            clusters[-1][0] += ch
        else:
            clusters.append([ch, cls if cls != "NSM" else "N"])
    n = len(clusters)
    cl = [c[1] for c in clusters]

    # W2: EN -> AN when the last strong type is AL
    strong = "L" if not rtl_base else "R"  # sos
    for i in range(n):
        if cl[i] in ("R", "AL", "L"):
            strong = cl[i]
        elif cl[i] == "EN" and strong == "AL":
            cl[i] = "AN"
    # W4: ES between two ENs -> EN; CS between two same-type numbers
    for i in range(1, n - 1):
        if cl[i] == "ES" and cl[i - 1] == "EN" and cl[i + 1] == "EN":
            cl[i] = "EN"
        elif cl[i] == "CS" and cl[i - 1] == cl[i + 1] and cl[i - 1] in ("EN", "AN"):
            cl[i] = cl[i - 1]
    # W5: ET sequences adjacent to EN -> EN
    for i in range(n):
        if cl[i] == "ET":
            j = i
            while j < n and cl[j] == "ET":
                j += 1
            prev_en = i > 0 and cl[i - 1] == "EN"
            next_en = j < n and cl[j] == "EN"
            if prev_en or next_en:
                for k in range(i, j):
                    cl[k] = "EN"
    # W6: remaining separators/terminators become neutral
    for i in range(n):
        if cl[i] in ("ES", "CS", "ET"):
            cl[i] = "N"
    # W7: EN -> L when the last strong type is L
    strong = "L" if not rtl_base else "R"
    for i in range(n):
        if cl[i] in ("R", "AL", "L"):
            strong = cl[i]
        elif cl[i] == "EN" and strong == "L":
            cl[i] = "L"

    # N1/N2: neutral runs take the surrounding direction when both sides
    # agree (EN/AN count as R), else the base direction
    def _dir(c: str) -> str:
        return "R" if c in ("R", "AL", "EN", "AN") else "L"

    base_dir = "R" if rtl_base else "L"
    i = 0
    while i < n:
        if cl[i] != "N":
            i += 1
            continue
        j = i
        while j < n and cl[j] == "N":
            j += 1
        before = _dir(cl[i - 1]) if i > 0 else base_dir
        after = _dir(cl[j]) if j < n else base_dir
        resolved = before if before == after else base_dir
        for k in range(i, j):
            cl[k] = resolved
        i = j

    # I1/I2: implicit levels
    levels = []
    for c in cl:
        if c in ("R", "AL"):
            levels.append(1)
        elif c in ("EN", "AN"):
            levels.append(2)
        elif c == "L":
            levels.append(2 if rtl_base else 0)
        else:  # resolved neutral carrying a direction
            levels.append(1 if c == "R" else (2 if rtl_base else 0))

    # mirroring happens on characters laid out RTL (odd level)
    texts = [c[0] for c in clusters]
    for i in range(n):
        if levels[i] % 2 == 1:
            texts[i] = "".join(_MIRROR.get(ch, ch) for ch in texts[i])

    # L2: from the highest level down to the lowest odd level (always 1
    # with implicit-only levels 0..2), reverse every maximal run at that
    # level or higher
    order = list(range(n))
    max_level = max(levels) if levels else 0
    for lev in range(max_level, 0, -1):
        i = 0
        while i < n:
            if levels[order[i]] >= lev:
                j = i
                while j < n and levels[order[j]] >= lev:
                    j += 1
                order[i:j] = order[i:j][::-1]
                i = j
            else:
                i += 1
    return "".join(texts[k] for k in order)


def collect_line_text(
    glyph_values: list[str],
    lefts: list[int],
    rights: list[int],
    glyph_width: int,
    space_fraction: float,
) -> str:
    """collectText (gtkDisplay.c:202-224) for one line of glyphs."""
    parts: list[str] = []
    n = len(glyph_values)
    for i in range(n):
        parts.append(glyph_values[i])
        if i + 1 < n:
            gap = lefts[i + 1] - rights[i]
            if gap > space_fraction * glyph_width:
                spaces = max(1, gap // glyph_width - 1) if glyph_width else 1
                parts.append(" " * spaces)
    return "".join(parts)


def assemble_page_text(
    lines: list[dict],
    glyph_width: int,
    left_margin: int,
    right_margin: int,
    rtl: bool,
    space_fraction: float,
) -> str:
    """displayText batch path (gtkDisplay.c:245-365) for one page.

    ``lines`` is a list of dicts with keys ``top bottom left_border
    right_border values lefts rights`` in reading order.
    """
    out: list[str] = []
    prev_bottom = 0
    for line in lines:
        blank_lines = 0
        if prev_bottom != 0:
            line_height = line["bottom"] - line["top"]
            if line_height > 0:
                # C integer division truncates toward zero
                blank_lines = int((line["top"] - prev_bottom) / line_height)
            blank_lines = max(blank_lines, 0)
            if blank_lines > 2:
                blank_lines = blank_lines // 2 + 1
        prev_bottom = line["bottom"]
        text = collect_line_text(
            line["values"], line["lefts"], line["rights"],
            glyph_width, space_fraction,
        )
        if rtl:
            indent = (right_margin - line["right_border"]) // glyph_width if glyph_width else 0
        else:
            indent = (line["left_border"] - left_margin) // glyph_width if glyph_width else 0
        indent = max(indent, 0)
        visual = log2vis(text, rtl)
        out.append("\n" * blank_lines)
        out.append(" " * indent)
        out.append(visual)
        out.append("\n")
    return "".join(out)
