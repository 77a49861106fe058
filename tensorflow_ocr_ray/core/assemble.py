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
    """Coarse bidi class: R (strong RTL), L (strong LTR), N (neutral)."""
    bd = unicodedata.bidirectional(ch)
    if bd in ("R", "AL"):
        return "R"
    if bd in ("L", "EN", "AN"):
        # digits (EN/AN) render left-to-right even in an RTL paragraph
        return "L"
    if bd in ("NSM",):
        return "M"  # combining marks travel with their base
    return "N"


def log2vis(line: str, rtl_base: bool) -> str:
    """Logical→visual reorder of one line (subset of UBA; identity for pure
    LTR text with an LTR base direction)."""
    if not rtl_base:
        # LTR base: reverse any maximal RTL runs in place
        out: list[str] = []
        run: list[str] = []
        for ch in line:
            cls = _char_class(ch)
            if cls == "R" or (run and cls in ("M",)):
                run.append(ch)
            else:
                if run:
                    out.extend(reversed(run))
                    run = []
                out.append(ch)
        if run:
            out.extend(reversed(run))
        return "".join(out)
    # RTL base: resolve each char into runs; neutrals join the RTL flow.
    # Cluster combining marks with their base char, then reverse the
    # sequence of clusters, keeping maximal LTR (L/EN) stretches intact.
    clusters: list[tuple[str, str]] = []  # (cluster_text, class)
    for ch in line:
        cls = _char_class(ch)
        if cls == "M" and clusters:
            text, base_cls = clusters[-1]
            clusters[-1] = (text + ch, base_cls)
        else:
            clusters.append((ch, cls))
    # group LTR stretches
    groups: list[tuple[str, str]] = []
    for text, cls in clusters:
        tag = "L" if cls == "L" else "R"
        if groups and groups[-1][1] == "L" and tag == "L":
            groups[-1] = (groups[-1][0] + text, "L")
        else:
            groups.append((text, tag))
    out_parts: list[str] = []
    for text, tag in reversed(groups):
        if tag == "L":
            out_parts.append(text)
        else:
            out_parts.append(
                "".join(_MIRROR.get(c, c) for c in reversed(text))
            )
    return "".join(out_parts)


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
