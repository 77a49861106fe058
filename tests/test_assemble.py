"""Text assembly semantics (reference: main/gtkDisplay.c:202-365)."""

from tensorflow_ocr_ray.core.assemble import (
    assemble_page_text,
    collect_line_text,
    log2vis,
)


def _line(values, lefts, rights, top, bottom, lb=None, rb=None):
    return {
        "top": top,
        "bottom": bottom,
        "left_border": lb if lb is not None else lefts[0],
        "right_border": rb if rb is not None else rights[-1],
        "values": values,
        "lefts": lefts,
        "rights": rights,
    }


def test_space_insertion_threshold():
    # gap > spaceFraction*glyphWidth → space; count = max(1, gap//gw - 1)
    gw = 10
    # gap 7 > 6 → one space; gap 5 ≤ 6 → no space
    out = collect_line_text(["a", "b", "c"], [0, 17, 32], [10, 27, 42], gw, 0.6)
    assert out == "a bc"


def test_wide_gap_multiple_spaces():
    gw = 10
    # gap 35: 35//10 - 1 = 2 spaces  (gtkDisplay.c:211-219, C int division)
    out = collect_line_text(["a", "b"], [0, 45], [10, 55], gw, 0.6)
    assert out == "a  b"


def test_blank_line_formula():
    # blank = (top - prevBottom) / lineHeight (C int div); >2 → n//2+1
    lines = [
        _line(["a"], [0], [10], 0, 10),
        _line(["b"], [0], [10], 30, 40),  # gap 20 / height 10 = 2 blanks
    ]
    text = assemble_page_text(lines, 10, 0, 10, False, 0.6)
    assert text == "a\n\n\nb\n"


def test_blank_line_gt2_halved():
    lines = [
        _line(["a"], [0], [10], 0, 10),
        _line(["b"], [0], [10], 90, 100),  # 80/10 = 8 > 2 → 8//2+1 = 5
    ]
    text = assemble_page_text(lines, 10, 0, 10, False, 0.6)
    assert text == "a\n" + "\n" * 5 + "b\n"


def test_indent_from_left_margin():
    lines = [
        _line(["a"], [0], [10], 0, 10),
        _line(["b"], [25], [35], 12, 22),  # (25-0)//10 = 2 indent spaces
    ]
    text = assemble_page_text(lines, 10, 0, 35, False, 0.6)
    assert text.splitlines()[1] == "  b"


def test_rtl_indent_from_right_margin():
    lines = [
        _line(["א"], [40], [50], 0, 10, lb=40, rb=50),
        _line(["ב"], [10], [20], 12, 22, lb=10, rb=20),  # (50-20)//10 = 3
    ]
    text = assemble_page_text(lines, 10, 10, 50, True, 0.6)
    assert text.splitlines()[1] == "   ב"


def test_log2vis_ltr_identity():
    assert log2vis("hello world", rtl_base=False) == "hello world"


def test_log2vis_rtl_run_in_ltr_base():
    # an RTL run inside LTR text is reversed in place
    assert log2vis("abc אבג xyz", rtl_base=False) == "abc גבא xyz"


def test_log2vis_rtl_base_reverses_and_mirrors():
    # RTL base: visual order is reversed; brackets mirror
    assert log2vis("אב(ג", rtl_base=True) == "ג)בא"


def test_log2vis_rtl_base_keeps_ltr_stretch():
    # an embedded LTR word stays left-to-right inside the reversed line
    out = log2vis("אב 12ab גד", rtl_base=True)
    assert "12ab"[0:4] in out  # stretch not reversed
    assert out.index("דג") < out.index("12ab")


def test_log2vis_uba_weak_and_neutral_rules():
    """Hand-checked against fribidi semantics: W2/W4/W5/W7 number rules,
    N1/N2 neutral resolution (EN/AN count as R context), implicit
    levels + L2 reversal."""
    cases = [
        ("abc 123 אבג", False, "abc 123 גבא"),   # EN after L stays L (W7)
        ("אבג 123", False, "123 גבא"),            # EN after R embeds at level 2
        ("א 12.34 ב", True, "ב 12.34 א"),         # CS between ENs joins (W4)
        ("א 12 34 ב", True, "ב 34 12 א"),         # space between numbers is R (N1)
        ("abc def", True, "abc def"),              # L-space-L joins L (N1)
        ("אב 12ab גד", True, "דג 12ab בא"),       # mixed number+latin stretch
    ]
    for line, rtl, want in cases:
        assert log2vis(line, rtl) == want, (line, rtl)


class TestExplicitBidiControls:
    """UBA X rules (LRE/RLE/LRO/RLO/PDF + LRI/RLI/FSI/PDI) — the
    explicit-embedding path the reference gets from fribidi
    (main/gtkDisplay.c:311-332); cases derived from UAX#9 examples."""

    def _v(self, s, rtl=False):
        from tensorflow_ocr_ray.core.assemble import log2vis

        return log2vis(s, rtl)

    def test_rlo_forces_reversal(self):
        assert self._v("abc ‮def‬ ghi") == "abc fed ghi"

    def test_rlo_whole_line(self):
        assert self._v("‮abc‬") == "cba"

    def test_rle_pure_ltr_content_inert(self):
        assert self._v("abc ‫xyz‬ def") == "abc xyz def"

    def test_rli_isolate_orders_content_rtl(self):
        assert self._v("abc ⁧1 2⁩ def") == "abc 2 1 def"

    def test_fsi_sniffs_hebrew(self):
        assert self._v("x ⁨א ב⁩ y") == \
            "x ב א y"

    def test_fsi_sniffs_latin(self):
        assert self._v("x ⁨a b⁩ y") == "x a b y"

    def test_nested_embeddings(self):
        assert self._v(
            "‫א ‪ab‬ ב‬", rtl=True
        ) == "ב ab א"

    def test_controls_removed_when_inert(self):
        assert self._v("a‪‬b") == "ab"

    def test_unmatched_pdi_removed_unmatched_rlo_to_eol(self):
        assert self._v("a⁩b ‮cd") == "ab dc"

    def test_mirroring_cancels_on_balanced_pairs(self):
        # reversal + L4 glyph mirroring cancel for balanced brackets
        assert self._v("‮(a)‬") == "(a)"

    def test_mirroring_unbalanced(self):
        assert self._v("‮(a‬") == "a)"

    def test_isolate_is_neutral_to_surroundings(self):
        # RTL text around an isolate stays one RTL run (isolate = neutral)
        got = self._v("א ⁦ab⁩ ב", rtl=True)
        assert got == "ב ab א"

    def test_overflow_depth_guarded(self):
        deep = "‫" * 200 + "a" + "‬" * 200
        assert self._v(deep) == "a"

    def test_implicit_path_untouched(self):
        # no controls -> the pre-existing implicit path handles it
        assert self._v("abc אב def") == "abc בא def"
