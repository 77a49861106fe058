"""fixspell.pl semantics (P3): wordlist-driven recursive correction."""

from tensorflow_ocr_ray.functions.fixspell import SpellFixer


def _fixer(words, rules):
    return SpellFixer(words, corrections=rules)


def test_ok_words_pass_through():
    f = _fixer({"hello"}, [("x", "y")])
    assert f.fix_word("hello") == "hello"


def test_single_substitution_reaches_wordlist():
    # the Perl testIt case: corrections x->y, a->b; okWords {ybab}
    f = _fixer({"ybab"}, [("x", "y"), ("a", "b")])
    assert f.fix_word("xbab") == "ybab"
    # the DFS applies fixes at positions 0, 1 and 3 to reach the wordlist
    assert f.fix_word("xaaa") == "ybab"
    # a word with no reachable fix stays unchanged
    assert f.fix_word("qqq") == "qqq"


def test_multi_position_search():
    # two substitutions at different positions, applied via recursion
    f = _fixer({"yb"}, [("x", "y"), ("a", "b")])
    assert f.fix_word("xa") == "yb"


def test_memoization_caches_results():
    f = _fixer({"ybab"}, [("x", "y"), ("a", "b")])
    f.fix_word("xbab")
    assert f.memo["xbab"] == "ybab"


def test_punctuation_and_space_preserved():
    f = _fixer({"ok"}, [("z", "o")])
    assert f.fix_text("zk, zk!") == "ok, ok!"


def test_hyphen_rejoin_across_lines():
    # doit: a word ending in ־ at EOL re-joins with the next line
    f = _fixer({"shtetl"}, [("x", "s")])
    out = f.fix_text("xhte־\ntl here")
    assert "shtetl" in out


def test_yiddish_default_rules():
    f = SpellFixer({"תּורה"})
    assert f.fix_word("תורה") == "תּורה"
