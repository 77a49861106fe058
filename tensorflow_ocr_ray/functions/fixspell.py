"""Wordlist-driven spell repair — the reference's ``fixspell.pl`` (P3).

Reference semantics (``fixspell.pl`` sub init/fixit/doit):

- a wordlist hash of acceptable words (``%okWords``)
- an ordered list of single-spot substitutions (Yiddish orthography
  corrections, e.g. ``ײ→ײַ``, ``א→אַ``)
- ``fixit(word, where)``: left-to-right recursive search — at position
  ``where``, try each correction anchored there; accept immediately if the
  corrected word is in the wordlist, else recurse at ``where+1`` keeping
  the change; finally recurse without any change.  First hit wins; words
  never in reach stay unchanged.
- ``doit``: hyphenated line ends re-join with the next line (``־`` at
  EOL); text splits on punctuation/whitespace runs which pass through
  verbatim; per-word results are memoized (``%corrected``).

The stage is stateful (wordlist + memo per actor) — used via
``map_batches(SpellFixer(...))`` or as a registered postprocessor.
"""

from __future__ import annotations

import re

# The Perl rules (fixspell.pl init): "target replacement" anchored at one
# position.  \P{M} (not-a-combining-mark lookahead) approximated as in
# postprocess.py.
_M = "̀-֑ͯ-ׇؐ-ؚ"
DEFAULT_CORRECTIONS: list[tuple[str, str]] = [
    ("ײ", "ײַ"),
    ("ת", "תּ"),
    ("כ", "כּ"),
    ("ב", "בֿ"),
    ("יע", "יִע"),
    ("עי", "עיִ"),
    (f"א(?=[^{_M}])", "אַ"),
    (f"א(?=[^{_M}])", "אָ"),
    (f"ש(?=[^{_M}])", "שׂ"),
]

_SPLIT = re.compile(r"([^\w\s]+|\s+)", re.UNICODE)
_LETTER = re.compile(r"[^\W\d_]", re.UNICODE)
_HYPHEN_EOL = re.compile(r"(\w+)־$", re.UNICODE)


class SpellFixer:
    """Stateful spell fixer: wordlist + per-instance memo cache."""

    def __init__(
        self,
        words,
        corrections: list[tuple[str, str]] | None = None,
        max_len: int = 40,
    ):
        self.ok = set(words)
        rules = corrections if corrections is not None else DEFAULT_CORRECTIONS
        self.rules = [(re.compile(pat, re.UNICODE), rep) for pat, rep in rules]
        self.memo: dict[str, str] = {}
        self.max_len = max_len

    def fixit(self, word: str, where: int) -> str:
        """fixspell.pl:fixit — anchored DFS over single substitutions."""
        if where >= len(word):
            return word
        if word in self.ok:
            return word
        for pat, rep in self.rules:
            m = pat.match(word, where)
            if m is not None:
                cand = word[: m.start()] + rep + word[m.end() :]
                if cand in self.ok:
                    return cand
                answer = self.fixit(cand, where + 1)
                if answer != cand:
                    return answer
        return self.fixit(word, where + 1)

    def fix_word(self, word: str) -> str:
        if word in self.ok or not _LETTER.search(word):
            return word
        if len(word) > self.max_len:
            return word  # runaway guard; the Perl recurses unboundedly
        got = self.memo.get(word)
        if got is None:
            got = self.fixit(word, 0)
            self.memo[word] = got
        return got

    def fix_text(self, text: str) -> str:
        """fixspell.pl:doit over one span's text (line-hyphen re-join +
        tokenwise correction; punctuation/space runs pass through)."""
        out: list[str] = []
        remainder = ""
        lines = text.split("\n")
        for i, line in enumerate(lines):
            if remainder:
                stripped = len(line) - len(line.lstrip())
                line = line[:stripped] + remainder + line[stripped:]
                remainder = ""
            m = _HYPHEN_EOL.search(line)
            if m and i < len(lines) - 1:
                remainder = m.group(1)
                line = line[: m.start()]
            out.append(
                "".join(self.fix_word(part) for part in _SPLIT.split(line))
            )
        return "\n".join(out)

    __call__ = fix_text


def make_fixspell(words) -> SpellFixer:
    """Factory for the postprocessor registry / actor constructors."""
    return SpellFixer(words)
