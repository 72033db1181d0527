"""Compound word decomposition — the reference's
``analysis/compound/`` package:

- ``DictionaryCompoundWordTokenFilter``
  (``compound/DictionaryCompoundWordTokenFilter.kt``): brute-force
  dictionary scan — every dictionary word found as a case-insensitive
  substring (within [minSubwordSize, maxSubwordSize]) is stacked after
  the original token at posInc 0; ``onlyLongestMatch`` keeps only the
  longest match per start offset; ``reuseChars=False`` (requires
  onlyLongestMatch) skips past consumed characters.
- ``HyphenationCompoundWordTokenFilter``
  (``compound/HyphenationCompoundWordTokenFilter.kt``): candidate
  subwords are spans between hyphenation points from a FOP/TeX pattern
  grammar (``compound/hyphenation/HyphenationTree.kt`` — Liang-style
  interletter values, the reference's simplified prefix-match variant),
  optionally filtered by a dictionary (with the genitive
  one-char-shorter fallback), with onlyLongestMatch / noSubMatches /
  noOverlappingMatches controls.

The shipped Danish grammar (``da_UTF8.xml``, Apache-2.0 FOP data) is
committed gzipped via scripts/build_hyphenation_assets.py. Both filters
keep the original token and stack subwords at the same position — the
ExpandAnalyzer machinery (expand.py). Conformance vectors: every
assertTokenStreamContents from TestCompoundWordTokenFilter.kt
(tests/test_compound.py).
"""

from __future__ import annotations

import gzip
import re
from pathlib import Path

from .expand import WhitespaceExpandAnalyzer

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15

_DATA_DIR = Path(__file__).resolve().parent / "data"


# ---------------------------------------------------------------------------
# HyphenationTree — compound/hyphenation/{HyphenationTree,PatternParser}.kt
# (the reference's simplified pattern store: insertion-ordered
# pattern -> interletter-value-digits map, prefix match per position)
# ---------------------------------------------------------------------------

class HyphenationTree:
    """Liang-style hyphenator loaded from a FOP XML pattern grammar.

    ``hyphenate(word, remain, push)`` returns the hyphenation points
    [0, p1, ..., len] or None — bit-compatible with the reference's
    HyphenationTree.hyphenate (incl. the leading-non-letter skip, the
    exception stoplist, and the odd-interletter-value rule)."""

    def __init__(self):
        self.classes: dict[str, str] = {}
        self.stoplist: dict[str, list] = {}
        # pattern -> tuple of int values (PatternParser.getPattern /
        # getInterletterValues, applied at consecutive positions from
        # the match start — the reference's searchPatterns)
        self.patterns: dict[str, tuple[int, ...]] = {}
        self._by_len: dict[int, dict[str, tuple[int, ...]]] = {}
        self._max_pat = 0
        self.hyphen_char = "-"

    # -- loading ----------------------------------------------------------
    @classmethod
    def from_xml(cls, xml: str) -> "HyphenationTree":
        t = cls()
        t.load_patterns(xml)
        return t

    @classmethod
    def danish(cls) -> "HyphenationTree":
        xml = gzip.decompress(
            (_DATA_DIR / "hyph_da.xml.gz").read_bytes()).decode("utf-8")
        return cls.from_xml(xml)

    def load_patterns(self, xml: str) -> None:
        text = re.sub(r"(?s)<!--.*?-->", " ", xml)
        m = re.search(r'<hyphen-char\s+[^>]*value\s*=\s*"([^"]*)"', text)
        if m and m.group(1):
            self.hyphen_char = m.group(1)[0]
        for group in self._extract(text, "classes").split():
            if group:
                equiv = group[0]
                for ch in group:
                    self.classes[ch] = equiv
        for word in self._extract(text, "exceptions").split():
            ex = self._normalize_exception(word)
            key = "".join(p for p in ex if isinstance(p, str))
            self.stoplist[key] = ex
        for word in self._extract(text, "patterns").split():
            pat = "".join(c for c in word if not c.isdigit())
            self.patterns[pat] = self._interletter_values(word)
        for pat, vals in self.patterns.items():
            self._by_len.setdefault(len(pat), {})[pat] = vals
        self._max_pat = max(self._by_len, default=0)

    @staticmethod
    def _extract(text: str, tag: str) -> str:
        m = re.search(rf"(?s)<{tag}[^>]*>(.*?)</{tag}>", text)
        return m.group(1) if m else ""

    def _normalize_exception(self, ex: str) -> list:
        res: list = []
        buf = ""
        for c in ex:
            if c == self.hyphen_char:
                if buf:
                    res.append(buf)
                    buf = ""
                res.append(None)  # a breakable Hyphen("-")
            else:
                buf += c
        if buf:
            res.append(buf)
        return res

    @staticmethod
    def _interletter_values(pat: str) -> tuple[int, ...]:
        # PatternParser.getInterletterValues — the reference's exact
        # (simplified) digit extraction, NOT classic TeX alignment.
        word = pat if pat[0].isdigit() else "0" + pat
        il: list[int] = []
        for i, c in enumerate(word):
            if c.isdigit():
                il.append(int(c))
                if i + 1 < len(word) and word[i + 1].isdigit():
                    il.append(0)
        if not word[-1].isdigit():
            il.append(0)
        return tuple(il)

    # -- hyphenation -------------------------------------------------------
    def hyphenate(self, word: str, remain: int = 1,
                  push: int = 1) -> list[int] | None:
        # normalize: skip leading non-letters, stop at trailing ones
        norm: list[str] = []
        ignore_at_beginning = 0
        end_of_letters = False
        for i, ch in enumerate(word):
            nc = self.classes.get(ch)
            if nc is None:
                if i == ignore_at_beginning:
                    ignore_at_beginning += 1
                else:
                    end_of_letters = True
            else:
                if end_of_letters:
                    return None
                norm.append(nc)
        n = len(norm)
        if n < remain + push:
            return None
        points: list[int] = []
        sw = "".join(norm)
        hw = self.stoplist.get(sw)
        if hw is not None:
            j = 0
            for part in hw:
                if isinstance(part, str):
                    j += len(part)
                    if remain <= j < n - push:
                        points.append(j + ignore_at_beginning)
        else:
            w = "." + sw + "."
            il = [0] * (n + 3)
            for i in range(n + 1):
                tail = w[i:]
                for plen, pats in self._by_len.items():
                    if plen > len(tail):
                        continue
                    vals = pats.get(tail[:plen])
                    if vals is not None:
                        for k, v in enumerate(vals):
                            if i + k < len(il) and v > il[i + k]:
                                il[i + k] = v
            for i in range(n):
                if (il[i + 1] & 1) == 1 and remain <= i <= n - push:
                    points.append(i + ignore_at_beginning)
        uniq: list[int] = []
        for p in points:
            if 0 < p < n and (not uniq or uniq[-1] != p):
                uniq.append(p)
        if not uniq:
            return None
        return [0] + uniq + [n]


# ---------------------------------------------------------------------------
# decompose kernels (token -> stacked subword list)
# ---------------------------------------------------------------------------

def dictionary_decompose(token: str, dictionary: frozenset[str],
                         min_word_size: int = DEFAULT_MIN_WORD_SIZE,
                         min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
                         max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
                         only_longest_match: bool = False,
                         reuse_chars: bool = True) -> list[str]:
    """DictionaryCompoundWordTokenFilter.decompose — dictionary is the
    lowercased word set (CharArraySet ignoreCase=true)."""
    if not reuse_chars and not only_longest_match:
        raise ValueError(
            "reuseChars can only be set to false if onlyLongestMatch is "
            "set to true")
    if len(token) < min_word_size:
        return []
    low = token.lower()
    n = len(token)
    out: list[str] = []
    i = 0
    while i <= n - min_subword_size:
        longest: tuple[int, int] | None = None
        for j in range(min_subword_size, max_subword_size + 1):
            if i + j > n:
                break
            if low[i:i + j] in dictionary:
                if only_longest_match:
                    if longest is None or longest[1] < j:
                        longest = (i, j)
                else:
                    out.append(token[i:i + j])
        if longest is not None and not reuse_chars:
            i += longest[1] - 1
        if only_longest_match and longest is not None:
            out.append(token[longest[0]:longest[0] + longest[1]])
        i += 1
    return out


def hyphenation_decompose(token: str, hyphenator: HyphenationTree,
                          dictionary: frozenset[str] | None = None,
                          min_word_size: int = DEFAULT_MIN_WORD_SIZE,
                          min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
                          max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
                          only_longest_match: bool = False,
                          no_sub_matches: bool = False,
                          no_overlapping_matches: bool = False
                          ) -> list[str]:
    """HyphenationCompoundWordTokenFilter.decompose (exact port incl.
    the genitive one-char-shorter dictionary fallback and the consumed-
    hyphen bookkeeping)."""
    if len(token) < min_word_size:
        return []
    calc_sub = (not only_longest_match and not no_sub_matches
                and not no_overlapping_matches)
    low = token.lower()
    if (dictionary is not None and not calc_sub
            and (low in dictionary
                 or (len(token) > 1 and low[:-1] in dictionary))):
        return []
    hyp = hyphenator.hyphenate(token, 1, 1)
    if hyp is None:
        return []
    max_sub = min(max_subword_size, len(token) - 1)
    out: list[str] = []
    consumed = -1
    last_start = -1
    last_len = -1
    i = 0
    while i < len(hyp):
        if no_overlapping_matches:
            i = max(i, consumed)
            if i >= len(hyp):
                break
        start = hyp[i]
        until = max(consumed, i) if no_sub_matches else i
        j = len(hyp) - 1
        while j > until:
            part_len = hyp[j] - start
            if part_len > max_sub:
                j -= 1
                continue
            if part_len < min_subword_size:
                break
            if dictionary is None or low[start:start + part_len] in \
                    dictionary:
                if start != last_start or part_len != last_len:
                    out.append(token[start:start + part_len])
                    last_start, last_len = start, part_len
                consumed = j
                if not calc_sub:
                    break
            elif low[start:start + part_len - 1] in dictionary:
                if start != last_start or part_len - 1 != last_len:
                    out.append(token[start:start + part_len - 1])
                    last_start, last_len = start, part_len - 1
                consumed = j
                if not calc_sub:
                    break
            j -= 1
        i += 1
    return out


# ---------------------------------------------------------------------------
# analyzer wrappers (whitespace tokenizer, original + stacked subwords)
# ---------------------------------------------------------------------------

class DictionaryCompoundAnalyzer(WhitespaceExpandAnalyzer):
    name = "dict_compound"

    def __init__(self, dictionary,
                 min_word_size: int = DEFAULT_MIN_WORD_SIZE,
                 min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
                 max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
                 only_longest_match: bool = False,
                 reuse_chars: bool = True):
        if not reuse_chars and not only_longest_match:
            raise ValueError(
                "reuseChars can only be set to false if onlyLongestMatch "
                "is set to true")
        self.dictionary = frozenset(w.lower() for w in dictionary)
        self.min_word_size = min_word_size
        self.min_subword_size = min_subword_size
        self.max_subword_size = max_subword_size
        self.only_longest_match = only_longest_match
        self.reuse_chars = reuse_chars

    def expand(self, tok: str) -> tuple[str, ...]:
        return (tok, *dictionary_decompose(
            tok, self.dictionary, self.min_word_size,
            self.min_subword_size, self.max_subword_size,
            self.only_longest_match, self.reuse_chars))


class HyphenationCompoundAnalyzer(WhitespaceExpandAnalyzer):
    name = "hyph_compound"

    def __init__(self, hyphenator: HyphenationTree, dictionary=None,
                 min_word_size: int = DEFAULT_MIN_WORD_SIZE,
                 min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
                 max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
                 only_longest_match: bool = False,
                 no_sub_matches: bool = False,
                 no_overlapping_matches: bool = False):
        self.hyphenator = hyphenator
        self.dictionary = (None if dictionary is None else
                           frozenset(w.lower() for w in dictionary))
        self.min_word_size = min_word_size
        self.min_subword_size = min_subword_size
        self.max_subword_size = max_subword_size
        self.only_longest_match = only_longest_match
        self.no_sub_matches = no_sub_matches
        self.no_overlapping_matches = no_overlapping_matches

    def expand(self, tok: str) -> tuple[str, ...]:
        return (tok, *hyphenation_decompose(
            tok, self.hyphenator, self.dictionary, self.min_word_size,
            self.min_subword_size, self.max_subword_size,
            self.only_longest_match, self.no_sub_matches,
            self.no_overlapping_matches))
