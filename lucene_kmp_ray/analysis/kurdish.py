"""Sorani Kurdish analysis chain.

Reference chain (``/root/reference/analysis/common/.../ckb/SoraniAnalyzer.kt``):
StandardTokenizer → SoraniNormalizationFilter → LowerCase →
DecimalDigit → Stop → SoraniStemFilter.

The normalizer (``ckb/SoraniNormalizer.kt``) is a single left-to-right
scan with in-place deletes; this port replicates the scan exactly:

- y variants (064A, 0649) → FARSI YEH (06CC); KAF (0643) → KEHEH (06A9)
- ZWNJ: if the previous *surviving* char is HEH (0647), it becomes AE
  (06D5); the ZWNJ is deleted
- an *original-final* HEH → AE (the check runs when the scan visits the
  char, so only chars with nothing after them qualify — a HEH produced
  from HEH DOACHASHMEE (06BE) is visited before conversion and stays HEH)
- TEH MARBUTA (0629) → AE; HEH DOACHASHMEE → HEH
- word-initial REH (0631, after any leading deletions) → RREH (0695);
  RREH-with-ring-above (0692) → RREH
- tatweel, harakat (064B-0652) and Unicode Cf (format) chars deleted

The stemmer (``ckb/SoraniStemmer.kt``) strips a postposition, then a
possessive pronoun, then the FIRST matching inflection suffix
(singular/plural/demonstrative/ezafe cascade with early returns).

Lowercase runs after normalization in the reference; neither transform
produces or consumes chars the other touches, so tokenize()'s built-in
lowercasing commutes with the normalizer (documented deviation-free).

SQL mirror: ``oracle.bm25_sorani_topk`` — the staged regexp/translate
expressions are GENERATED from the same tables, with the
original-final-HEH rule applied BEFORE deletions to keep the scan-order
semantics.  Conformance vectors from TestSoraniNormalizationFilter.kt /
TestSoraniStemFilter.kt live in tests/test_sorani_analyzer.py.
"""

from __future__ import annotations

import sys
import unicodedata

from .arabic import fold_digits
from .romance import _RomanceAnalyzer

# normalized forms (the reference list ships pre-normalized)
SORANI_STOP_WORDS = frozenset("""
و کە ی کرد ئەوەی سەر دوو هەروەها لەو دەکات چەند هەر ئەو ئەم من ئێمە تۆ
ئێوە ئەوان بە پێ بەبێ بەدەم بەلای بەپێی بەرلە بەرەوی بەرەوە بەردەم بێ
بێجگە بۆ دە تێ دەگەڵ دوای جگە لە لێ لەبەر لەبەینی لەبابەت لەبارەی
لەباتی لەبن لەبرێتی لەدەم لەگەڵ لەلایەن لەناو لەنێو لەپێناوی لەرەوی
لەرێ لەرێگا لەسەر لەژێر ناو نێوان پاش پێش وەک
""".split())

_YEH, _DOTLESS_YEH, _FARSI_YEH = "ي", "ى", "ی"
_KAF, _KEHEH = "ك", "ک"
_HEH, _AE, _ZWNJ = "ه", "ە", "‌"
_HEH_DOACHASHMEE, _TEH_MARBUTA = "ھ", "ة"
_REH, _RREH, _RREH_ABOVE = "ر", "ڕ", "ڒ"
_TATWEEL = "ـ"
_HARAKAT = "".join(chr(c) for c in range(0x064B, 0x0653))  # 064B-0652

SORANI_DELETE = _TATWEEL + _HARAKAT

# all Unicode Cf chars (Character.getType == FORMAT), from unicodedata
SORANI_CF = frozenset(
    chr(c) for c in range(sys.maxunicode + 1)
    if unicodedata.category(chr(c)) == "Cf")

_SIMPLE_MAP = {_YEH: _FARSI_YEH, _DOTLESS_YEH: _FARSI_YEH,
               _KAF: _KEHEH, _TEH_MARBUTA: _AE,
               _HEH_DOACHASHMEE: _HEH, _RREH_ABOVE: _RREH}
_DELETE_SET = frozenset(SORANI_DELETE)


def sorani_normalize(s: str) -> str:
    """Exact port of the SoraniNormalizer left-to-right scan."""
    out: list[str] = []
    n = len(s)
    for i, c in enumerate(s):
        if c in _SIMPLE_MAP:
            out.append(_SIMPLE_MAP[c])
        elif c == _ZWNJ:
            if out and out[-1] == _HEH:
                out[-1] = _AE
        elif c == _HEH:
            out.append(_AE if i == n - 1 else _HEH)
        elif c == _REH:
            out.append(_RREH if not out else _REH)
        elif c in _DELETE_SET or c in SORANI_CF:
            pass
        else:
            out.append(c)
    return "".join(out)


# (suffix, min_len_exclusive) — the three cumulative groups, then the
# first-match cascade (reference if/else-if order)
CKB_POSTPOSITION = [("دا", 5, 2), ("نا", 4, 1),
                    ("ەوە", 6, 3)]
CKB_POSSESSIVE = [("مان", 6, 3),
                  ("یان", 6, 3),
                  ("تان", 6, 3)]
CKB_CASCADE = [
    ("ێکی", 6, 3),          # indefinite singular ezafe
    ("یەکی", 7, 4),
    ("ێک", 5, 2),                # indefinite singular
    ("یەک", 6, 3),
    ("ەکە", 6, 3),          # definite singular
    ("کە", 5, 2),
    ("ەکان", 7, 4),    # definite plural
    ("کان", 6, 3),
    ("یانی", 7, 4),    # indefinite plural ezafe
    ("انی", 6, 3),
    ("یان", 6, 3),          # indefinite plural
    ("ان", 5, 2),
    ("یانە", 7, 4),    # demonstrative plural
    ("انە", 6, 3),
    ("ایە", 5, 2),          # demonstrative singular (-2!)
    ("ەیە", 5, 2),
    ("ە", 4, 1),
    ("ی", 4, 1),                      # absolute singular ezafe
]


def sorani_stem(s: str) -> str:
    for sfx, min_len, drop in CKB_POSTPOSITION:
        if len(s) > min_len and s.endswith(sfx):
            s = s[:len(s) - drop]
            break
    for sfx, min_len, drop in CKB_POSSESSIVE:
        if len(s) > min_len and s.endswith(sfx):
            s = s[:len(s) - drop]
            break
    for sfx, min_len, drop in CKB_CASCADE:
        if len(s) > min_len and s.endswith(sfx):
            return s[:len(s) - drop]
    return s


def _ckb_pre(tok: str) -> str:
    return fold_digits(sorani_normalize(tok))


class SoraniAnalyzer(_RomanceAnalyzer):
    """normalize → (lowercase) → digit fold → stop → stem."""
    name = "sorani"
    stop_words = SORANI_STOP_WORDS
    elide = staticmethod(_ckb_pre)

    def _stem(self, tok: str) -> str:
        return sorani_stem(tok)
