"""Khmer analysis chain — grapheme-cluster tokenizer + reordering.

Reference chain (``/root/reference/analysis/extra/.../km/``), default
configuration (normalization level 1, stop words and number folding
OFF): KhmerNormalizationCharFilter (a MappingCharFilter over the RAW
text — longest-match, single pass) → GraphemeClusterTokenizer →
CharReorderFilter.

- The char filter's level-1 map composes split vowels (េ+ី → ើ,
  េ+ា → ោ), drops the discouraged invisible vowels ឴/឵, fixes a
  doubled coeng-ro, and rewrites deprecated code points;
- the tokenizer is a 4-state scanner over char categories BASE
  (ក-ឳ), COENG (្), INSIDE (dependent vowels/signs + ZWJ/ZWNJ),
  DIGIT (៰-៹ and ASCII), everything else IGNORE: digit runs, leading
  inside/coeng runs, and syllables ``B (I | C+ (B|I))* C*``;
- the reorder filter (tokens of 2..30 chars starting with a BASE)
  STABLY sorts the cluster's chars by category (base < robat < coeng
  < zwj < shift < vowel < sign-ms < sign-mf; a base after a coeng
  inherits COENG), then applies the published rewrite chain (split
  vowel composition, ុ-before-above-vowel reorder, triisap/muusikatoan
  upshifts, coeng-ro-last, coeng Da → Ta, and a short list of word
  corrections).

SQL mirror: ``oracle.khmer_preamble`` — replace-chain char filter,
GENERATED RE2 token pattern, and the reorder as a per-token
list_sort-by-(category, index) plus the same regex chain.  Vectors
from TestKhmerAnalyzer.kt live in tests/test_khmer_analyzer.py.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# level-1 normalization map (NormalizeCharMap semantics: longest match
# at each position, single pass, no rescan)
KM_CHARFILTER_RULES = [
    ("\u17c1\u17b8", "\u17be"),
    ("\u17c1\u17b6", "\u17c4"),
    ("\u17d2\u179a\u17d2", "\u17d2\u179a"),
    ("\u17b4", ""),
    ("\u17b5", ""),
    ("\u17e2\u17d3", "\u19e0"),
    ("\u17a3", "\u17a2"),
    ("\u17a4", "\u17a2\u17b6"),
    ("\u17a8", "\u17a7\u1780"),
    ("\u17d8", "\u17d4\u179b\u17d4"),
]
_KM_CF_BY_FIRST: dict[str, list[tuple[str, str]]] = {}
for _pat, _rep in sorted(KM_CHARFILTER_RULES,
                         key=lambda r: -len(r[0])):
    _KM_CF_BY_FIRST.setdefault(_pat[0], []).append((_pat, _rep))


def khmer_charfilter(text: str) -> str:
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        rules = _KM_CF_BY_FIRST.get(text[i])
        if rules:
            for pat, rep in rules:       # longest first
                if text.startswith(pat, i):
                    out.append(rep)
                    i += len(pat)
                    break
            else:
                out.append(text[i])
                i += 1
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


# tokenizer categories
def _km_cat(c: str) -> int:
    o = ord(c)
    if 0x17E0 <= o <= 0x17F9 or 0x30 <= o <= 0x39:
        return 4    # DIGIT
    if 0x1780 <= o <= 0x17B3:
        return 1    # BASE
    if o == 0x17D2:
        return 3    # COENG
    if 0x17B6 <= o <= 0x17D3 or o == 0x17DD or o in (0x200C, 0x200D):
        return 2    # INSIDE
    return 5        # IGNORE


def khmer_tokenize(text: str) -> list[str]:
    """GraphemeClusterTokenizer state machine (INIT / INSIDESYL /
    AFTERCOENG / AFTERDIGIT)."""
    out: list[str] = []
    cur: list[str] = []
    state = 0  # 0 INIT, 1 INSIDESYL, 2 AFTERCOENG, 3 AFTERDIGIT
    for c in text:
        cat = _km_cat(c)
        if cat == 5:
            if cur:
                out.append("".join(cur))
                cur = []
            state = 0
            continue
        brk = False
        if state == 0:
            if cat == 1:
                brk, state = True, 1
            elif cat == 4:
                brk, state = True, 3
        elif state == 1:
            if cat == 3:
                state = 2
            elif cat != 2:
                brk = True
        elif state == 2:
            if cat == 4:
                brk = True
            elif cat != 3:
                state = 1
        else:
            if cat != 4:
                brk = True
        if brk and cur:
            out.append("".join(cur))
            cur = []
            state = {1: 1, 4: 3}.get(cat, 0)
        elif not cur:
            state = {1: 1, 4: 3}.get(cat, state)
        cur.append(c)
    if cur:
        out.append("".join(cur))
    return out


# reorder categories (CharReorderFilter)
def _km_reorder_cat(c: str) -> int:
    o = ord(c)
    if 0x1780 <= o <= 0x17B3:
        return 1                         # BASE
    if 0x17B4 <= o <= 0x17C5:
        return 6                         # VOWEL
    if o == 0x17C6 or o == 0x17CB or 0x17CD <= o <= 0x17D1 \
            or o == 0x17D3 or o == 0x17DD:
        return 7                         # MS
    if o in (0x17C7, 0x17C8):
        return 8                         # MF
    if o in (0x17C9, 0x17CA):
        return 5                         # SHIFT
    if o == 0x17CC:
        return 2                         # ROBAT
    if o == 0x17D2:
        return 3                         # COENG
    if 0x17D4 <= o <= 0x17DC:
        return 0                         # OTHER
    if o in (0x200C, 0x200D):
        return 4                         # Z
    return 0


_BNB = "[\u1780-\u1793\u1795-\u17a2]"
_SF = "[\u179e-\u17a0\u17a2]"
_SNF = "[\u1780-\u179d\u17a1]"
_SS = "[\u1784\u1789\u1793\u1794\u1798-\u179d]"
_VA = "[\u17b7-\u17ba\u17be\u17d0\u17dd]|\u17b6\u17c6"
_TRIISAP_RE = re.compile(
    f"({_SF}(?:\u17d2{_BNB}){{0,2}}|{_BNB}(?:\u17d2{_SF}"
    f"(?:\u17d2{_BNB})?|\u17d2{_BNB}\u17d2{_SF}))\u17bb({_VA})")
_MUUSIK_RE = re.compile(
    f"({_SS}(?:\u17d2{_SNF}){{0,2}}|{_SNF}(?:\u17d2{_SS}"
    f"(?:\u17d2{_SNF})?|\u17d2{_SNF}\u17d2{_SS}))\u17bb({_VA})")

KM_CORRECTIONS = [
    ("ប្តី", "ប្ដី"),
    ("ផម្តើ", "ផ្ដើម"),
    ("ផ្តើម", "ផ្ដើម"),
    ("ផ្តល់", "ផ្ដល់"),
    ("ម្តង", "ម្ដង"),
    ("កណល្តា", "កណ្ដាល"),
    ("កណ្តាល", "កណ្ដាល"),
]


def khmer_reorder(tok: str) -> str:
    n = len(tok)
    if n < 2 or n > 30:
        return tok
    if _km_reorder_cat(tok[0]) != 1:
        return tok
    cats = []
    for i, c in enumerate(tok):
        cat = _km_reorder_cat(c)
        if i > 0 and cat == 1 and cats[i - 1] == 3:
            cat = 3
        cats.append(cat)
    order = sorted(range(n), key=lambda i: cats[i])   # stable
    res = "".join(tok[i] for i in order)
    res = re.sub("([\u200c\u200d])[\u200c\u200d]+", r"\1", res)
    res = re.sub("\u17d2\u17d2+", "\u17d2", res)
    res = re.sub("\u17c1(\u17bb?)\u17b8", "\\g<1>\u17be", res)
    res = re.sub("\u17c1(\u17bb?)\u17b6", "\\g<1>\u17c4", res)
    res = re.sub("\u17b8(\u17bb?)\u17c1", "\\g<1>\u17be", res)
    res = re.sub("\u17b6(\u17bb?)\u17c1", "\\g<1>\u17c4", res)
    res = re.sub(f"({_VA})(\u17bb)", r"\2\1", res)
    res = _TRIISAP_RE.sub("\\g<1>\u17ca\\g<2>", res)
    res = _MUUSIK_RE.sub("\\g<1>\u17c9\\g<2>", res)
    res = re.sub("(\u17d2\u179a)(\u17d2[\u1780-\u17b3])",
                 r"\2\1", res)
    res = re.sub("(\u17d2)\u178a", "\\g<1>\u178f", res)
    for bad, good in KM_CORRECTIONS:
        res = res.replace(bad, good)
    return res


class KhmerAnalyzer:
    """char filter → grapheme tokenizer → reorder (default config:
    no stop words, no number folding)."""

    name = "khmer"

    def __call__(self, text: str) -> list[str]:
        return [khmer_reorder(t)
                for t in khmer_tokenize(khmer_charfilter(text))]

    def analyze_flat(self, texts):
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        doc_of_l: list[int] = []
        pos_l: list[int] = []
        for i, text in enumerate(texts):
            toks = self(text or "")
            flat.extend(toks)
            doc_of_l.extend([i] * len(toks))
            pos_l.extend(range(len(toks)))
            doc_lengths[i] = len(toks)
        return (doc_lengths, pa.array(flat, pa.string()),
                np.array(doc_of_l, dtype=np.int64),
                np.array(pos_l, dtype=np.int64))
