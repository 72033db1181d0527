"""Burmese analysis chain — custom syllable tokenizer.

Reference chain (``/root/reference/analysis/extra/.../my/``):
BurmeseTokenizer → DecimalDigit → BurmeseNormalization → Stop →
BurmeseStemFilter.  This analyzer REPLACES the standard tokenizer:

- Myanmar-digit runs tokenize whole;
- other Myanmar runs split by longest-match PARTICLES (grammatical
  clitics like များ/သည်/ကို) else into SYLLABLES — a syllable breaks
  before a base letter unless the previous char is the VIRAMA (U+1039)
  or the next char is the ASAT (U+103A);
- any other letter/digit run (Java isLetterOrDigit = L* + Nd)
  tokenizes whole and LOWERCASES — a Myanmar char directly following a
  Latin run is absorbed into it (reference quirk, kept);
- the normalizer drops ZWSP/ZWNJ/ZWJ/BOM, folds Myanmar digits to
  ASCII, deletes the section marks ၊ ။, and folds quote/dash variants;
- the stemmer strips one particle-like suffix (stem > len+1).

SQL mirror: ``oracle.burmese_preamble`` tokenizes with a GENERATED
RE2 pattern (particles longest-first, syllable continuation encoded as
ordered alternation ``V B | B A | non-base``).  Vectors from
TestBurmeseAnalyzer.kt live in tests/test_burmese_analyzer.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BURMESE_STOP_WORDS = frozenset("""
က ကို မှာ တွင် မှ နဲ့ နှင့် ၏ သည် တဲ့ သော တွေ များ တို့ အတွက်
ကြောင့် ကတည်းက ပါ မ လည်း ပဲ သာ တော့ သူ သူတို့ ငါ ကျွန်တော် ကျွန်မ ဒီ
ဒါ ဟို အဲဒီ ရှိ ဖြစ် မဟုတ် ပြီး ပြီးတော့
""".split())

BURMESE_PARTICLES = ['ကြောင့်', 'ကတည်းက', 'အတွက်', 'နှင့်', 'တွင်', 'များ', 'တို့', 'လည်း', 'တော့', 'တွေ', 'သည်', 'တဲ့', 'သော', 'နဲ့', 'မှာ', 'ကို', 'မှ', 'ပါ', 'ပဲ', 'သာ', 'က', '၏']

BURMESE_SUFFIXES = ['ကြောင့်', 'ကတည်းက', 'အတွက်', 'နှင့်', 'များ', 'တို့', 'တွင်', 'တွေ', 'သည်', 'သော', 'တဲ့', 'နဲ့', 'မှာ', 'ကို', 'မှ', 'ပါ', 'က', '၏']

_ASAT = "\u103a"
_VIRAMA = "\u1039"

_MY_RANGES = ((0x1000, 0x109F), (0xAA60, 0xAA7F), (0xA9E0, 0xA9FF))
_MY_DIGITS = ((0x1040, 0x1049), (0x1090, 0x1099), (0xA9F0, 0xA9F9))
_MY_BASE = ((0x1000, 0x102A), (0x103F, 0x103F), (0x1050, 0x1055),
            (0x105A, 0x105D), (0x1061, 0x1061), (0x1065, 0x1066),
            (0x106E, 0x1070), (0x1075, 0x1081), (0x108E, 0x108E),
            (0xAA60, 0xAA6F), (0xA9E0, 0xA9E4))


def _in(ch: str, ranges) -> bool:
    o = ord(ch)
    return any(a <= o <= b for a, b in ranges)


def _is_my(ch):
    return _in(ch, _MY_RANGES)


def _is_my_digit(ch):
    return _in(ch, _MY_DIGITS)


def _is_base(ch):
    return _in(ch, _MY_BASE)


def _is_alnum(ch: str) -> bool:
    import unicodedata
    cat = unicodedata.category(ch)
    return cat.startswith("L") or cat == "Nd"


def burmese_tokenize(text: str) -> list[str]:
    """BurmeseTokenizer.tokenize — the exact scanner."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if _is_my_digit(ch):
            j = i + 1
            while j < n and _is_my_digit(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
        elif _is_my(ch):
            j = i + 1
            while j < n and _is_my(text[j]):
                j += 1
            k = i
            while k < j:
                for p in BURMESE_PARTICLES:
                    if k + len(p) <= j and text.startswith(p, k):
                        out.append(p)
                        k += len(p)
                        break
                else:
                    e = k + 1
                    while e < j:
                        c = text[e]
                        if _is_base(c) and text[e - 1] != _VIRAMA \
                                and not (e + 1 < n and
                                         text[e + 1] == _ASAT):
                            break
                        e += 1
                    out.append(text[k:e])
                    k = e
            i = j
        elif _is_alnum(ch):
            j = i + 1
            while j < n and _is_alnum(text[j]):
                j += 1
            out.append(text[i:j].lower())
            i = j
        else:
            i += 1
    return out


_MY_DIGIT_FOLD = {chr(0x1040 + k): str(k) for k in range(10)}
_NORM_MAP = dict(_MY_DIGIT_FOLD)
for _c in "’‘‛ʹʼ`´":
    _NORM_MAP[_c] = "'"
for _c in "‐‑‒–—―":
    _NORM_MAP[_c] = "-"
for _c in "\u200b\u200c\u200d\ufeff၊။":
    _NORM_MAP[_c] = None
_NORM_TRANS = str.maketrans(_NORM_MAP)


def burmese_normalize(tok: str) -> str:
    return tok.translate(_NORM_TRANS)


def burmese_stem(w: str) -> str:
    if len(w) <= 1:
        return w
    for sfx in BURMESE_SUFFIXES:
        if len(w) > len(sfx) + 1 and w.endswith(sfx):
            return w[:len(w) - len(sfx)]
    return w


class BurmeseAnalyzer:
    """custom tokenizer → normalize → stop → stem"""

    name = "burmese"

    def __init__(self):
        self.stop_set = frozenset(BURMESE_STOP_WORDS)
        self.stop = sorted(self.stop_set)

    def __call__(self, text: str) -> list[str]:
        out = []
        for tok in burmese_tokenize(text):
            t = burmese_normalize(tok)
            if t and t not in self.stop_set:
                out.append(burmese_stem(t))
        return out

    def analyze_flat(self, texts):
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        doc_of_l: list[int] = []
        pos_l: list[int] = []
        for i, text in enumerate(texts):
            toks = burmese_tokenize(text or "")
            kept = 0
            for p, tok in enumerate(toks):
                t = burmese_normalize(tok)
                if t and t not in self.stop_set:
                    flat.append(burmese_stem(t))
                    doc_of_l.append(i)
                    pos_l.append(p)
                    kept += 1
            doc_lengths[i] = kept
        return (doc_lengths, pa.array(flat, pa.string()),
                np.array(doc_of_l, dtype=np.int64),
                np.array(pos_l, dtype=np.int64))
