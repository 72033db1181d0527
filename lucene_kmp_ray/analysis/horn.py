"""Horn-of-Africa analyzers: Amharic and Oromo.

Faithful ports of the reference's horn module:

- ``AmharicAnalyzer`` [ref: analysis/horn/.../am/AmharicAnalyzer.kt]:
  StandardTokenizer -> LowerCase -> DecimalDigitFilter -> Ethiopic
  normalization (AmharicNormalizer.kt char folds) -> stop ->
  AmharicStemmer.kt (fixed LEMMAS map, light prefix/suffix strip with
  plural repair, then the HornMorpho lexicon fallback via the Ge'ez ->
  SERA romanization).
- ``OromoAnalyzer`` [ref: analysis/horn/.../om/OromoAnalyzer.kt]:
  same frame with apostrophe normalization (OromoNormalizer.kt) and
  OromoStemmer.kt (LEMMAS map, lexicon lookup first, light suffix
  strip fallback).
- ``HornLexicons`` [ref: horn/HornLexicons.kt]: lexicon lookup =
  analyses map, then word set, then prefix-strip, then two rounds of
  suffix-strip; SERA simplification (H->h, backtick->', Ke guard).

Lexicon data (474,736 Amharic / 192,720 Oromo entries + 293 Ge'ez-SERA
pairs) is generated from the public HornMorpho-derived files the
reference distributes — see ``scripts/build_horn_assets.py``."""

from __future__ import annotations

import gzip
import json
import os
import unicodedata
from functools import lru_cache

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

# [ref: am/AmharicAnalyzer.kt DEFAULT_STOPWORD_DATA]
AMHARIC_STOP_WORDS = frozenset("""
ነው ናቸው ነበር ነበሩ እና ወይም ግን እንደ ይህ ያ እኔ እኛ አንተ አንቺ እሱ እሷ እነሱ ላይ
ውስጥ ከ ወደ ስለ
""".split())

# [ref: om/OromoAnalyzer.kt DEFAULT_STOPWORD_DATA — compact list]
OROMO_STOP_WORDS = frozenset("""
fi kan kun kana sun sana akka ani ati inni isheen nu isin isaan keessa
irra gara hamma yoo fa
""".split())

# [ref: am/AmharicNormalizer.kt]
_AM_NORM = {}
for group, target in [("ሃሐሓኃ", "ሀ"), ("ሑኁ", "ሁ"), ("ሒኂ", "ሂ"),
                      ("ሔኄ", "ሄ"), ("ሕኅ", "ህ"), ("ሖኆ", "ሆ"),
                      ("ሠ", "ሰ"), ("ሡ", "ሱ"), ("ሢ", "ሲ"), ("ሣ", "ሳ"),
                      ("ሤ", "ሴ"), ("ሥ", "ስ"), ("ሦ", "ሶ"), ("ዐ", "አ"),
                      ("ዑ", "ኡ"), ("ዒ", "ኢ"), ("ዓ", "ኣ"), ("ዔ", "ኤ"),
                      ("ዕ", "እ"), ("ዖ", "ኦ"), ("ጸ", "ፀ"), ("ጹ", "ፁ"),
                      ("ጺ", "ፂ"), ("ጻ", "ፃ"), ("ጼ", "ፄ"), ("ጽ", "ፅ"),
                      ("ጾ", "ፆ")]:
    for ch in group:
        _AM_NORM[ch] = target
_AM_NORM_TABLE = str.maketrans(_AM_NORM)

_AM_LEMMAS = {
    "የማያስፈልጋትስ": "አስፈለገ", "አይደለችም": "ነው", "ይመጣሉ": "መጣ",
    "ቢያስጨንቁአቸው": "አስጨነቀ", "ለዘመዶቻችንም": "ዘመድ",
}
_AM_PREFIXES = ["እንደ", "የማይ", "ያል", "ለ", "በ", "ከ", "የ", "ስ", "እ"]
_AM_SUFFIXES = ["ዎቻችንም", "ዎቻችን", "ዎችንም", "ዎችን", "ዎችም", "ዎች", "ቻችንም",
                "ቻችን", "ችንም", "ችን", "አቸው", "ቸው", "ችሁ", "ችህ", "ችሽ",
                "ችም", "ች", "ንም", "ን", "ም", "ስ"]

_AM_SERA_PREFIXES = ["'nde", "yemay", "yal", "le", "be", "ke", "ye", "s"]
_AM_SERA_SUFFIXES = ["Wocacnm", "Wocacn", "Wocnm", "Wocn", "Wocm", "Woc",
                     "ocacnm", "ocacn", "ocnm", "ocn", "ocm", "oc",
                     "ac_ew", "c_ew", "cnm", "cn", "m", "n", "s"]

_OM_LEMMAS = {
    "afeeramaniiru": "afeeramuu", "dubbanne": "dubbachuu",
    "namoota": "nama", "manaan": "mana",
}
_OM_SUFFIXES = ["oota", "wwan", "leen", "tti", "irra", "iin", "aan",
                "een", "manii", "mani", "ani", "ne", "te", "tu", "ti",
                "ni", "n"]


class _Lexicons:
    def __init__(self):
        with gzip.open(os.path.join(_DATA_DIR, "horn_lexicons.json.gz"),
                       "rt", encoding="utf-8") as f:
            blob = json.load(f)
        self.am_analyses = blob["amharic"]
        self.am_words = set()
        for s, m in self.am_analyses.items():
            self.am_words.add(m)
        self.om_analyses = blob["oromo"]
        self.om_words = set(self.om_analyses.values())
        self.geez = blob["geez_sera"]


@lru_cache(maxsize=1)
def _lex() -> _Lexicons:
    return _Lexicons()


def _simplify_sera(term: str) -> str:
    # [ref: HornLexicons.simplifySera]
    r = term.replace("^", "").replace("H", "h").replace("`", "'")
    r = r.replace("Ke", "!!").replace("K", "h").replace("!!", "Ke")
    return r


def _to_sera(term: str) -> str:
    g = _lex().geez
    return _simplify_sera("".join(g.get(c, c) for c in term))


def _strip_prefix(word: str, prefixes) -> str:
    for p in prefixes:
        if len(word) > len(p) + 2 and word.startswith(p):
            return word[len(p):]
    return word


def _strip_suffix(word: str, suffixes) -> str:
    for s in suffixes:
        if len(word) > len(s) + 2 and word.endswith(s):
            return word[:len(word) - len(s)]
    return word


def _lexicon_lookup(term: str, analyses, words, prefixes, suffixes):
    # [ref: HornLexicons.Lexicon.lookup]
    m = analyses.get(term)
    if m is not None:
        return m
    if term in words:
        return term
    cand = _strip_prefix(term, prefixes)
    m = analyses.get(cand)
    if m is not None:
        return m
    if cand in words:
        return cand
    for _ in range(2):
        cand = _strip_suffix(cand, suffixes)
        m = analyses.get(cand)
        if m is not None:
            return m
        if cand in words:
            return cand
    return None


def amharic_lexicon_stem(term: str) -> str | None:
    # [ref: HornLexicons.amharicStem]
    lx = _lex()
    roman = _to_sera(term) if any(ord(c) > 0x1200 for c in term) \
        else _simplify_sera(term)
    return _lexicon_lookup(roman, lx.am_analyses, lx.am_words,
                           _AM_SERA_PREFIXES, _AM_SERA_SUFFIXES)


def oromo_lexicon_stem(term: str) -> str | None:
    lx = _lex()
    return _lexicon_lookup(term.lower(), lx.om_analyses, lx.om_words,
                           [], OROMO_SUFFIXES_GEN)


# generator-side Oromo suffix list (differs slightly from the stemmer's)
OROMO_SUFFIXES_GEN = ["oota", "wwan", "leen", "oota", "tti", "irra",
                      "iin", "aan", "een", "manii", "mani", "ani", "ne",
                      "te", "tu", "ti", "ni", "n"]


def amharic_stem(word: str) -> str:
    # [ref: am/AmharicStemmer.kt]
    if len(word) <= 1:
        return word
    mapped = _AM_LEMMAS.get(word)
    if mapped is not None:
        return mapped
    light = _am_light(word)
    if light != word:
        return light
    return amharic_lexicon_stem(word) or word


def _am_light(word: str) -> str:
    w = _strip_prefix(word, _AM_PREFIXES)
    w = _strip_suffix(w, _AM_SUFFIXES)
    w = _strip_suffix(w, _AM_SUFFIXES)
    if w.endswith("ፎ") and len(w) > 2:
        w = w[:-1] + "ፍ"
    return w if len(w) >= 2 else word


def oromo_stem(word: str) -> str:
    # [ref: om/OromoStemmer.kt]
    if len(word) <= 2:
        return word
    mapped = _OM_LEMMAS.get(word)
    if mapped is not None:
        return mapped
    hit = oromo_lexicon_stem(word)
    if hit is not None:
        return hit
    return _om_light(word)


def _om_light(word: str) -> str:
    w = _strip_suffix(word, _OM_SUFFIXES)
    w = _strip_suffix(w, _OM_SUFFIXES)
    return w if len(w) >= 3 else word


def _fold_digits(s: str) -> str:
    """DecimalDigitFilter: any Unicode decimal digit -> ASCII 0-9."""
    if s.isascii():
        return s
    out = []
    for c in s:
        d = unicodedata.decimal(c, None)
        out.append(chr(ord("0") + d) if d is not None else c)
    return "".join(out)


class AmharicAnalyzer:
    """Full Amharic chain; callable text -> tokens."""

    name = "amharic"

    def __init__(self, stop_words=AMHARIC_STOP_WORDS):
        self.stop = stop_words
        _lex()  # load once per actor

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        out = []
        for t in tokenize(text):
            t = _fold_digits(t).translate(_AM_NORM_TABLE)
            if t in self.stop:
                continue
            out.append(amharic_stem(t))
        return out

    def analyze_flat(self, texts):
        return _flat(self, texts)


class OromoAnalyzer:
    """Full Oromo chain; callable text -> tokens."""

    name = "oromo"

    def __init__(self, stop_words=OROMO_STOP_WORDS):
        self.stop = stop_words
        _lex()

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        out = []
        for t in tokenize(text):
            t = _fold_digits(t)
            t = "".join("'" if c in "’‘ʼ`´" else c
                        for c in t)
            if t in self.stop:
                continue
            out.append(oromo_stem(t))
        return out

    def analyze_flat(self, texts):
        return _flat(self, texts)


def _flat(analyzer, texts):
    import numpy as np
    import pyarrow as pa

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    doc_lengths = np.empty(len(texts), dtype=np.int64)
    flat: list[str] = []
    doc_of_l: list[int] = []
    pos_l: list[int] = []
    for i, text in enumerate(texts):
        toks = analyzer(text or "")
        flat.extend(toks)
        doc_of_l.extend([i] * len(toks))
        pos_l.extend(range(len(toks)))
        doc_lengths[i] = len(toks)
    return (doc_lengths, pa.array(flat, pa.string()),
            np.array(doc_of_l, dtype=np.int64),
            np.array(pos_l, dtype=np.int64))
