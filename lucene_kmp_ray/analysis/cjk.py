"""CJK bigram analysis — the reference's CJKAnalyzer
(``/root/reference/analysis/common/.../cjk/CJKAnalyzer.kt``):
StandardTokenizer → CJKWidthFilter → LowerCase → CJKBigramFilter →
StopFilter(classic CJK list).

CJKBigramFilter semantics (``cjk/CJKBigramFilter.kt:100-160``): characters
of the enabled scripts (Han, Hiragana, Katakana, Hangul) that are ADJACENT
in the original text (offset-aligned — "一 二" with a space does NOT
bigram) form overlapping character bigrams; an isolated single CJK char
emits as a unigram; non-CJK tokens pass through untouched. The width
filter folds fullwidth ASCII forms to halfwidth and composes halfwidth
katakana + voice marks (NFKC restricted to the width-variant blocks).

Conformance vectors asserted in tests/test_german_analyzer.py.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa

from .standard import (CJK_HANGUL_RANGES, CJK_KATAKANA_RANGES,
                       CJK_SINGLE_RANGES, CJK_SINGLE_ASTRAL, _ranges_re,
                       tokenize)

# classic CJK stoplist (CJKAnalyzer.kt DEFAULT_STOPWORD_DATA: common
# English words + artifacts)
CJK_STOP_WORDS = frozenset(
    "a and are as at be but by for if in into is it no not of on or s "
    "such t that the their then there these they this to was will with "
    "www".split())

# one maximal run of adjacent CJK chars (any of the four scripts —
# adjacency across scripts bigrams too, e.g. Han directly followed by
# Hiragana, matching the offset-aligned buffering of the filter)
_CJK_RUN_RE = re.compile(
    f"[{_ranges_re(CJK_SINGLE_RANGES + CJK_KATAKANA_RANGES + CJK_HANGUL_RANGES, CJK_SINGLE_ASTRAL)}]+")

_WIDTH_RE = re.compile("[＀-￯]")


def cjk_width_fold(text: str) -> str:
    """CJKWidthFilter analog: NFKC restricted to the halfwidth/fullwidth
    forms block (fullwidth ASCII → halfwidth, halfwidth katakana →
    fullwidth, dakuten composition)."""
    if not _WIDTH_RE.search(text):
        return text
    # normalize run-wise so surrounding text is untouched; include a
    # following voice mark so ﾊ + ﾞ compose
    return re.sub("[＀-￯]+",
                  lambda m: unicodedata.normalize("NFKC", m.group(0)),
                  text)


class CJKAnalyzer:
    """Pluggable analyzer slot instance: CJK runs → overlapping bigrams
    (unigram when isolated), non-CJK → standard word tokens, stop filter
    last (as the reference chain orders it)."""

    name = "cjk"

    def __init__(self, stop_words=CJK_STOP_WORDS):
        self.stop_set = frozenset(stop_words)

    def __call__(self, text: str) -> list[str]:
        text = cjk_width_fold(text or "")
        out: list[str] = []
        last = 0
        for m in _CJK_RUN_RE.finditer(text):
            if m.start() > last:
                out.extend(tokenize(text[last:m.start()]))
            run = m.group(0)
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i:i + 2] for i in range(len(run) - 1))
            last = m.end()
        if last < len(text):
            out.extend(tokenize(text[last:]))
        return [t for t in out if t not in self.stop_set]

    def analyze_flat(self, texts):
        """Batch interface for the inverter. Bigram emission is per-doc
        (the run scanner is a compiled regex; the per-token work is tiny
        slicing), positions sequential as CJKBigramFilter emits them."""
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        for i, t in enumerate(texts):
            toks = self(t or "")
            doc_lengths[i] = len(toks)
            flat.extend(toks)
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64),
                           doc_lengths)
        starts = np.append(0, np.cumsum(doc_lengths))[:-1]
        positions = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(starts, doc_lengths)
        return doc_lengths, pa.array(flat, pa.string()), doc_of, positions
