"""Core analyzers: Keyword / Whitespace / UnicodeWhitespace / Simple /
Stop / LimitTokenCount.

Reference (``/root/reference/analysis/common/.../core/``):

- ``KeywordAnalyzer``: the whole input is one token, unchanged.
- ``WhitespaceAnalyzer``: split at ``Character.isWhitespace`` (which
  excludes NBSP/U+2007/U+202F); no case folding.
- ``UnicodeWhitespaceAnalyzer``: split at Unicode-whitespace (Java set
  plus the space separators Java excludes).
- ``SimpleAnalyzer``: maximal letter runs (``Character.isLetter``),
  lowercased.
- ``StopAnalyzer``: SimpleAnalyzer + a stop set (default here: the
  classic English stop set the reference's EnglishAnalyzer exposes as
  ENGLISH_STOP_WORDS_SET).
- ``LimitTokenCountAnalyzer``: wraps any analyzer, keeping only the
  first ``max_token_count`` tokens
  (``miscellaneous/LimitTokenCountAnalyzer.kt``).

CharTokenizer's 255-char max token length is honored: longer runs are
emitted as consecutive 255-char chunks.  All are vectorized for
``analyze_flat`` via one split_pattern_regex per batch.  The letter
class is Python's ``[^\\W\\d_]`` (SQL mirror: RE2 ``\\pL``) — identical
on the BMP letters the corpus and tests use.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Java Character.isWhitespace: Unicode space separators EXCEPT the
# non-breaking ones, plus the control whitespace set.  Built from real
# codepoints (RE2 rejects \\uXXXX escapes; literal chars work in both
# Python re and RE2).
_JAVA_WS = ("\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f "
            + chr(0x1680)
            + chr(0x2000) + "-" + chr(0x2006)
            + chr(0x2008) + "-" + chr(0x200A)
            + chr(0x2028) + chr(0x2029) + chr(0x205F) + chr(0x3000))
# Unicode WHITESPACE property adds the non-breaking separators + NEL.
_UNI_WS = _JAVA_WS + chr(0x85) + chr(0xA0) + chr(0x2007) + chr(0x202F)

ENGLISH_STOP_WORDS_SET = frozenset("""
a an and are as at be but by for if in into is it no not of on or such
that the their then there these they this to was will with
""".split())

MAX_TOKEN_LEN = 255


def _chunk255(tokens: list[str]) -> list[str]:
    if all(len(t) <= MAX_TOKEN_LEN for t in tokens):
        return tokens
    out: list[str] = []
    for t in tokens:
        if len(t) <= MAX_TOKEN_LEN:
            out.append(t)
        else:
            out.extend(t[i:i + MAX_TOKEN_LEN]
                       for i in range(0, len(t), MAX_TOKEN_LEN))
    return out


class _CharRunAnalyzer:
    """Shared shape: split on a delimiter regex, optional lowercase,
    optional stop set, 255-char token cap."""

    delim_re = f"[{_JAVA_WS}]+"
    lowercase = False
    stop_set: frozenset[str] = frozenset()

    def __init__(self):
        self._re = re.compile(self.delim_re)

    def __call__(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
        toks = [t for t in self._re.split(text) if t]
        toks = _chunk255(toks)
        if self.stop_set:
            toks = [t for t in toks if t not in self.stop_set]
        return toks

    def analyze_flat(self, texts):
        arr = pa.array(list(texts), pa.string())
        if self.lowercase:
            arr = pc.utf8_lower(arr)
        lst = pc.split_pattern_regex(arr, pattern=self.delim_re)
        flat = pc.list_flatten(lst)
        sizes = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        sizes = np.nan_to_num(sizes).astype(np.int64)
        doc_of = np.repeat(np.arange(len(arr), dtype=np.int64), sizes)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        doc_of = doc_of[nonempty]
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        if len(lens) and lens.max() > MAX_TOKEN_LEN:
            # rare path: expand over-long runs into 255-char chunks
            toks, docs = [], []
            for t, d in zip(flat.to_pylist(), doc_of):
                for c in _chunk255([t]):
                    toks.append(c)
                    docs.append(d)
            flat = pa.array(toks, pa.string())
            doc_of = np.asarray(docs, dtype=np.int64)
        # token positions BEFORE stop removal (stop gaps preserved)
        counts = np.bincount(doc_of, minlength=len(arr)).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        positions = (np.arange(len(doc_of), dtype=np.int64)
                     - starts[doc_of]).astype(np.int32)
        if self.stop_set:
            stop_arr = pa.array(sorted(self.stop_set), pa.string())
            keep = pc.invert(pc.is_in(flat, value_set=stop_arr)) \
                .to_numpy(zero_copy_only=False)
            flat = flat.filter(pa.array(keep))
            doc_of = doc_of[keep]
            positions = positions[keep]
        lengths = np.bincount(doc_of, minlength=len(arr)).astype(np.int64)
        return lengths, flat, doc_of, positions


class WhitespaceAnalyzer(_CharRunAnalyzer):
    name = "whitespace"


class UnicodeWhitespaceAnalyzer(_CharRunAnalyzer):
    name = "unicode_whitespace"
    delim_re = f"[{_UNI_WS}]+"


class SimpleAnalyzer(_CharRunAnalyzer):
    name = "simple"
    delim_re = r"[\W\d_]+"
    lowercase = True


class StopAnalyzer(SimpleAnalyzer):
    name = "stop"
    stop_set = ENGLISH_STOP_WORDS_SET

    def __init__(self, stop_words=None):
        super().__init__()
        if stop_words is not None:
            self.stop_set = frozenset(stop_words)


class KeywordAnalyzer:
    """The entire input as one token (unchanged, any length)."""

    name = "keyword"

    def __call__(self, text: str) -> list[str]:
        return [text] if text else []

    def analyze_flat(self, texts):
        arr = pa.array(list(texts), pa.string())
        keep = pc.not_equal(arr, "").to_numpy(zero_copy_only=False)
        flat = arr.filter(pa.array(keep))
        doc_of = np.nonzero(keep)[0].astype(np.int64)
        lengths = keep.astype(np.int64)
        positions = np.zeros(len(doc_of), dtype=np.int32)
        return lengths, flat, doc_of, positions


class LimitTokenCountAnalyzer:
    """Keep only the first ``max_token_count`` tokens of the delegate
    (``miscellaneous/LimitTokenCountAnalyzer.kt``)."""

    def __init__(self, delegate, max_token_count: int):
        self.delegate = delegate
        self.max_token_count = int(max_token_count)
        self.name = f"limit{self.max_token_count}_" + \
            getattr(delegate, "name", "analyzer")

    def __call__(self, text: str) -> list[str]:
        return self.delegate(text)[:self.max_token_count]

    def analyze_flat(self, texts):
        lengths, flat, doc_of, positions = self.delegate.analyze_flat(texts)
        keep = positions < self.max_token_count
        if keep.all():
            return lengths, flat, doc_of, positions
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
        positions = positions[keep]
        lengths = np.bincount(
            doc_of, minlength=len(lengths)).astype(np.int64)
        return lengths, flat, doc_of, positions
