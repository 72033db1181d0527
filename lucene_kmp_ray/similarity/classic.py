"""Classic (TF-IDF) and Boolean similarities — the Similarity extension
surface beyond the pinned BM25 (SURVEY §2.4; reference has 47 similarity
files, these are the two with distinct scoring models that need no extra
index data).

ClassicSimilarity (``search/similarities/ClassicSimilarity.kt`` over the
``TFIDFSimilarity.kt`` scorer):

- ``idf = float(ln((docCount+1)/(docFreq+1)) + 1)`` (ClassicSimilarity.kt
  idf); multi-term idf sums the per-term float values in double
  (TFIDFSimilarity.kt:382-391).
- ``queryWeight = boost * idf`` (TFIDFScorer:450).
- ``normTable[i] = float(1/sqrt(LENGTH_TABLE[i]))`` for i in 1..255;
  ``normTable[0] = 1/normTable[255]`` (TFIDFSimilarity.kt:429-434).
- ``score(freq, norm) = tf(freq) * queryWeight * normTable[norm]`` with
  ``tf = float(sqrt(freq))`` — the exact op order of TFIDFScorer:452-455.

BooleanSimilarity (``BooleanSimilarity.kt``): every hit scores the boost.

Both conform to the Searcher's similarity slot: ``scorer(boost, doc_count,
sum_total_term_freq, doc_freqs)`` → object with ``score(freqs, norm_bytes)``
and ``max_score`` (for block-max bounds). ``dtype='float64'`` applies the
same formulas in IEEE double so a DuckDB oracle mirrors scores bit-exactly.
"""

from __future__ import annotations

import math

import numpy as np

from ..util.smallfloat import LENGTH_TABLE_INT


class ClassicSimilarity:
    def __init__(self, dtype: str = "float32"):
        self.dtype = np.dtype(dtype)

    def idf(self, doc_freq: int, doc_count: int) -> float:
        v = math.log((doc_count + 1) / (doc_freq + 1)) + 1.0
        if self.dtype == np.float32:
            return float(np.float32(v))
        return v

    def idf_sum(self, doc_freqs: list[int], doc_count: int) -> float:
        total = 0.0
        for df in doc_freqs:
            total += self.idf(df, doc_count)
        if self.dtype == np.float32:
            return float(np.float32(total))
        return total

    def scorer(self, boost: float, doc_count: int, sum_total_term_freq: int,
               doc_freqs: list[int],
               total_term_freqs=None) -> "ClassicScorer":
        idf = self.idf_sum(doc_freqs, doc_count) if len(doc_freqs) != 1 \
            else self.idf(doc_freqs[0], doc_count)
        return ClassicScorer(self, boost, idf)


class ClassicScorer:
    def __init__(self, sim: ClassicSimilarity, boost: float, idf: float):
        dt = sim.dtype
        lengths = LENGTH_TABLE_INT.astype(np.float64)
        table = np.empty(256, dtype=dt)
        with np.errstate(divide="ignore"):
            table[1:] = (1.0 / np.sqrt(lengths[1:])).astype(dt)
        table[0] = dt.type(1) / table[255]
        self.norm_table = table
        self.weight = dt.type(dt.type(boost) * dt.type(idf))
        self.idf = idf
        self.dtype = dt

    def score(self, freq: np.ndarray, norm_byte: np.ndarray) -> np.ndarray:
        dt = self.dtype
        tf = np.sqrt(np.asarray(freq).astype(np.float64)).astype(dt)
        raw = tf * self.weight
        return raw * self.norm_table[np.asarray(norm_byte).astype(np.uint8)]

    def max_score(self, max_freq: int, min_norm_byte: int) -> float:
        return float(self.score(np.array([max_freq]),
                                np.array([min_norm_byte], np.uint8))[0])


class BooleanSimilarity:
    """Every matching doc scores the query boost (BooleanSimilarity.kt)."""

    def __init__(self, dtype: str = "float32"):
        self.dtype = np.dtype(dtype)

    def idf(self, doc_freq: int, doc_count: int) -> float:
        return 1.0

    def idf_sum(self, doc_freqs, doc_count) -> float:
        return 1.0

    def scorer(self, boost: float, doc_count: int, sum_total_term_freq: int,
               doc_freqs: list[int],
               total_term_freqs=None) -> "BooleanScorer_":
        return BooleanScorer_(self, boost)


class BooleanScorer_:
    def __init__(self, sim: BooleanSimilarity, boost: float):
        self.dtype = sim.dtype
        self.boost = self.dtype.type(boost)

    def score(self, freq: np.ndarray, norm_byte: np.ndarray) -> np.ndarray:
        return np.full(len(np.asarray(freq)), self.boost, dtype=self.dtype)

    def max_score(self, max_freq: int, min_norm_byte: int) -> float:
        return float(self.boost)


class RawTFSimilarity:
    """Raw term-frequency similarity (``search/similarities/
    RawTFSimilarity.kt``): ``score(freq, norm) = boost * freq`` — the
    norm is ignored entirely. Used by the reference as the simplest
    SimScorer (e.g. feature-style fields where freq IS the payload)."""

    def __init__(self, dtype: str = "float32"):
        self.dtype = np.dtype(dtype)

    def idf(self, doc_freq: int, doc_count: int) -> float:
        return 1.0

    def idf_sum(self, doc_freqs, doc_count) -> float:
        return 1.0

    def scorer(self, boost: float, doc_count: int, sum_total_term_freq: int,
               doc_freqs: list[int],
               total_term_freqs=None) -> "RawTFScorer":
        return RawTFScorer(self, boost)


class RawTFScorer:
    def __init__(self, sim: RawTFSimilarity, boost: float):
        self.dtype = sim.dtype
        self.boost = self.dtype.type(boost)

    def score(self, freq: np.ndarray, norm_byte: np.ndarray) -> np.ndarray:
        return (self.boost *
                np.asarray(freq).astype(self.dtype))

    def max_score(self, max_freq: int, min_norm_byte: int) -> float:
        return float(self.boost * self.dtype.type(max_freq))
