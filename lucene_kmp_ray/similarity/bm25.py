"""BM25 similarity — numerically identical to the reference.

Re-implements ``/root/reference/core/.../search/similarities/BM25Similarity.kt``:

- ``idf = ln(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5))`` (double → float,
  BM25Similarity.kt:48-50); multi-term idf is summed as double over the
  per-term float values, then cast to float (kt:138-146).
- ``avgdl = sumTotalTermFreq / docCount`` (double → float, kt:53-55).
- 256-entry cache ``cache[i] = 1f/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl))``
  (kt:161-164) with ``LENGTH_TABLE[i] = byte4ToInt(i)`` (kt:252-260).
- per-hit ``score = weight - weight/(1 + freq*cache[norm & 0xFF])`` with
  ``weight = boost * idf`` — the monotonicity-preserving float32 rewrite of
  ``freq/(freq+K)`` (kt:185-198). We reproduce it with numpy float32 ops in
  the same order.

``dtype='float32'`` is the Lucene-exact mode. ``dtype='float64'`` applies the
identical formulas in IEEE double throughout (no 256-entry float32 cache
quantization of the *arithmetic*, but the norm byte is still the lossy
SmallFloat byte) so a DuckDB SQL oracle can reproduce scores bit-exactly.
"""

from __future__ import annotations

import math

import numpy as np

from ..util.smallfloat import LENGTH_TABLE, LENGTH_TABLE_INT

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


class BM25Similarity:
    """Stateless scorer factory; one instance per (k1, b, dtype)."""

    def __init__(self, k1: float = K1_DEFAULT, b: float = B_DEFAULT,
                 dtype: str = "float32"):
        if not math.isfinite(k1) or k1 < 0:
            raise ValueError(f"illegal k1 value: {k1}, must be a non-negative finite value")
        if math.isnan(b) or b < 0 or b > 1:
            raise ValueError(f"illegal b value: {b}, must be between 0 and 1")
        self.k1 = k1
        self.b = b
        self.dtype = np.dtype(dtype)

    # BM25Similarity.kt:48-50 — computed in double, returned as float32 in f32 mode
    def idf(self, doc_freq: int, doc_count: int) -> float:
        v = math.log(1 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
        if self.dtype == np.float32:
            return float(np.float32(v))
        return v

    def idf_sum(self, doc_freqs: list[int], doc_count: int) -> float:
        """Multi-term idf: sum per-term float values in double (kt:138-146)."""
        total = 0.0
        for df in doc_freqs:
            total += self.idf(df, doc_count)
        if self.dtype == np.float32:
            return float(np.float32(total))
        return total

    def avgdl(self, sum_total_term_freq: int, doc_count: int) -> float:
        v = sum_total_term_freq / float(doc_count)
        if self.dtype == np.float32:
            return float(np.float32(v))
        return v

    def scorer(self, boost: float, doc_count: int, sum_total_term_freq: int,
               doc_freqs: list[int],
               total_term_freqs=None) -> "BM25Scorer":
        idf = self.idf_sum(doc_freqs, doc_count) if len(doc_freqs) != 1 \
            else self.idf(doc_freqs[0], doc_count)
        return BM25Scorer(self, boost, idf,
                          self.avgdl(sum_total_term_freq, doc_count))


class BM25Scorer:
    """Vectorized equivalent of BM25Similarity.BM25Scorer (kt:161-198)."""

    def __init__(self, sim: BM25Similarity, boost: float, idf: float, avgdl: float):
        dt = sim.dtype
        k1 = dt.type(sim.k1)
        b = dt.type(sim.b)
        one = dt.type(1)
        table = LENGTH_TABLE if dt == np.float32 else LENGTH_TABLE_INT.astype(np.float64)
        # cache[i] = 1/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl)) in dt arithmetic
        self.cache = one / (k1 * ((one - b) + b * table / dt.type(avgdl)))
        self.weight = dt.type(dt.type(boost) * dt.type(idf))
        self.idf = idf
        self.avgdl = avgdl
        self.dtype = dt

    def score(self, freq: np.ndarray, norm_byte: np.ndarray) -> np.ndarray:
        """score = weight - weight/(1 + freq * cache[norm]) elementwise.

        ``freq`` int array; ``norm_byte`` uint8 array (SmallFloat byte4).
        """
        one = self.dtype.type(1)
        f = np.asarray(freq).astype(self.dtype)
        inv = self.cache[np.asarray(norm_byte).astype(np.uint8)]
        return self.weight - self.weight / (one + f * inv)

    def max_score(self, max_freq: int, min_norm_byte: int) -> float:
        """Upper bound for block-max pruning: score at (block max freq,
        block min norm byte). Coarser than the reference's competitive
        (freq, norm) pareto set (CompetitiveImpactAccumulator.kt:44-105)
        but still a sound upper bound because score is monotone ↑ in freq
        and ↑ as the norm byte decreases (MaxScoreCache.kt:30-45 analog)."""
        return float(self.score(np.array([max_freq]),
                                np.array([min_norm_byte], dtype=np.uint8))[0])
