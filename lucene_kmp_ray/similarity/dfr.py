"""Divergence-from-randomness, information-based and
divergence-from-independence similarities — the rest of the reference's
``search/similarities/`` randomness family (``DFRSimilarity.kt``,
``IBSimilarity.kt``, ``DFISimilarity.kt`` over ``SimilarityBase.kt``).

Shared scoring contract (SimilarityBase.kt:34-47, 149-167):

- per-term ``BasicStats`` (numberOfDocuments, numberOfFieldTokens,
  avgFieldLength = sumTotalTermFreq/docCount, docFreq, totalTermFreq);
- ``docLen`` = decoded SmallFloat norm ``LENGTH_TABLE[normByte]``;
- multi-term queries sum per-term FLOAT scores in double
  (MultiSimilarity.kt:39-45 MultiSimScorer);
- ``log2(x) = ln(x)/ln(2)`` (SimilarityBase.kt:183-186 — NOT a fused
  log2, the reference divides).

Components (each cites its reference file):

- Normalizations (``Normalization.kt:61-68`` none; ``NormalizationH1/
  H2/H3/Z.kt``): tfn = tf · c·(avgFl/len) | tf·log2(1 + c·avgFl/len) |
  Dirichlet-ish (tf + mu·P)/(len + mu)·mu | tf·(avgFl/len)^z.
- DFR basic models G / I(F) / I(n) / I(ne)
  (``BasicModelG/IF/In/Ine.kt``) with after effects B
  ((F+2)/(n+1), ``AfterEffectB.kt:31-35``) and L (1,
  ``AfterEffectL.kt``), combined exactly like the reference's
  rewritten non-decreasing forms.
- IB distributions LL / SPL (``DistributionLL.kt:15-17``,
  ``DistributionSPL.kt:20-43`` incl. both nextafter edge guards) with
  lambdas DF / TTF (``LambdaDF.kt``/``LambdaTTF.kt`` — float32 values,
  nudged off exactly 1).
- DFI with independence Standardized / Saturated / ChiSquared
  (``DFISimilarity.kt:31-41``, ``Independence*.kt``): expected =
  (F+1)·len/(T+1), score 0 when freq ≤ expected else
  boost·log2(measure+1).

``dtype='float64'`` skips the per-term float casts so DuckDB oracles
can mirror the arithmetic (scores still rounded to 6dp in entries —
numpy and DuckDB libm ln/pow differ by 1 ULP on some arguments).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..util.smallfloat import LENGTH_TABLE_INT

_LOG_2 = math.log(2.0)


def log2(x):
    """SimilarityBase.log2 (SimilarityBase.kt:183-186): ln(x)/ln(2)."""
    return np.log(x) / _LOG_2


@dataclass
class BasicStats:
    """SimilarityBase per-term stats (BasicStats.kt via
    fillBasicStats, SimilarityBase.kt:60-75)."""
    number_of_documents: int
    number_of_field_tokens: int
    avg_field_length: float
    doc_freq: int
    total_term_freq: int
    boost: float = 1.0


# ------------------------------------------------- normalizations --------
class NoNormalization:
    """Normalization.kt:61-68: tfn = tf."""

    def tfn(self, stats, tf, dl):
        return tf


class NormalizationH1:
    """NormalizationH1.kt:53-55 (c default 1): tf · c · avgFl/len."""

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def tfn(self, stats, tf, dl):
        return tf * self.c * (stats.avg_field_length / dl)


class NormalizationH2:
    """NormalizationH2.kt:52-54 (c default 1):
    tf · log2(1 + c·avgFl/len)."""

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def tfn(self, stats, tf, dl):
        return tf * log2(1.0 + self.c * stats.avg_field_length / dl)


class NormalizationH3:
    """NormalizationH3.kt:45-48 (mu default 800):
    (tf + mu·P)/(len + mu)·mu with float32 P like the reference's
    ``(ttf + 1f)/(tokens + 1f)``."""

    def __init__(self, mu: float = 800.0):
        self.mu = float(mu)

    def tfn(self, stats, tf, dl):
        p = float(np.float32(np.float32(stats.total_term_freq + 1.0) /
                             np.float32(stats.number_of_field_tokens
                                        + 1.0)))
        return (tf + self.mu * p) / (dl + self.mu) * self.mu


class NormalizationZ:
    """NormalizationZ.kt:49-51 (z default 0.30):
    tf · (avgFl/len)^z."""

    def __init__(self, z: float = 0.30):
        self.z = float(np.float32(z))

    def tfn(self, stats, tf, dl):
        return tf * np.power(stats.avg_field_length / dl, self.z)


# ----------------------------------------------------- after effects -----
class AfterEffectB:
    """AfterEffectB.kt:31-35: (F+1+1)/(n+1) with F=ttf, n=df."""

    def score_times_1p_tfn(self, stats):
        return (stats.total_term_freq + 1 + 1.0) / (stats.doc_freq + 1)


class AfterEffectL:
    """AfterEffectL.kt:31-33: 1."""

    def score_times_1p_tfn(self, stats):
        return 1.0


# ----------------------------------------------------- basic models ------
class BasicModelG:
    """BasicModelG.kt:33-47: λ=F/(N+F); B·(1+tfn) - (B-A) rewritten as
    (B - (B-A)/(1+tfn)) · ae·(1+tfn)."""

    def score(self, stats, tfn, ae):
        F = float(stats.total_term_freq + 1)
        N = float(stats.number_of_documents)
        lam = F / (N + F)
        A = log2(lam + 1.0)
        B = log2((1.0 + lam) / lam)
        return (B - (B - A) / (1.0 + tfn)) * ae


class BasicModelIF:
    """BasicModelIF.kt:31-41: A·ae·(1 - 1/(1+tfn)),
    A = log2(1 + (N+1)/(F+0.5))."""

    def score(self, stats, tfn, ae):
        A = log2(1.0 + (stats.number_of_documents + 1.0)
                 / (stats.total_term_freq + 0.5))
        return A * ae * (1.0 - 1.0 / (1.0 + tfn))


class BasicModelIn:
    """BasicModelIn.kt:31-41: A·ae·(1 - 1/(1+tfn)),
    A = log2((N+1)/(n+0.5))."""

    def score(self, stats, tfn, ae):
        A = log2((stats.number_of_documents + 1.0)
                 / (stats.doc_freq + 0.5))
        return A * ae * (1.0 - 1.0 / (1.0 + tfn))


class BasicModelIne:
    """BasicModelIne.kt:32-44: ne = N·(1 - ((N-1)/N)^F),
    A = log2((N+1)/(ne+0.5))."""

    def score(self, stats, tfn, ae):
        N = float(stats.number_of_documents)
        F = float(stats.total_term_freq)
        ne = N * (1.0 - ((N - 1.0) / N) ** F)
        A = log2((N + 1.0) / (ne + 0.5))
        return A * ae * (1.0 - 1.0 / (1.0 + tfn))


# ------------------------------------------------- IB distributions ------
class DistributionLL:
    """DistributionLL.kt:15-17: -ln(λ/(tfn+λ))."""

    def score(self, stats, tfn, lam):
        return -np.log(lam / (tfn + lam))


class DistributionSPL:
    """DistributionSPL.kt:20-43 with both floating-point edge guards:
    q = 1 - 1/(tfn+1) nudged below 1; pow = λ^q nudged off λ."""

    def score(self, stats, tfn, lam):
        q = 1.0 - 1.0 / (tfn + 1.0)
        q = np.where(q == 1.0, np.nextafter(1.0, 0.0), q)
        pw = np.power(lam, q)
        if lam < 1.0:
            fix = np.nextafter(lam, np.inf)
        else:
            fix = np.nextafter(lam, -np.inf)
        pw = np.where(pw == lam, fix, pw)
        return -np.log((pw - lam) / (1.0 - lam))


class LambdaDF:
    """LambdaDF.kt:13-19: float32 (n+1)/(N+1), nextDown'd off 1."""

    def lam(self, stats) -> float:
        v = np.float32((stats.doc_freq + 1.0)
                       / (stats.number_of_documents + 1.0))
        if v == np.float32(1.0):
            v = np.nextafter(v, np.float32(0.0))
        return float(v)


class LambdaTTF:
    """LambdaTTF.kt:13-19: float32 (F+1)/(N+1), nextUp'd off 1."""

    def lam(self, stats) -> float:
        v = np.float32((stats.total_term_freq + 1.0)
                       / (stats.number_of_documents + 1.0))
        if v == np.float32(1.0):
            v = np.nextafter(v, np.float32(2.0))
        return float(v)


# ---------------------------------------------- DFI independences --------
class IndependenceStandardized:
    """IndependenceStandardized.kt:15-17."""

    def score(self, freq, expected):
        return (freq - expected) / np.sqrt(expected)


class IndependenceSaturated:
    """IndependenceSaturated.kt:12-14."""

    def score(self, freq, expected):
        return (freq - expected) / expected


class IndependenceChiSquared:
    """IndependenceChiSquared.kt:13-15."""

    def score(self, freq, expected):
        return (freq - expected) * (freq - expected) / expected


# ------------------------------------------------ SimilarityBase slot ----
class _SimilarityBase:
    """Searcher similarity-slot adapter shared by the randomness
    family: one BasicStats per term, MultiSimScorer float summation."""

    def __init__(self, dtype: str = "float32"):
        self.dtype = np.dtype(dtype)

    def idf(self, doc_freq: int, doc_count: int) -> float:
        return 1.0

    def idf_sum(self, doc_freqs, doc_count) -> float:
        return 1.0

    def _score(self, stats: BasicStats, freq: np.ndarray,
               dl: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def scorer(self, boost: float, doc_count: int, sum_total_term_freq: int,
               doc_freqs: list[int],
               total_term_freqs=None) -> "_BaseScorer":
        if total_term_freqs is None:
            raise ValueError(
                "randomness-family similarities need per-term "
                "total_term_freqs")
        avg = sum_total_term_freq / float(doc_count)
        stats = [BasicStats(doc_count, sum_total_term_freq, avg, df, ttf,
                            float(boost))
                 for df, ttf in zip(doc_freqs, total_term_freqs)]
        return _BaseScorer(self, stats)


class _BaseScorer:
    def __init__(self, sim: _SimilarityBase, stats: list[BasicStats]):
        self.sim = sim
        self.stats = stats
        self.dtype = sim.dtype

    def score(self, freq: np.ndarray, norm_byte: np.ndarray) -> np.ndarray:
        dt = self.dtype
        f = np.asarray(freq).astype(np.float64)
        dl = LENGTH_TABLE_INT[
            np.asarray(norm_byte).astype(np.uint8)].astype(np.float64)
        total = np.zeros(len(f), dtype=np.float64)
        for st in self.stats:
            s = np.asarray(self.sim._score(st, f, dl), dtype=np.float64)
            if dt == np.float32:            # SimScorer.score -> Float
                s = s.astype(np.float32).astype(np.float64)
            total += s
        return total.astype(dt)

    def max_score(self, max_freq: int, min_norm_byte: int) -> float:
        return float(self.score(np.array([max_freq]),
                                np.array([min_norm_byte], np.uint8))[0])


class DFRSimilarity(_SimilarityBase):
    """DFRSimilarity.kt:118-122: boost · basicModel(tfn, ae)."""

    def __init__(self, basic_model, after_effect, normalization,
                 dtype: str = "float32"):
        super().__init__(dtype)
        self.basic_model = basic_model
        self.after_effect = after_effect
        self.normalization = normalization

    def _score(self, stats, freq, dl):
        tfn = self.normalization.tfn(stats, freq, dl)
        ae = self.after_effect.score_times_1p_tfn(stats)
        return stats.boost * self.basic_model.score(stats, tfn, ae)


class IBSimilarity(_SimilarityBase):
    """IBSimilarity.kt:47-49: boost · distribution(tfn, λ)."""

    def __init__(self, distribution, lambda_, normalization,
                 dtype: str = "float32"):
        super().__init__(dtype)
        self.distribution = distribution
        self.lambda_ = lambda_
        self.normalization = normalization

    def _score(self, stats, freq, dl):
        tfn = self.normalization.tfn(stats, freq, dl)
        lam = self.lambda_.lam(stats)
        return stats.boost * self.distribution.score(stats, tfn, lam)


class DFISimilarity(_SimilarityBase):
    """DFISimilarity.kt:31-41: 0 when freq ≤ expected, else
    boost · log2(independence + 1)."""

    def __init__(self, independence, dtype: str = "float32"):
        super().__init__(dtype)
        self.independence = independence

    def _score(self, stats, freq, dl):
        expected = ((stats.total_term_freq + 1) * dl
                    / (stats.number_of_field_tokens + 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            measure = self.independence.score(freq, expected)
            s = stats.boost * log2(measure + 1.0)
        return np.where(freq <= expected, 0.0, s)
