"""Language-model similarities: Dirichlet prior and Jelinek-Mercer
smoothing (``search/similarities/LMDirichletSimilarity.kt``,
``LMJelinekMercerSimilarity.kt`` over ``LMSimilarity.kt`` +
``SimilarityBase.kt``).

Scoring contract (SimilarityBase.kt:149-167 BasicSimScorer):

- ``docLen`` is the DECODED norm length ``LENGTH_TABLE[normByte]``
  (SmallFloat byte4 — lossy above 40), as a double.
- ``P`` (collection probability, LMSimilarity.kt:118
  ``DefaultCollectionModel``) = ``(totalTermFreq + 1) /
  (numberOfFieldTokens + 1)`` where numberOfFieldTokens =
  collection ``sumTotalTermFreq`` (SimilarityBase.kt:71-74
  fillBasicStats).
- LMDirichlet (LMDirichletSimilarity.kt:51-61, mu default 2000):
  ``score = boost * (ln(1 + freq/(mu*P)) + ln(mu/(dl+mu)))``,
  clipped at 0 (docs with fewer occurrences than the collection
  model predicts).
- LMJelinekMercer (LMJelinekMercerSimilarity.kt:44-46, λ ∈ (0, 1]):
  ``score = boost * ln(1 + ((1-λ)*freq/dl) / (λ*P))``.
- Multi-term stats build ONE per-term scorer each and SUM the float
  scores in double (MultiSimilarity.kt:36-45 MultiSimScorer), unlike
  BM25's idf-sum-then-one-scorer.

Both conform to the Searcher similarity slot —
``scorer(boost, doc_count, sum_total_term_freq, doc_freqs, ttfs)`` →
object with ``score(freqs, norm_bytes)`` / ``max_score`` — and need the
per-term total_term_freqs (the 5th argument the BM25/Classic sims
ignore). ``dtype='float64'`` skips the reference's per-term float casts
so a DuckDB oracle mirrors scores bit-exactly.
"""

from __future__ import annotations

import numpy as np

from ..util.smallfloat import LENGTH_TABLE_INT


class _LMBase:
    def __init__(self, dtype: str = "float32"):
        self.dtype = np.dtype(dtype)

    # idf hooks exist for Searcher paths that report idf; LM models have
    # no idf notion — explain() shows P instead
    def idf(self, doc_freq: int, doc_count: int) -> float:
        return 1.0

    def idf_sum(self, doc_freqs, doc_count) -> float:
        return 1.0

    def _term_score(self, freq: np.ndarray, dl: np.ndarray, p: float,
                    boost: float) -> np.ndarray:
        raise NotImplementedError

    def scorer(self, boost: float, doc_count: int, sum_total_term_freq: int,
               doc_freqs: list[int], total_term_freqs: "list[int] | None"
               = None) -> "_LMScorer":
        if total_term_freqs is None:
            raise ValueError(
                "LM similarities need per-term total_term_freqs "
                "(this query path resolves only doc_freqs)")
        ps = [(ttf + 1.0) / (sum_total_term_freq + 1.0)
              for ttf in total_term_freqs]
        return _LMScorer(self, float(boost), ps)


class _LMScorer:
    """One BasicSimScorer per term, float-summed like MultiSimScorer.

    All per-term scorers share the (freq, norm) inputs — the Searcher
    resolves multi-term stats for phrase-style queries where every term
    position contributes the same sloppy freq (PhraseWeight contract)."""

    def __init__(self, sim: _LMBase, boost: float, ps: list[float]):
        self.sim = sim
        self.boost = boost
        self.ps = ps
        self.dtype = sim.dtype

    def score(self, freq: np.ndarray, norm_byte: np.ndarray) -> np.ndarray:
        dt = self.dtype
        f = np.asarray(freq).astype(np.float64)
        dl = LENGTH_TABLE_INT[
            np.asarray(norm_byte).astype(np.uint8)].astype(np.float64)
        total = np.zeros(len(f), dtype=np.float64)
        for p in self.ps:
            s = self.sim._term_score(f, dl, p, self.boost)
            if dt == np.float32:            # SimScorer.score -> Float
                s = s.astype(np.float32).astype(np.float64)
            total += s
        return total.astype(dt)

    def max_score(self, max_freq: int, min_norm_byte: int) -> float:
        # both models are monotone increasing in freq and decreasing in
        # dl, so the block bound is score(max_freq, min length)
        return float(self.score(np.array([max_freq]),
                                np.array([min_norm_byte], np.uint8))[0])


class LMDirichletSimilarity(_LMBase):
    """Bayesian Dirichlet-prior smoothing (Zhai & Lafferty 2001);
    LMDirichletSimilarity.kt:51-61, negative scores clipped to 0."""

    def __init__(self, mu: float = 2000.0, dtype: str = "float32"):
        super().__init__(dtype)
        if not (mu >= 0 and np.isfinite(mu)):
            raise ValueError(f"illegal mu value: {mu}")
        self.mu = float(mu)

    def _term_score(self, freq, dl, p, boost):
        # plain ln(1 + x), not log1p: the reference computes ln(1 + ...)
        # (LMDirichletSimilarity.kt:56) and the SQL oracle mirrors it
        mu = self.mu
        s = boost * (np.log(1.0 + freq / (mu * p)) +
                     np.log(mu / (dl + mu)))
        return np.maximum(s, 0.0)


class LMJelinekMercerSimilarity(_LMBase):
    """Jelinek-Mercer linear interpolation
    (LMJelinekMercerSimilarity.kt:44-46); λ ∈ (0, 1], small λ suits
    short queries (the reference class doc)."""

    def __init__(self, lam: float = 0.1, dtype: str = "float32"):
        super().__init__(dtype)
        if not (0 < lam <= 1):
            raise ValueError("lambda must be in the range (0 .. 1]")
        self.lam = float(lam)

    def _term_score(self, freq, dl, p, boost):
        lam = self.lam
        return boost * np.log(
            1.0 + ((1.0 - lam) * freq / dl) / (lam * p))
