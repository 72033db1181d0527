"""Axiomatic retrieval functions F1/F2/F3 × EXP/LOG
(``search/similarities/Axiomatic.kt`` + ``AxiomaticF*.kt``) and the
Indri Dirichlet LM (``IndriDirichletSimilarity.kt``) — the last
members of the reference's similarities module.

Axiomatic score (Axiomatic.kt:70-84): ``max(0, (tf · ln · tfln · idf
− gamma) · boost)`` with the five components per variant (defaults
s=0.25, queryLen=1, k=0.35, Axiomatic.kt:51):

- tf: ``1 + ln(1 + ln(freq + 1))`` (F1*/F3*) or 1 (F2*);
- ln (length norm): ``(avgFl + s)/(avgFl + dl·s)`` (F1*) or 1;
- tfln: ``freq/(freq + s + s·dl/avgFl)`` (F2*) or 1;
- idf: ``((N+1)/df)^k`` (EXP) or ``ln((N+1)/df)`` (LOG);
- gamma: ``(dl − queryLen)·s·queryLen/avgFl`` (F3*) or 0.

IndriDirichlet (IndriDirichletSimilarity.kt:51-60, mu default 2000):
``score = ln((freq + mu·P)/(dl + mu))`` with the Indri collection
model ``P = totalTermFreq / numberOfFieldTokens``
(IndriDirichletSimilarity.kt:96-106 — no +1 smoothing, unlike the
default LM model). Scores are negative log-probabilities ranked
descending, exactly like the reference.

Parameter validation mirrors TestAxiomaticSimilarity.kt:10-72
(finite 0 ≤ s, 0 < k ≤ 1, queryLen ≥ 0 and finite).
"""

from __future__ import annotations

import numpy as np

from .dfr import _SimilarityBase


class Axiomatic(_SimilarityBase):
    def __init__(self, s: float = 0.25, query_len: int = 1,
                 k: float = 0.35, dtype: str = "float32"):
        super().__init__(dtype)
        if not (np.isfinite(s) and 0 <= s <= 1):
            raise ValueError(f"illegal s value: {s}, must be between 0 "
                             "and 1")
        if not (np.isfinite(k) and 0 < k <= 1):
            raise ValueError(f"illegal k value: {k}, must be between 0 "
                             "and 1")
        if query_len < 0 or not np.isfinite(query_len):
            raise ValueError(f"illegal query length value: {query_len}")
        self.s = float(np.float32(s))
        self.k = float(np.float32(k))
        self.query_len = int(query_len)

    # components (each variant overrides its non-trivial subset)
    def tf(self, stats, freq, dl):
        return 1.0 + np.log(1.0 + np.log(freq + 1.0))

    def ln(self, stats, freq, dl):
        return 1.0

    def tfln(self, stats, freq, dl):
        return 1.0

    def idf_comp(self, stats, freq, dl):
        raise NotImplementedError

    def gamma(self, stats, freq, dl):
        return 0.0

    def _score(self, stats, freq, dl):
        s = (self.tf(stats, freq, dl)
             * self.ln(stats, freq, dl)
             * self.tfln(stats, freq, dl)
             * self.idf_comp(stats, freq, dl)
             - self.gamma(stats, freq, dl)) * stats.boost
        return np.maximum(0.0, s)

    # (the similarity-slot idf(df, n)/idf_sum hooks stay inherited from
    # _SimilarityBase; the scoring component is idf_comp to avoid
    # shadowing them — values match Axiomatic.kt's idf())


def _idf_exp(self, stats, freq, dl):
    """AxiomaticF1EXP.kt:63-69: ((N+1)/df)^k."""
    return ((stats.number_of_documents + 1.0)
            / stats.doc_freq) ** self.k


def _idf_log(self, stats, freq, dl):
    """AxiomaticF1LOG.kt: ln((N+1)/df)."""
    return np.log((stats.number_of_documents + 1.0) / stats.doc_freq)


def _ln_f1(self, stats, freq, dl):
    """AxiomaticF1EXP.kt:45-51: (avgFl+s)/(avgFl+dl·s)."""
    return ((stats.avg_field_length + self.s)
            / (stats.avg_field_length + dl * self.s))


def _tfln_f2(self, stats, freq, dl):
    """AxiomaticF2EXP.kt:54-58: freq/(freq+s+s·dl/avgFl)."""
    return freq / (freq + self.s + self.s * dl
                   / stats.avg_field_length)


def _tf_one(self, stats, freq, dl):
    return 1.0


def _gamma_f3(self, stats, freq, dl):
    """AxiomaticF3EXP.kt:71-77: (dl−queryLen)·s·queryLen/avgFl."""
    return ((dl - self.query_len) * self.s * self.query_len
            / stats.avg_field_length)


class AxiomaticF1EXP(Axiomatic):
    ln = _ln_f1
    idf_comp = _idf_exp


class AxiomaticF1LOG(Axiomatic):
    def __init__(self, s: float = 0.25, dtype: str = "float32"):
        super().__init__(s, dtype=dtype)
    ln = _ln_f1
    idf_comp = _idf_log


class AxiomaticF2EXP(Axiomatic):
    tf = _tf_one
    tfln = _tfln_f2
    idf_comp = _idf_exp


class AxiomaticF2LOG(Axiomatic):
    def __init__(self, s: float = 0.25, dtype: str = "float32"):
        super().__init__(s, dtype=dtype)
    tf = _tf_one
    tfln = _tfln_f2
    idf_comp = _idf_log


class AxiomaticF3EXP(Axiomatic):
    def __init__(self, s: float = 0.25, query_len: int = 1,
                 k: float = 0.35, dtype: str = "float32"):
        super().__init__(s, query_len, k, dtype=dtype)
    idf_comp = _idf_exp
    gamma = _gamma_f3


class AxiomaticF3LOG(Axiomatic):
    def __init__(self, s: float = 0.25, query_len: int = 1,
                 dtype: str = "float32"):
        super().__init__(s, query_len, dtype=dtype)
    idf_comp = _idf_log
    gamma = _gamma_f3


class IndriDirichletSimilarity(_SimilarityBase):
    """IndriDirichletSimilarity.kt:51-60: ln((freq + mu·P)/(dl + mu)),
    P = ttf/numberOfFieldTokens (:96-106), mu default 2000."""

    def __init__(self, mu: float = 2000.0, dtype: str = "float32"):
        super().__init__(dtype)
        self.mu = float(mu)

    def _score(self, stats, freq, dl):
        p = (float(stats.total_term_freq)
             / float(stats.number_of_field_tokens))
        return stats.boost * np.log((freq + self.mu * p)
                                    / (dl + self.mu))
