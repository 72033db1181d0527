"""Axiomatic + Indri similarity vectors (Axiomatic.kt components,
TestAxiomaticSimilarity.kt:10-72 parameter validation,
IndriDirichletSimilarity.kt:51-60)."""

import math

import numpy as np
import pytest

from lucene_kmp_ray.similarity.axiomatic import (AxiomaticF1EXP,
                                                 AxiomaticF1LOG,
                                                 AxiomaticF2EXP,
                                                 AxiomaticF2LOG,
                                                 AxiomaticF3EXP,
                                                 AxiomaticF3LOG,
                                                 IndriDirichletSimilarity)
from lucene_kmp_ray.util.smallfloat import int_to_byte4

N_DOCS = 100
FIELD_TOKENS = 5000
AVG_FL = 50.0
DF = 10
TTF = 70
FREQ = 7.0
DOC_LEN = 40
S = float(np.float32(0.25))
K = float(np.float32(0.35))


def _score(sim):
    scorer = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF])
    return float(scorer.score(np.array([FREQ]),
                              np.array([int_to_byte4(DOC_LEN)],
                                       np.uint8))[0])


def test_f1exp_closed_form():
    tf = 1 + math.log(1 + math.log(FREQ + 1))
    ln = (AVG_FL + S) / (AVG_FL + DOC_LEN * S)
    idf = ((N_DOCS + 1.0) / DF) ** K
    gold = np.float32(max(0.0, tf * ln * idf))
    assert abs(_score(AxiomaticF1EXP()) - float(gold)) < 1e-5


def test_f2log_closed_form():
    tfln = FREQ / (FREQ + S + S * DOC_LEN / AVG_FL)
    idf = math.log((N_DOCS + 1.0) / DF)
    gold = np.float32(max(0.0, tfln * idf))
    assert abs(_score(AxiomaticF2LOG()) - float(gold)) < 1e-5


def test_f3exp_gamma():
    tf = 1 + math.log(1 + math.log(FREQ + 1))
    idf = ((N_DOCS + 1.0) / DF) ** K
    gamma = (DOC_LEN - 1) * S * 1 / AVG_FL
    gold = np.float32(max(0.0, tf * idf - gamma))
    assert abs(_score(AxiomaticF3EXP()) - float(gold)) < 1e-5


def test_all_variants_finite_and_freq_monotone():
    f = np.array([1.0, 3.0, 9.0])
    nb = np.array([int_to_byte4(DOC_LEN)] * 3, np.uint8)
    for cls in (AxiomaticF1EXP, AxiomaticF1LOG, AxiomaticF2EXP,
                AxiomaticF2LOG, AxiomaticF3EXP, AxiomaticF3LOG):
        s = cls().scorer(1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF]).score(f, nb)
        assert np.all(np.isfinite(s)) and s[0] <= s[1] <= s[2], cls


def test_parameter_validation():
    # TestAxiomaticSimilarity.kt:10-72
    for bad_s in (float("inf"), -1.0, float("nan")):
        with pytest.raises(ValueError, match="illegal s value"):
            AxiomaticF2EXP(s=bad_s)
    for bad_k in (2.0, -1.0, float("nan")):
        with pytest.raises(ValueError, match="illegal k value"):
            AxiomaticF2EXP(k=bad_k)
    with pytest.raises(ValueError, match="illegal query length"):
        AxiomaticF3EXP(query_len=-1)


def test_indri_dirichlet_closed_form():
    # IndriDirichletSimilarity.kt:51-60 — P without +1 smoothing
    p = TTF / FIELD_TOKENS
    gold = np.float32(math.log((FREQ + 2000.0 * p) / (DOC_LEN + 2000.0)))
    got = _score(IndriDirichletSimilarity())
    assert abs(got - float(gold)) < 1e-5
    assert got < 0.0  # negative log-probability, ranked descending
