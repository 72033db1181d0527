"""LM similarity correctness vectors from the reference's
TestSimilarityBase.kt:329-345 (testLMDirichlet / testLMJelinekMercer,
stats at :496-514: 100 docs, 5000 field tokens, ttf=70, df=10, freq=7,
docLen=40, tolerance FLOAT_EPSILON=1e-5)."""

import math

import numpy as np

from lucene_kmp_ray.similarity.lm import (LMDirichletSimilarity,
                                          LMJelinekMercerSimilarity)
from lucene_kmp_ray.util.smallfloat import int_to_byte4

N_DOCS = 100
FIELD_TOKENS = 5000
DF = 10
TTF = 70
FREQ = 7.0
DOC_LEN = 40
EPS = 1e-5


def _score(sim):
    norm = int_to_byte4(DOC_LEN)
    scorer = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF])
    return float(scorer.score(np.array([FREQ]),
                              np.array([norm], np.uint8))[0])


def test_lm_dirichlet_gold():
    # TestSimilarityBase.kt:331-334 — gold recomputed from the test's
    # own reformulation of the Dirichlet score
    p = (FREQ + 2000.0 * (TTF + 1) / (FIELD_TOKENS + 1.0)) \
        / (DOC_LEN + 2000.0)
    a = 2000.0 / (DOC_LEN + 2000.0)
    gold = math.log(p / (a * (TTF + 1) / (FIELD_TOKENS + 1.0))) \
        + math.log(a)
    assert abs(_score(LMDirichletSimilarity()) - gold) < EPS


def test_lm_jelinek_mercer_gold():
    # TestSimilarityBase.kt:338-344
    lam = 0.1
    p = (1 - lam) * FREQ / DOC_LEN + lam * (TTF + 1) / (FIELD_TOKENS + 1.0)
    gold = math.log(p / (lam * (TTF + 1) / (FIELD_TOKENS + 1.0)))
    assert abs(_score(LMJelinekMercerSimilarity(lam)) - gold) < EPS


def test_dirichlet_clips_negative():
    # LMDirichletSimilarity.kt:60-61: rarer-than-predicted docs score 0
    sim = LMDirichletSimilarity()
    scorer = sim.scorer(1.0, 100, 100, [90], [90])  # very common term
    s = scorer.score(np.array([1.0]),
                     np.array([int_to_byte4(40)], np.uint8))
    assert float(s[0]) == 0.0


def test_multi_term_float_sum():
    # MultiSimilarity.kt:39-45: sum of per-term float scores
    sim = LMDirichletSimilarity()
    norm = np.array([int_to_byte4(DOC_LEN)], np.uint8)
    f = np.array([FREQ])
    two = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF, DF], [TTF, 30])
    a = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF])
    b = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF], [30])
    got = float(two.score(f, norm)[0])
    want = np.float32(np.float64(np.float32(a.score(f, norm)[0])) +
                      np.float64(np.float32(b.score(f, norm)[0])))
    assert got == float(want)


def test_requires_ttfs():
    import pytest
    with pytest.raises(ValueError):
        LMDirichletSimilarity().scorer(1.0, 100, 5000, [10])


def test_float64_mode_matches_double_math():
    sim = LMDirichletSimilarity(dtype="float64")
    scorer = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF])
    dl = 40.0
    p = (TTF + 1.0) / (FIELD_TOKENS + 1.0)
    want = math.log(1.0 + FREQ / (2000.0 * p)) \
        + math.log(2000.0 / (dl + 2000.0))
    got = float(scorer.score(np.array([FREQ]),
                             np.array([int_to_byte4(40)], np.uint8))[0])
    # numpy's SIMD log and libm log may differ by 1 ULP — the oracle
    # entries round to 6dp for the same reason
    assert math.isclose(got, max(want, 0.0), rel_tol=1e-12)
