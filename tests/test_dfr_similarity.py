"""Randomness-family correctness vectors from the reference's
TestSimilarityBase.kt:346-397 (exact float golds at the :496-514 stats
fixture: 100 docs, 5000 field tokens, avgFl=50, df=10, ttf=70, freq=7,
docLen=40, FLOAT_EPSILON=1e-5)."""

import math

import numpy as np

from lucene_kmp_ray.similarity.dfr import (AfterEffectB, AfterEffectL,
                                           BasicModelG, BasicModelIF,
                                           BasicModelIn, BasicModelIne,
                                           DFISimilarity, DFRSimilarity,
                                           DistributionLL,
                                           DistributionSPL, IBSimilarity,
                                           IndependenceChiSquared,
                                           IndependenceSaturated,
                                           IndependenceStandardized,
                                           LambdaDF, LambdaTTF,
                                           NoNormalization,
                                           NormalizationH1,
                                           NormalizationH2,
                                           NormalizationH3,
                                           NormalizationZ)
from lucene_kmp_ray.util.smallfloat import int_to_byte4

N_DOCS = 100
FIELD_TOKENS = 5000
AVG_FL = 50.0
DF = 10
TTF = 70
FREQ = 7.0
DOC_LEN = 40
EPS = 1e-5


def _score(sim):
    scorer = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF])
    return float(scorer.score(np.array([FREQ]),
                              np.array([int_to_byte4(DOC_LEN)],
                                       np.uint8))[0])


def test_ll_for_ib():
    # TestSimilarityBase.kt:349-352
    sim = IBSimilarity(DistributionLL(), LambdaDF(), NoNormalization())
    assert abs(_score(sim) - 4.178574562072754) < EPS


def test_spl_for_ib():
    # :357-359
    sim = IBSimilarity(DistributionSPL(), LambdaTTF(), NoNormalization())
    assert abs(_score(sim) - 2.2387237548828125) < EPS


def test_ine_b2():
    # :365-368
    sim = DFRSimilarity(BasicModelIne(), AfterEffectB(), NormalizationH2())
    assert abs(_score(sim) - 5.747603416442871) < EPS


def test_g_l1():
    # :373-376
    sim = DFRSimilarity(BasicModelG(), AfterEffectL(), NormalizationH1())
    assert abs(_score(sim) - 1.6390540599822998) < EPS


def test_in_2():
    # :381-386 (gold recomputed per the test's own closed form)
    sim = DFRSimilarity(BasicModelIn(), AfterEffectL(), NormalizationH2())
    tfn = FREQ * math.log2(1.0 + AVG_FL / DOC_LEN)
    gold = tfn * math.log2((N_DOCS + 1.0) / (DF + 0.5)) / (1 + tfn)
    assert abs(_score(sim) - gold) < EPS


def test_if_b():
    # :391-397
    sim = DFRSimilarity(BasicModelIF(), AfterEffectB(), NoNormalization())
    b = (TTF + 1 + 1) / ((DF + 1) * (FREQ + 1))
    if_ = FREQ * math.log2(1 + (N_DOCS + 1.0) / (TTF + 0.5))
    assert abs(_score(sim) - b * if_) < EPS


def test_dfi_zero_at_or_below_expected():
    # DFISimilarity.kt:35-36
    for ind in (IndependenceStandardized(), IndependenceSaturated(),
                IndependenceChiSquared()):
        sim = DFISimilarity(ind)
        scorer = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF])
        # expected = 71*40/5001 ≈ 0.568 → freq 0.5 scores 0
        s = scorer.score(np.array([0.5]),
                         np.array([int_to_byte4(DOC_LEN)], np.uint8))
        assert float(s[0]) == 0.0


def test_dfi_chisquared_positive():
    sim = DFISimilarity(IndependenceChiSquared())
    expected = (TTF + 1) * DOC_LEN / (FIELD_TOKENS + 1)
    measure = (FREQ - expected) ** 2 / expected
    gold = np.float32(math.log(measure + 1.0) / math.log(2.0))
    assert abs(_score(sim) - float(gold)) < EPS


def test_all_normalizations_finite_and_monotone():
    # unitTestCore-style sanity: every combo yields finite, freq-monotone
    # scores at the fixture stats
    norms = [NoNormalization(), NormalizationH1(), NormalizationH2(),
             NormalizationH3(), NormalizationZ()]
    models = [BasicModelG(), BasicModelIF(), BasicModelIn(),
              BasicModelIne()]
    effects = [AfterEffectB(), AfterEffectL()]
    f = np.array([1.0, 3.0, 9.0])
    nb = np.array([int_to_byte4(DOC_LEN)] * 3, np.uint8)
    for nz in norms:
        for m in models:
            for e in effects:
                s = DFRSimilarity(m, e, nz).scorer(
                    1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF]).score(f, nb)
                assert np.all(np.isfinite(s)) and s[0] <= s[1] <= s[2]
        for dist in (DistributionLL(), DistributionSPL()):
            for lam in (LambdaDF(), LambdaTTF()):
                s = IBSimilarity(dist, lam, nz).scorer(
                    1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF]).score(f, nb)
                assert np.all(np.isfinite(s)) and s[0] <= s[1] <= s[2]


def test_multi_term_float_sum():
    sim = DFRSimilarity(BasicModelIne(), AfterEffectB(), NormalizationH2())
    f = np.array([FREQ])
    nb = np.array([int_to_byte4(DOC_LEN)], np.uint8)
    two = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF, 5], [TTF, 20])
    a = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [DF], [TTF])
    b = sim.scorer(1.0, N_DOCS, FIELD_TOKENS, [5], [20])
    want = np.float32(np.float64(np.float32(a.score(f, nb)[0])) +
                      np.float64(np.float32(b.score(f, nb)[0])))
    assert float(two.score(f, nb)[0]) == float(want)
