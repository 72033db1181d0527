"""WordDelimiterGraphFilter conformance vs the reference test vectors
(TestWordDelimiterGraphFilter.kt: testSplits, testPossessives,
testPositionIncrements, testTokenType)."""

import numpy as np
import pytest

from lucene_kmp_ray.analysis.worddelim import (CATENATE_ALL, DEFAULT_FLAGS,
                                               GENERATE_NUMBER_PARTS,
                                               GENERATE_WORD_PARTS,
                                               PRESERVE_ORIGINAL,
                                               SPLIT_ON_CASE_CHANGE,
                                               SPLIT_ON_NUMERICS,
                                               STEM_ENGLISH_POSSESSIVE,
                                               WordDelimiterAnalyzer,
                                               WordDelimiterFilter)

SPLIT_VECTORS = [
    # TestWordDelimiterGraphFilter.kt:213-224 (doSplit, default flags)
    ("basic-split", ["basic", "split"]),
    ("camelCase", ["camel", "Case"]),
    ("บ้าน", ["บ้าน"]),
    ("test's'", ["test"]),
    ("Роберт", ["Роберт"]),
    ("РобЕрт", ["Роб", "Ерт"]),
    ("aǅungla", ["aǅungla"]),
    ("हिन्दी", ["हिन्दी"]),
    ("١٢٣٤", ["١٢٣٤"]),
    # classic behaviors implied by WordDelimiterIterator.isBreak
    ("PowerShot", ["Power", "Shot"]),
    ("SD500", ["SD", "500"]),
    ("ABCDef", ["ABCDef"]),       # UPPER→lower never breaks
    ("501st", ["501", "st"]),
    ("O'Neil's", ["O", "Neil"]),  # internal + final possessive
    ("A's", ["A"]),
    ("123's", ["123", "s"]),      # possessive requires preceding alpha
    ("SuperDuperXL500", ["Super", "Duper", "XL", "500"]),
    ("TransAM", ["Trans", "AM"]),
    ("McKinley", ["Mc", "Kinley"]),
]


@pytest.mark.parametrize("inp,want", SPLIT_VECTORS)
def test_splits(inp, want):
    f = WordDelimiterFilter(DEFAULT_FLAGS)
    assert [t for t, _ in f.parts(inp)[0]] == want


def test_possessive_toggle():
    # TestWordDelimiterGraphFilter.kt:239-240
    stem = WordDelimiterFilter(DEFAULT_FLAGS)
    nostem = WordDelimiterFilter(DEFAULT_FLAGS & ~STEM_ENGLISH_POSSESSIVE)
    assert [t for t, _ in stem.parts("ra's")[0]] == ["ra"]
    assert [t for t, _ in nostem.parts("ra's")[0]] == ["ra", "s"]


def test_preserve_original_positions():
    # "SAL_S8371 - SAL" → SAL_S8371(0) SAL(0) S(1) 8371(2) -(3) SAL(4)
    # (posIncrements 1,0,1,1,1,1, TestWordDelimiterGraphFilter.kt:301-306)
    a = WordDelimiterAnalyzer(DEFAULT_FLAGS | PRESERVE_ORIGINAL,
                              lowercase=False)
    dl, flat, doc, pos = a.analyze_flat(["SAL_S8371 - SAL"])
    got = list(zip(flat.to_pylist(), pos.tolist()))
    assert sorted(got) == sorted([("SAL_S8371", 0), ("SAL", 0), ("S", 1),
                                  ("8371", 2), ("-", 3), ("SAL", 4)])


def test_catenate_all_positions():
    # "LUCENE / solR" → LUCENE(0) solR(2) sol(2) R(3)
    # (TestWordDelimiterGraphFilter.kt:336-343: posIncrements 1,2,0,1)
    flags = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_ALL |
             SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS |
             STEM_ENGLISH_POSSESSIVE)
    a = WordDelimiterAnalyzer(flags, lowercase=False)
    dl, flat, doc, pos = a.analyze_flat(["LUCENE / solR"])
    got = sorted(zip(flat.to_pylist(), pos.tolist()))
    assert got == sorted([("LUCENE", 0), ("solR", 2), ("sol", 2), ("R", 3)])


def test_dropped_delimiter_consumes_position():
    # "LUCENE / SOLR" → LUCENE(0) SOLR(2) (posIncrements 1,2)
    a = WordDelimiterAnalyzer(lowercase=False)
    dl, flat, doc, pos = a.analyze_flat(["LUCENE / SOLR"])
    assert list(zip(flat.to_pylist(), pos.tolist())) == \
        [("LUCENE", 0), ("SOLR", 2)]


def test_protected_words():
    # protWords pass through unsplit (TestWordDelimiterGraphFilter NUTCH)
    f = WordDelimiterFilter(DEFAULT_FLAGS, protected=frozenset({"foo-bar"}))
    assert [t for t, _ in f.parts("foo-bar")[0]] == ["foo-bar"]


def test_catenate_token_type_vector():
    # "foo-bar" + CATENATE_ALL → foobar, foo, bar
    # (TestWordDelimiterGraphFilter.kt:256-260)
    flags = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_ALL |
             SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS |
             STEM_ENGLISH_POSSESSIVE)
    f = WordDelimiterFilter(flags)
    assert sorted(t for t, _ in f.parts("foo-bar")[0]) == \
        ["bar", "foo", "foobar"]


def test_analyze_flat_matches_call():
    a = WordDelimiterAnalyzer()
    texts = ["PowerShot SD500 O'Neil's", "Wi-Fi --- j2se", "", "camelCase"]
    dl, flat, doc, pos = a.analyze_flat(texts)
    toks = flat.to_pylist()
    for i, t in enumerate(texts):
        assert [tok for tok, d in zip(toks, doc) if d == i] == a(t)
    assert dl.tolist() == [len(a(t)) for t in texts]
    # positions strictly increasing per doc for generated-parts-only flags
    for i in range(len(texts)):
        p = pos[doc == i]
        assert np.all(np.diff(p) > 0)
