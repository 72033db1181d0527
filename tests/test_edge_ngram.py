"""EdgeNGramTokenFilter reference vectors (TestEdgeNGramTokenFilter.kt)."""

import pytest

from lucene_kmp_ray.analysis.standard import EdgeNGramAnalyzer


def grams(analyzer, text):
    return [g for t in text.split() for g in analyzer._grams(t)]


def test_front_unigram():
    assert EdgeNGramAnalyzer(1, 1)._grams("abcde") == ["a"]


def test_oversized():
    assert EdgeNGramAnalyzer(6, 6)._grams("abcde") == []
    assert EdgeNGramAnalyzer(6, 6, preserve_original=True) \
        ._grams("abcde") == ["abcde"]


def test_front_range():
    assert EdgeNGramAnalyzer(1, 3)._grams("abcde") == ["a", "ab", "abc"]


def test_preserve_original():
    text = "a bcd efghi jk"
    assert grams(EdgeNGramAnalyzer(2, 3), text) == \
        ["bc", "bcd", "ef", "efg", "jk"]
    assert grams(EdgeNGramAnalyzer(2, 3, preserve_original=True), text) == \
        ["a", "bc", "bcd", "ef", "efg", "efghi", "jk"]


def test_small_token_in_stream():
    assert grams(EdgeNGramAnalyzer(3, 3), "abc de fgh") == ["abc", "fgh"]


def test_filter_positions():
    assert grams(EdgeNGramAnalyzer(1, 3), "abcde vwxyz") == \
        ["a", "ab", "abc", "v", "vw", "vwx"]
    # grams share the source word's position (posinc-0 model)
    _, flat, doc_of, pos = EdgeNGramAnalyzer(1, 3).analyze_flat(
        ["abcde vwxyz"])
    assert flat.to_pylist() == ["a", "ab", "abc", "v", "vw", "vwx"]
    assert list(pos) == [0, 0, 0, 1, 1, 1]


def test_dropped_token_advances_position():
    # "a bcd" (2..3): "a" is dropped but still occupies position 0
    _, flat, _, pos = EdgeNGramAnalyzer(2, 3).analyze_flat(["a bcd"])
    assert flat.to_pylist() == ["bc", "bcd"]
    assert list(pos) == [1, 1]


def test_invalid_input():
    for lo, hi in ((0, 0), (2, 1), (-1, 2)):
        with pytest.raises(ValueError):
            EdgeNGramAnalyzer(lo, hi)
