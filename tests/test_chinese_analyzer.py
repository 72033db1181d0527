"""Smartcn-semantics Chinese analyzer conformance.

Vectors from the reference's own TestSmartChineseAnalyzer.kt. The word
dictionary is the real decoded coredict (79,905 words, authentic
frequencies); the bigram table is empty (not in the distribution), so
any vector here passing proves the unigram-smoothed HHMM path matches.
"""

import pytest

from lucene_kmp_ray.analysis.chinese import (
    HHMMSegmenter,
    SmartChineseAnalyzer,
)


@pytest.fixture(scope="module")
def analyzer():
    return SmartChineseAnalyzer()


VECTORS = [
    ("我购买了道具和服装。", ["我", "购买", "了", "道具", "和", "服装"]),
    ("我购买了道具和服装。 我购买了道具和服装。",
     ["我", "购买", "了", "道具", "和", "服装"] * 2),
    # ideographic space separator
    ("我购买了道具和服装　我购买了道具和服装。",
     ["我", "购买", "了", "道具", "和", "服装"] * 2),
    ("我购买 Tests 了道具和服装",
     ["我", "购买", "test", "了", "道具", "和", "服装"]),
    ("我购买 Tests 了道具和服装1234",
     ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]),
    ("我购买 Ｔｅｓｔｓ 了道具和服装１２３４",
     ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]),
    ("Title:San", ["titl", "san"]),
]


@pytest.mark.parametrize("text,expected", VECTORS)
def test_reference_vectors(analyzer, text, expected):
    assert analyzer(text) == expected


def test_surrogate_pairs(analyzer):
    # astral CJK ext chars pass through as single tokens
    s = ("\U0002CB3B\U0002CB4A\U0002CB73\U0002CB5B鿏"
         "\U0002B7FC\U0002CB2D鿔")
    assert analyzer(s) == list(
        ["\U0002CB3B", "\U0002CB4A", "\U0002CB73", "\U0002CB5B", "鿏",
         "\U0002B7FC", "\U0002CB2D", "鿔"])


def test_hanzi_word_spanning_space():
    # the graph scan skips SPACE_LIKE inside hanzi word candidates
    seg = HHMMSegmenter()
    toks = seg.process("中 国")
    surfaces = [t.term for t in toks]
    assert "中国" in surfaces


def test_punct_stop_list(analyzer):
    assert analyzer("，。！？") == []
    assert analyzer("") == []


def test_single_char_fallback(analyzer):
    # rare hanzi outside any multi-char word still come out as unigrams
    out = analyzer("鑫")
    assert out == ["鑫"]


def test_zh_vectors_reproduce(analyzer):
    from __ray_entry__ import ZH_VECTORS
    for phrase, expected in ZH_VECTORS:
        assert analyzer(phrase) == expected, phrase
