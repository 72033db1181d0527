"""ClassicAnalyzer conformance — the reference's TestClassicAnalyzer.kt
vectors (classic jflex grammar + ClassicFilter + stop set)."""

import pytest

from lucene_kmp_ray.analysis.classic import ClassicAnalyzer, classic_tokenize

VECTORS = [
    ("B2B", ["b2b"]), ("2B", ["2b"]),
    ("word_having_underscore", ["word", "having", "underscore"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["o'reilly"]), ("you're", ["you're"]), ("she's", ["she"]),
    ("Jim's", ["jim"]), ("don't", ["don't"]), ("O'Reilly's", ["o'reilly"]),
    ("s-class", ["s", "class"]), ("t-com", ["t", "com"]),
    ("a-class", ["class"]),
    ("AT&T", ["at&t"]), ("Excite@Home", ["excite@home"]),
    ("www.nutch.org.", ["www.nutch.org"]),
    ("test@example.com", ["test@example.com"]),
    ("first.lastname@example.com", ["first.lastname@example.com"]),
    ("first_lastname@example.com", ["first_lastname@example.com"]),
    ("21.35", ["21.35"]), ("R2D2 C3PO", ["r2d2", "c3po"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("1-2-3", ["1-2-3"]), ("a1-b2-c3", ["a1-b2-c3"]),
    ("a1-b-c3", ["a1-b-c3"]),
    ("David has 5000 bones", ["david", "has", "5000", "bones"]),
    ("C embedded developers wanted",
     ["c", "embedded", "developers", "wanted"]),
    ('"QUOTED" word', ["quoted", "word"]),
    ("U.S.A.", ["usa"]), ("C++", ["c"]), ("C#", ["c"]),
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
]


@pytest.fixture(scope="module")
def analyzer():
    return ClassicAnalyzer()


@pytest.mark.parametrize("text,expected", VECTORS)
def test_reference_vectors(analyzer, text, expected):
    assert analyzer(text) == expected


def test_max_token_length():
    a = ClassicAnalyzer(max_token_length=5)
    assert a("ab cd toolong xy z") == ["ab", "cd", "xy", "z"]


def test_types():
    types = dict(classic_tokenize("U.S.A. AT&T www.nutch.org 1-2-3"))
    assert types["U.S.A."] == "<ACRONYM>"
    assert types["AT&T"] == "<COMPANY>"
    assert types["www.nutch.org"] == "<HOST>"
    assert types["1-2-3"] == "<NUM>"


def test_cj_per_char():
    a = ClassicAnalyzer()
    assert a("漢字") == ["漢", "字"]
