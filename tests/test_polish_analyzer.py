"""Morfologik Polish conformance: the CFSA2 decoder + PREFIX-encoder
lemma decoding against published PoliMorf inflection->lemma pairs, and
the MorfologikFilter pass-through/replacement semantics."""

import pytest

from lucene_kmp_ray.analysis.polish import (
    CFSA2,
    MorfologikAnalyzer,
    PolishStemmer,
    _stemmer,
)

# published PoliMorf facts (checkable against the upstream dictionary)
PAIRS = {
    "żołnierzami": ["żołnierz"],
    "samochodami": ["samochód"],
    "książki": ["książka"],
    "domy": ["dom"],
    "kotów": ["kot"],
    "miastach": ["miasto"],
    "jestem": ["być"],          # suppletive lemma
    "piękna": ["piękny", "piękno"],
    "polskie": ["polski", "polskie"],
}


@pytest.fixture(scope="module")
def stemmer() -> PolishStemmer:
    return _stemmer()


@pytest.mark.parametrize("word", sorted(PAIRS))
def test_published_pairs(stemmer, word):
    assert stemmer.lookup(word) == PAIRS[word]


def test_absent_word_empty(stemmer):
    assert stemmer.lookup("spark") == []
    assert stemmer.lookup("xyzzy") == []
    assert stemmer.lookup("") == []


def test_fsa_header_parses():
    import os
    path = os.path.join(os.path.dirname(__file__), "..",
                        "lucene_kmp_ray", "analysis", "data",
                        "polish.dict")
    with open(path, "rb") as f:
        fsa = CFSA2(f.read())
    assert len(fsa.label_mapping) == 32
    assert fsa.root() > 0


def test_analyzer_replaces_and_passes_through():
    a = MorfologikAnalyzer()
    # lemmas replace dictionary words; unknown tokens pass through
    assert a("żołnierzami spark") == ["żołnierz", "spark"]
    # multi-reading forms emit every lemma
    assert a("polskie") == ["polski", "polskie"]


def test_analyzer_case_fold():
    a = MorfologikAnalyzer()
    # tokenizer lowercases; the dictionary lookup then hits
    assert a("Żołnierzami") == ["żołnierz"]


def test_pl_vectors_reproduce():
    from __ray_entry__ import PL_VECTORS
    a = MorfologikAnalyzer()
    for phrase, expected in PL_VECTORS:
        assert a(phrase) == expected, phrase
