"""Amharic + Oromo (Horn module) conformance: the reference's own
stemmer/normalizer vectors, lexicon lookups through the Ge'ez-SERA
romanization, and the analyzer chains."""

import pytest

from lucene_kmp_ray.analysis.horn import (
    AmharicAnalyzer,
    OromoAnalyzer,
    amharic_stem,
    oromo_stem,
)

# TestAmharicStemmer.kt vectors
AM_STEMS = [
    ("የማያስፈልጋትስ", "አስፈለገ"), ("አይደለችም", "ነው"), ("ይመጣሉ", "መጣ"),
    ("ሀገር", "hager"), ("yehagerocn", "hager"), ("na", "mT'"),
    ("መጽሐፎችን", "መጽሐፍ"), ("ለዘመዶቻችንም", "ዘመድ"),
    ("x", "x"), ("zzzzzz", "zzzzzz"),
]
# TestOromoStemmer.kt vectors
OM_STEMS = [
    ("afeeramaniiru", "afeeramuu"), ("dubbanne", "dubbachuu"),
    ("namoota", "nama"), ("manaan", "mana"), ("fedhi", "fedh"),
    ("ameerikaatti", "ameerikaa"),
    ("ameerikaanummaa", "ameerikaanummaa"),
]


@pytest.mark.parametrize("word,expected", AM_STEMS)
def test_amharic_stem(word, expected):
    assert amharic_stem(word) == expected


@pytest.mark.parametrize("word,expected", OM_STEMS)
def test_oromo_stem(word, expected):
    assert oromo_stem(word) == expected


def test_amharic_normalizer_folds():
    a = AmharicAnalyzer()
    # ሐ/ኃ fold to ሀ before stemming (AmharicNormalizer.kt)
    assert a("ሐገር") == a("ሀገር")


def test_amharic_stopwords():
    a = AmharicAnalyzer()
    assert a("ነው እና ግን") == []


def test_oromo_apostrophe_normalization():
    a = OromoAnalyzer()
    assert a("ba’e") == a("ba'e")


def test_oromo_stopwords():
    a = OromoAnalyzer()
    assert a("kan kun sana") == []


def test_horn_vectors_reproduce():
    from __ray_entry__ import AM_VECTORS, OM_VECTORS
    am, om = AmharicAnalyzer(), OromoAnalyzer()
    for phrase, expected in AM_VECTORS:
        assert am(phrase) == expected, phrase
    for phrase, expected in OM_VECTORS:
        assert om(phrase) == expected, phrase


def test_latin_corpus_reduction():
    import re

    import pyarrow.parquet as pq
    from lucene_kmp_ray.oracle import _AM_CORPUS_STEMS, _OM_CORPUS_STEMS
    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    am, om = AmharicAnalyzer(), OromoAnalyzer()
    pat = re.compile(r"[a-z0-9]+")
    for s in texts:
        toks = pat.findall((s or "").lower())
        assert am(s or "") == [_AM_CORPUS_STEMS.get(t, t) for t in toks]
        assert om(s or "") == [_OM_CORPUS_STEMS.get(t, t) for t in toks]
