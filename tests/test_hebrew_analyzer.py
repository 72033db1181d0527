"""HebMorph Hebrew conformance: hspell dictionary lemmatization with
legal-prefix stripping and per-lemma prefix-mask checks, plus the
Latin-corpus pass-through reduction the bm25_hebrew oracle relies on."""

import re

import pyarrow.parquet as pq
import pytest

from lucene_kmp_ray.analysis.hebrew import (
    HebrewAnalyzer,
    is_hebrew_word,
    lemmatize,
    strip_niqqud,
)

# standard Hebrew morphology facts (hspell data, checkable upstream)
FACTS = {
    "ספרים": ["ספר"],          # books -> book
    "ילדים": ["ילד"],          # children -> child
    "הספרים": ["ספר"],         # the-books: ה prefix stripped
    "בבית": ["בית"],           # in-house: ב prefix stripped
    "והילדים": ["ילד"],        # and-the-children: וה double prefix
    "אאכוף": ["אכף"],          # 1sg future verb -> lemma
    "כתבתי": ["כתב", "כתבה"],  # wrote-1sg: both readings
    "שלום": ["שלום"],          # identity lemma
}


@pytest.mark.parametrize("word", sorted(FACTS))
def test_morphology_facts(word):
    assert lemmatize(word) == FACTS[word]


def test_unknown_hebrew_empty():
    assert lemmatize("צצצצצ") == []


def test_helpers():
    assert is_hebrew_word("ספר") and not is_hebrew_word("spark")
    assert strip_niqqud("שָׁלוֹם") == "שלום"


def test_analyzer_chain():
    a = HebrewAnalyzer()
    assert a("הספרים בבית") == ["ספר", "בית"]
    # unknown Hebrew passes through; ascii lowercased
    assert a("צצצצצ Data") == ["צצצצצ", "data"]


def test_niqqud_stripped_before_lookup():
    a = HebrewAnalyzer()
    assert a("שָׁלוֹם") == ["שלום"]


def test_latin_corpus_reduction():
    a = HebrewAnalyzer()
    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    pat = re.compile(r"[a-z0-9]+")
    for s in texts:
        s = s or ""
        assert a(s) == pat.findall(s.lower())


def test_he_vectors_reproduce():
    from __ray_entry__ import HE_VECTORS
    a = HebrewAnalyzer()
    for phrase, expected in HE_VECTORS:
        assert a(phrase) == expected, phrase


# --- BasicHebrewTest.kt recall assertions ------------------------------
# assertFoundInText(doc, query) holds iff the lemma sets intersect

def _terms(w):
    lem = lemmatize(w)
    return set(lem) if lem else {w}


@pytest.mark.parametrize("doc,query", [
    ("בת", "בת"), ("שבתו", "שבתו"), ("אנציקלופדיה", "אנציקלופדיה"),
    ("שבתו", "בת"),    # prefix + suffix reading
    ("שבתו", "תו"),    # prefix reading
    ("שבתו", "ישב"),   # verb inflection reading
    ("שבתו", "שבתנו"),
])
def test_reference_recall_found(doc, query):
    assert _terms(doc) & _terms(query), (doc, query)


def test_reference_recall_not_found():
    # "too much of a tolerance" case must NOT match
    assert not (_terms("שבתו") & _terms("שיבה"))
