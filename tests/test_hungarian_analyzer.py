"""Hungarian light-stemmer conformance (rules traced from
hu/HungarianLightStemmer.kt; the reference test's only vector is a
keyword-exclusion check, covered here by the default no-exclusion
chain)."""

from lucene_kmp_ray.analysis.hungarian import (HungarianAnalyzer,
                                               hungarian_stem)


def test_case_removal():
    assert hungarian_stem("házaknak") == "haz"       # fold + nak + plural
    assert hungarian_stem("kertben") == "kert"       # ben
    assert hungarian_stem("idejekent") == "ide"      # kent, then je
    assert hungarian_stem("tollal") == "tol"         # doubled cons + al


def test_possessive_and_plural():
    assert hungarian_stem("gyermekeinket") == "gyermek"
    assert hungarian_stem("házak") == "haz"
    assert hungarian_stem("emberek") == "ember"


def test_final_normalize():
    # final a/e/i/o stripped when length > 3
    assert hungarian_stem("alma") == "alm"
    assert hungarian_stem("babakocsi") == "babakocs"


def test_chain_and_stops():
    a = HungarianAnalyzer()
    out = a("és a házaknak kertben")
    assert out == ["haz", "kert"]


def test_analyze_flat_agrees_with_call():
    a = HungarianAnalyzer()
    texts = ["és a házaknak kertben", "gyermekeinket emberek alma"]
    lengths, flat, doc_of, _pos = a.analyze_flat(texts)
    toks = flat.to_pylist()
    per_doc = [[] for _ in texts]
    for t, d in zip(toks, doc_of):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
    assert list(lengths) == [len(x) for x in per_doc]
