"""Serbian + Catalan analyzer conformance (reference simplified rules)."""

from lucene_kmp_ray.analysis.catalan import CatalanAnalyzer, catalan_stem
from lucene_kmp_ray.analysis.serbian import (SerbianAnalyzer,
                                             serbian_normalize,
                                             serbian_stem)


def test_serbian_stem_rules():
    assert serbian_stem("danima") == "dan"
    assert serbian_stem("ovima") == "ov"     # first-match: 'ima' wins
    assert serbian_stem("crnim") == "crn"
    assert serbian_stem("ni") == "ni"        # length guard
    assert serbian_stem("pisaće") == "pisać"
    assert serbian_stem("ima") == "ima"


def test_serbian_normalize():
    assert serbian_normalize("џеп") == "dzep"
    assert serbian_normalize("љубав") == "ljubav"
    assert serbian_normalize("ђак") == "djak"
    assert serbian_normalize("život") == "zivot"
    assert serbian_normalize("ćirilica") == "cirilica"
    assert serbian_normalize("шума") == "suma"


def test_serbian_order_stem_before_normalize():
    # Cyrillic 'данима' does NOT match the Latin 'ima' rule (stemmer
    # runs before normalization — reference order)
    a = SerbianAnalyzer()
    assert a("данима") == ["danima"]
    assert a("danima") == ["dan"]


def test_catalan_stem_rules():
    assert catalan_stem("llengües") == "llengu"
    assert catalan_stem("llengua") == "llengu"
    assert catalan_stem("diccionari") == "diccion"
    assert catalan_stem("institut") == "inst"
    assert catalan_stem("estudis") == "estud"
    assert catalan_stem("catalans") == "catalan"
    assert catalan_stem("cases") == "cas"
    assert catalan_stem("córrer") == "correr"
    assert catalan_stem("col·legi") == "col.legi"  # middot → '.'


def test_catalan_elision_and_chain():
    a = CatalanAnalyzer()
    assert a("l'institut") == ["inst"]
    assert a("d'estudis") == ["estud"]


def test_analyze_flat_agrees_with_call():
    for cls, texts in [
        (SerbianAnalyzer, ["данима danima", "џеп љубав crnim"]),
        (CatalanAnalyzer, ["l'institut d'estudis", "llengües catalanes"]),
    ]:
        a = cls()
        lengths, flat, doc_of, _pos = a.analyze_flat(texts)
        toks = flat.to_pylist()
        per_doc = [[] for _ in texts]
        for t, d in zip(toks, doc_of):
            per_doc[d].append(t)
        assert per_doc == [a(t) for t in texts], cls.__name__
        assert list(lengths) == [len(x) for x in per_doc]
