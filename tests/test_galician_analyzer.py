"""Galician RSLP conformance: vectors from the reference's
TestGalicianAnalyzer.kt / TestGalicianStemFilter.kt /
TestGalicianMinimalStemFilter.kt, plus generated-SQL parity fuzzing."""

import random

from lucene_kmp_ray.analysis.rslp import (GalicianAnalyzer, _gl_steps,
                                          galician_minimal_stem,
                                          galician_stem, parse_rslp)


def test_analyzer_vectors():
    a = GalicianAnalyzer()
    assert a("correspondente") == ["correspond"]
    assert a("corresponderá") == ["correspond"]


def test_minimal_stemmer():
    assert galician_minimal_stem("elefantes") == "elefante"
    assert galician_minimal_stem("elefante") == "elefante"
    assert galician_minimal_stem("kalóres") == "kalór"
    assert galician_minimal_stem("kalór") == "kalór"
    # plural-step exceptions survive
    assert galician_minimal_stem("mas") == "mas"
    assert galician_minimal_stem("barcelonês") == "barcelonês"


def test_rslp_mechanics():
    steps = _gl_steps()
    assert set(steps) == {"Plural", "Unification", "Adverb",
                          "Augmentative", "Noun", "Verb", "Vowel"}
    # conditional suffixes gate the step
    assert steps["Plural"].cond_suffixes == ("s",)
    # whole-word plural exception (type 1): 'mas' survives the s-strip
    assert steps["Plural"].apply("mas") == "mas"
    assert steps["Plural"].apply("casas") == "casa"
    # diminutive -iño → -o (the Galician rule; min stem 3)
    assert steps["Augmentative"].apply("pequeniño") == "pequeno"


def test_parse_roundtrip_counts():
    from lucene_kmp_ray.analysis.rslp import GALICIAN_RSLP_DATA
    steps = parse_rslp(GALICIAN_RSLP_DATA)
    # the published rules file: 7 steps, Verb is by far the largest
    assert len(steps["Verb"].rules) > 100
    assert len(steps["Noun"].rules) > 50


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(3)
    steps = _gl_steps()
    sfx = [r.suffix for st in steps.values() for r in st.rules]
    exc = [w for st in steps.values() for r in st.rules
           for w in sorted(r.exc_words)[:2]]
    alphabet = "abcdefghilmnopqrstuvxzáéêíóúãõçñ"
    words = ["correspondente", "corresponderá", "cansadísimo",
             "maluquinho", "mulleraza"] + exc[:100]
    for _ in range(400):
        base = "".join(random.choice(alphabet)
                       for _ in range(random.randint(0, 7)))
        words.append(base + random.choice(sfx))
    words = sorted(set(w for w in words if w))
    sql = f"""
WITH RECURSIVE rkept AS (SELECT row_number() OVER () AS doc_id, t0
                         FROM (SELECT unnest(?) AS t0)),
{oracle._gl_stem_ctes()}
SELECT term FROM rterms ORDER BY doc_id
"""
    got = [r[0] for r in duckdb.connect().execute(sql, [words]).fetchall()]
    assert got == [galician_stem(w) for w in words]
