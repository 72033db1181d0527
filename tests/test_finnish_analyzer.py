"""FinnishAnalyzer conformance: vectors from TestFinnishAnalyzer.kt
plus hand-traced snowball cases and generated-SQL parity fuzzing."""

import random

from lucene_kmp_ray.analysis.finnish import (FinnishAnalyzer, finnish_stem,
                                             FI_CASE, FI_OTHER,
                                             FI_PARTICLES, FI_POSS)


def test_reference_vectors():
    a = FinnishAnalyzer()
    assert a("edeltäjiinsä") == ["edeltäj"]
    assert a("edeltäjistään") == ["edeltäj"]
    assert a("olla") == []          # stop word


def test_known_snowball_cases():
    # taloissa: case 'ssa' removed in R1, then i_plural → talo
    assert finnish_stem("taloissa") == "talo"
    # possessive 'nsa' then case — edeltäjiinsä path pieces
    assert finnish_stem("edeltäjiinsä") == "edeltäj"
    # t_plural: final t after vowel
    assert finnish_stem("tytöt") == "tytö"
    # tidy strips a final AEI vowel after a consonant inside R1 —
    # even for non-Finnish text
    assert finnish_stem("merge") == "merg"


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(5)
    alphabet = "aeiouyäöbcdfghjklmnprstv"
    sfx = ([s for s, _ in FI_PARTICLES] + [s for s, _ in FI_POSS] +
           [s for s, _ in FI_CASE] + [s for s, _ in FI_OTHER] +
           ["t", "it", "aat", "iinsä", "stään", "kse", "ie",
            "aan", "een", "ssa", "issa", "imma", "mmat", "po", ""])
    words = ["edeltäjiinsä", "edeltäjistään", "taloissa",
             "tyttö", "tytöt"]
    for _ in range(700):
        base = "".join(random.choice(alphabet)
                       for _ in range(random.randint(0, 8)))
        words.append(base + random.choice(sfx))
    words = sorted(set(w for w in words if w))
    sql = f"""
WITH rkept AS (SELECT row_number() OVER () AS doc_id, t0
               FROM (SELECT unnest(?) AS t0)),
{oracle._fi_stem_ctes()}
SELECT term FROM rterms ORDER BY doc_id
"""
    got = [r[0] for r in duckdb.connect().execute(sql, [words]).fetchall()]
    assert got == [finnish_stem(w) for w in words]
