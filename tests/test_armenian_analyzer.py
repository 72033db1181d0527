"""ArmenianAnalyzer: chain behavior + generated-SQL parity fuzzing
(the reference ships no Armenian stemmer vectors; parity with the
generated oracle is the conformance bar, per the snowball tables)."""

import random

from lucene_kmp_ray.analysis.armenian import (HY_ADJECTIVE, HY_ENDING,
                                              HY_NOUN, HY_VERB, HY_VOWELS,
                                              ArmenianAnalyzer,
                                              armenian_stem)


def test_basic_stemming():
    # ending 'երեն' is not a listed suffix; verb 'են'? — trace a
    # couple of table-driven cases
    assert armenian_stem("մարդկանց") == "մարդկ"      # noun ոց/անց
    assert armenian_stem("merge") == "merge"              # no Armenian vowels
    # suffix before the first vowel boundary survives
    assert armenian_stem("ա") == "ա"


def test_analyzer_chain():
    a = ArmenianAnalyzer()
    assert a("the merge runs") == ["the", "merge", "runs"]
    # stop word removed
    assert a("և մարդկանց") == ["մարդկ"]


def test_tables_longest_first():
    for t in (HY_ENDING, HY_VERB, HY_ADJECTIVE, HY_NOUN):
        assert all(len(t[i]) >= len(t[i + 1]) for i in range(len(t) - 1))


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(9)
    cons = "բգդզթժլխծկհձղճմյնշչպջռսվտրցփքֆ"
    alphabet = cons + "".join(sorted(HY_VOWELS))
    sfx = list(HY_ENDING + HY_VERB + HY_ADJECTIVE + HY_NOUN) + ["", ""]
    words = ["հայերեն", "մարդկանց", "merge"]
    for _ in range(700):
        base = "".join(random.choice(alphabet)
                       for _ in range(random.randint(0, 7)))
        words.append(base + random.choice(sfx))
    words = sorted(set(w for w in words if w))
    sql = f"""
WITH rkept AS (SELECT row_number() OVER () AS doc_id, t0
               FROM (SELECT unnest(?) AS t0)),
{oracle._hy_stem_ctes()}
SELECT term FROM rterms ORDER BY doc_id
"""
    got = [r[0] for r in duckdb.connect().execute(sql, [words]).fetchall()]
    assert got == [armenian_stem(w) for w in words]
