"""LithuanianAnalyzer: snowball behavior checks + generated-SQL parity
fuzzing (the reference ships no Lithuanian stemmer vectors)."""

import random

from lucene_kmp_ray.analysis.lithuanian import (LT_CONFLICTS, LT_STEP1,
                                                LT_STEP2,
                                                LithuanianAnalyzer,
                                                lithuanian_stem)


def test_known_snowball_cases():
    assert lithuanian_stem("vaikas") == "vaik"
    assert lithuanian_stem("vaikai") == "vaik"
    assert lithuanian_stem("mergaitės") == "mergait"
    # conditional R1 offset: 'a'-initial word longer than 6 chars scans
    # the region from index 1
    assert lithuanian_stem("aplinkybės") == "aplinkyb"


def test_fix_rules():
    # step1 strips a bare case 'e' inside R1 — even on non-Lithuanian text
    assert lithuanian_stem("merge") == "merg"
    a = LithuanianAnalyzer()
    assert a("ir vaikas") == ["vaik"]   # 'ir' is a stop word


def test_tables_longest_first():
    for t in (LT_STEP1, LT_STEP2):
        assert all(len(t[i]) >= len(t[i + 1]) for i in range(len(t) - 1))
    assert all(len(LT_CONFLICTS[i][0]) >= len(LT_CONFLICTS[i + 1][0])
               for i in range(len(LT_CONFLICTS) - 1))


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(21)
    alphabet = "aeiouyąėęįūųbcdfghjklmnprstvzčšž"
    sfx = (LT_STEP1[:60] + LT_STEP2 + [s for s, _ in LT_CONFLICTS] +
           ["gd", "č", "dž", "", ""])
    words = ["vaikas", "vaikai", "mergaitės", "aplinkybės"]
    for _ in range(600):
        base = "".join(random.choice(alphabet)
                       for _ in range(random.randint(0, 7)))
        words.append(base + random.choice(sfx))
    words = sorted(set(w for w in words if w))
    sql = f"""
WITH RECURSIVE rkept AS (SELECT row_number() OVER () AS doc_id, t0
                         FROM (SELECT unnest(?) AS t0)),
{oracle._lt_stem_ctes()}
SELECT term FROM rterms ORDER BY doc_id
"""
    got = [r[0] for r in duckdb.connect().execute(sql, [words]).fetchall()]
    assert got == [lithuanian_stem(w) for w in words]
