"""BasqueAnalyzer: snowball behavior checks + generated-SQL parity
fuzzing (the reference ships no Basque stemmer vectors)."""

import random

from lucene_kmp_ray.analysis.basque import (EU_ADITZAK, EU_ADJETIBOAK,
                                            EU_IZENAK, BasqueAnalyzer,
                                            basque_stem)


def test_known_snowball_cases():
    assert basque_stem("etxeetan") == "etxe"
    assert basque_stem("liburuak") == "liburu"
    # the arabera→arabera rewrite is a protective no-op: the repeat
    # loop moves its cursor past it instead of spinning
    assert basque_stem("arabera") == "arabera"


def test_cursor_carry():
    # after a match at [s, c) the next pass matches suffixes ending at
    # s; the loops terminate even on self-rewrites
    a = BasqueAnalyzer()
    assert a("eta liburuak") == ["liburu"]   # 'eta' is a stop word


def test_tables_longest_first():
    for t in (EU_ADITZAK, EU_IZENAK, EU_ADJETIBOAK):
        assert all(len(t[i][0]) >= len(t[i + 1][0])
                   for i in range(len(t) - 1))


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(31)
    alphabet = "aeioubdgkhjlmnprstxz"
    sfx = ([s for s, _, _ in EU_ADITZAK][:60] +
           [s for s, _, _ in EU_IZENAK][:100] +
           [s for s, _, _ in EU_ADJETIBOAK] + ["", ""])
    words = ["etxeetan", "liburuak", "zuentzat", "arabera", "emakumea"]
    for _ in range(500):
        base = "".join(random.choice(alphabet)
                       for _ in range(random.randint(0, 6)))
        words.append(base + random.choice(sfx))
    words = sorted(set(w for w in words if w))
    sql = f"""
WITH RECURSIVE rkept AS (SELECT row_number() OVER () AS doc_id, t0
                         FROM (SELECT unnest(?) AS t0)),
{oracle._eu_stem_ctes()}
SELECT term FROM rterms ORDER BY doc_id
"""
    got = [r[0] for r in duckdb.connect().execute(sql, [words]).fetchall()]
    assert got == [basque_stem(w) for w in words]
