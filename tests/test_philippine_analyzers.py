"""Tagalog/Cebuano/Ilocano conformance: vectors from the reference's
Test*Analyzer.kt suites plus generated-SQL parity fuzz."""

import random

from lucene_kmp_ray.analysis import philippine as ph


def test_tagalog():
    a = ph.TagalogAnalyzer()
    assert a("Pilipino") == ["pilipino"]
    assert a("Tagalog") == ["tagalog"]
    assert a("1234") == ["1234"]
    # affix pipeline: mag- prefix + -an suffix
    assert ph.tagalog_stem("magluto") == "luto"
    assert ph.tagalog_stem("aalis") == "alis"     # vowel dedup


def test_cebuano():
    a = ph.CebuanoAnalyzer()
    assert a("Mopalit") == ["palit"]
    assert a("Gipalitan") == ["palit"]
    assert a("१२३४") == ["1234"]
    assert a("Ang mga tawo sa Cebu ug Pransiya") == ["tawo", "cebu"]


def test_ilocano():
    a = ph.IlocanoAnalyzer()
    assert a("Ilokáno") == ["ilokano"]
    assert a("nagadal") == ["adal"]
    assert a("dagiti ubing ket agbasa iti libro") == [
        "ubing", "basa", "libro"]


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(71)
    con = duckdb.connect()
    langs = {
        "tagalog": (ph.tagalog_stem, 2, "abeghiklmnoprstuwy-'",
                    ph.TL_PREFIXES + ph.TL_SUFFIXES +
                    ["um", "in", "'t", "'y", "aa", "-"]),
        "cebuano": (ph.cebuano_stem, 3, "abeghiklmnoprstuwy-'",
                    ph.CEB_PREFIXES + ph.CEB_SUFFIXES +
                    ["um", "in", "'g", "'ng", "mang", "pan", "-"]),
        "ilocano": (ph.ilocano_stem, 3, "abeghiklmnoprstuwy-",
                    ph.ILO_PREFIXES + ph.ILO_SUFFIXES +
                    ["um", "in", "-"]),
    }
    for lang, (fn, guard, alpha, affixes) in langs.items():
        words = set()
        for _ in range(500):
            base = "".join(random.choice(alpha)
                           for _ in range(random.randint(0, 6)))
            words.add(random.choice(affixes + ["", ""]) + base +
                      random.choice(affixes + ["", ""]))
        words = sorted(w for w in words if w)
        stages = oracle._extra_stem_stages(lang)
        ctes, prev = [], "rg"
        for i, expr in enumerate(stages):
            ctes.append(f"xs{i} AS (SELECT doc_id, t0, g, "
                        f"CASE WHEN g THEN ({expr}) ELSE w END AS w "
                        f"FROM {prev})")
            prev = f"xs{i}"
        sql = f"""
WITH rkept AS (SELECT row_number() OVER () AS doc_id, t0
               FROM (SELECT unnest(?) AS t0)),
rg AS (SELECT doc_id, t0, length(t0) > {guard} AS g, t0 AS w
       FROM rkept),
{",".join(ctes)}
SELECT w FROM {prev} ORDER BY doc_id
"""
        got = [r[0] for r in con.execute(sql, [words]).fetchall()]
        assert got == [fn(w) for w in words], lang
