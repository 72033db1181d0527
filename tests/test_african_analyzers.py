"""Hausa/Swahili/Yoruba/Igbo/Tigrinya conformance: vectors from the
reference's Test*Analyzer.kt suites plus generated-SQL parity fuzz."""

import random

from lucene_kmp_ray.analysis import african as af


def test_hausa():
    a = af.HausaAnalyzer()
    assert a("Nakarantawa") == ["karanta"]
    assert a("ƙasa") == ["kasa"]
    assert a("١٢٣٤") == ["1234"]
    assert a("ni da su nakarantawa") == ["karanta"]


def test_swahili():
    a = af.SwahiliAnalyzer()
    assert a("Ninasoma") == ["som"]
    assert a("Vitabu") == ["tabu"]
    assert a("mimi na mtoto ninasoma kitabu") == ["toto", "som",
                                                  "tabu"]


def test_yoruba():
    a = af.YorubaAnalyzer()
    assert a("Yorùbá") == ["yoruba"]
    assert a("ìkọwé") == ["kowe"]
    assert a("àwọn ọmọ ní ilé ìkọwé") == ["omo", "ile", "kowe"]


def test_igbo():
    a = af.IgboAnalyzer()
    assert a("Ikwughi") == ["kwu"]
    assert a("Akwụkwọ") == ["akwukwo"]
    assert a("anyi na ha ikwughi akwukwo") == ["kwu", "akwukwo"]


def test_tigrinya():
    a = af.TigrinyaAnalyzer()
    assert a("መፅሐፍታት") == ["መጽሀፍ"]
    assert a("ሠላም") == ["ሰላም"]
    assert a("እቲ ኣብ መፅሐፍታት እዩ") == ["መጽሀፍ"]


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(61)
    con = duckdb.connect()
    langs = {
        "hausa": (af.hausa_stem, "abcdehiknorstuwy'",
                  af.HA_PREFIXES + af.HA_SUFFIXES),
        "swahili": (af.swahili_stem, "abehikmnostuvwz",
                    af.SW_VERB_PREFIXES + af.SW_NOUN_PREFIXES +
                    af.SW_SUFFIXES),
        "yoruba": (af.yoruba_stem, "abeikmnorstuw-'",
                   af.YO_PREFIXES + ["'n", "-"]),
        "igbo": (af.igbo_stem, "abeghikmnorsuwịọụ",
                 af.IG_SUFFIXES + ["na", "i", "n", "m", "ị"]),
        "tigrinya": (af.tigrinya_stem, "ሀሁሂሰሱላልካክኩምንታት",
                     af.TI_SUFFIXES),
    }
    for lang, (fn, alpha, affixes) in langs.items():
        words = set()
        for _ in range(400):
            base = "".join(random.choice(alpha)
                           for _ in range(random.randint(0, 6)))
            words.add(random.choice(affixes + [""]) + base +
                      random.choice(affixes + [""]))
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
rg AS (SELECT doc_id, t0, length(t0) > 3 AS g, t0 AS w FROM rkept),
{",".join(ctes)}
SELECT w FROM {prev} ORDER BY doc_id
"""
        got = [r[0] for r in con.execute(sql, [words]).fetchall()]
        assert got == [fn(w) for w in words], lang
