"""IrishAnalyzer conformance: vectors from the reference's
TestIrishAnalyzer.kt / TestIrishLowerCaseFilter.kt, plus generated-SQL
parity fuzzing of the stemmer and the full token chain."""

import random

from lucene_kmp_ray.analysis.irish import (IrishAnalyzer, irish_lowercase,
                                           irish_stem)


def test_basics():
    a = IrishAnalyzer()
    assert a("siopadóireacht") == ["siopadóir"]
    assert a("síceapatacha") == ["síceapaite"]


def test_contractions_and_hyphens():
    a = IrishAnalyzer()
    # TestIrishAnalyzer.testContractions
    assert a("b'fhearr m'athair") == ["fearr", "athair"]
    # TestIrishAnalyzer.testHyphens: n- split off by the tokenizer and
    # removed by the hyphenation stop list
    assert a("n-athair") == ["athair"]


def test_irish_lowercase():
    # IrishLowerCaseFilter: lowercase n/t + upper vowel → hyphen insert
    assert irish_lowercase("nAthair") == "n-athair"
    assert irish_lowercase("tUISCE") == "t-uisce"
    assert irish_lowercase("Nathair") == "nathair"   # capital N: no insert
    assert irish_lowercase("teach") == "teach"       # lowercase vowel: no
    # full chain: the stemmer's initial morph then strips the n-
    a = IrishAnalyzer()
    assert a("nAthair") == ["athair"]


def test_stop_words():
    a = IrishAnalyzer()
    assert a("an triúr agus") == []


def test_initial_morph():
    assert irish_stem("bhfuil") == "fuil"
    assert irish_stem("thaispeáin") == "taispeáin"
    assert irish_stem("t-uisce") == "uisce"


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(11)
    alphabet = "abcdefghilmnoprstuáéíóú"
    sfx = ["aíochta", "íocht", "ire", "aire", "abh", "eamh", "aibh",
           "imh", "irí", "óideacha", "patacha", "achta", "arcachta",
           "eachta", "grafaíochta", "paite", "ach", "each",
           "óideach", "gineach", "patach", "grafaíoch", "pataigh",
           "óidigh", "achtúil", "gineas", "ginis", "acht",
           "arcacht", "grafaíochtaí", "imid", "aimid", "ímid",
           "adh", "eadh", "faidh", "fidh", "áil", "ain", "tear",
           "tar", ""]
    pfx = ["bhf", "bh", "bp", "ch", "d'fh", "d'", "dh", "dt", "fh",
           "gc", "gh", "h-", "m'", "mb", "mh", "n-", "nd", "ng",
           "ph", "sh", "t-", "th", "ts", "b'", ""]
    words = ["siopadóireacht", "síceapatacha", "fearr", "athair"]
    for _ in range(600):
        base = "".join(random.choice(alphabet)
                       for _ in range(random.randint(0, 7)))
        words.append(random.choice(pfx) + base + random.choice(sfx))
    words = sorted(set(w for w in words if w))
    sql = f"""
WITH rkept AS (SELECT row_number() OVER () AS doc_id, t0
               FROM (SELECT unnest(?) AS t0)),
{oracle._ga_stem_ctes()}
SELECT term FROM rterms ORDER BY doc_id
"""
    got = [r[0] for r in duckdb.connect().execute(sql, [words]).fetchall()]
    assert got == [irish_stem(w) for w in words]


def test_batch_call_parity():
    a = IrishAnalyzer()
    texts = ["b'fhearr m'athair nAthair", "n-athair said an triúr",
             "siopadóireacht síceapatacha the merge"]
    nl, flat, doc_of, pos = a.analyze_flat(texts)
    toks = flat.to_pylist()
    per_doc = [[] for _ in texts]
    for t, d in zip(toks, doc_of.tolist()):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
    assert nl.tolist() == [len(a(t)) for t in texts]
