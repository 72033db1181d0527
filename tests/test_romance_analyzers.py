"""Spanish / Italian / Portuguese light-stemmer + analyzer conformance
(reference vectors from Test{Spanish,Italian,Portuguese}Analyzer.kt and
TestPortugueseLightStemFilter.kt), plus engine↔SQL-oracle parity."""

import duckdb
import pyarrow as pa
import pytest

from lucene_kmp_ray.analysis.romance import (ItalianAnalyzer,
                                             PortugueseAnalyzer,
                                             SpanishAnalyzer,
                                             italian_light_stem,
                                             portuguese_light_stem,
                                             spanish_light_stem)

PT_VECTORS = [
    # TestPortugueseLightStemFilter.kt:87-106 + analyzer vector
    ("doutores", "doutor"), ("doutor", "doutor"),
    ("homens", "homem"), ("homem", "homem"),
    ("papéis", "papel"), ("papel", "papel"),
    ("normais", "normal"), ("normal", "normal"),
    ("lencóis", "lencol"), ("lencol", "lencol"),
    ("barris", "barril"), ("barril", "barril"),
    ("botões", "bota"), ("botão", "bota"),
    ("quilométricas", "quilometric"),
]


@pytest.mark.parametrize("w,want", PT_VECTORS)
def test_portuguese_vectors(w, want):
    assert portuguese_light_stem(w) == want


def test_spanish_vectors():
    assert spanish_light_stem("chicana") == "chican"
    assert spanish_light_stem("chicano") == "chican"
    assert spanish_light_stem("veces") == "vez"  # the ces→z rewrite


def test_italian_vectors():
    assert italian_light_stem("abbandonata") == "abbandonat"
    assert italian_light_stem("abbandonati") == "abbandonat"


def test_stopwords_and_elision():
    assert SpanishAnalyzer()("los chicanos") == ["chican"]
    it = ItalianAnalyzer()
    assert it("dallo") == []
    assert it("dell'Italia") == ["ital"]
    assert it("l'Italiano") == ["italian"]


@pytest.mark.parametrize("cls", [SpanishAnalyzer, ItalianAnalyzer,
                                 PortugueseAnalyzer])
def test_analyze_flat_matches_call(cls):
    ana = cls()
    texts = ["dell'Italia è bella", "los chicanos cantan botões",
             "", "as capoeiras doutores normais"]
    dl, flat, doc, pos = ana.analyze_flat(pa.array(texts, pa.string()))
    toks = flat.to_pylist()
    for i, t in enumerate(texts):
        assert [tok for tok, d in zip(toks, doc) if d == i] == ana(t)
    assert dl.tolist() == [len(ana(t)) for t in texts]


@pytest.mark.parametrize("lang,cls", [("spanish", SpanishAnalyzer),
                                      ("italian", ItalianAnalyzer),
                                      ("portuguese", PortugueseAnalyzer)])
def test_sql_oracle_parity(lang, cls):
    """The SQL stem cascade must agree with the engine stemmer on every
    (doc, term) of the sf0.001 corpus — the same property the driver
    hash-checks at sf0.01."""
    import collections

    from lucene_kmp_ray import oracle
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    sql = oracle.romance_preamble(lang) + \
        "SELECT doc_id, term, count(*) c FROM rterms GROUP BY ALL"
    ora = {(r.doc_id, r.term): r.c
           for r in con.execute(sql).fetchdf().itertuples()}
    t = con.execute(oracle.CORPUS_SQL).fetch_arrow_table()
    ids = t["doc_id"].to_pylist()
    ana = cls()
    dl, flat, doc, pos = ana.analyze_flat(t["text"].combine_chunks())
    eng = collections.Counter()
    for tok, d in zip(flat.to_pylist(), doc):
        eng[(ids[d], tok)] += 1
    assert dict(eng) == ora
