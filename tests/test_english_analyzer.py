"""Porter stemmer + EnglishAnalyzer chain + English-analyzed index build.

Stemmer vectors come from the published algorithm's own examples (Porter
1980 §§2-6); chain semantics mirror EnglishAnalyzer (possessive strip →
stop removal with position gaps → Porter)."""

import numpy as np
import pytest

from lucene_kmp_ray.analysis.porter import porter_stem
from lucene_kmp_ray.analysis.standard import (ENGLISH_STOP_WORDS,
                                              EnglishAnalyzer,
                                              StandardAnalyzer)

VECTORS = {
    # step 1
    "caresses": "caress", "ponies": "poni", "cats": "cat", "feed": "feed",
    "agreed": "agre", "plastered": "plaster", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "sized": "size",
    "hopping": "hop", "tanned": "tan", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    # step 2 (incl. the bli/logi additions Lucene ships)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "analogousli": "analog",
    "vietnamization": "vietnam", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "formaliti": "formal",
    "sensibiliti": "sensibl", "archaeologi": "archaeolog",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "adjustable": "adjust", "defensible": "defens",
    "replacement": "replac", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # short words unchanged
    "at": "at", "by": "by", "ax": "ax",
}


def test_porter_vectors():
    bad = {w: (porter_stem(w), e) for w, e in VECTORS.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_english_chain_per_text():
    a = EnglishAnalyzer()
    assert a("The operators' queries are running") == \
        ["oper", "queri", "run"]
    assert a("John's table") == ["john", "tabl"]
    assert a("the a of and") == []
    assert "the" in ENGLISH_STOP_WORDS


def test_english_analyze_flat_matches_per_text():
    a = EnglishAnalyzer()
    texts = ["The operators' queries are running fast",
             "", "the the the", "merge tables quickly, John’s orders"]
    nl, flat, doc_of, positions = a.analyze_flat(texts)
    toks = flat.to_pylist()
    per_doc = [[] for _ in texts]
    for t, d in zip(toks, doc_of):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
    assert nl.tolist() == [len(a(t)) for t in texts]
    # positions keep original indices (stop removal leaves gaps):
    # doc 0 tokens: the(0) operators'(1) queries(2) are(3) running(4) fast(5)
    d0 = positions[np.asarray(doc_of) == 0].tolist()
    assert d0 == [1, 2, 4, 5]


def test_english_index_build_and_search(tmp_path, ray_session):
    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import Searcher, TermQuery
    from lucene_kmp_ray.sources.corpus import corpus_dataset

    idx = str(tmp_path / "en_idx")
    man = build_index(corpus_dataset("/root/testdata/sf0.001"), idx,
                      segment_size=100, analyzer=EnglishAnalyzer())
    assert man["analyzer"] == "english"
    s = Searcher(IndexReader(idx))
    # stop words are not indexed
    assert s.search(TermQuery("the"), k=1).total_hits == 0
    # stemmed forms are ('query' → 'queri', 'merge' → 'merg')
    assert s.search(TermQuery("queri"), k=1).total_hits > 0
    assert s.search(TermQuery("query"), k=1).total_hits == 0
    assert s.search(TermQuery("merg"), k=1).total_hits > 0
    # norms count only indexed tokens: sum_ttf < standard build's
    from lucene_kmp_ray.sources.corpus import corpus_table
    from lucene_kmp_ray.analysis import tokenize
    texts = corpus_table("/root/testdata/sf0.001")["text"].to_pylist()
    total_std = sum(len(tokenize(t)) for t in texts)
    assert man["sum_total_term_freq"] < total_std
    ea = EnglishAnalyzer()
    assert man["sum_total_term_freq"] == sum(len(ea(t)) for t in texts)


def test_parser_with_english_analyzer():
    from lucene_kmp_ray.search import BooleanQuery, Occur, TermQuery, parse_query
    a = EnglishAnalyzer()
    assert parse_query("Queries", analyzer=a) == TermQuery("queri")
    q = parse_query("running AND merges", analyzer=a)
    assert q == BooleanQuery.build((Occur.MUST, TermQuery("run")),
                                   (Occur.MUST, TermQuery("merg")))
    # stopword-only clause drops out entirely
    assert parse_query("the running", analyzer=a) == TermQuery("run")


def test_ngram_analyzer_batch_matches_per_text():
    from lucene_kmp_ray.analysis.standard import NGramAnalyzer
    a = NGramAnalyzer(2, 3)
    texts = ["Spark joins fast", "", "ab c big-table"]
    nl, flat, doc_of, pos = a.analyze_flat(texts)
    per_doc = [[] for _ in texts]
    for t, d in zip(flat.to_pylist(), doc_of):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
    assert nl.tolist() == [len(a(t)) for t in texts]
    # grams of one word share the word position
    assert a("spark") == ["sp", "pa", "ar", "rk", "spa", "par", "ark"]
    assert NGramAnalyzer(2, 4)("ab") == ["ab"]


def test_ngram_index_substring_search(tmp_path, ray_session):
    from lucene_kmp_ray.analysis.standard import NGramAnalyzer
    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import Searcher, TermQuery
    from lucene_kmp_ray.sources.corpus import corpus_dataset

    idx = str(tmp_path / "ngram_idx")
    man = build_index(corpus_dataset("/root/testdata/sf0.001"), idx,
                      segment_size=250, analyzer=NGramAnalyzer(3, 3))
    assert man["analyzer"] == "ngram_3_3"
    s = Searcher(IndexReader(idx))
    # 'par' occurs only inside 'spark' / 'part' in the corpus vocabulary
    td = s.search(TermQuery("par"), k=10)
    assert td.total_hits > 0
    # full words are not terms in a pure 3-gram index (len != 3)
    assert s.search(TermQuery("spark"), k=1).total_hits == 0


def test_per_field_analyzer_dict(ray_session, tmp_path):
    """PerFieldAnalyzerWrapper role: invert_segment/build accept a
    {field: analyzer} dict — title analyzed English (stemmed), text
    standard, each field queryable with its own analysis."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_kmp_ray.analysis.standard import (EnglishAnalyzer,
                                                  StandardAnalyzer)
    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import Searcher, TermQuery

    texts = ["running quickly", "the runner runs"]
    titles = ["running shoes", "jogging gear"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(2), pa.int64()),
        "url": pa.array(["u0", "u1"], pa.string()),
        "text": pa.array(texts, pa.string()),
        "title": pa.array(titles, pa.string())}))
    idx = str(tmp_path / "perfield")
    build_index(ds, idx, segment_size=100, fields=("text", "title"),
                analyzer={"text": StandardAnalyzer(),
                          "title": EnglishAnalyzer()})
    s = Searcher(IndexReader(idx))
    # text: unstemmed — "running" matches doc 0 only
    assert {h.doc_id for h in
            s.search(TermQuery("running"), k=10).score_docs} == {0}
    # title: Porter-stemmed — query-side stem "run" matches "running"
    ana = EnglishAnalyzer()
    (stem,) = ana("running")
    assert stem == "run"
    assert {h.doc_id for h in
            s.search(TermQuery(stem, "title"), k=10).score_docs} == {0}
