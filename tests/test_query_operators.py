"""Multi-term / synonym / dismax / range-filter operators + query parser.

Brute-force oracles over the raw corpus texts (TestBooleanQuery /
BaseSimilarityTestCase assertion style, SURVEY §5)."""

from collections import Counter

import numpy as np
import pytest

from lucene_kmp_ray.analysis import tokenize
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import (BooleanQuery, BoostQuery,
                                   DisjunctionMaxQuery, FuzzyQuery, Occur,
                                   PhraseQuery, PrefixQuery, RangeFilterQuery,
                                   RegexpQuery, Searcher, SynonymQuery,
                                   TermInSetQuery, TermQuery, TermRangeQuery,
                                   WildcardQuery, parse_query)
from lucene_kmp_ray.search.query import _edit_distance_le


@pytest.fixture(scope="module")
def searcher(built_index):
    return Searcher(IndexReader(built_index))


@pytest.fixture(scope="module")
def toks(corpus_texts):
    return [tokenize(t) for t in corpus_texts]


def _docs_of(td):
    return sorted(h.doc_id for h in td.score_docs)


# ---------------------------------------------------------------- multiterm
def test_prefix_query(searcher, toks):
    exp = sorted(i for i, t in enumerate(toks)
                 if any(w.startswith("sp") for w in t))
    td = searcher.search(PrefixQuery("sp"), k=10_000)
    assert td.total_hits == len(exp) and _docs_of(td) == exp
    assert all(h.score == 1.0 for h in td.score_docs)  # constant score


def test_wildcard_query(searcher, toks):
    import fnmatch
    pat = "s*k"
    exp = sorted(i for i, t in enumerate(toks)
                 if any(fnmatch.fnmatchcase(w, pat) for w in t))
    td = searcher.search(WildcardQuery(pat), k=10_000)
    assert _docs_of(td) == exp


def test_regexp_query(searcher, toks):
    import re
    rx = re.compile("jo.n|wind.*")
    exp = sorted(i for i, t in enumerate(toks)
                 if any(rx.fullmatch(w) for w in t))
    td = searcher.search(RegexpQuery("jo.n|wind.*"), k=10_000)
    assert _docs_of(td) == exp


def test_term_range_query(searcher, toks):
    exp = sorted(i for i, t in enumerate(toks)
                 if any("order" <= w <= "spark" for w in t))
    td = searcher.search(TermRangeQuery("order", "spark"), k=10_000)
    assert _docs_of(td) == exp
    # exclusive bounds
    exp2 = sorted(i for i, t in enumerate(toks)
                  if any("order" < w < "spark" for w in t))
    td2 = searcher.search(
        TermRangeQuery("order", "spark", include_lower=False,
                       include_upper=False), k=10_000)
    assert _docs_of(td2) == exp2


def test_term_in_set_query(searcher, toks):
    terms = ("spark", "window", "zzz")
    exp = sorted(i for i, t in enumerate(toks)
                 if any(w in terms for w in t))
    td = searcher.search(TermInSetQuery(terms), k=10_000)
    assert _docs_of(td) == exp


def test_fuzzy_query(searcher, toks):
    # vocabulary distance-1 neighbours of 'scan' (e.g. 'scan' itself + any)
    vocab = sorted({w for t in toks for w in t})
    match = {w for w in vocab if _edit_distance_le("scan", w, 1)}
    exp = sorted(i for i, t in enumerate(toks) if any(w in match for w in t))
    td = searcher.search(FuzzyQuery("scan", max_edits=1), k=10_000)
    assert _docs_of(td) == exp


def test_edit_distance_kernel():
    assert _edit_distance_le("spark", "spark", 0)
    assert _edit_distance_le("spark", "sparks", 1)
    assert _edit_distance_le("spark", "spork", 1)
    assert not _edit_distance_le("spark", "sprk", 0)
    assert _edit_distance_le("spark", "sprk", 1)
    assert not _edit_distance_le("spark", "ok", 2)


# ------------------------------------------------------------------ synonym
def test_synonym_query_freq_sum_and_blended_df(searcher, toks):
    """SynonymQuery('spark','join') ≡ one pseudo-term with freq summed and
    df = max of the two dfs (SynonymQuery.kt:182-202)."""
    from lucene_kmp_ray.similarity.bm25 import BM25Similarity
    from lucene_kmp_ray.util.smallfloat import int_to_byte4_np
    tfs = [Counter(t) for t in toks]
    lens = np.array([len(t) for t in toks])
    norms = int_to_byte4_np(lens)
    df_a = sum(1 for c in tfs if "spark" in c)
    df_b = sum(1 for c in tfs if "join" in c)
    docs = [i for i, c in enumerate(tfs) if "spark" in c or "join" in c]
    freqs = np.array([tfs[i]["spark"] + tfs[i]["join"] for i in docs])
    sc = BM25Similarity().scorer(1.0, len(toks), int(lens.sum()),
                                 [max(df_a, df_b)])
    scores = sc.score(freqs, norms[np.array(docs)])
    order = np.lexsort((np.array(docs), -scores.astype(np.float64)))[:10]
    exp = [(int(np.array(docs)[i]), float(scores[i])) for i in order]

    td = searcher.search(SynonymQuery(("spark", "join")), k=10)
    assert td.total_hits == len(docs)
    assert [(h.doc_id, h.score) for h in td.score_docs] == exp


# ------------------------------------------------------------------- dismax
def test_dismax_max_and_tiebreak(searcher):
    qa, qb = TermQuery("spark"), TermQuery("join")
    a = {h.doc_id: h.score
         for h in searcher.search(qa, k=10_000).score_docs}
    b = {h.doc_id: h.score
         for h in searcher.search(qb, k=10_000).score_docs}
    for tb in (0.0, 0.3):
        exp = {}
        for d in set(a) | set(b):
            s = sorted(filter(None, [a.get(d), b.get(d)]), reverse=True)
            exp[d] = np.float32(s[0] + tb * sum(s[1:]))
        td = searcher.search(DisjunctionMaxQuery((qa, qb), tb), k=10_000)
        got = {h.doc_id: np.float32(h.score) for h in td.score_docs}
        assert set(got) == set(exp)
        for d in got:
            assert got[d] == pytest.approx(float(exp[d]), rel=1e-6)


# ------------------------------------------------------------- range filter
def test_range_filter_with_scoring_clause(searcher, toks):
    """FILTER(length range) ∧ MUST(term): filter restricts, score unchanged
    (TestBooleanQuery.kt:497 filter-does-not-affect-score)."""
    lens = np.array([len(t) for t in toks])
    lo, hi = 40, 60
    base = {h.doc_id: h.score
            for h in searcher.search(TermQuery("spark"), k=10_000).score_docs}
    exp = {d: s for d, s in base.items() if lo <= lens[d] <= hi}
    q = BooleanQuery.build(
        (Occur.MUST, TermQuery("spark")),
        (Occur.FILTER, RangeFilterQuery("length", lo, hi)))
    td = searcher.search(q, k=10_000)
    got = {h.doc_id: h.score for h in td.score_docs}
    assert got == exp


# ------------------------------------------------------------------- parser
def test_parser_terms_and_bool():
    q = parse_query("spark AND join")
    assert q == BooleanQuery.build((Occur.MUST, TermQuery("spark")),
                                   (Occur.MUST, TermQuery("join")))
    q = parse_query("spark join")
    assert q == BooleanQuery.build((Occur.SHOULD, TermQuery("spark")),
                                   (Occur.SHOULD, TermQuery("join")))
    q = parse_query("+spark -join window")
    assert q == BooleanQuery.build((Occur.MUST, TermQuery("spark")),
                                   (Occur.MUST_NOT, TermQuery("join")),
                                   (Occur.SHOULD, TermQuery("window")))
    assert parse_query("Spark") == TermQuery("spark")  # analyzed


def test_parser_phrase_range_wild_fuzzy_boost():
    assert parse_query('"big order scan"') == \
        PhraseQuery(("big", "order", "scan"))
    assert parse_query("spar*") == PrefixQuery("spar")
    assert parse_query("s?ark") == WildcardQuery("s?ark")
    assert parse_query("spark~1") == FuzzyQuery("spark", max_edits=1)
    assert parse_query("spark~") == FuzzyQuery("spark", max_edits=2)
    assert parse_query("[batch TO data]") == TermRangeQuery("batch", "data")
    assert parse_query("{batch TO data}") == \
        TermRangeQuery("batch", "data", False, False)
    assert parse_query("spark^2.5") == BoostQuery(TermQuery("spark"), 2.5)
    assert parse_query("title:spark") == TermQuery("spark")  # field ignored


def test_parser_groups():
    q = parse_query("(spark OR data) AND join")
    inner = BooleanQuery.build((Occur.SHOULD, TermQuery("spark")),
                               (Occur.SHOULD, TermQuery("data")))
    assert q == BooleanQuery.build((Occur.MUST, inner),
                                   (Occur.MUST, TermQuery("join")))


def test_parser_end_to_end(searcher):
    td1 = searcher.search(parse_query("spark AND join"), k=10)
    td2 = searcher.search(
        BooleanQuery.build((Occur.MUST, TermQuery("spark")),
                           (Occur.MUST, TermQuery("join"))), k=10)
    assert [(h.doc_id, h.score) for h in td1.score_docs] == \
        [(h.doc_id, h.score) for h in td2.score_docs]
