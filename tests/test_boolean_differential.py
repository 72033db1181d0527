"""Randomized boolean-tree differential: the engine's match set for an
arbitrary MUST/SHOULD/MUST_NOT/FILTER tree must equal a brute-force
set evaluation over the tokenized corpus (TestBooleanQuery-style
oracle, SURVEY §5), including minimum_should_match semantics."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_kmp_ray.analysis import tokenize
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import BooleanQuery, Occur, Searcher, TermQuery

VOCAB = ["spark", "join", "window", "the", "scan", "batch", "big",
         "order", "shuffle", "zzz_missing"]


@pytest.fixture(scope="module")
def env(built_index, corpus_texts):
    toks = [set(tokenize(t)) for t in corpus_texts]
    return Searcher(IndexReader(built_index)), toks


terms = st.sampled_from(VOCAB)
occurs = st.sampled_from([Occur.MUST, Occur.SHOULD, Occur.MUST_NOT,
                          Occur.FILTER])
clauses = st.lists(st.tuples(occurs, terms), min_size=1, max_size=5)


def _brute(toks, cl, msm):
    musts = [t for o, t in cl if o in (Occur.MUST, Occur.FILTER)]
    shoulds = [t for o, t in cl if o == Occur.SHOULD]
    nots = [t for o, t in cl if o == Occur.MUST_NOT]
    if msm > len(shoulds):
        return set()  # Lucene rewrites msm > #optional to MatchNoDocsQuery
    out = set()
    has_positive = bool(musts) or bool(shoulds)
    for i, tk in enumerate(toks):
        if any(t in tk for t in nots):
            continue
        if any(t not in tk for t in musts):
            continue
        n_should = sum(1 for t in shoulds if t in tk)
        need = msm if msm else (1 if (shoulds and not musts) else 0)
        if shoulds and n_should < need:
            continue
        if not has_positive:
            continue  # pure-negative query matches nothing (Lucene)
        out.add(i)
    return out


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(clauses, st.integers(min_value=0, max_value=3))
def test_boolean_tree_matches_brute(env, cl, msm):
    searcher, toks = env
    q = BooleanQuery.build(*[(o, TermQuery(t)) for o, t in cl])
    if msm:
        q = BooleanQuery(q.clauses, minimum_should_match=msm)
    td = searcher.search(q, k=10_000)
    got = {h.doc_id for h in td.score_docs}
    want = _brute(toks, cl, msm)
    assert got == want, (cl, msm)
    assert td.total_hits == len(want)
