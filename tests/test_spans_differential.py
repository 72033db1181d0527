"""Randomized span-near differential (SURVEY §5 random strategy): the
engine's NearSpansOrdered / NearSpansUnordered walks
(lucene_kmp_ray/search/spans.py) must agree with an exhaustive
enumeration of occurrence-position combinations on WHICH DOCS MATCH.

Brute semantics (single-token sub-spans, distinct terms):
- ordered: ∃ positions p1 < p2 < ... (one per term, in clause order)
  with total gap Σ(p_i − p_{i−1} − 1) ≤ slop;
- unordered: ∃ one position per term with
  (max+1 − min) − n_terms ≤ slop;
- first(end): ∃ occurrence with position + 1 ≤ end;
- not: an include match whose span overlaps no exclude occurrence.
"""

from itertools import product

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_kmp_ray.analysis import tokenize

VOCAB = ["t1", "t2", "t3", "t4", "x", "y"]


@pytest.fixture(scope="module")
def env(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import Searcher

    rng = np.random.default_rng(7)
    vocab = np.array(VOCAB, dtype=object)
    texts = [" ".join(vocab[rng.integers(0, len(vocab),
                                         int(rng.integers(1, 25)))])
             for _ in range(200)]
    idx = str(tmp_path_factory.mktemp("idx") / "spans")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "text": pa.array(texts)}))
    build_index(ds, idx, segment_size=64)
    pos = [{t: [i for i, w in enumerate(tokenize(txt)) if w == t]
            for t in VOCAB} for txt in texts]
    return Searcher(IndexReader(idx)), pos


def _ordered_match(poslists, slop):
    # width check needs the actual gaps — enumerate fully (docs ≤ 25 toks)
    for combo in product(*poslists):
        if all(combo[i] > combo[i - 1] for i in range(1, len(combo))):
            gaps = sum(combo[i] - combo[i - 1] - 1
                       for i in range(1, len(combo)))
            if gaps <= slop:
                return True
    return False


def _unordered_match(poslists, slop):
    for combo in product(*poslists):
        if len(set(combo)) == len(combo):
            width = (max(combo) + 1 - min(combo)) - len(combo)
            if width <= slop:
                return True
    return False


distinct_terms = st.lists(st.sampled_from(["t1", "t2", "t3", "t4"]),
                          min_size=2, max_size=3, unique=True)


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(distinct_terms, st.integers(0, 5), st.booleans())
def test_span_near_duel(env, ts, slop, in_order):
    from lucene_kmp_ray.search.spans import SpanNearQuery, SpanTermQuery
    searcher, pos = env
    q = SpanNearQuery(tuple(SpanTermQuery(t) for t in ts), slop=slop,
                      in_order=in_order)
    got = {h.doc_id for h in searcher.search(q, k=100_000).score_docs}
    brute = _ordered_match if in_order else _unordered_match
    want = {i for i, p in enumerate(pos)
            if all(p[t] for t in ts) and brute([p[t] for t in ts], slop)}
    assert got == want, (ts, slop, in_order)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.sampled_from(["t1", "t2", "t3", "t4"]), st.integers(1, 8))
def test_span_first_duel(env, t, end):
    from lucene_kmp_ray.search.spans import SpanFirstQuery, SpanTermQuery
    searcher, pos = env
    q = SpanFirstQuery(SpanTermQuery(t), end=end)
    got = {h.doc_id for h in searcher.search(q, k=100_000).score_docs}
    want = {i for i, p in enumerate(pos)
            if any(pp + 1 <= end for pp in p[t])}
    assert got == want, (t, end)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.sampled_from(["t1", "t2"]), st.sampled_from(["t3", "t4", "x"]))
def test_span_not_duel(env, inc, exc):
    # single-token spans: include survives iff its position has no
    # exclude occurrence AT the same position (overlap of width-1 spans)
    from lucene_kmp_ray.search.spans import (SpanNotQuery, SpanTermQuery)
    searcher, pos = env
    q = SpanNotQuery(SpanTermQuery(inc), SpanTermQuery(exc))
    got = {h.doc_id for h in searcher.search(q, k=100_000).score_docs}
    want = {i for i, p in enumerate(pos)
            if any(pp not in p[exc] for pp in p[inc])}
    assert got == want, (inc, exc)
