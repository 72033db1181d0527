"""LRUQueryCache + UsageTrackingQueryCachingPolicy analogs
(search/querycache.py): policy thresholds, ring history, LRU eviction,
and cached-filter end-to-end identity with caching disabled."""

import numpy as np
import pytest

from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import (BooleanQuery, FieldExistsQuery,
                                   MatchAllDocsQuery, Occur, PrefixQuery,
                                   Searcher, TermQuery)
from lucene_kmp_ray.search.querycache import (LRUQueryCache,
                                              UsageTrackingQueryCachingPolicy)


def test_policy_costly_cached_on_second_use():
    p = UsageTrackingQueryCachingPolicy()
    q = PrefixQuery("spa")  # MultiTermQuery → costly → min freq 2
    assert not p.should_cache(q)
    p.on_use(q)
    assert not p.should_cache(q)
    p.on_use(q)
    assert p.should_cache(q)


def test_policy_cheap_needs_five_compound_four():
    p = UsageTrackingQueryCachingPolicy()
    phrase_like = BooleanQuery.build((Occur.MUST, TermQuery("a")),
                                     (Occur.MUST, TermQuery("b")))
    for _ in range(3):
        p.on_use(phrase_like)
    assert not p.should_cache(phrase_like)  # compound → 4
    p.on_use(phrase_like)
    assert p.should_cache(phrase_like)

    from lucene_kmp_ray.search.spans import SpanFirstQuery, SpanTermQuery
    cheap = SpanFirstQuery(SpanTermQuery("a"), end=3)  # neither costly
    for _ in range(4):                                 # nor compound → 5
        p.on_use(cheap)
    assert not p.should_cache(cheap)
    p.on_use(cheap)
    assert p.should_cache(cheap)


def test_policy_never_caches_plenty_fast_queries():
    p = UsageTrackingQueryCachingPolicy()
    for q in (TermQuery("x"), FieldExistsQuery("text"),
              MatchAllDocsQuery()):
        for _ in range(10):
            p.on_use(q)
        assert not p.should_cache(q)
        assert p.frequency(q) == 0  # never even tracked


def test_policy_ring_history_evicts():
    p = UsageTrackingQueryCachingPolicy(history_size=4)
    q = PrefixQuery("a")
    p.on_use(q)
    p.on_use(q)
    assert p.should_cache(q)
    for i in range(4):  # 4 other queries push q out of the ring
        p.on_use(PrefixQuery(f"z{i}"))
    assert p.frequency(q) == 0
    assert not p.should_cache(q)


def test_lru_eviction_is_per_query():
    c = LRUQueryCache(max_queries=2, min_segment_docs=0)
    a, b, d = PrefixQuery("a"), PrefixQuery("b"), PrefixQuery("d")
    c.put(a, 0, np.array([1]))
    c.put(a, 1, np.array([2]))
    c.put(b, 0, np.array([3]))
    c.put(d, 0, np.array([4]))  # evicts a with BOTH its segments
    assert c.get(a, 0) is None and c.get(a, 1) is None
    assert c.get(b, 0) is not None and c.get(d, 0) is not None
    assert c.cached_query_count == 2


def test_cached_filter_end_to_end_identity(built_index):
    reader = IndexReader(built_index)
    cache = LRUQueryCache(min_segment_docs=0)  # test segments are tiny
    pol = UsageTrackingQueryCachingPolicy()
    s = Searcher(reader, query_cache=cache, query_caching_policy=pol)
    s_off = Searcher(reader, query_cache=False)
    # NOTE: a FILTER RangeFilterQuery next to a MUST takes the deferred
    # verify-at-candidates path (the IndexOrDocValuesQuery planner) and
    # deliberately bypasses the cache — the skipCacheFactor spirit; a
    # prefix expansion is the cacheable whole-segment filter shape
    q = BooleanQuery.build(
        (Occur.MUST, TermQuery("spark")),
        (Occur.FILTER, PrefixQuery("win")))

    runs = []
    for _ in range(6):
        td = s.search(q, k=100)
        runs.append([(h.doc_id, h.score) for h in td.score_docs])
    assert all(r == runs[0] for r in runs)
    off = [(h.doc_id, h.score)
           for h in s_off.search(q, k=100).score_docs]
    assert runs[0] == off
    # PrefixQuery is costly → cached from its 2nd use on; later
    # searches must HIT (one get per segment per search)
    assert cache.hit_count > 0
    assert cache.cached_query_count >= 1
    # cached arrays are frozen
    for segs in cache._by_query.values():
        for arr in segs.values():
            assert not arr.flags.writeable


def test_must_not_goes_through_cache(built_index):
    reader = IndexReader(built_index)
    cache = LRUQueryCache(min_segment_docs=0)
    s = Searcher(reader, query_cache=cache)
    q = BooleanQuery.build(
        (Occur.MUST, TermQuery("spark")),
        (Occur.MUST_NOT, PrefixQuery("win")))
    base = [(h.doc_id, h.score)
            for h in Searcher(reader, query_cache=False)
            .search(q, k=100).score_docs]
    for _ in range(3):
        got = [(h.doc_id, h.score) for h in s.search(q, k=100).score_docs]
        assert got == base
    assert cache.hit_count > 0


def test_small_leaves_skip_cache(built_index):
    reader = IndexReader(built_index)
    cache = LRUQueryCache(min_segment_docs=10_000)  # Lucene default
    s = Searcher(reader, query_cache=cache)
    q = BooleanQuery.build(
        (Occur.MUST, TermQuery("spark")),
        (Occur.FILTER, PrefixQuery("win")))
    for _ in range(6):
        s.search(q, k=10)
    assert cache.hit_count == 0 and cache.cached_query_count == 0
