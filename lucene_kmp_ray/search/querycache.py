"""Filter-result caching — ``search/LRUQueryCache.kt`` +
``QueryCachingPolicy.kt`` + ``UsageTrackingQueryCachingPolicy.kt``
analogs.

Lucene caches the DocIdSet a filter produces per (query, leaf) once a
usage-tracking policy has seen the query often enough. Here the cached
artifact is the sorted local-docID ``np.ndarray`` a non-scoring
(FILTER / MUST_NOT) sub-query evaluation produces per segment —
read-only, keyed by the (hashable, frozen-dataclass) query itself.

Faithful knobs:
- history ring of the last 256 query hashes
  (``UsageTrackingQueryCachingPolicy.kt:16``);
- min frequency to cache: 2 for costly queries (multi-term expansions,
  point/range/spatial — ``isCostly`` at :115-124), 4 for compound
  Boolean/DisMax (:41-48), 5 otherwise;
- never cache TermQuery / FieldExistsQuery / MatchAll / MatchNo /
  empty compounds (``shouldNeverCache`` at :130-160);
- cache only segments of ≥ ``min_segment_docs`` docs (the
  ``minSegmentSizePredicate(10000)`` leaf predicate,
  ``LRUQueryCache.kt:82``) — tiny leaves re-evaluate faster than a
  cache round-trip;
- LRU over ``max_queries`` distinct queries (eviction drops ALL of a
  query's per-segment entries, like Lucene's per-query eviction).

Divergence, documented: Lucene tracks RAM bytes and a skipCacheFactor
for cost-asymmetric conjunctions; this analog bounds by query count
only (arrays here are small docID vectors, not bitsets).
"""

from __future__ import annotations

from collections import Counter, OrderedDict, deque

import numpy as np

from .query import (BooleanQuery, DisjunctionMaxQuery, FieldExistsQuery,
                    GeoBoxQuery, GeoDistanceQuery, GeoLineQuery,
                    GeoPolygonQuery, IndexSortRangeQuery,
                    MatchAllDocsQuery, MatchNoDocsQuery, MultiTermQuery,
                    PointInSetQuery, RangeFieldQuery, RangeFilterQuery,
                    TermQuery, XYBoxQuery, XYCircleQuery, XYLineQuery,
                    XYPolygonQuery)

_POINT_OR_SPATIAL = (RangeFilterQuery, IndexSortRangeQuery, PointInSetQuery,
                     RangeFieldQuery, GeoBoxQuery, GeoDistanceQuery,
                     GeoLineQuery, GeoPolygonQuery, XYBoxQuery,
                     XYCircleQuery, XYLineQuery, XYPolygonQuery)


def is_costly(query) -> bool:
    """``UsageTrackingQueryCachingPolicy.isCostly``: whole-index work to
    BUILD the doc set — multi-term expansions and point/spatial scans."""
    return isinstance(query, MultiTermQuery) or \
        isinstance(query, _POINT_OR_SPATIAL)


def should_never_cache(query) -> bool:
    if isinstance(query, (TermQuery, FieldExistsQuery, MatchAllDocsQuery,
                          MatchNoDocsQuery)):
        return True
    if isinstance(query, BooleanQuery) and not query.clauses:
        return True
    if isinstance(query, DisjunctionMaxQuery) and not query.disjuncts:
        return True
    return False


class UsageTrackingQueryCachingPolicy:
    """Ring-buffer usage tracker (hashes only, like the reference — rare
    hash collisions at worst cache a slightly-underused query)."""

    def __init__(self, history_size: int = 256):
        self._ring: deque = deque(maxlen=history_size)
        self._freq: Counter = Counter()

    def min_frequency_to_cache(self, query) -> int:
        if is_costly(query):
            return 2
        if isinstance(query, (BooleanQuery, DisjunctionMaxQuery)):
            return 4  # cache compounds earlier than their sub-clauses
        return 5

    def on_use(self, query) -> None:
        if should_never_cache(query):
            return
        h = hash(query)
        if len(self._ring) == self._ring.maxlen:
            old = self._ring[0]
            self._freq[old] -= 1
            if not self._freq[old]:
                del self._freq[old]
        self._ring.append(h)
        self._freq[h] += 1

    def frequency(self, query) -> int:
        return self._freq.get(hash(query), 0)

    def should_cache(self, query) -> bool:
        if should_never_cache(query):
            return False
        return self.frequency(query) >= self.min_frequency_to_cache(query)


class LRUQueryCache:
    """Per-(query, segment) cached filter doc arrays with per-QUERY LRU
    eviction and hit/miss counters (``LRUQueryCache.kt`` stats API)."""

    def __init__(self, max_queries: int = 1000,
                 min_segment_docs: int = 10_000):
        self.max_queries = max_queries
        self.min_segment_docs = min_segment_docs
        self._by_query: OrderedDict = OrderedDict()  # query -> {seg: docs}
        self.hit_count = 0
        self.miss_count = 0

    def leaf_cacheable(self, sr) -> bool:
        return sr.doc_count >= self.min_segment_docs

    def get(self, query, seg: int):
        segs = self._by_query.get(query)
        if segs is not None:
            self._by_query.move_to_end(query)
            docs = segs.get(seg)
            if docs is not None:
                self.hit_count += 1
                return docs
        self.miss_count += 1
        return None

    def put(self, query, seg: int, docs: np.ndarray) -> None:
        docs = np.asarray(docs)
        docs.setflags(write=False)
        segs = self._by_query.get(query)
        if segs is None:
            segs = self._by_query[query] = {}
        segs[seg] = docs
        self._by_query.move_to_end(query)
        while len(self._by_query) > self.max_queries:
            self._by_query.popitem(last=False)  # evict the whole query

    @property
    def cached_query_count(self) -> int:
        return len(self._by_query)
