"""QueryRescorer (search/QueryRescorer.kt role): two-pass rescoring
semantics against brute recomputation over the first-pass hits."""

import numpy as np
import pytest

from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import Searcher, TermQuery
from lucene_kmp_ray.similarity.bm25 import BM25Similarity


@pytest.fixture(scope="module")
def searcher(built_index):
    return Searcher(IndexReader(built_index),
                    BM25Similarity(dtype="float64"))


def _scores(searcher, q, k=100000):
    return {h.doc_id: h.score
            for h in searcher.search(q, k=k).score_docs}


def test_rescore_combines_first_plus_weighted_second(searcher):
    first = searcher.search(TermQuery("spark"), k=50)
    td = searcher.rescore(first, TermQuery("the"), weight=2.0, top_n=10)
    s2 = _scores(searcher, TermQuery("the"))
    want = sorted(
        ((h.score + 2.0 * s2.get(h.doc_id, 0.0), h.doc_id)
         for h in first.score_docs),
        key=lambda t: (-t[0], t[1]))[:10]
    got = [(h.score, h.doc_id) for h in td.score_docs]
    assert [d for _, d in got] == [d for _, d in want]
    np.testing.assert_allclose([s for s, _ in got], [s for s, _ in want],
                               rtol=0, atol=0)
    # first-pass totalHits preserved (QueryRescorer returns the original
    # TotalHits with re-sorted hits)
    assert td.total_hits == first.total_hits


def test_rescore_nonmatching_second_is_identity_reorder(searcher):
    first = searcher.search(TermQuery("spark"), k=20)
    td = searcher.rescore(first, TermQuery("zzz_nope"), weight=5.0,
                          top_n=20)
    assert [(h.doc_id, h.score) for h in td.score_docs] == \
        [(h.doc_id, h.score) for h in first.score_docs]


def test_rescore_with_spans_reference_vector(ray_session, tmp_path):
    """TestQueryRescorerWithSpans.kt testBasic: boolean(wizard OR oz)
    ranks doc 0 first; rescoring with SpanNear(wizard, oz, slop=0,
    ordered) weight 2.0 flips the order — doc 1 has the adjacent pair,
    doc 0's gap of 5 gets no span match."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.search import BooleanQuery, Occur
    from lucene_kmp_ray.search.spans import SpanNearQuery, SpanTermQuery

    idx = str(tmp_path / "wiz")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "url": pa.array(["u0", "u1"]),
        "text": pa.array(["wizard the the the the the oz",
                          "wizard oz the the the the the the"])}))
    build_index(ds, idx, segment_size=10)
    s = Searcher(IndexReader(idx), BM25Similarity(dtype="float64"))
    bq = BooleanQuery.build(
        (Occur.SHOULD, TermQuery("wizard")),
        (Occur.SHOULD, TermQuery("oz")))
    first = s.search(bq, k=10)
    assert first.total_hits == 2
    snq = SpanNearQuery((SpanTermQuery("wizard"), SpanTermQuery("oz")),
                        slop=0, in_order=True)
    td = s.rescore(first, snq, weight=2.0, top_n=10)
    assert td.total_hits == 2
    assert [h.doc_id for h in td.score_docs] == [1, 0]


def test_rescore_can_promote_lower_first_pass_hits(searcher):
    # with a large weight the second query dominates the final order
    first = searcher.search(TermQuery("spark"), k=50)
    td = searcher.rescore(first, TermQuery("join"), weight=100.0,
                          top_n=10)
    s2 = _scores(searcher, TermQuery("join"))
    assert all(s2.get(h.doc_id, 0.0) > 0 for h in td.score_docs[:3])


def test_sort_rescorer_reorders_keeping_scores(searcher):
    """SortRescorer.kt: hits re-sorted by the Sort, original first-pass
    scores preserved on the re-sorted docs (kt:77-84)."""
    from lucene_kmp_ray.search.ray_search import SortField
    first = searcher.search(TermQuery("spark"), k=30)
    td = searcher.rescore_by_sort(
        first, (SortField("length", descending=True),), top_n=10)
    lens = {h.doc_id: int(searcher.reader.segment_readers[h.seg]
                          .doc_meta["length"][h.doc].as_py())
            for h in first.score_docs}
    want = sorted(first.score_docs,
                  key=lambda h: (-lens[h.doc_id], h.doc_id))[:10]
    assert [(h.doc_id, h.score) for h in td.score_docs] == \
        [(h.doc_id, h.score) for h in want]
    assert td.total_hits == first.total_hits


def test_sort_rescorer_multi_key_and_ascending(searcher):
    from lucene_kmp_ray.search.ray_search import SortField
    first = searcher.search(TermQuery("the"), k=40)
    td = searcher.rescore_by_sort(
        first, (SortField("max_tf", descending=True),
                SortField("length", descending=False)), top_n=15)
    meta = {}
    for h in first.score_docs:
        dm = searcher.reader.segment_readers[h.seg].doc_meta
        meta[h.doc_id] = (int(dm["max_tf"][h.doc].as_py()),
                          int(dm["length"][h.doc].as_py()))
    want = sorted(first.score_docs,
                  key=lambda h: (-meta[h.doc_id][0], meta[h.doc_id][1],
                                 h.doc_id))[:15]
    assert [h.doc_id for h in td.score_docs] == [h.doc_id for h in want]


def test_sort_rescorer_empty_first_pass(searcher):
    from lucene_kmp_ray.search.ray_search import SortField
    first = searcher.search(TermQuery("zzznotaterm"), k=10)
    td = searcher.rescore_by_sort(
        first, (SortField("length", descending=True),), top_n=10)
    assert td.score_docs == [] or td.score_docs == first.score_docs
