"""DistanceFeatureQuery analogs — reference vectors.

ref: core/src/commonTest/.../document/TestLongDistanceFeatureQuery.kt
(testBasics: origin 10 → docs 12,8 at 3·5/7; origin 7 → doc 7 at 3·5/5
then 8 at 3·5/6) and TestLatLonPointDistanceFeatureQuery semantics
(score = weight · pivot/(pivot + haversine m)).
"""
import numpy as np
import pyarrow as pa
import pytest


def _index(tmp_path, **cols):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    n = len(next(iter(cols.values())))
    tbl = {"doc_id": pa.array(range(n), pa.int64()),
           "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
           "text": pa.array(["spark"] * n, pa.string())}
    tbl.update(cols)
    idx = str(tmp_path / "dfq")
    import ray.data as rd
    build_index(rd.from_arrow(pa.table(tbl)), idx, segment_size=2,
                meta_cols=tuple(cols))
    return idx


def _searcher(idx, dtype="float32"):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search.searcher import Searcher
    from lucene_kmp_ray.similarity.bm25 import BM25Similarity
    return Searcher(IndexReader(idx), BM25Similarity(dtype=dtype))


def test_long_distance_feature_basics(ray_session, tmp_path):
    # TestLongDistanceFeatureQuery.kt testBasics, float32 engine mode
    from lucene_kmp_ray.search import LongDistanceFeatureQuery
    idx = _index(tmp_path, foo=pa.array([3, 12, 8, -1, 7], pa.int64()))
    s = _searcher(idx)

    td = s.search(LongDistanceFeatureQuery("foo", 10, 5, weight=3.0), k=2)
    got = [(h.doc_id, h.score) for h in td.score_docs]
    exp_s = float(np.float32(3.0 * (5.0 / (5.0 + 2.0))))
    assert got == [(1, exp_s), (2, exp_s)]  # ties break by docID

    td = s.search(LongDistanceFeatureQuery("foo", 7, 5, weight=3.0), k=2)
    got = [(h.doc_id, h.score) for h in td.score_docs]
    assert got == [(4, float(np.float32(3.0 * (5.0 / 5.0)))),
                   (2, float(np.float32(3.0 * (5.0 / 6.0))))]

    with pytest.raises(ValueError, match="pivotDistance"):
        LongDistanceFeatureQuery("foo", 0, 0)


def test_long_distance_feature_overflow(ray_session, tmp_path):
    # testOverUnderFlow contract: extreme origins don't wrap — scores
    # stay in [0, w] and the closest doc still wins
    from lucene_kmp_ray.search import LongDistanceFeatureQuery
    lo, hi = -(2**63), 2**63 - 1
    idx = _index(tmp_path, foo=pa.array([3, hi, lo], pa.int64()))
    s = _searcher(idx)
    td = s.search(LongDistanceFeatureQuery("foo", hi, 1, weight=1.0), k=3)
    assert td.score_docs[0].doc_id == 1
    assert all(0.0 <= h.score <= 1.0 for h in td.score_docs)
    td = s.search(LongDistanceFeatureQuery("foo", lo, 1, weight=1.0), k=3)
    assert td.score_docs[0].doc_id == 2


def test_geo_distance_feature(ray_session, tmp_path):
    # LatLonPointDistanceFeatureQuery.kt:113 — proximity boost composes
    # with BM25 in SHOULD position
    from lucene_kmp_ray.search import (BooleanQuery, GeoDistanceFeatureQuery,
                                       Occur, TermQuery)
    idx = _index(tmp_path,
                 lat=pa.array([0.0, 10.0, 0.1], pa.float64()),
                 lon=pa.array([0.0, 10.0, 0.1], pa.float64()))
    s = _searcher(idx, dtype="float64")
    q = GeoDistanceFeatureQuery(0.0, 0.0, 100_000.0, weight=2.0)
    td = s.search(q, k=3)
    assert [h.doc_id for h in td.score_docs] == [0, 2, 1]
    assert td.score_docs[0].score == 2.0  # distance 0 → full weight
    assert 0.0 < td.score_docs[2].score < td.score_docs[1].score < 2.0

    hyb = BooleanQuery.build((Occur.SHOULD, TermQuery("spark")),
                             (Occur.SHOULD, q))
    td2 = s.search(hyb, k=3)
    assert td2.score_docs[0].doc_id == 0
    assert td2.score_docs[0].score > td.score_docs[0].score  # BM25 added
