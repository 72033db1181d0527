"""LatLonPoint.nearest analog — reference scenario vectors.

ref: core/src/commonTest/.../search/TestNearest.kt
(testNearestNeighborWithDeletedDocs, testTieBreakByDocID,
testNearestNeighborWithNoDocs, testNearestNeighborRandom) against
document/LatLonPoint.kt:417-457 + document/NearestNeighbor.kt.
"""
import numpy as np
import pyarrow as pa
import pytest


def _geo_index(tmp_path, lats, lons, name="near"):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    n = len(lats)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "text": pa.array(["spark here"] * n, pa.string()),
        "lat": pa.array(lats, pa.float64()),
        "lon": pa.array(lons, pa.float64())}))
    idx = str(tmp_path / name)
    build_index(ds, idx, segment_size=max(2, (n + 1) // 2),
                meta_cols=("lat", "lon"))
    return idx


def _searcher(idx):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search.searcher import Searcher
    return Searcher(IndexReader(idx))


def test_nearest_basic_and_deleted(ray_session, tmp_path):
    # TestNearest.kt testNearestNeighborWithDeletedDocs: doc0 at the query
    # point wins; after deleting doc0, doc1 wins.
    from lucene_kmp_ray.index.deletes import delete_by_url
    idx = _geo_index(tmp_path, [40.0, 45.0], [50.0, 55.0])
    s = _searcher(idx)
    td = s.nearest(40.0, 50.0, 1)
    assert [h.doc_id for h in td.score_docs] == [0]
    assert td.score_docs[0].score == 0.0  # exact point → zero meters
    assert td.total_hits == 2 and td.relation == "EQUAL_TO"

    delete_by_url(idx, ["u0"])
    td = _searcher(idx).nearest(40.0, 50.0, 1)
    assert [h.doc_id for h in td.score_docs] == [1]
    assert td.score_docs[0].score > 0
    # points.docCount keeps deleted docs until merge (LatLonPoint.kt:434)
    assert td.total_hits == 2


def test_tie_break_by_doc_id(ray_session, tmp_path):
    # TestNearest.kt testTieBreakByDocID: two docs at the same point →
    # smaller docID first (NearestNeighbor.kt:37-42)
    idx = _geo_index(tmp_path, [40.0, 40.0], [50.0, 50.0])
    td = _searcher(idx).nearest(45.0, 50.0, 2)
    assert [h.doc_id for h in td.score_docs] == [0, 1]
    assert td.score_docs[0].score == td.score_docs[1].score


def test_no_docs(ray_session, tmp_path):
    # testNearestNeighborWithNoDocs analog: index without geo meta
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "url": pa.array(["u0"], pa.string()),
        "text": pa.array(["spark"], pa.string())}))
    idx = str(tmp_path / "nogeo")
    build_index(ds, idx, segment_size=2)
    td = _searcher(idx).nearest(40.0, 50.0, 1)
    assert td.score_docs == [] and td.total_hits == 0


def test_validation(ray_session, tmp_path):
    idx = _geo_index(tmp_path, [0.0], [0.0], "val")
    s = _searcher(idx)
    with pytest.raises(ValueError, match="n must be at least 1"):
        s.nearest(0.0, 0.0, 0)
    with pytest.raises(ValueError, match="latitude"):
        s.nearest(91.0, 0.0, 1)
    with pytest.raises(ValueError, match="longitude"):
        s.nearest(0.0, 181.0, 1)


def test_random_differential(ray_session, tmp_path):
    # testNearestNeighborRandom analog: engine top-k == brute-force
    # haversine sort with docID tie-break (same clobbered sort key)
    rng = np.random.default_rng(7)
    n = 200
    lats = rng.uniform(-90, 90, n)
    lons = rng.uniform(-180, 180, n)
    idx = _geo_index(tmp_path, lats.tolist(), lons.tolist(), "rand")
    qlat, qlon = 12.5, -33.25
    td = _searcher(idx).nearest(qlat, qlon, 10)

    from lucene_kmp_ray.search.query import EARTH_MEAN_RADIUS_METERS
    x2 = np.radians(qlat)
    h = (1.0 - np.cos(np.radians(lats) - x2)) + \
        np.cos(np.radians(lats)) * np.cos(x2) * \
        (1.0 - np.cos(np.radians(lons - qlon)))
    h = (h.view(np.int64) & np.int64(-8)).view(np.float64)
    dist = EARTH_MEAN_RADIUS_METERS * 2.0 * \
        np.arcsin(np.minimum(1.0, np.sqrt(h * 0.5)))
    exp = np.lexsort((np.arange(n), dist))[:10]
    assert [h_.doc_id for h_ in td.score_docs] == exp.tolist()
    got = np.array([h_.score for h_ in td.score_docs])
    assert np.allclose(got, dist[exp], rtol=0, atol=0)


def test_distance_sort_over_query_matches(ray_session, tmp_path):
    # LatLonPoint.newDistanceSort role (TestLatLonPointDistanceSort):
    # matches of a query ordered by distance; missing coords +inf last
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.search import TermQuery

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(5)], pa.string()),
        "text": pa.array(["spark", "spark", "other", "spark", "spark"],
                         pa.string()),
        "lat": pa.array([10.0, 0.1, 0.0, None, 50.0], pa.float64()),
        "lon": pa.array([10.0, 0.1, 0.0, None, 50.0], pa.float64())}))
    idx = str(tmp_path / "dsort")
    build_index(ds, idx, segment_size=2, meta_cols=("lat", "lon"))
    td = _searcher(idx).nearest(0.0, 0.0, 10, query=TermQuery("spark"))
    # doc2 is closest but doesn't match; doc3 matches but has no coords
    assert [h.doc_id for h in td.score_docs] == [1, 0, 4, 3]
    assert td.score_docs[-1].score == float("inf")
    assert td.total_hits == 4
