"""Query elevation — reference scenario vectors.

ref: core/src/commonTest/.../search/TestElevationComparator.kt
(testSorting / testSortingReversed): elevated ids pin to the top in
priority order, remainder sorts by score (desc, or asc when the score
sort is reversed).
"""
import pyarrow as pa


def _index(tmp_path):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    # the reference corpus: ipod×1..3 then boosted×1..3; ids a b c x y z
    texts = ["ipod", "ipod ipod", "ipod ipod ipod",
             "boosted", "boosted boosted", "boosted boosted boosted"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "url": pa.array(list("abcxyz"), pa.string()),
        "text": pa.array(texts, pa.string())}))
    idx = str(tmp_path / "elev")
    build_index(ds, idx, segment_size=2)
    return idx


def test_elevation_sorting(ray_session, tmp_path):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import TermQuery
    from lucene_kmp_ray.search.searcher import Searcher

    s = Searcher(IndexReader(_index(tmp_path)))
    # organic query: title ipod; elevation: a (prio hi) then x
    td = s.search_elevated(TermQuery("ipod"), ["a", "x"], k=50)
    assert len(td.score_docs) == 4  # a b c + elevated x
    got = [h.url for h in td.score_docs]
    # 0 & 3 elevated; remainder by BM25 desc: c ("ipod ipod ipod") > b
    assert got == ["a", "x", "c", "b"]
    assert td.score_docs[1].score == 0.0  # x never matches ipod

    rev = s.search_elevated(TermQuery("ipod"), ["a", "x"], k=50,
                            score_reversed=True)
    assert [h.url for h in rev.score_docs] == ["a", "x", "b", "c"]


def test_elevation_respects_deletes(ray_session, tmp_path):
    from lucene_kmp_ray.index.deletes import delete_by_url
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import TermQuery
    from lucene_kmp_ray.search.searcher import Searcher

    idx = _index(tmp_path)
    delete_by_url(idx, ["x"])
    td = Searcher(IndexReader(idx)).search_elevated(
        TermQuery("ipod"), ["a", "x"], k=50)
    assert [h.url for h in td.score_docs] == ["a", "c", "b"]
