"""Sorted-field pagination — searchAfter with a FieldDoc cursor.

ref: search/IndexSearcher.kt searchAfter(FieldDoc, Query, n, Sort) /
TestSearchAfter.kt sorted cases: page boundaries are strict — page 2
starts strictly after page 1's last row in the sort order, pages
concatenate to the full sorted run, and no row repeats or is skipped.
"""
import numpy as np
import pyarrow as pa


def test_sorted_paging_pages_concatenate(ray_session, tmp_path):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.search import TermQuery
    from lucene_kmp_ray.search.ray_search import (SortField,
                                                  search_sorted_by_fields)

    rng = np.random.default_rng(5)
    n = 60
    lens = rng.integers(0, 9, n)  # heavy ties → tie-break coverage
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "text": pa.array(["spark"] * n, pa.string()),
        "w": pa.array(lens, pa.int64())}))
    idx = str(tmp_path / "pg")
    build_index(ds, idx, segment_size=13, meta_cols=("w",))
    sf = (SortField("w", descending=True),)

    full = search_sorted_by_fields(idx, TermQuery("spark"), sf, k=60)
    pages, cursor = [], None
    for _ in range(4):
        page = search_sorted_by_fields(idx, TermQuery("spark"), sf, k=15,
                                       after=cursor)
        assert len(page) == 15
        pages.append(page)
        cursor = page.iloc[-1].to_dict()
    got = [int(r) for p in pages for r in p["doc_id"]]
    assert got == [int(r) for r in full["doc_id"]]
    # past the end → empty page
    last = pages[-1].iloc[-1].to_dict()
    tail = search_sorted_by_fields(idx, TermQuery("spark"), sf, k=15,
                                   after=last)
    assert len(tail) == 0


def test_sorted_paging_with_missing_values(ray_session, tmp_path):
    # cursor paging across the null boundary: missing_last=True puts
    # null-key docs at the end; pages must still concatenate exactly
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.search import TermQuery
    from lucene_kmp_ray.search.ray_search import (SortField,
                                                  search_sorted_by_fields)

    rng = np.random.default_rng(9)
    n = 40
    w = [None if rng.random() < 0.3 else int(rng.integers(0, 6))
         for _ in range(n)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "text": pa.array(["spark"] * n, pa.string()),
        "w": pa.array(w, pa.int64())}))
    idx = str(tmp_path / "pgnull")
    build_index(ds, idx, segment_size=9, meta_cols=("w",))
    sf = (SortField("w", descending=True, missing_last=True),)

    full = search_sorted_by_fields(idx, TermQuery("spark"), sf, k=n)
    pages, cursor = [], None
    while True:
        page = search_sorted_by_fields(idx, TermQuery("spark"), sf, k=7,
                                       after=cursor)
        if page.empty:
            break
        pages.append(page)
        cursor = page.iloc[-1].to_dict()
    got = [int(r) for p in pages for r in p["doc_id"]]
    assert got == [int(r) for r in full["doc_id"]]
